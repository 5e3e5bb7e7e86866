#!/bin/bash
# Fault-tolerant training launcher (replaces the reference SGE/torchrun script
# train.sh). On crash it restarts and auto-resumes from the NEWEST checkpoint in
# the experiment directory — an improvement over the reference's fixed
# CURRENT_CHECKPOINT path (reference train.sh:30-37).
#
# Usage: ./train.sh <data-path> [extra train.py flags...]
set -u

DATA_PATH="${1:?usage: ./train.sh <data-path> [flags...]}"
shift || true
RESULTS_DIR="${RESULTS_DIR:-results}"
mkdir -p logs

latest_ckpt() {
    # newest orbax step dir across all experiments
    ls -d "${RESULTS_DIR}"/*/checkpoints/[0-9]* 2>/dev/null | sort | tail -n 1
}

while true; do
    CKPT="$(latest_ckpt)"
    if [ -n "${CKPT}" ]; then
        echo "Resuming from ${CKPT}"
        python train.py --data-path "${DATA_PATH}" --results-dir "${RESULTS_DIR}" \
            --ckpt "${CKPT}" "$@" 2>&1 | tee -a logs/train.log
    else
        python train.py --data-path "${DATA_PATH}" --results-dir "${RESULTS_DIR}" \
            "$@" 2>&1 | tee -a logs/train.log
    fi
    echo "train.py exited ($?); restarting in 1s..." | tee -a logs/train.log
    sleep 1
done
