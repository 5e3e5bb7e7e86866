#!/bin/bash
# Tail all training logs (parity with reference viewlog.sh).
PARENT_PATH=$( cd "$(dirname "${BASH_SOURCE[0]}")" ; pwd -P )
cd "$PARENT_PATH"
tail -f ./logs/* ./results/*/log.txt 2>/dev/null
