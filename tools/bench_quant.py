#!/usr/bin/env python
"""int8 weight-only serving benchmark (opt-in feature, no ref equivalent).

Same harness as the headline bench (bench.py shapes + the SHARED
grouped-pipelined measurement in utils/benchmark.py) run twice: the exact
f32-tree chain and the int8 weight-only chain (`DiTConfig.quant` +
models/quantize.quantize_params — block projection weights stored as
symmetric per-output-channel int8 and read as int8 from HBM by the
ops/pallas_quant kernel, halving the weight stream the roofline note in
PARITY.md identifies as one of the two walls at these shapes). Reports
steps/sec per variant and the speedup.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--groups", type=int, default=10)
    parser.add_argument("--runs", type=int, default=10)
    parser.add_argument("--model", type=str, default="DiT-B")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument(
        "--variants", type=str, default="f32,int8",
        help="comma list from {f32,int8}; order is measurement order",
    )
    parser.add_argument(
        "--accel-tau", type=float, default=None,
        help="ADAPTIVE Δ-cache tau applied to every measured variant "
             "(error-driven skip; combines with int8 for the adaptive "
             "frontier point)",
    )
    parser.add_argument("--max-skip", type=int, default=7)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="trained checkpoint (orbax dir or torch .pt); "
                             "adaptive-tau skip counts are weight-dependent")
    parser.add_argument("--num-classes", type=int, default=52670)
    parser.add_argument(
        "--max-rows", type=int, default=None,
        help="override pallas_quant.BATCH_BLOCK_MAX_ROWS (the rows-per-"
             "program cap of the batch-blocked int8 kernels)",
    )
    parser.add_argument(
        "--accel-interval", type=int, default=1,
        help="Δ-cache interval applied to every measured variant (the "
             "PARITY synergy rows compare f32 at interval 1 vs int8 at "
             "interval 3 — two invocations)",
    )
    args = parser.parse_args()

    from osu_diffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.max_rows is not None:
        from osu_diffusion_tpu.ops import pallas_quant as _pq

        _pq.BATCH_BLOCK_MAX_ROWS = args.max_rows
    from osu_diffusion_tpu import CONTEXT_SIZE
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models import DiT_models
    from osu_diffusion_tpu.models.quantize import quantize_params
    from osu_diffusion_tpu.sampling import Sampler
    from osu_diffusion_tpu.utils.benchmark import (
        fetch_fence,
        headline_inputs,
        measure_grouped,
    )

    steps = 100
    diffusion = create_diffusion(str(steps), noise_schedule="squaredcos_cap_v2")
    t_len = args.seq_len
    n = args.batch
    z, o, c, y, init_args = headline_inputs(n, t_len, args.num_classes)

    model = DiT_models[args.model](
        num_classes=args.num_classes, context_size=CONTEXT_SIZE,
        scan_blocks=False,
    )
    if args.ckpt:
        from osu_diffusion_tpu.train.checkpoint import restore_params_any

        params = restore_params_any(args.ckpt, model)
    else:
        params = model.init(jax.random.PRNGKey(0), *init_args)["params"]
    qmodel = DiT_models[args.model](
        num_classes=args.num_classes, context_size=CONTEXT_SIZE,
        scan_blocks=False, quant=True,
    )
    qparams = quantize_params(params)

    setups = {"f32": (model, params), "int8": (qmodel, qparams)}
    results = {}
    for name in args.variants.split(","):
        m, p = setups[name]
        sampler = Sampler(m, diffusion, cfg_scale=1.0, band=None, bucket=t_len,
                          accel_interval=args.accel_interval,
                          accel_tau=args.accel_tau,
                          accel_max_skip=args.max_skip)
        t0 = time.perf_counter()
        out = sampler(p, z, o, c, y, jax.random.PRNGKey(3))
        fetch_fence(out)
        compile_s = time.perf_counter() - t0
        full_steps = (
            int(sampler.last_full_model_steps) if sampler.accel else steps
        )

        per_group = measure_grouped(
            lambda j, p=p: sampler(p, z, o, c, y, jax.random.PRNGKey(4 + j)),
            steps=steps, groups=args.groups, runs=args.runs,
        )
        results[name] = {
            "steps_per_sec_best": round(max(per_group), 1),
            "steps_per_sec_median": round(statistics.median(per_group), 1),
            "per_group": [round(v, 1) for v in per_group],
            "compile_s": round(compile_s, 1),
            "full_model_steps": full_steps,
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    if "f32" in results and "int8" in results:
        results["speedup"] = round(
            results["int8"]["steps_per_sec_best"]
            / results["f32"]["steps_per_sec_best"],
            3,
        )
    print(json.dumps({"model": args.model, "batch": n, "seq_len": t_len,
                      "results": results}))


if __name__ == "__main__":
    main()
