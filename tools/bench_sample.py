#!/usr/bin/env python
"""Generic sampling throughput bench: any registry model / batch / T.

Same grouped-pipelined methodology as the headline bench (bench.py,
utils/benchmark.py) — 100-step exact f32 chain, CFG-doubled inputs — but
parameterized, so the registry's upper half (DiT-L/XL) gets recorded numbers
next to DiT-B (reference trained DiT-L, train.sh:13 / sample.bat:1).
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
    parser.add_argument("--model", type=str, default="DiT-L")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--groups", type=int, default=10)
    parser.add_argument("--runs", type=int, default=10)
    parser.add_argument("--scan-blocks", action="store_true",
                        help="scan-over-depth layout (smaller compile; the "
                             "unrolled default is ~8%% faster at DiT-B)")
    args = parser.parse_args()

    from osu_diffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from osu_diffusion_tpu import CONTEXT_SIZE
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models import DiT_models
    from osu_diffusion_tpu.sampling import Sampler
    from osu_diffusion_tpu.utils.benchmark import (
        fetch_fence,
        headline_inputs,
        measure_grouped,
    )

    model = DiT_models[args.model](
        num_classes=52670, context_size=CONTEXT_SIZE,
        scan_blocks=args.scan_blocks,
    )
    diffusion = create_diffusion(str(args.steps),
                                 noise_schedule="squaredcos_cap_v2")
    z, o, c, y, init_args = headline_inputs(args.batch, args.seq_len)
    params = model.init(jax.random.PRNGKey(0), *init_args)["params"]
    sampler = Sampler(model, diffusion, cfg_scale=1.0, band=None,
                      bucket=args.seq_len)

    t0 = time.perf_counter()
    out = sampler(params, z, o, c, y, jax.random.PRNGKey(3))
    fetch_fence(out)
    compile_s = time.perf_counter() - t0

    per_group = measure_grouped(
        lambda j: sampler(params, z, o, c, y, jax.random.PRNGKey(4 + j)),
        steps=args.steps, groups=args.groups, runs=args.runs,
    )
    print(json.dumps({
        "model": args.model, "batch": args.batch, "seq_len": args.seq_len,
        "steps_per_sec_best": round(max(per_group), 1),
        "steps_per_sec_median": round(statistics.median(per_group), 1),
        "per_group": [round(v, 1) for v in per_group],
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
