#!/usr/bin/env python
"""Training-throughput benchmark: DiT-B train step, samples/sec/chip and MFU.

Not the driver headline (bench.py is); used to track the >50%-MFU north star
(BASELINE.json) during development.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e (v5 lite) peak bf16 FLOP/s per chip


def model_flops_per_step(n_params_active: int, batch: int, seq_len: int) -> float:
    """6·P·tokens forward+backward estimate for the parameterized matmuls."""
    return 6.0 * n_params_active * batch * seq_len


def attention_flops_per_step(
    depth: int, hidden: int, batch: int, seq_len: int, band: int | None
) -> float:
    """Ideal fwd+bwd FLOPs of the attention score/value matmuls (the term
    6·P·tokens misses — it dominates the banded long-T benchmarks, whose
    whole point is the O(T·band) attention).

    Exact banded pair count per query row (band q-L < k <= q+L, clipped at
    the sequence edges); 4·pairs·D forward (QK^T and PV at 2 FLOPs/MAC each),
    x3 for fwd+bwd — the ideal algorithm, consistent with 6·P·tokens which
    also excludes remat/recompute FLOPs."""
    q = np.arange(seq_len)
    if band is None:
        pairs = seq_len * seq_len
    else:
        lo = np.maximum(0, q - band + 1)
        hi = np.minimum(seq_len, q + band + 1)
        pairs = int((hi - lo).sum())
    return depth * 12.0 * hidden * pairs * batch


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="DiT-B")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--steps-per-call", type=int, default=8)
    parser.add_argument("--calls", type=int, default=3)
    parser.add_argument("--num-classes", type=int, default=52670)
    parser.add_argument("--no-bf16", action="store_true")
    parser.add_argument("--use-pallas", action="store_true",
                        help="fused kernels (flash attention + adaLN-MLP) with "
                             "their residual-saving custom VJPs")
    parser.add_argument("--no-remat", action="store_true",
                        help="disable per-block rematerialization")
    parser.add_argument("--scan-blocks", action="store_true")
    parser.add_argument("--attn-layout", choices=["packed", "einsum"],
                        default="packed",
                        help="attention projection layout experiment: einsum "
                             "folds the head transposes into the matmuls")
    parser.add_argument("--mlp-bwd", choices=["fused", "xla"], default="xla",
                        help="adaLN-MLP kernel backward: Pallas fused "
                             "reduction/LN-backward kernels vs plain-jnp "
                             "(only meaningful with --use-pallas)")
    parser.add_argument("--pallas-ops", default="attn,mlp",
                        help="which ops --use-pallas fuses: attn,mlp / attn / "
                             "mlp (mlp-only keeps XLA dense attention)")
    parser.add_argument("--band", type=int, default=None,
                        help="banded attention half-width (long-sequence "
                             "fine-tuning shape); defaults to seq-len when "
                             "--use-pallas is set")
    parser.add_argument("--flash-block", type=int, default=128,
                        help="flash-attention kernel block size (q rows per "
                             "program and key-window stride) — the long-T "
                             "tuning knob")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of the timed calls")
    parser.add_argument("--slim-stats", choices=["auto", "on", "off"],
                        default="auto",
                        help="flash backward with the compact-LSE / in-kernel "
                             "delta layout (ops/pallas_attention.py "
                             "SLIM_STATS_DEFAULT)")
    args = parser.parse_args()

    if args.slim_stats != "auto":
        import osu_diffusion_tpu.ops.pallas_attention as _pa

        _pa.SLIM_STATS_DEFAULT = args.slim_stats == "on"

    from osu_diffusion_tpu import CONTEXT_SIZE
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models import DiT_models
    from osu_diffusion_tpu.parallel import batch_sharding, make_mesh, make_train_step
    from osu_diffusion_tpu.parallel.train_step import (
        create_train_state,
        make_multi_train_step,
        make_optimizer,
    )
    from osu_diffusion_tpu.parallel.sharding import shard_params

    model = DiT_models[args.model](
        num_classes=args.num_classes, context_size=CONTEXT_SIZE,
        class_dropout_prob=0.2, remat=not args.no_remat,
        scan_blocks=args.scan_blocks, attn_layout=args.attn_layout,
        mlp_bwd=args.mlp_bwd, pallas_ops=args.pallas_ops,
        flash_block=args.flash_block,
    )
    diffusion = create_diffusion("", noise_schedule="squaredcos_cap_v2", use_l1=True)
    opt = make_optimizer()
    n, t = args.batch, args.seq_len

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, t, 2)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, t)), jnp.zeros((2, t, CONTEXT_SIZE)), jnp.zeros((2,), jnp.int32),
    )["params"]
    # active params exclude the embedding table (only 1-2 rows touched per item)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    table = params["y_embedder"]["embedding_table"]["embedding"]
    n_active = n_params - int(np.prod(table.shape))

    # single-device: plain execution (the SPMD path costs seconds/dispatch on
    # tunneled runtimes); multi-device: mesh + sharding
    import contextlib

    use_mesh = len(jax.devices()) > 1
    mesh = make_mesh(num_model=1) if use_mesh else None
    with (mesh if use_mesh else contextlib.nullcontext()):
        if use_mesh:
            params = shard_params(params, mesh)
        state = create_train_state(params, opt, mesh)
        single = make_train_step(
            model, diffusion, opt,
            compute_dtype=jnp.float32 if args.no_bf16 else jnp.bfloat16,
            use_pallas=args.use_pallas,
            band=args.band if args.band is not None
            else (args.seq_len if args.use_pallas else None),
        )
        k = args.steps_per_call
        multi = jax.jit(make_multi_train_step(single, k), donate_argnums=(0,))

        r = np.random.RandomState(0)
        raw = r.rand(k, n, t, 19).astype(np.float32)
        raw[..., :2] *= [512, 384]
        raw[..., 2] = np.cumsum(r.rand(k, n, t), axis=-1) * 200
        prev = np.tile([256.0, 192.0], (k, n, 1)).astype(np.float32)
        y = r.randint(0, args.num_classes, (k, n)).astype(np.int32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = (jnp.asarray(raw), jnp.asarray(prev), jnp.asarray(y))
        if use_mesh:
            batch = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))

        state, m = multi(state, batch, jax.random.PRNGKey(1))  # compile+warm
        float(m["loss"])  # fetch: block_until_ready is not a reliable
        # execution fence on the axon runtime (utils/benchmark.py docstring)
        import contextlib as _ctx

        prof = (
            jax.profiler.trace(args.profile_dir)
            if args.profile_dir else _ctx.nullcontext()
        )
        with prof:
            start = time.perf_counter()
            for i in range(args.calls):
                state, m = multi(state, batch, jax.random.PRNGKey(2 + i))
            # the calls chain through `state`, so fetching the last loss
            # fences them all
            float(m["loss"])
            elapsed = time.perf_counter() - start

    steps = args.calls * k
    steps_per_sec = steps / elapsed
    samples_per_sec = steps_per_sec * n
    cfg = model.config
    eff_band = args.band if args.band is not None else (
        args.seq_len if args.use_pallas else None
    )
    mm_flops = model_flops_per_step(n_active, n, t)
    attn_flops = attention_flops_per_step(cfg.depth, cfg.hidden_size, n, t, eff_band)
    flops = mm_flops + attn_flops
    mfu = steps_per_sec * flops / V5E_BF16_PEAK_FLOPS
    print(json.dumps({
        "model": args.model,
        "use_pallas": args.use_pallas,
        "remat": not args.no_remat,
        "band": args.band,
        "flash_block": args.flash_block,
        "slim_stats": args.slim_stats,
        "batch": n,
        "seq_len": t,
        "steps_per_sec": round(steps_per_sec, 3),
        "samples_per_sec": round(samples_per_sec, 1),
        "est_flops_per_step": flops,
        "attn_flops_per_step": attn_flops,
        "mfu": round(mfu, 4),
        "loss": float(m["loss"]),
    }))


if __name__ == "__main__":
    main()
