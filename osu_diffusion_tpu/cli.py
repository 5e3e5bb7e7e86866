"""Command-line entry points with the reference's flag surfaces.

`sample_main` mirrors reference sample.py:208-236 and `train_main` mirrors
train.py:306-336 (boolean flags are real --flag/--no-flag pairs, fixing the
reference's `type=bool` truthy-string trap, SURVEY.md §7 defects list).
"""
from __future__ import annotations

import argparse
import logging
import os
import re
import warnings
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu import CONTEXT_SIZE
from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.data import beatmap_to_sequence, get_beatmap_idx
from osu_diffusion_tpu.data.process import (
    split_and_process_sequence,
    split_and_process_sequence_no_augment,
)
from osu_diffusion_tpu.diffusion import create_diffusion
from osu_diffusion_tpu.export import create_beatmap, plot_beatmap
from osu_diffusion_tpu.models import DiT_models
from osu_diffusion_tpu.sampling import Sampler, prepare_cfg_inputs
from osu_diffusion_tpu.train.checkpoint import restore_params_any

CLEAN_FILENAME_RX = re.compile(r"[/\\?%*:|\"<>\x7F\x00-\x1F]")


def _bool_flag(parser, name, default):
    parser.add_argument(
        f"--{name}", action=argparse.BooleanOptionalAction, default=default
    )


def serving_regime_warnings(
    quantize_weights: bool,
    accel_interval: int,
    t_len: int,
    dispatch_batch: int,
) -> list[str]:
    """Measured regime cliffs of the fast serving flags (PARITY.md "int8
    weight-only serving" / "Δ-cache accelerated sampling").

    int8 weight-only pays in the weight-bound regime — where few tokens
    share each streamed weight byte. With the round-5 batch-blocked kernels
    (weight blocks resident across batch rows) the whole batch-2 line is a
    win: measured 1.57x at T=32, 1.20x/1.04x/1.03x/1.04x at T=48/64/96/128.
    The one remaining lose regime is batched throughput (0.93x at dispatch
    batch 32 — compute-bound; XLA's flattened f32 matmuls win). Δ-cache
    intervals deeper than 3 stop paying at T<=32 (dispatch-bound: the
    per-dispatch overhead, not the model, sets the floor). The flags are
    documented accelerators, so warn whenever a requested combination is in
    a measured lose-or-parity regime instead of silently slowing the user.
    Returns the warning strings (also emitted via warnings.warn)."""
    out: list[str] = []
    if quantize_weights and dispatch_batch >= 8:
        out.append(
            f"--quantize-weights at dispatch batch {dispatch_batch}: int8 "
            "weight-only serving is a small-batch latency feature; at "
            "large batch the chain is compute-bound and int8 measured "
            "0.93x f32 at batch 32 (PARITY.md). Expect parity-at-best; "
            "drop the flag for batched throughput."
        )
    if accel_interval > 3 and t_len <= 32:
        out.append(
            f"--accel-interval {accel_interval} at T={t_len}: the chain is "
            "dispatch-bound at short T, where intervals deeper than 3 stop "
            "paying (PARITY.md); use --accel-interval 3 or less."
        )
    for msg in out:
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return out


# ---------------------------------------------------------------------------
# sample
# ---------------------------------------------------------------------------


def build_sample_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--beatmap", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument(
        "--model", type=str, choices=list(DiT_models.keys()), default="DiT-B"
    )
    parser.add_argument("--num-classes", type=int, default=52670)
    parser.add_argument("--beatmap-idx", type=str,
                        default=os.path.join("assets", "beatmap_idx.pickle"))
    parser.add_argument("--cfg-scale", type=float, default=1.0)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--style-id", type=int, default=None)
    parser.add_argument("--plot-time", type=float, default=None)
    parser.add_argument("--plot-width", type=float, default=2000)
    parser.add_argument("--num-variants", type=int, default=1)
    parser.add_argument("--refine-ckpt", type=str, default=None)
    parser.add_argument("--refine-iters", type=int, default=10)
    parser.add_argument("--compute-dtype", choices=["f32", "bf16"], default="f32",
                        help="model-stream dtype: f32 (default) preserves "
                             "reference output parity; bf16 halves activation "
                             "memory (useful at very long T; measured neutral "
                             "on speed at typical shapes)")
    parser.add_argument("--results-dir", type=str, default="results")
    _bool_flag(parser, "make-animation", False)
    _bool_flag(parser, "use-pallas", True)
    _bool_flag(parser, "augment-flip", False)
    # default ON for sampling: 10x faster cold compiles at ~8% runtime cost
    # (unrolled measures 2154-2165 vs scan 1988-1993 steps/s, PARITY.md
    # "Depth-layout A/B" — pass --no-scan-blocks for peak throughput; the
    # headline bench does). Training keeps the unrolled default (remat inside
    # scan cannot be CSE'd away, costing ~24% there). Checkpoints saved with
    # the other block layout are converted automatically on restore
    # (restore_params_any).
    _bool_flag(parser, "scan-blocks", True)
    # int8 weight-only serving: block projection weights quantized to
    # symmetric per-output-channel int8 and read as int8 by a Pallas matmul
    # kernel (half the HBM weight stream; ops/pallas_quant.py). Approximate
    # (weight rounding ~0.4%/channel); embedders/final layer stay f32.
    # Pays in the weight-bound regime (short windows: 1.33x at T=32); at
    # T>=128 the chain is MXU-bound and f32 is marginally faster (0.98x) —
    # see PARITY.md "int8 weight-only serving".
    _bool_flag(parser, "quantize-weights", False)
    # accepted for reference flag parity (sample.py:224); TPU sampling runs
    # fp32 activations with bf16 MXU passes regardless
    _bool_flag(parser, "use-amp", True)
    parser.add_argument("--sampling-method", type=str, default="ancestral",
                        choices=["ancestral", "ddim"])
    parser.add_argument("--accel-interval", type=int, default=1,
                        help="Δ-cache accelerated sampling (opt-in, "
                             "approximate): run the full model every Nth "
                             "denoise step, reuse the cached middle-block "
                             "residual in between (Δ-DiT-style). 1 = exact "
                             "sampling; implies the unrolled block layout")
    parser.add_argument("--accel-span", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="block range [LO, HI) the Δ-cache covers "
                             "(default: the middle two-thirds of the depth)")
    parser.add_argument("--accel-tau", type=float, default=None,
                        help="adaptive Δ-cache: reuse the cached Δ while the "
                             "relative input drift since the last full step "
                             "stays below TAU (error-driven skips replace "
                             "the fixed --accel-interval schedule)")
    parser.add_argument("--accel-max-skip", type=int, default=7,
                        help="adaptive Δ-cache staleness cap: force a full "
                             "step after this many consecutive skips")
    return parser


def sample_main(args) -> list[str]:
    """End-to-end beatmap generation. Parity with reference sample.py:39-205.

    One deliberate fix: the reference applies the *augmenting* splitter at
    sample time (sample.py:64 calls split_and_process_sequence, which random-
    flips the map — SURVEY.md §7 defect list). Default here is no flip;
    --augment-flip restores the reference behavior.
    """
    from osu_diffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = jax.random.PRNGKey(args.seed)

    beatmap = Beatmap.from_path(args.beatmap)
    filename = f"{beatmap.beatmap_id} {beatmap.artist} - {beatmap.title}"
    filename = CLEAN_FILENAME_RX.sub("-", filename)
    result_dir = os.path.join(args.results_dir, filename)
    os.makedirs(result_dir, exist_ok=True)

    seq_no_embed = beatmap_to_sequence(beatmap)  # (T, 19)

    if args.plot_time is not None:
        start_index = int(np.nonzero(seq_no_embed[:, 2] >= args.plot_time)[0][0])
        seq_no_embed = seq_no_embed[start_index : start_index + args.seq_len]
        print(f"Sequence trimmed to length {seq_no_embed.shape[0]}")

    if args.augment_flip:
        rng, flip_rng = jax.random.split(rng)
        (seq_x, seq_o, seq_c), seq_len = split_and_process_sequence(
            jnp.asarray(seq_no_embed), flip_rng
        )
    else:
        (seq_x, seq_o, seq_c), seq_len = split_and_process_sequence_no_augment(
            jnp.asarray(seq_no_embed)
        )
    seq_o = seq_o - seq_o[0]
    print(f"seq len {seq_len}")

    # Δ-cache acceleration statically slices the depth loop, so it needs the
    # unrolled block layout; restore_params_any converts scan-layout
    # checkpoints in-memory either way
    scan_blocks = (
        args.scan_blocks and args.accel_interval <= 1 and args.accel_tau is None
    )
    if args.quantize_weights:
        from osu_diffusion_tpu.models.quantize import restore_quantized

        model, params = restore_quantized(
            args.ckpt, DiT_models[args.model],
            num_classes=args.num_classes, context_size=CONTEXT_SIZE,
            scan_blocks=scan_blocks,
        )
    else:
        model = DiT_models[args.model](
            num_classes=args.num_classes, context_size=CONTEXT_SIZE,
            scan_blocks=scan_blocks,
        )
        params = restore_params_any(args.ckpt, model)
    diffusion = create_diffusion(
        str(args.num_sampling_steps), noise_schedule="squaredcos_cap_v2"
    )

    if args.style_id is not None:
        beatmap_idx = get_beatmap_idx(args.beatmap_idx)
        idx = beatmap_idx[args.style_id]
        class_labels = [idx + i for i in range(args.num_variants)]
    else:
        class_labels = [args.num_classes]

    # regime-cliff guardrails: CFG doubles the dispatched batch
    serving_regime_warnings(
        args.quantize_weights, args.accel_interval,
        t_len=int(seq_len), dispatch_batch=2 * len(class_labels),
    )

    rng, noise_rng, sample_rng = jax.random.split(rng, 3)
    z, o, c, y = prepare_cfg_inputs(
        seq_x, np.asarray(seq_o), np.asarray(seq_c), class_labels,
        args.num_classes, noise_rng,
    )

    sampler = Sampler(
        model, diffusion, cfg_scale=args.cfg_scale, band=args.seq_len,
        use_pallas=args.use_pallas, method=args.sampling_method,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32,
        accel_interval=args.accel_interval,
        accel_span=tuple(args.accel_span) if args.accel_span else None,
        accel_tau=args.accel_tau,
        accel_max_skip=args.accel_max_skip,
    )

    n = len(class_labels)

    def to_seq(samples):
        coords = np.asarray(samples)[:n]  # drop the null-class half
        rest = np.broadcast_to(seq_no_embed[None, :, 2:], (n, seq_len, 17))
        return np.concatenate([coords, rest], axis=-1)

    written: list[str] = []

    def save_sequence(sampled_seq, iteration_number=None):
        for idx, seq in enumerate(sampled_seq):
            try:
                suffix = "" if iteration_number is None else f" {iteration_number}"
                new_beatmap = create_beatmap(
                    seq, beatmap,
                    f"Diffusion {args.style_id} {idx} {datetime.now()}{suffix}",
                )
                out_path = os.path.join(
                    result_dir,
                    f"{beatmap.beatmap_id} result {args.style_id} {idx}{suffix}.osu",
                )
                new_beatmap.write_path(out_path)
                written.append(out_path)
                if args.plot_time is not None:
                    import matplotlib.pyplot as plt

                    fig, ax = plt.subplots()
                    plot_beatmap(ax, new_beatmap, args.plot_time, args.plot_width)
                    ax.axis("equal")
                    ax.set_xlim([0, 512])
                    ax.set_ylim([384, 0])
                    plt.show()
            except Exception as e:
                logging.error("Failed to create beatmap.", exc_info=e)

    if args.plot_time is not None and args.make_animation:
        import matplotlib.pyplot as plt
        from matplotlib import animation

        all_steps = _progressive_samples(sampler, params, z, o, c, y, sample_rng)
        fig, ax = plt.subplots()
        ax.axis("equal")
        ax.set_xlim([0, 512])
        ax.set_ylim([384, 0])
        artists = []
        sampled_seq = None
        for s in np.asarray(all_steps):
            sampled_seq = to_seq(s)
            new_beatmap = create_beatmap(
                sampled_seq[0], beatmap, f"Diffusion {args.style_id}"
            )
            artists.append(plot_beatmap(ax, new_beatmap, args.plot_time, args.plot_width))
        ani = animation.ArtistAnimation(fig=fig, artists=artists, interval=1000 // 24)
        ani.save(filename=os.path.join(result_dir, "animation.gif"), writer="pillow")
        save_sequence(sampled_seq)
    else:
        samples = sampler(params, z, o, c, y, sample_rng)
        save_sequence(to_seq(samples))

        if args.refine_ckpt is not None:
            # refine pass: repeated t=0 denoise with the refine model
            # (parity sample.py:186-205; the refine model is trained by the
            # t=0-only trainer, train_nodist.py:222)
            params = restore_params_any(args.refine_ckpt, model)
            img = samples
            t0 = jnp.zeros((img.shape[0],), jnp.int32)
            # the refine pass keeps the banded attention of the main sampling
            # path (the reference reuses model_kwargs incl. attn_mask,
            # sample.py:193-205); samples are unpadded here so no valid_len
            from osu_diffusion_tpu.ops.attention import banded_attention_mask

            refine_mask = (
                None if args.use_pallas
                else banded_attention_mask(img.shape[1], args.seq_len)
            )
            # the whole refine chain is ONE jitted lax.scan program (a single
            # device dispatch — the per-iteration Python loop paid the
            # ~1-2s tunnel dispatch latency refine_iters times; same shape
            # as evals/unfuck._runner)
            @jax.jit
            def refine_chain(params, img, rng):
                def model_fn(x, t, **kw):
                    return model.apply(
                        {"params": params}, x, t, o, c, y,
                        cfg_scale=args.cfg_scale,
                        attn_mask=refine_mask,
                        band=args.seq_len if args.use_pallas else None,
                        use_pallas=args.use_pallas,
                        method=type(model).forward_with_cfg,
                    )

                def body(im, step_rng):
                    out = diffusion.p_sample(
                        model_fn, im, t0, step_rng, clip_denoised=True
                    )
                    return out["sample"], None

                rngs = jax.random.split(rng, args.refine_iters)
                final, _ = jax.lax.scan(body, img, rngs)
                return final

            img = refine_chain(params, img, sample_rng)
            save_sequence(to_seq(img), args.refine_iters)

    return written


def _progressive_samples(sampler: Sampler, params, z, o, c, y, rng):
    """All intermediate samples for the animation flow."""
    diffusion = sampler.diffusion
    model = sampler.model
    t_real = z.shape[1]
    mask = None
    from osu_diffusion_tpu.ops.attention import banded_attention_mask

    if sampler.band is not None:
        mask = banded_attention_mask(t_real, sampler.band)

    def model_fn(x, t, **kw):
        return model.apply(
            {"params": params}, x, t, o, c, y, cfg_scale=sampler.cfg_scale,
            attn_mask=mask, method=type(model).forward_with_cfg,
        )

    return jax.jit(
        lambda r: diffusion.p_sample_loop_progressive(
            model_fn, z.shape, r, noise=z, clip_denoised=True
        )
    )(rng)


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------


def build_train_parser() -> argparse.ArgumentParser:
    from osu_diffusion_tpu.train.trainer import TrainConfig

    d = TrainConfig(data_path="")
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", type=str, required=True)
    parser.add_argument("--num-classes", type=int, default=d.num_classes)
    parser.add_argument("--data-end", type=int, default=d.data_end)
    parser.add_argument("--data-start", type=int, default=d.data_start)
    parser.add_argument("--results-dir", type=str, default=d.results_dir)
    parser.add_argument(
        "--model", type=str, choices=list(DiT_models.keys()), default=d.model
    )
    parser.add_argument("--epochs", type=int, default=d.epochs)
    parser.add_argument("--global-batch-size", type=int, default=d.global_batch_size)
    parser.add_argument("--global-seed", type=int, default=d.global_seed)
    parser.add_argument("--num-workers", type=int, default=d.num_workers)
    parser.add_argument("--log-every", type=int, default=d.log_every)
    parser.add_argument("--ckpt-every", type=int, default=d.ckpt_every)
    parser.add_argument("--seq-len", type=int, default=d.seq_len)
    parser.add_argument("--stride", type=int, default=d.stride)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--noise-schedule", type=str, default=d.noise_schedule)
    parser.add_argument("--lr", type=float, default=d.lr)
    parser.add_argument("--embed-only-epochs", type=int, default=d.embed_only_epochs)
    parser.add_argument("--num-model", type=int, default=d.num_model)
    parser.add_argument("--fine-tune-ids", type=str, default=None,
                        help="accepted for reference flag parity (train.py:330); "
                             "the reference never uses it either")
    parser.add_argument("--dist", type=str, default=None,
                        help="accepted for reference flag parity (train.py:329); "
                             "JAX needs no process-group backend — the mesh "
                             "replaces nccl/gloo")
    parser.add_argument("--use-amp", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="reference alias for --use-bf16 (fp16+scaler has "
                             "no TPU equivalent; bf16 needs no loss scaling)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--steps-per-call", type=int, default=d.steps_per_call)
    parser.add_argument("--profile-dir", type=str, default=None)
    parser.add_argument("--band", type=int, default=d.band,
                        help="banded attention half-width for long-T "
                             "fine-tuning (defaults to seq-len when "
                             "--use-pallas)")
    _bool_flag(parser, "context-parallel", d.context_parallel)
    _bool_flag(parser, "l1-loss", d.l1_loss)
    _bool_flag(parser, "relearn-embeds", d.relearn_embeds)
    _bool_flag(parser, "use-bf16", d.use_bf16)
    _bool_flag(parser, "use-pallas", d.use_pallas)
    _bool_flag(parser, "multihost", False)
    _bool_flag(parser, "scan-blocks", d.scan_blocks)
    _bool_flag(parser, "remat", d.remat)
    parser.add_argument("--mlp-bwd", choices=["fused", "xla"], default=d.mlp_bwd,
                        help="adaLN-MLP kernel backward (use_pallas only): "
                             "plain-jnp 'xla' (measured default) or the "
                             "Pallas fused reduction/LN-backward kernels")
    parser.add_argument("--pallas-ops", default=d.pallas_ops,
                        help="which ops --use-pallas fuses: attn,mlp / attn / "
                             "mlp (mlp-only keeps XLA dense attention — the "
                             "short-T training configuration)")
    parser.add_argument("--flash-block", type=int, default=d.flash_block,
                        help="flash-attention kernel block size; 256 measured "
                             "+2.5 MFU points at T=1024 band=128 (128 is "
                             "right at window-length T)")
    return parser


def train_config_kwargs(args) -> dict:
    """Parsed train-CLI args -> TrainConfig kwargs. Shared by train_main and
    the root train_nodist.py wrapper (which overrides max_timestep=1) so the
    two cannot drift when flags are added."""
    use_bf16 = args.use_bf16 if args.use_amp is None else args.use_amp
    return dict(
        data_path=args.data_path,
        num_classes=args.num_classes,
        data_start=args.data_start,
        data_end=args.data_end,
        results_dir=args.results_dir,
        model=args.model,
        epochs=args.epochs,
        global_batch_size=args.global_batch_size,
        global_seed=args.global_seed,
        num_workers=args.num_workers,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        seq_len=args.seq_len,
        stride=args.stride,
        ckpt=args.ckpt,
        noise_schedule=args.noise_schedule,
        l1_loss=args.l1_loss,
        lr=args.lr,
        relearn_embeds=args.relearn_embeds,
        embed_only_epochs=args.embed_only_epochs,
        num_model=args.num_model,
        use_bf16=use_bf16,
        use_pallas=args.use_pallas,
        max_steps=args.max_steps,
        steps_per_call=args.steps_per_call,
        profile_dir=args.profile_dir,
        multihost=args.multihost,
        scan_blocks=args.scan_blocks,
        remat=args.remat,
        band=args.band,
        context_parallel=args.context_parallel,
        mlp_bwd=args.mlp_bwd,
        pallas_ops=args.pallas_ops,
        flash_block=args.flash_block,
    )


def train_main(args) -> dict:
    from osu_diffusion_tpu.train.trainer import TrainConfig, train

    return train(TrainConfig(**train_config_kwargs(args)))
