"""Pattern-repair robustness evaluation.

Behavioral parity with reference testing/unfuck_pattern.py: perturb a span of a
pattern's coordinates with Gaussian noise of a given magnitude, then repeatedly
denoise at t=0 with an in-paint mask pinning everything outside the span, and
report the mean distance to the original before and after repair.

TPU-native difference: the num_sampling_steps repeated t=0 p_sample calls run
as one lax.scan; predictions are batched.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.data.featurize import beatmap_to_sequence
from osu_diffusion_tpu.data.process import split_and_process_sequence_no_augment
from osu_diffusion_tpu.diffusion.process import GaussianDiffusion
from osu_diffusion_tpu.evals.toy import SUITES, _toy_root, load_filler_seq
from osu_diffusion_tpu.models.dit import DiT
from osu_diffusion_tpu.ops.attention import banded_attention_mask

PLAYFIELD = np.array([512.0, 384.0], dtype=np.float32)


@functools.cache
def _runner(model: DiT, num_sampling_steps: int):
    """One jitted repair chain per (model, step count): jit's own shape cache
    then serves every fixture — previously the scan was re-jitted (and the
    whole chain recompiled) inside every unfuck_pattern call."""

    @jax.jit
    def run(diffusion, params, x, o, c, y, attn_mask, mask, rng):
        def model_fn(xt, tt, **kw):
            return model.apply({"params": params}, xt, tt, o, c, y,
                               attn_mask=attn_mask)

        def in_paint(x0):
            return jnp.where(mask, x0, x)

        t0 = jnp.zeros((x.shape[0],), jnp.int32)

        def body(img, step_rng):
            out = diffusion.p_sample(
                model_fn, img, t0, step_rng, clip_denoised=True,
                denoised_fn=in_paint,
            )
            return out["sample"], None

        rngs = jax.random.split(rng, num_sampling_steps)
        final, _ = jax.lax.scan(body, x, rngs)
        return final

    return run


def example_from_beatmap(
    beatmap: Beatmap, seq_len: int | None, filler_seq: np.ndarray
) -> tuple[np.ndarray, int, int]:
    """(seq (T,19), start, end): the original pattern's row span after optional
    filler padding. Parity: unfuck_pattern.py:32-47."""
    seq = beatmap_to_sequence(beatmap)
    orig_len = seq.shape[0]
    if seq_len is not None:
        if seq_len > orig_len:
            to_add = seq_len - orig_len
            filler_add = filler_seq[-to_add:].copy()
            seq = seq.copy()
            seq[:, 2] += filler_add[-1, 2] - seq[0, 2] + 300
            seq = np.concatenate([filler_add, seq], axis=0)
        elif seq_len < orig_len:
            seq = seq[-seq_len:]
    # trimmed fixtures fill the whole window: the span start must clamp at 0,
    # not go negative (a negative slice start shrank the span and crashed the
    # noise broadcast for any fixture longer than seq_len)
    return seq, max(0, seq.shape[0] - orig_len), seq.shape[0]


def fuckup_pattern(
    seq: np.ndarray, start: int, end: int, magnitude: float, rng: np.random.Generator
) -> np.ndarray:
    """Add N(0, magnitude) pixel noise to the span's coordinates.
    Parity: unfuck_pattern.py:70-74."""
    out = seq.copy()
    out[start:end, :2] += rng.standard_normal((end - start, 2)).astype(np.float32) * magnitude
    return out


def unfuck_pattern(
    model: DiT,
    diffusion: GaussianDiffusion,
    params,
    seq_fucked: np.ndarray,
    start: int,
    end: int,
    num_predictions: int,
    num_sampling_steps: int,
    num_classes: int,
    rng: jax.Array,
    max_seq_len: int = 128,
) -> np.ndarray:
    """Repeated t=0 denoising with the span free and the rest pinned.
    Returns (num_predictions, end-start, 2) repaired pixel coords.
    Parity: unfuck_pattern.py:77-131 (the loop is a lax.scan here)."""
    (seq_x, seq_o, seq_c), seq_len = split_and_process_sequence_no_augment(
        jnp.asarray(seq_fucked)
    )
    seq_o = seq_o - seq_o[0]

    n = num_predictions
    x = jnp.broadcast_to(seq_x[None], (n, seq_len, 2))
    o = jnp.broadcast_to(seq_o[None], (n, seq_len))
    c = jnp.broadcast_to(seq_c[None], (n, seq_len, seq_c.shape[-1]))
    y = jnp.full((n,), num_classes, dtype=jnp.int32)

    mask = jnp.zeros((n, seq_len, 2), bool).at[:, start:end, :].set(True)
    attn_mask = None
    if seq_len > max_seq_len:
        attn_mask = banded_attention_mask(seq_len, max_seq_len)

    run = _runner(model, num_sampling_steps)
    img = run(diffusion, params, x, o, c, y, attn_mask, mask, rng)
    return np.asarray(img[:, start:end, :]) * PLAYFIELD


def evaluate_suite(
    model,
    diffusion,
    params,
    suite: str,
    num_predictions: int,
    num_sampling_steps: int,
    num_classes: int,
    seq_len: int | None,
    magnitude: float,
    rng: jax.Array,
    assets_dir: str | None = None,
) -> dict:
    """Mean pixel distance before (fucked) and after (unfucked) repair.
    Parity: unfuck_pattern.py:153-182."""
    root = os.path.join(_toy_root(assets_dir), suite)
    filler = load_filler_seq(assets_dir)
    np_rng = np.random.default_rng(0)
    num = 0
    total_before = 0.0
    total_after = 0.0
    for i, filename in enumerate(sorted(os.listdir(root))):
        beatmap = Beatmap.from_path(os.path.join(root, filename))
        seq, start, end = example_from_beatmap(beatmap, seq_len, filler)
        if end - start <= 0:
            continue
        seq_fucked = fuckup_pattern(seq, start, end, magnitude, np_rng)
        true_pos = seq[start:end, :2]
        fucked_pos = seq_fucked[start:end, :2]
        preds = unfuck_pattern(
            model, diffusion, params, seq_fucked, start, end,
            num_predictions, num_sampling_steps, num_classes,
            jax.random.fold_in(rng, i),
        )
        before = np.linalg.norm(fucked_pos - true_pos, axis=-1)
        after = np.linalg.norm(preds - true_pos[None], axis=-1)
        num += num_predictions * (end - start)
        total_before += float(before.sum()) * num_predictions
        total_after += float(after.sum())
    return {
        "suite": suite,
        "mean_fucked_distance": total_before / max(1, num),
        "mean_unfucked_distance": total_after / max(1, num),
        "num_predictions": num,
    }


def main(argv=None):
    import argparse

    from osu_diffusion_tpu import CONTEXT_SIZE
    from osu_diffusion_tpu.diffusion import create_diffusion
    from osu_diffusion_tpu.models import DiT_models
    from osu_diffusion_tpu.train.checkpoint import restore_params_any

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--model", type=str, choices=list(DiT_models.keys()),
                        default="DiT-B")
    parser.add_argument("--num-classes", type=int, default=52670)
    parser.add_argument("--num-sampling-steps", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-predictions", type=int, default=100)
    parser.add_argument("--tests", type=str, nargs="*", default=SUITES)
    parser.add_argument("--seq-len", type=int, default=None)
    parser.add_argument("--noise-schedule", type=str, default="squaredcos_cap_v2")
    parser.add_argument("--fucking-magnitude", type=float, default=5)
    parser.add_argument("--assets-dir", type=str, default=None)
    args = parser.parse_args(argv)

    model = DiT_models[args.model](
        num_classes=args.num_classes, context_size=CONTEXT_SIZE
    )
    params = restore_params_any(args.ckpt, model)
    diffusion = create_diffusion(None, noise_schedule=args.noise_schedule)
    rng = jax.random.PRNGKey(args.seed)
    for suite in args.tests:
        print(suite)
        res = evaluate_suite(
            model, diffusion, params, suite, args.num_predictions,
            args.num_sampling_steps, args.num_classes, args.seq_len,
            args.fucking_magnitude, rng, args.assets_dir,
        )
        print(
            f"Mean fucked distance = {res['mean_fucked_distance']} units "
            f"(out of {res['num_predictions']})"
        )
        print(
            f"Mean unfucked distance = {res['mean_unfucked_distance']} units "
            f"(out of {res['num_predictions']})"
        )


if __name__ == "__main__":
    main()
