"""Toy-suite in-paint evaluation.

Behavioral parity with reference testing/test_toy.py: for each hand-authored
pattern, in-paint the final object's position (all other coordinates pinned via
denoised_fn each step) with the null class and count predictions within 30 px.

TPU-native difference: the reference runs num_predictions (default 100) samples
through a Python p_sample loop per example; here all predictions are one
batched jitted chain via Sampler.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu.beatmap import Beatmap
from osu_diffusion_tpu.data.featurize import beatmap_to_sequence
from osu_diffusion_tpu.data.process import split_and_process_sequence_no_augment
from osu_diffusion_tpu.sampling import Sampler

PLAYFIELD = np.array([512.0, 384.0], dtype=np.float32)
SUITES = ["geometry", "stream", "symmetry", "visual_spacing"]
GOOD_RADIUS_PX = 30.0  # parity: test_toy.py:163-164


def _toy_root(assets_dir: str | None = None) -> str:
    if assets_dir is not None:
        return assets_dir
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "assets", "toy_datasets")


def load_filler_seq(assets_dir: str | None = None) -> np.ndarray:
    """kimi_no_bouken context filler (parity: test_toy.py:21)."""
    path = os.path.join(_toy_root(assets_dir), "kimi_no_bouken.osu")
    return beatmap_to_sequence(Beatmap.from_path(path))


def example_from_beatmap(
    beatmap: Beatmap, seq_len: int | None, filler_seq: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(seq (T,19), label (2,)) with trailing slider-body steps trimmed and the
    length pinned to seq_len using filler context. Parity: test_toy.py:79-112."""
    seq = beatmap_to_sequence(beatmap)
    hit_objects = beatmap.hit_objects(spinners=False)
    posterior = hit_objects[-1]
    label = np.array([posterior.position.x, posterior.position.y], dtype=np.float32)

    # trim trailing slider-body datapoints (types > 5)
    type_index = np.argmax(seq[:, 3:], axis=1)
    bad = type_index > 5
    num_bad = 0
    for flag in bad[::-1]:
        if flag:
            num_bad += 1
        else:
            break
    if num_bad > 0:
        seq = seq[:-num_bad]

    assert np.allclose(seq[-1, :2], label), "trim did not land on the target object"

    if seq_len is not None:
        if seq_len > seq.shape[0]:
            to_add = seq_len - seq.shape[0]
            filler_add = filler_seq[-to_add:].copy()
            seq = seq.copy()
            seq[:, 2] += filler_add[-1, 2] - seq[0, 2] + 300
            seq = np.concatenate([filler_add, seq], axis=0)
        elif seq_len < seq.shape[0]:
            seq = seq[-seq_len:]
    return seq, label


def load_example_folder(
    name: str, seq_len: int | None, assets_dir: str | None = None
) -> list[tuple[np.ndarray, np.ndarray]]:
    root = os.path.join(_toy_root(assets_dir), name)
    filler = load_filler_seq(assets_dir)
    data = []
    for filename in sorted(os.listdir(root)):
        beatmap = Beatmap.from_path(os.path.join(root, filename))
        data.append(example_from_beatmap(beatmap, seq_len, filler))
    return data


def generate_predictions(
    sampler: Sampler,
    params,
    seq_no_embed: np.ndarray,
    num_predictions: int,
    num_classes: int,
    rng: jax.Array,
) -> np.ndarray:
    """In-paint the last datapoint's position num_predictions times.
    Returns (num_predictions, 2) pixel coordinates. Parity: test_toy.py:32-76."""
    (seq_x, seq_o, seq_c), seq_len = split_and_process_sequence_no_augment(
        jnp.asarray(seq_no_embed)
    )
    seq_o = seq_o - seq_o[0]

    n = num_predictions
    x = jnp.broadcast_to(seq_x[None], (n, seq_len, 2))
    o = jnp.broadcast_to(seq_o[None], (n, seq_len))
    c = jnp.broadcast_to(seq_c[None], (n, seq_len, seq_c.shape[-1]))
    y = jnp.full((n,), num_classes, dtype=jnp.int32)

    mask = jnp.zeros((n, seq_len, 2), bool).at[:, -1, :].set(True)
    noise_rng, sample_rng = jax.random.split(rng)
    z = jax.random.normal(noise_rng, (n, seq_len, 2), jnp.float32)
    z = jnp.where(mask, z, x)

    samples = sampler(
        params, z, o, c, y, sample_rng,
        known_x=x, known_mask=mask, use_cfg=False,
    )
    return np.asarray(samples[:, -1, :]) * PLAYFIELD


def evaluate_suite(
    sampler: Sampler,
    params,
    suite: str,
    num_predictions: int,
    num_classes: int,
    seq_len: int | None,
    rng: jax.Array,
    assets_dir: str | None = None,
) -> dict:
    """Fraction of in-painted predictions within 30 px of the truth."""
    examples = load_example_folder(suite, seq_len, assets_dir)
    num_total = 0
    num_good = 0
    for i, (seq, label) in enumerate(examples):
        preds = generate_predictions(
            sampler, params, seq, num_predictions, num_classes,
            jax.random.fold_in(rng, i),
        )
        distances = np.linalg.norm(preds - label, axis=1)
        num_good += int((distances < GOOD_RADIUS_PX).sum())
        num_total += len(preds)
    return {
        "suite": suite,
        "accuracy": num_good / max(1, num_total),
        "good": num_good,
        "total": num_total,
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
    parser.add_argument("--generate", type=str, default=None,
                        help="single fixture (relative to the toy root): print "
                             "per-prediction coordinates (parity test_toy.py:154-167)")
    parser.add_argument("--seq-len", type=int, default=None)
    parser.add_argument("--noise-schedule", type=str, default="squaredcos_cap_v2")
    parser.add_argument("--assets-dir", type=str, default=None)
    parser.add_argument("--accel-interval", type=int, default=1,
                        help="Δ-cache accelerated sampling (see Sampler): "
                             "full model every Nth step, cached middle-block "
                             "residual in between; 1 = exact")
    parser.add_argument("--accel-span", type=int, nargs=2, default=None,
                        metavar=("LO", "HI"))
    parser.add_argument("--accel-tau", type=float, default=None,
                        help="adaptive Δ-cache (see Sampler): error-driven "
                             "skips below this relative input drift")
    parser.add_argument("--accel-max-skip", type=int, default=7)
    parser.add_argument("--quantize-weights", action="store_true",
                        help="int8 weight-only serving (DiTConfig.quant): "
                             "measures the accuracy cost of the quantized "
                             "chain on a trained checkpoint")
    args = parser.parse_args(argv)

    if args.quantize_weights:
        from osu_diffusion_tpu.models.quantize import restore_quantized

        model, params = restore_quantized(
            args.ckpt, DiT_models[args.model],
            num_classes=args.num_classes, context_size=CONTEXT_SIZE,
            scan_blocks=False,
        )
    else:
        model = DiT_models[args.model](
            num_classes=args.num_classes, context_size=CONTEXT_SIZE,
            scan_blocks=False,
        )
        params = restore_params_any(args.ckpt, model)
    diffusion = create_diffusion(
        str(args.num_sampling_steps), noise_schedule=args.noise_schedule
    )
    # band follows --seq-len (the trained window), not a hardcoded 128: the
    # reference masks beyond +-seq_len neighbours whenever the example length
    # exceeds the window (test_toy.py:37-42). At T <= band this equals full
    # attention, so the default matches the reference's seq_len-128 protocol.
    sampler = Sampler(
        model, diffusion, band=args.seq_len or 128,
        accel_interval=args.accel_interval,
        accel_span=tuple(args.accel_span) if args.accel_span else None,
        accel_tau=args.accel_tau,
        accel_max_skip=args.accel_max_skip,
    )
    rng = jax.random.PRNGKey(args.seed)

    if args.generate is not None:
        path = os.path.join(_toy_root(args.assets_dir), args.generate)
        beatmap = Beatmap.from_path(path)
        end_time = beatmap.hit_objects()[-1].time.total_seconds() * 1000
        filler = load_filler_seq(args.assets_dir)
        seq, pos = example_from_beatmap(beatmap, args.seq_len, filler)
        preds = generate_predictions(
            sampler, params, seq, args.num_predictions, args.num_classes, rng
        )
        distances = np.linalg.norm(preds - pos, axis=1)
        good = int((distances < GOOD_RADIUS_PX).sum())
        print(
            f"Generate example correct predictions = "
            f"{good / len(preds) * 100}% ({good}/{len(preds)})"
        )
        for p_ in preds:
            print(f"{round(float(p_[0]))},{round(float(p_[1]))},{round(end_time)},1,0,0:0:0:0:")
        return

    for suite in args.tests:
        print(suite)
        res = evaluate_suite(
            sampler, params, suite, args.num_predictions, args.num_classes,
            args.seq_len, rng, args.assets_dir,
        )
        print(
            f"Correct predictions = {res['accuracy'] * 100}% "
            f"({res['good']}/{res['total']})"
        )
        if sampler.accel and sampler.last_full_model_steps is not None:
            # adaptive/fixed Δ-cache: how much of the chain actually ran the
            # full model (the quality table pairs this with the accuracy)
            print(
                f"full model steps = {int(sampler.last_full_model_steps)}"
                f"/{args.num_sampling_steps}"
            )


if __name__ == "__main__":
    main()
