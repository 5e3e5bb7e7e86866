"""Sequence splitting / distance features / windowing (L1, device-side capable).

Behavioral parity with reference data_loading.py:138-203, as pure jnp functions
that run **inside jit** — the TPU-native "device-side featurizer": the loader
ships raw (T, 19) windows and the distance embedding, flip augmentation,
normalization and time randomization all fuse into the train step
(SURVEY.md §7 step 8). Host-side callers can pass numpy arrays; everything here
is shape-polymorphic over a leading batch axis.

Differences from the reference, by design (documented, distribution-equivalent):
- The reference flips a whole beatmap once per load (data_loading.py:138-143);
  here the flip is drawn per window (same Bernoulli(0.5) per axis marginal).
- The reference computes distances over the full beatmap then windows, so a
  window's first datapoint keeps its true distance-to-previous. Raw windows
  lose that one value, so `prev_xy` (the coordinates of the datapoint just
  before the window, or the playfield center (256,192) at sequence start,
  parity data_loading.py:146-151) is shipped alongside each window.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from osu_diffusion_tpu.ops.embeddings import timestep_embedding

PLAYFIELD = jnp.asarray((512.0, 384.0), dtype=jnp.float32)
CENTER = jnp.asarray((256.0, 192.0), dtype=jnp.float32)
DIST_EMBED_DIM = 128
MAX_TIME_OFFSET = 100000.0  # parity: data_loading.py:200


def calc_distances(seq: jnp.ndarray, prev_xy: jnp.ndarray | None = None) -> jnp.ndarray:
    """Euclidean distance of each datapoint to its predecessor.

    seq: (..., T, 19); prev_xy: (..., 2) predecessor of element 0 (defaults to
    the playfield center, parity data_loading.py:146-151).
    Returns (..., T).
    """
    xy = seq[..., :2]
    if prev_xy is None:
        prev_first = jnp.broadcast_to(CENTER, xy[..., :1, :].shape)
    else:
        prev_first = prev_xy[..., None, :]
    prev = jnp.concatenate([prev_first, xy[..., :-1, :]], axis=-2)
    return jnp.linalg.norm(xy - prev, axis=-1)


def _split(seq: jnp.ndarray, xy: jnp.ndarray, prev_xy: jnp.ndarray | None):
    seq_d = calc_distances(seq, prev_xy)
    seq_x = xy / PLAYFIELD
    seq_o = seq[..., 2]
    seq_c = jnp.concatenate(
        [timestep_embedding(seq_d, DIST_EMBED_DIM), seq[..., 3:]], axis=-1
    )
    return seq_x, seq_o, seq_c


def split_and_process_sequence(
    seq: jnp.ndarray,
    rng: jax.Array,
    prev_xy: jnp.ndarray | None = None,
):
    """Split with random flip augmentation. Parity: data_loading.py:154-169.

    Returns ((seq_x, seq_o, seq_c), T). Distances are computed on the unflipped
    positions like the reference (flips preserve them anyway).
    """
    fx_rng, fy_rng = jax.random.split(rng)
    flip_x = jax.random.uniform(fx_rng, seq.shape[:-2]) < 0.5
    flip_y = jax.random.uniform(fy_rng, seq.shape[:-2]) < 0.5
    xy = seq[..., :2]
    x = jnp.where(flip_x[..., None], 512.0 - xy[..., 0], xy[..., 0])
    y = jnp.where(flip_y[..., None], 384.0 - xy[..., 1], xy[..., 1])
    xy = jnp.stack([x, y], axis=-1)
    return _split(seq, xy, prev_xy), seq.shape[-2]


def split_and_process_sequence_no_augment(
    seq: jnp.ndarray, prev_xy: jnp.ndarray | None = None
):
    """Split without augmentation. Parity: data_loading.py:172-187."""
    return _split(seq, seq[..., :2], prev_xy), seq.shape[-2]


def window_and_relative_time(seq_tuple, s: int, e: int, rand01: float):
    """Slice [s, e) and re-zero time with a uniform offset in [0, 100000) ms.
    Parity: data_loading.py:195-203 (rand01 explicit instead of global RNG)."""
    seq_x, seq_o, seq_c = seq_tuple
    x = seq_x[..., s:e, :]
    o = seq_o[..., s:e] - seq_o[..., s, None] + rand01 * MAX_TIME_OFFSET
    c = seq_c[..., s:e, :]
    return x, o, c


def process_batch(
    raw: jnp.ndarray,
    prev_xy: jnp.ndarray,
    rng: jax.Array,
    augment: bool = True,
):
    """Device-side featurizer for a batch of raw windows.

    raw: (N, T, 19) raw datapoint windows (absolute positions/time);
    prev_xy: (N, 2) predecessor coordinates for the distance feature.
    Returns (x, o, c): (N,T,2) normalized coords, (N,T) randomized relative
    time, (N,T,144) context. Fully jit-compatible — call inside the train step.
    """
    n = raw.shape[0]
    t_rng, f_rng = jax.random.split(rng)
    if augment:
        (x, o, c), _ = split_and_process_sequence(raw, f_rng, prev_xy)
    else:
        (x, o, c), _ = split_and_process_sequence_no_augment(raw, prev_xy)
    offset = jax.random.uniform(t_rng, (n, 1)) * MAX_TIME_OFFSET
    o = o - o[..., :1] + offset
    return x, o, c
