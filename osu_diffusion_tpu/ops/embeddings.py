"""Sinusoidal embedding primitives (L2).

Behavioral parity with the reference (positional_embedding.py:29-77) with one
deliberate design difference: the reference flattens (N, T[, D]) tensors to 1-D,
embeds, and reshapes back; here we broadcast directly — identical results, but a
single fused XLA op with no data movement, and the functions are shape-polymorphic
pytree-friendly jnp code usable inside jit/scan.

Parity quirks preserved:
- cos comes FIRST, then sin (reference positional_embedding.py:46).
- freqs = exp(-ln(max_period) * arange(half) / half)  (reference :40-44).
- odd dims are zero-padded on the right (reference :47-48).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of scalar values.

    :param t: array of any shape (...,) of (possibly fractional) values.
    :param dim: output embedding dimension.
    :return: array of shape (..., dim), float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        pad = jnp.zeros_like(embedding[..., :1])
        embedding = jnp.concatenate([embedding, pad], axis=-1)
    return embedding


def offset_sequence_embedding(o: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """(N, T) time offsets -> (N, T, dim). Parity: positional_embedding.py:52-63."""
    return timestep_embedding(o, dim, max_period)


def position_sequence_embedding(pos: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """(N, T, D) positions -> (N, T, D * dim). Parity: positional_embedding.py:66-77.

    The reference reshapes the flattened (N*T*D, dim) embedding to (N, T, D*dim),
    which concatenates the per-coordinate embeddings in coordinate order — the
    broadcasted equivalent below produces the same layout.
    """
    *lead, d = pos.shape
    emb = timestep_embedding(pos, dim, max_period)  # (..., D, dim)
    return emb.reshape(*lead, d * dim)
