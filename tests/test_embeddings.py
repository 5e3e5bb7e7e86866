"""Embedding primitive parity tests (reference positional_embedding.py:29-77).

Golden values are computed with an independent numpy transcription of the
documented formula (cos-first ordering, freqs = exp(-ln(P)·i/half)).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from osu_diffusion_tpu.ops.embeddings import (
    offset_sequence_embedding,
    position_sequence_embedding,
    timestep_embedding,
)


def np_timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = np.exp(-np.log(max_period) * np.arange(half, dtype=np.float32) / half)
    args = np.asarray(t, dtype=np.float32)[..., None] * freqs
    emb = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    if dim % 2:
        emb = np.concatenate([emb, np.zeros_like(emb[..., :1])], axis=-1)
    return emb


def test_timestep_embedding_matches_formula():
    t = np.array([0.0, 1.0, 17.5, 999.0], dtype=np.float32)
    got = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    want = np_timestep_embedding(t, 256)
    # atol 3e-3: XLA float32 sin/cos range reduction on args up to ~1000 rad
    # differs from numpy's float64-accurate reduction at the 1e-3 level.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=3e-3)


def test_timestep_embedding_cos_first():
    # t=0: cos(0)=1 for the first half, sin(0)=0 for the second half.
    got = np.asarray(timestep_embedding(jnp.zeros((1,)), 8))
    np.testing.assert_allclose(got[0, :4], 1.0)
    np.testing.assert_allclose(got[0, 4:], 0.0)


def test_timestep_embedding_odd_dim_pads_zero():
    got = np.asarray(timestep_embedding(jnp.array([3.0]), 7))
    assert got.shape == (1, 7)
    assert got[0, -1] == 0.0


def test_offset_sequence_embedding_shape_and_value():
    o = np.random.RandomState(0).rand(2, 5).astype(np.float32) * 1000
    got = np.asarray(offset_sequence_embedding(jnp.asarray(o), 128))
    assert got.shape == (2, 5, 128)
    # matches per-element flatten-and-embed (reference :52-63)
    want = np_timestep_embedding(o.reshape(-1), 128).reshape(2, 5, 128)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=3e-3)


def test_position_sequence_embedding_coordinate_order():
    # (N,T,D)->(N,T,D*dim) with x-embedding first then y (reference :66-77)
    pos = np.random.RandomState(1).rand(3, 4, 2).astype(np.float32) * 512
    got = np.asarray(position_sequence_embedding(jnp.asarray(pos), 128))
    assert got.shape == (3, 4, 256)
    want = np_timestep_embedding(pos.reshape(-1), 128).reshape(3, 4, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=3e-3)
