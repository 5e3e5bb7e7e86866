"""Banded flash-attention kernel vs. the dense-mask XLA path (interpret mode on
CPU; the same kernel compiles for TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import osu_diffusion_tpu.ops.pallas_attention as pa
from osu_diffusion_tpu.ops.attention import banded_attention_mask, dot_product_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    orig = pa.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pa.pl, "pallas_call", patched)


def _qkv(n=1, h=2, t=128, dh=32, seed=0):
    r = jax.random.PRNGKey(seed)
    ks = jax.random.split(r, 3)
    shape = (n, h, t, dh)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


@pytest.mark.parametrize("t,band,block", [
    (128, 128, 64),   # band >= T: full attention
    (256, 64, 64),    # multi-block band
    (200, 48, 64),    # ragged T (padding path)
    (64, 16, 32),     # small blocks
])
def test_kernel_matches_dense_mask(t, band, block):
    q, k, v = _qkv(t=t)
    got = pa.banded_flash_attention(q, k, v, band, block, jnp.float32)
    want = dot_product_attention(q, k, v, banded_attention_mask(t, band))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_band_asymmetry_exact():
    """The reference band is q - L < k <= q + L (asymmetric by one); the kernel
    must reproduce it exactly, not a symmetric approximation."""
    t, band, block = 64, 8, 32
    q, k, v = _qkv(t=t, h=1)
    got = pa.banded_flash_attention(q, k, v, band, block, jnp.float32)
    want = dot_product_attention(q, k, v, banded_attention_mask(t, band))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    # sanity: shifting the band by one breaks agreement
    qi = np.arange(t)[:, None]
    ki = np.arange(t)[None, :]
    sym = (ki >= qi - band) & (ki <= qi + band)
    want_sym = dot_product_attention(q, k, v, jnp.asarray(sym))
    assert not np.allclose(np.asarray(got), np.asarray(want_sym), atol=1e-4)


def test_gradients_flow():
    q, k, v = _qkv(t=64, dh=16)

    def loss(q, k, v):
        return jnp.sum(pa.banded_flash_attention(q, k, v, 16, 32, jnp.float32) ** 2)

    g_got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        o = dot_product_attention(q, k, v, banded_attention_mask(64, 16))
        return jnp.sum(o ** 2)

    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
