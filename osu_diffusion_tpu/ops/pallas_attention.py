"""Fused banded (block-local) flash attention — Pallas TPU kernel.

The TPU-native replacement for the reference's dense (T, T) boolean mask over
nn.MultiheadAttention (reference models.py:164-170, sample.py:82-84): the band
is *structure* here. For each 128-row query block only the key blocks that can
intersect the band  q - L < k <= q + L  are streamed from VMEM and combined
with an online (flash) softmax, so compute and memory are O(T * L) instead of
O(T^2) — the asymptotic win that makes long-sequence sampling cheap.

Forward runs the fused kernel; the backward pass recomputes through the XLA
dense-mask path (attention at our T is recompute-cheap, and sampling — the
perf-critical path — never differentiates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 128
NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _banded_attn_kernel(
    q_ref, k_ref, v_ref, o_ref, *, band: int, block: int, t_real: int,
    scale: float, matmul_dtype,
):
    """One (batch*head, q-block) program.

    q_ref: (1, B, Dh); k_ref/v_ref: (1, T_pad, Dh); o_ref: (1, B, Dh).
    Streams the W = 2*ceil(band/B)+1 key blocks that can overlap the band.
    """
    j = pl.program_id(1)
    t_pad = k_ref.shape[1]
    n_kb = t_pad // block
    dh = q_ref.shape[2]

    # matmul inputs in matmul_dtype (f32 accumulate); bf16 default matches
    # XLA's MXU passes, tests use f32 for exact comparison
    q = (q_ref[0].astype(jnp.float32) * scale).astype(matmul_dtype)  # (B, Dh)
    q_idx = j * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)

    reach = _cdiv(band, block)
    m = jnp.full((block, 1), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((block, 1), dtype=jnp.float32)
    acc = jnp.zeros((block, dh), dtype=jnp.float32)

    for w in range(2 * reach + 1):
        kb = j - reach + w
        kb_valid = jnp.logical_and(kb >= 0, kb < n_kb)
        kb_c = jnp.clip(kb, 0, n_kb - 1)
        start = pl.multiple_of(kb_c * block, block)
        k_blk = k_ref[0, pl.ds(start, block), :].astype(matmul_dtype)  # (B, Dh)
        v_blk = v_ref[0, pl.ds(start, block), :].astype(matmul_dtype)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (B, B)
        k_idx = kb_c * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        # band semantics (parity with the reference loop): q - L < k <= q + L
        allowed = (
            (k_idx > q_idx - band)
            & (k_idx <= q_idx + band)
            & (k_idx < t_real)
            & kb_valid
        )
        s = jnp.where(allowed, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # explicit zero for masked entries: when a row's running max is still
        # NEG_INF, exp(s - m_new) would be exp(0)=1 for masked scores
        p = jnp.where(allowed, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(matmul_dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _banded_flash_fwd_impl(
    q, k, v, band: int, block: int, matmul_dtype, t_real: int | None = None
) -> jnp.ndarray:
    n, h, t, dh = q.shape
    # callers that pre-pad T (e.g. Sampler length bucketing) pass the unpadded
    # length so real queries near the pad boundary don't attend garbage keys
    t_valid = t if t_real is None else int(t_real)
    t_pad = _cdiv(t, block) * block
    pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    qp = jnp.pad(q, pad).reshape(n * h, t_pad, dh)
    kp = jnp.pad(k, pad).reshape(n * h, t_pad, dh)
    vp = jnp.pad(v, pad).reshape(n * h, t_pad, dh)
    scale = 1.0 / (dh ** 0.5)

    grid = (n * h, t_pad // block)
    out = pl.pallas_call(
        functools.partial(
            _banded_attn_kernel, band=band, block=block, t_real=t_valid,
            scale=scale, matmul_dtype=matmul_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((n * h, t_pad, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(qp, kp, vp)
    return out.reshape(n, h, t_pad, dh)[:, :, :t, :]


def _xla_banded_attention(q, k, v, band: int, t_real: int | None = None) -> jnp.ndarray:
    """Dense-mask reference path (differentiable)."""
    from osu_diffusion_tpu.ops.attention import banded_attention_mask, dot_product_attention

    t = q.shape[2]
    mask = banded_attention_mask(t, band)
    if t_real is not None and t_real != t:
        mask = mask & (jnp.arange(t)[None, :] < t_real)
    return dot_product_attention(q, k, v, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def banded_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    band: int, block: int = DEFAULT_BLOCK, matmul_dtype=jnp.bfloat16,
    t_real: int | None = None,
) -> jnp.ndarray:
    """q,k,v: (N, H, T, Dh) -> (N, H, T, Dh), band half-width L (static).

    `t_real`: the real (unpadded) sequence length when the caller already
    padded T — keys at index >= t_real are masked out."""
    return _banded_flash_fwd_impl(q, k, v, band, block, matmul_dtype, t_real)


def _fwd(q, k, v, band, block, matmul_dtype, t_real):
    return _banded_flash_fwd_impl(q, k, v, band, block, matmul_dtype, t_real), (q, k, v)


def _bwd(band, block, matmul_dtype, t_real, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b, c: _xla_banded_attention(a, b, c, band, t_real), q, k, v
    )
    return vjp(g)


banded_flash_attention.defvjp(_fwd, _bwd)
