"""Fused adaLN-modulated MLP — Pallas TPU kernel.

One kernel computes the whole DiT-block MLP half (reference models.py:172-174):

    out = x + gate * fc2( gelu_tanh( fc1( ln(x) * (1+scale) + shift ) ) )

The 4x-hidden intermediate never leaves VMEM — XLA cannot fuse across two
matmuls, so the unfused path writes/reads the (N, T, 4D) activation through
HBM twice; at DiT-B batch 256 that's ~1.6 GB of traffic per layer per
direction. LayerNorm (non-affine, eps 1e-6, parity models.py:136) and the
modulation fold into the fc1 prologue, the gate+residual into the fc2 epilogue.

Backward recomputes through the reference jnp path (ln/modulate/matmuls are
recompute-cheap) via custom_vjp, like the banded attention kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 128


def _adaln_mlp_kernel(
    x_ref, shift_ref, scale_ref, gate_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref, *, eps: float, matmul_dtype,
):
    """One (batch, T-block, H-block) program.

    The hidden dimension is blocked so only (D, BH) weight slices live in VMEM
    at once; the output block accumulates partial fc2 contributions across the
    innermost grid axis (GELU is elementwise over H, so H-blocking is exact).
    shift/scale/gate ride along un-blocked as (N, D) and are row-indexed with
    program_id (TPU lowering requires >=8 sublanes per block)."""
    i = pl.program_id(0)
    k = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # (BT, D)

    # non-affine LayerNorm over the feature axis (recomputed per H-block; cheap)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)

    shift = shift_ref[pl.ds(i, 1), :].astype(jnp.float32)  # (1, D)
    scale = scale_ref[pl.ds(i, 1), :].astype(jnp.float32)
    gate = gate_ref[pl.ds(i, 1), :].astype(jnp.float32)

    # adaLN modulation (parity models.py:12-13)
    h = xn * (1.0 + scale) + shift

    # matmul inputs in matmul_dtype (f32 accumulate); bf16 default matches
    # XLA's MXU passes, tests use f32 for exact comparison
    h = jnp.dot(h.astype(matmul_dtype), w1_ref[...].astype(matmul_dtype),
                preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)  # b1 block is (1, BH)
    h = jax.nn.gelu(h, approximate=True)  # GELU-tanh, parity models.py:138
    partial = jnp.dot(
        h.astype(matmul_dtype), w2_ref[...].astype(matmul_dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == 0)
    def _():
        o_ref[0] = (
            x + gate * (partial + b2_ref[0].astype(jnp.float32))
        ).astype(o_ref.dtype)

    @pl.when(k > 0)
    def _():
        o_ref[0] = o_ref[0] + (gate * partial).astype(o_ref.dtype)


def _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2,
                        block_t: int, eps: float, matmul_dtype=jnp.bfloat16,
                        block_h: int | None = None) -> jnp.ndarray:
    n, t, d = x.shape
    hdim = w1.shape[1]
    if block_h is None:
        block_h = next(
            (c for c in (1024, 768, 512, 384, 256, 128) if hdim % c == 0), hdim
        )
    assert hdim % block_h == 0, (hdim, block_h)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        x = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])

    # biases as (1, H): 1-D operands trip Mosaic's tiling when blocked
    b1_2d = b1.reshape(1, hdim)
    b2_2d = b2.reshape(1, d)

    grid = (n, t_pad // block_t, hdim // block_h)
    out = pl.pallas_call(
        functools.partial(_adaln_mlp_kernel, eps=eps, matmul_dtype=matmul_dtype),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (N, D), whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((d, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, D)
        ],
        out_specs=pl.BlockSpec(
            (1, block_t, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(x, shift, scale, gate, w1, b1_2d, w2, b2_2d)
    return out[:, :t, :]


def _reference_impl(x, shift, scale, gate, w1, b1, w2, b2, eps: float):
    """jnp reference path (used for the backward recompute and CPU tests)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    h = xn * (1.0 + scale[:, None, :]) + shift[:, None, :]
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=True)
    h = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return x + gate[:, None, :] * h


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def adaln_mlp(x, shift, scale, gate, w1, b1, w2, b2,
              block_t: int = DEFAULT_BLOCK_T, eps: float = 1e-6,
              matmul_dtype=jnp.bfloat16):
    """x: (N, T, D); shift/scale/gate: (N, D); w1: (D, H); w2: (H, D).
    Returns x + gate * MLP(modulate(LN(x), shift, scale))."""
    return _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2, block_t,
                               eps, matmul_dtype)


def _fwd(x, shift, scale, gate, w1, b1, w2, b2, block_t, eps, matmul_dtype):
    out = _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2, block_t,
                              eps, matmul_dtype)
    return out, (x, shift, scale, gate, w1, b1, w2, b2)


def _bwd(block_t, eps, matmul_dtype, res, g):
    x, shift, scale, gate, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, eps=eps), x, shift, scale, gate, w1, b1, w2, b2
    )
    return vjp(g)


adaln_mlp.defvjp(_fwd, _bwd)
