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
    o_ref, *, eps: float
):
    """One (batch, T-block) program. x_ref: (1, BT, D); shift/scale/gate:
    (1, D); w1: (D, H); w2: (H, D)."""
    x = x_ref[0].astype(jnp.float32)  # (BT, D)

    # non-affine LayerNorm over the feature axis
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)

    # adaLN modulation (parity models.py:12-13)
    h = xn * (1.0 + scale_ref[0].astype(jnp.float32)) + shift_ref[0].astype(jnp.float32)

    h = jnp.dot(h, w1_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)  # GELU-tanh, parity models.py:138
    h = jnp.dot(h, w2_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32)
    h = h + b2_ref[...].astype(jnp.float32)

    o_ref[0] = (x + gate_ref[0].astype(jnp.float32) * h).astype(o_ref.dtype)


def _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2,
                        block_t: int, eps: float) -> jnp.ndarray:
    n, t, d = x.shape
    hdim = w1.shape[1]
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        x = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])

    grid = (n, t_pad // block_t)
    out = pl.pallas_call(
        functools.partial(_adaln_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_t, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(x, shift, scale, gate, w1, b1, w2, b2)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def adaln_mlp(x, shift, scale, gate, w1, b1, w2, b2,
              block_t: int = DEFAULT_BLOCK_T, eps: float = 1e-6):
    """x: (N, T, D); shift/scale/gate: (N, D); w1: (D, H); w2: (H, D).
    Returns x + gate * MLP(modulate(LN(x), shift, scale))."""
    return _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2, block_t, eps)


def _fwd(x, shift, scale, gate, w1, b1, w2, b2, block_t, eps):
    out = _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2, block_t, eps)
    return out, (x, shift, scale, gate, w1, b1, w2, b2)


def _bwd(block_t, eps, res, g):
    x, shift, scale, gate, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, eps=eps), x, shift, scale, gate, w1, b1, w2, b2
    )
    return vjp(g)


adaln_mlp.defvjp(_fwd, _bwd)
