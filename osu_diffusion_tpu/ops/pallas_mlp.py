"""Fused adaLN-modulated MLP — Pallas TPU kernel.

One kernel computes the whole DiT-block MLP half (reference models.py:172-174):

    out = x + gate * fc2( gelu_tanh( fc1( ln(x) * (1+scale) + shift ) ) )

In inference the 4x-hidden intermediate never leaves VMEM — XLA cannot fuse
across two matmuls, so the unfused path writes/reads the (N, T, 4D) activation
through HBM twice; at DiT-B batch 256 that's ~1.6 GB of traffic per layer per
direction. LayerNorm (non-affine, eps 1e-6, parity models.py:136) and the
modulation fold into the fc1 prologue, the gate+residual into the fc2 epilogue.

When differentiated, the forward kernel additionally emits the pre-GELU
activation `a` and the pre-gate MLP output as residuals, making the backward
FLOP-minimal: exactly the four unavoidable matmuls (dw1, dw2, and the two
input-grad products) with NO matmul recompute. Recomputing `a` instead would
itself be a matmul — the MLP is all matmuls, so full rematerialization costs
8 matmul-units per block per step where this costs 6. The elementwise pieces
(LayerNorm stats, modulate, GELU') are recomputed from x/a in the XLA backward
for free.
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
    o_ref, a_ref, mlp_ref, *, eps: float, matmul_dtype,
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
    if a_ref is not None:  # training: save the pre-GELU activation
        a_ref[0] = h.astype(a_ref.dtype)
    h = jax.nn.gelu(h, approximate=True)  # GELU-tanh, parity models.py:138
    partial = jnp.dot(
        h.astype(matmul_dtype), w2_ref[...].astype(matmul_dtype),
        preferred_element_type=jnp.float32,
    )

    if mlp_ref is not None:
        # training: accumulate the pre-gate MLP output across H-blocks in f32
        # (mlp_ref is an f32 residual — bf16 partial-sum round-off would feed
        # dgate and the whole backward), then write the output once from the
        # finished accumulator at the last block.
        @pl.when(k == 0)
        def _():
            mlp_ref[0] = partial + b2_ref[0].astype(jnp.float32)

        @pl.when(k > 0)
        def _():
            mlp_ref[0] = mlp_ref[0] + partial

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[0] = (x + gate * mlp_ref[0]).astype(o_ref.dtype)
    else:
        # inference: accumulate directly into the output block
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
                        block_h: int | None = None, with_residuals: bool = False):
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
    xo_spec = pl.BlockSpec(
        (1, block_t, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((n, t_pad, d), x.dtype)]
    out_specs = [xo_spec]
    kernel = functools.partial(_adaln_mlp_kernel, eps=eps, matmul_dtype=matmul_dtype)
    if with_residuals:
        # pre-gate mlp rides in f32: it is both the cross-H-block accumulator
        # and a backward residual (dgate, dmlp), and it is small — (N, T, D)
        # next to the (N, T, H) pre-GELU `a`, which stays in x.dtype (bf16 in
        # training; GELU' from bf16-rounded `a` is a documented precision
        # tradeoff worth the 4x memory).
        out_shape += [
            jax.ShapeDtypeStruct((n, t_pad, hdim), x.dtype),  # pre-GELU a
            jax.ShapeDtypeStruct((n, t_pad, d), jnp.float32),  # pre-gate mlp
        ]
        out_specs += [
            pl.BlockSpec((1, block_t, block_h), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            xo_spec,
        ]
    else:
        kernel = functools.partial(kernel, a_ref=None, mlp_ref=None)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            xo_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (N, D), whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((d, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, D)
        ],
        out_specs=out_specs,
    )(x, shift, scale, gate, w1, b1_2d, w2, b2_2d)
    if with_residuals:
        out, a, mlp = outs
        return out[:, :t, :], a[:, :t, :], mlp[:, :t, :]
    return outs[0][:, :t, :]


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
    out, a, mlp = _adaln_mlp_fwd_impl(
        x, shift, scale, gate, w1, b1, w2, b2, block_t, eps, matmul_dtype,
        with_residuals=True,
    )
    return out, (x, shift, scale, gate, w1, w2, a, mlp)


def _bwd(block_t, eps, matmul_dtype, res, g):
    """FLOP-minimal backward: only the four unavoidable matmuls.

    Saved residuals: x (block input), the modulation vectors, the weights, the
    pre-GELU activation `a` and the pre-gate MLP output. Everything else
    (LayerNorm stats, the modulated input h1, GELU and its derivative) is
    elementwise-recomputable from those for free.
    """
    x, shift, scale, gate, w1, w2, a, mlp = res
    f32 = jnp.float32
    g = g.astype(f32)
    gate_b = gate.astype(f32)[:, None, :]

    # elementwise forward recompute (no matmuls)
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn = xc * inv
    h1 = xn * (1.0 + scale.astype(f32)[:, None, :]) + shift.astype(f32)[:, None, :]
    gelu_out, gelu_vjp = jax.vjp(
        lambda t: jax.nn.gelu(t, approximate=True), a.astype(f32)
    )

    # matmul inputs in matmul_dtype (bf16 MXU passes in training, f32 in
    # tests), f32 accumulation — matching the forward kernel's precision
    md = lambda v: v.astype(matmul_dtype)

    # out = x + gate * mlp
    dgate = jnp.sum(g * mlp.astype(f32), axis=1)
    dmlp = g * gate_b
    # mlp = gelu(a) @ w2 + b2
    db2 = jnp.sum(dmlp, axis=(0, 1))
    dw2 = jnp.einsum(
        "nth,ntd->hd", md(gelu_out), md(dmlp), preferred_element_type=f32
    )
    dgelu = jnp.einsum(
        "ntd,hd->nth", md(dmlp), md(w2), preferred_element_type=f32
    )
    da = gelu_vjp(dgelu.astype(f32))[0]
    # a = h1 @ w1 + b1
    db1 = jnp.sum(da, axis=(0, 1))
    dw1 = jnp.einsum("ntd,nth->dh", md(h1), md(da), preferred_element_type=f32)
    dh1 = jnp.einsum("nth,dh->ntd", md(da), md(w1), preferred_element_type=f32)
    # h1 = xn * (1 + scale) + shift
    dshift = jnp.sum(dh1, axis=1)
    dscale = jnp.sum(dh1 * xn, axis=1)
    dxn = dh1 * (1.0 + scale.astype(f32)[:, None, :])
    # non-affine LayerNorm backward
    dx_ln = inv * (
        dxn
        - jnp.mean(dxn, axis=-1, keepdims=True)
        - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True)
    )
    dx = g + dx_ln

    cast = lambda v, ref: v.astype(ref.dtype)
    return (
        cast(dx, x), cast(dshift, shift), cast(dscale, scale), cast(dgate, gate),
        cast(dw1, w1), db1.astype(w1.dtype), cast(dw2, w2), db2.astype(w2.dtype),
    )


adaln_mlp.defvjp(_fwd, _bwd)
