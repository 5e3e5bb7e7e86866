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
8 matmul-units per block per step where this costs 6.

Two backward implementations share that residual contract (bwd_impl):

- "xla" (default): plain-jnp backward (the elementwise pieces recomputed from
  x/a; XLA fuses them into the surrounding passes). Measured faster on v5e
  at every tested shape — see PARITY.md "Fused MLP backward".
- "fused": two Pallas kernels. Stage 1 computes dmlp = g*gate, the
  dgate/db1/db2 reductions, dgelu = dmlp @ w2^T and GELU' in one pass —
  the XLA backward's separate HBM reduction passes and its f32 (N,T,H)
  dgelu/da intermediates never exist (da is emitted once, stream-dtype).
  Stage 2 accumulates dh1 = da @ w1^T in VMEM scratch and applies the
  dshift/dscale reductions + modulation/LayerNorm backward in the epilogue.
  The two weight-grad dots stay in XLA over kernel-emitted operands.
  Targeted the profiled ~6% bias/modulation-reduction residue at DiT-B, but
  the in-kernel transposed-operand matmuls cost more than the saved HBM
  passes gain (3.60 vs 4.21 steps/s at DiT-B b256 T=128) — kept as a
  correct, tested, documented negative result.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 128


def _pick_block_h(hdim: int) -> int:
    return next((c for c in (1024, 768, 512, 384, 256, 128) if hdim % c == 0), hdim)


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
        block_h = _pick_block_h(hdim)
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


def _adaln_mlp_quant_kernel(
    x_ref, shift_ref, scale_ref, gate_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, *, eps: float, c: int,
):
    """int8 weight-only variant of the inference kernel: w1/w2 blocks arrive
    as int8 (half the HBM weight stream), are upcast in-register and fed to
    the MXU; the per-output-channel dequant scales fold into the epilogues
    (s1 with b1, s2 applied per H-block partial — scales are k-invariant so
    distributing over the accumulation is exact). Processes `c` batch rows
    per program (pallas_quant._batch_block) so a resident weight block
    serves c rows instead of 1 — the fix for the 32x-redundant weight
    stream that made batch-32 serving 0.51x."""
    i = pl.program_id(0)
    k = pl.program_id(2)
    x = x_ref[...].astype(jnp.float32)  # (C, BT, D)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)

    shift = shift_ref[pl.ds(i * c, c), :].astype(jnp.float32)  # (C, D)
    scale = scale_ref[pl.ds(i * c, c), :].astype(jnp.float32)
    gate = gate_ref[pl.ds(i * c, c), :].astype(jnp.float32)

    h = xn * (1.0 + scale[:, None, :]) + shift[:, None, :]
    hb = h.reshape(-1, h.shape[-1])  # (C*BT, D)
    hb = jnp.dot(hb.astype(jnp.bfloat16), w1_ref[...].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    hb = hb * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32)
    hb = jax.nn.gelu(hb, approximate=True)
    partial = jnp.dot(
        hb.astype(jnp.bfloat16), w2_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * s2_ref[0].astype(jnp.float32)
    partial = partial.reshape(x.shape)
    gate3 = gate[:, None, :]

    @pl.when(k == 0)
    def _():
        o_ref[...] = (
            x + gate3 * (partial + b2_ref[0].astype(jnp.float32))
        ).astype(o_ref.dtype)

    @pl.when(k > 0)
    def _():
        o_ref[...] = o_ref[...] + (gate3 * partial).astype(o_ref.dtype)


def adaln_mlp_quant(x, shift, scale, gate, w1q, s1, b1, w2q, s2, b2,
                    block_t: int = DEFAULT_BLOCK_T, eps: float = 1e-6,
                    interpret: bool = False):
    """Inference-only int8 fused MLP half: one kernel for
    x + gate * fc2(gelu(fc1(modulate(LN(x))))) with int8 w1q/w2q and
    per-output-channel scales s1 (H,) / s2 (D,). Serving path of
    DiTConfig.quant — no VJP (quantized trees are never trained).
    Interprets on the CPU backend (no XLA fallback exists for this path)."""
    from osu_diffusion_tpu.ops.pallas_quant import (
        _batch_block,
        _block_t_for,
        _interp_kwargs,
    )

    n, t, d = x.shape
    hdim = w1q.shape[1]
    block_h = _pick_block_h(hdim)
    # cross-H-block fc2 partials accumulate in o_ref.dtype; the contract is
    # the f32 serving stream — bf16 activations would round every partial
    if x.dtype != jnp.float32:
        raise TypeError(f"adaln_mlp_quant requires f32 activations, got {x.dtype}")
    # clamp the T block to the (sublane-aligned) real length: padding short
    # sequences to a fixed 128 block multiplies the row work 128/T-fold and
    # erases the int8 win exactly in its weight-bound home regime (measured
    # 0.78x at T=32 before this clamp) — shared policy in pallas_quant
    block_t = _block_t_for(t, block_t)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        x = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])
    c = _batch_block(n, block_t)

    b1_2d = b1.reshape(1, hdim)
    b2_2d = b2.reshape(1, d)
    s1_2d = s1.reshape(1, hdim)
    s2_2d = s2.reshape(1, d)

    grid = (n // c, t_pad // block_t, hdim // block_h)
    xo_spec = pl.BlockSpec(
        (c, block_t, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = _interp_kwargs(interpret)
    out = pl.pallas_call(
        functools.partial(_adaln_mlp_quant_kernel, eps=eps, c=c),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, d), x.dtype),
        grid=grid,
        in_specs=[
            xo_spec,
            whole,  # shift (N, D)
            whole,  # scale
            whole,  # gate
            pl.BlockSpec((d, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
            whole,  # s2 (1, D)
            whole,  # b2 (1, D)
        ],
        out_specs=xo_spec,
        **kwargs,
    )(x, shift, scale, gate, w1q, s1_2d, b1_2d, w2q, s2_2d, b2_2d)
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


_GELU_C0 = 0.7978845608028654  # sqrt(2/pi)
_GELU_C1 = 0.044715


def _bwd_prologue_kernel(
    g_ref, mlp_ref, a_ref, gate_ref, w2_ref,
    da_ref, gelu_ref, dmlp_ref, dgate_ref, db1_ref, db2_ref,
    *, matmul_dtype,
):
    """One (batch, T-block, H-block) program of the fused backward, stage 1.

    In one read of the residuals this computes dmlp = g * gate, the dgate /
    db1 / db2 reductions (which XLA otherwise runs as separate HBM passes over
    the (N,T,*) gradients), the dgelu = dmlp @ w2^T matmul, and GELU' applied
    in-register — emitting `da` and `gelu(a)` directly in the stream dtype.
    The f32 (N,T,H) dgelu/da intermediates of the XLA backward never exist.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    f32 = jnp.float32
    gf = g_ref[0].astype(f32)  # (BT, D)
    gate = gate_ref[pl.ds(i, 1), :].astype(f32)  # (1, D)
    dmlp = gf * gate

    # reductions ride on the k == 0 visit (g/mlp blocks are k-invariant)
    dgate_c = jnp.sum(gf * mlp_ref[0].astype(f32), axis=0, keepdims=True)
    db2_c = jnp.sum(dmlp, axis=0, keepdims=True)

    @pl.when(k == 0)
    def _():
        dmlp_ref[0] = dmlp.astype(dmlp_ref.dtype)

        @pl.when(j == 0)
        def _():
            dgate_ref[pl.ds(i, 1), :] = dgate_c

        @pl.when(j > 0)
        def _():
            dgate_ref[pl.ds(i, 1), :] += dgate_c

        @pl.when((i == 0) & (j == 0))
        def _():
            db2_ref[...] = db2_c

        @pl.when((i > 0) | (j > 0))
        def _():
            db2_ref[...] += db2_c

    # dgelu = dmlp @ w2[k]^T : (BT, D) x (BH, D) -> (BT, BH)
    dgelu = jax.lax.dot_general(
        dmlp.astype(matmul_dtype), w2_ref[...].astype(matmul_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )

    # GELU-tanh forward + derivative from the saved pre-activation
    af = a_ref[0].astype(f32)  # (BT, BH)
    u = _GELU_C0 * (af + _GELU_C1 * af * af * af)
    th = jnp.tanh(u)
    gelu_out = 0.5 * af * (1.0 + th)
    dgelu_dx = 0.5 * (1.0 + th) + 0.5 * af * (1.0 - th * th) * _GELU_C0 * (
        1.0 + 3.0 * _GELU_C1 * af * af
    )
    da = dgelu_dx * dgelu
    da_ref[0] = da.astype(da_ref.dtype)
    gelu_ref[0] = gelu_out.astype(gelu_ref.dtype)

    db1_c = jnp.sum(da, axis=0, keepdims=True)  # (1, BH)

    @pl.when((i == 0) & (j == 0))
    def _():
        db1_ref[pl.ds(k, 1), :] = db1_c

    @pl.when((i > 0) | (j > 0))
    def _():
        db1_ref[pl.ds(k, 1), :] += db1_c


def _bwd_epilogue_kernel(
    da_ref, x_ref, g_ref, shift_ref, scale_ref, w1_ref,
    dx_ref, h1_ref, dshift_ref, dscale_ref,
    acc_ref,
    *, eps: float, matmul_dtype,
):
    """Fused backward, stage 2: dh1 = da @ w1^T accumulated over H-blocks in a
    VMEM scratch, then — at the last H-block — the dshift/dscale reductions,
    the modulation + non-affine LayerNorm backward, and the residual add, all
    without materializing dh1 in HBM. Also emits h1 (recomputed from x) for
    the dw1 dot, saving the XLA elementwise-recompute pass over x."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    f32 = jnp.float32

    # (BT, BH) x (D, BH) -> (BT, D)
    partial = jax.lax.dot_general(
        da_ref[0].astype(matmul_dtype), w1_ref[...].astype(matmul_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )

    @pl.when(k == 0)
    def _():
        acc_ref[...] = partial

    @pl.when(k > 0)
    def _():
        acc_ref[...] += partial

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        xf = x_ref[0].astype(f32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xn = xc * inv
        sc = scale_ref[pl.ds(i, 1), :].astype(f32)  # (1, D)
        sh = shift_ref[pl.ds(i, 1), :].astype(f32)
        h1_ref[0] = (xn * (1.0 + sc) + sh).astype(h1_ref.dtype)

        dh1 = acc_ref[...]
        dshift_c = jnp.sum(dh1, axis=0, keepdims=True)
        dscale_c = jnp.sum(dh1 * xn, axis=0, keepdims=True)

        @pl.when(j == 0)
        def _():
            dshift_ref[pl.ds(i, 1), :] = dshift_c
            dscale_ref[pl.ds(i, 1), :] = dscale_c

        @pl.when(j > 0)
        def _():
            dshift_ref[pl.ds(i, 1), :] += dshift_c
            dscale_ref[pl.ds(i, 1), :] += dscale_c

        dxn = dh1 * (1.0 + sc)
        dx_ln = inv * (
            dxn
            - jnp.mean(dxn, axis=-1, keepdims=True)
            - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True)
        )
        dx_ref[0] = (g_ref[0].astype(f32) + dx_ln).astype(dx_ref.dtype)


def _bwd_fused_impl(res, g, block_t: int, eps: float, matmul_dtype,
                    block_h: int | None = None):
    """Pallas-fused backward: same math as `_bwd`, ~half the HBM traffic.

    Stage 1 + stage 2 kernels cover everything except the two weight-grad
    matmuls, which stay as XLA dots over the kernel-emitted stream-dtype
    operands (gelu_out/dmlp and h1/da). Bias/modulation grads accumulate in
    f32 inside the kernels — same reduction precision as the XLA backward;
    the grid walks t-blocks then batch sequentially, so partial sums only
    differ from a flat sum by association order."""
    x, shift, scale, gate, w1, w2, a, mlp = res
    n, t, d = x.shape
    hdim = w1.shape[1]
    if block_h is None:
        block_h = _pick_block_h(hdim)
    assert hdim % block_h == 0, (hdim, block_h)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0)]
        # zero-padded g makes every padded-row gradient exactly zero, so the
        # in-kernel reductions and the weight-grad dots need no masking
        g = jnp.pad(g, pad)
        x = jnp.pad(x, pad)
        a = jnp.pad(a, pad)
        mlp = jnp.pad(mlp, pad)
    g = g.astype(x.dtype)

    grid = (n, t_pad // block_t, hdim // block_h)
    f32 = jnp.float32
    td_spec = pl.BlockSpec(
        (1, block_t, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM
    )
    th_spec = pl.BlockSpec(
        (1, block_t, block_h), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)

    da, gelu_out, dmlp, dgate, db1, db2 = pl.pallas_call(
        functools.partial(_bwd_prologue_kernel, matmul_dtype=matmul_dtype),
        out_shape=[
            jax.ShapeDtypeStruct((n, t_pad, hdim), x.dtype),  # da
            jax.ShapeDtypeStruct((n, t_pad, hdim), x.dtype),  # gelu(a)
            jax.ShapeDtypeStruct((n, t_pad, d), x.dtype),  # dmlp
            jax.ShapeDtypeStruct((n, d), f32),  # dgate
            jax.ShapeDtypeStruct((hdim // block_h, block_h), f32),  # db1
            jax.ShapeDtypeStruct((1, d), f32),  # db2
        ],
        grid=grid,
        in_specs=[
            td_spec,  # g
            td_spec,  # mlp (f32 residual)
            th_spec,  # a
            whole,  # gate (N, D)
            pl.BlockSpec((block_h, d), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[th_spec, th_spec, td_spec, whole, whole, whole],
    )(g, mlp, a, gate, w2)

    md = lambda v: v.astype(matmul_dtype)
    dw2 = jnp.einsum(
        "nth,ntd->hd", md(gelu_out), md(dmlp), preferred_element_type=f32
    )

    dx, h1, dshift, dscale = pl.pallas_call(
        functools.partial(_bwd_epilogue_kernel, eps=eps, matmul_dtype=matmul_dtype),
        out_shape=[
            jax.ShapeDtypeStruct((n, t_pad, d), x.dtype),  # dx
            jax.ShapeDtypeStruct((n, t_pad, d), x.dtype),  # h1
            jax.ShapeDtypeStruct((n, d), f32),  # dshift
            jax.ShapeDtypeStruct((n, d), f32),  # dscale
        ],
        grid=grid,
        in_specs=[
            th_spec,  # da
            td_spec,  # x
            td_spec,  # g
            whole,  # shift
            whole,  # scale
            pl.BlockSpec((d, block_h), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=[td_spec, td_spec, whole, whole],
        scratch_shapes=[pltpu.VMEM((block_t, d), f32)],
    )(da, x, g, shift, scale, w1)

    dw1 = jnp.einsum("ntd,nth->dh", md(h1), md(da), preferred_element_type=f32)
    db1 = db1.reshape(hdim)

    cast = lambda v, ref: v.astype(ref.dtype)
    return (
        cast(dx[:, :t, :], x), cast(dshift, shift), cast(dscale, scale),
        cast(dgate, gate), cast(dw1, w1), db1.astype(w1.dtype),
        cast(dw2, w2), db2.reshape(d).astype(w2.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def adaln_mlp(x, shift, scale, gate, w1, b1, w2, b2,
              block_t: int = DEFAULT_BLOCK_T, eps: float = 1e-6,
              matmul_dtype=jnp.bfloat16, bwd_impl: str = "xla"):
    """x: (N, T, D); shift/scale/gate: (N, D); w1: (D, H); w2: (H, D).
    Returns x + gate * MLP(modulate(LN(x), shift, scale)).

    bwd_impl: "xla" (kernel forward, plain-jnp backward — measured default) or
    "fused" (Pallas stage-1/stage-2 kernels + two XLA weight-grad dots)."""
    return _adaln_mlp_fwd_impl(x, shift, scale, gate, w1, b1, w2, b2, block_t,
                               eps, matmul_dtype)


def _fwd(x, shift, scale, gate, w1, b1, w2, b2, block_t, eps, matmul_dtype,
         bwd_impl):
    out, a, mlp = _adaln_mlp_fwd_impl(
        x, shift, scale, gate, w1, b1, w2, b2, block_t, eps, matmul_dtype,
        with_residuals=True,
    )
    return out, (x, shift, scale, gate, w1, w2, a, mlp)


def _bwd_dispatch(block_t, eps, matmul_dtype, bwd_impl, res, g):
    if bwd_impl == "fused":
        return _bwd_fused_impl(res, g, block_t, eps, matmul_dtype)
    assert bwd_impl == "xla", bwd_impl
    return _bwd(block_t, eps, matmul_dtype, res, g)


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


adaln_mlp.defvjp(_fwd, _bwd_dispatch)
