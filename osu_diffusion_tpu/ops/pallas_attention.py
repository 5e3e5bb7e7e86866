"""Fused banded (block-local) flash attention — Pallas TPU kernels, fwd + bwd.

The TPU-native replacement for the reference's dense (T, T) boolean mask over
nn.MultiheadAttention (reference models.py:164-170, sample.py:82-84): the band
is *structure* here. For each 128-row query block only the key blocks that can
intersect the band  q - L < k <= q + L  are streamed from VMEM and combined
with an online (flash) softmax, so compute and memory are O(T * L) instead of
O(T^2) — the asymptotic win that makes long-sequence sampling cheap.

The backward pass is block-local too: the forward additionally emits the
per-row log-sum-exp (LSE) when differentiated, and two Pallas kernels compute
dq (grid over query blocks) and dk/dv (grid over key blocks) by recomputing the
banded probabilities from q, k and the saved LSE — the O(T*L) structure
survives training, and the (T, T) probability matrix never exists in either
direction (reference bwd: nn.MultiheadAttention's dense softmax backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 128
NEG_INF = -1e30
# LSE/delta rows are stored broadcast over a 128-lane minor axis so backward
# kernels read them as (block, 128) tiles and slice a (block, 1) column —
# avoiding sublane<->lane transposes (the layout jax's own TPU flash kernel
# uses for its l/m residuals).
LANE = 128
# slim-stats mode (the long-T backward-traffic experiment, PARITY.md "Long-T
# flash block sweep"): the LSE residual is stored sublane-packed as
# (n*h, SUBLANE, t) f32 (each row replicated over the 8 sublanes so the
# (1, SUBLANE, block) tiles satisfy Mosaic's (8, 128) minimum f32 tile) —
# 16x less HBM than the lane-broadcast layout — and the softmax-jacobian
# delta row term is computed inside the backward kernels from o·do instead of
# being materialized as a second broadcast array. The sublane<->lane
# transposes this requires are done exactly with a diagonal-mask reduction
# (VPU, no MXU rounding). Trace-time default for model callers; kernels take
# it per-call. None = AUTO: slim whenever the block is lane-aligned (measured
# strictly faster in every training config, PARITY.md "Long-T flash-backward
# optimization"); True/False force a layout (True raises for non-lane-aligned
# blocks on TPU).
SLIM_STATS_DEFAULT: bool | None = None
SUBLANE = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _col_to_row(col):
    """(B, 1) -> (1, B) EXACTLY, without MXU rounding: broadcast the column
    across lanes, keep the diagonal, reduce rows — each output lane sums one
    nonzero f32 term. A (B, B) VPU op, negligible next to the score matmuls."""
    b = col.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.sum(jnp.where(r == c, col, 0.0), axis=0, keepdims=True)


def _row_to_col(row):
    """(1, B) -> (B, 1) exactly (see _col_to_row)."""
    b = row.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return jnp.sum(jnp.where(r == c, row, 0.0), axis=1, keepdims=True)


def _banded_attn_fwd_kernel(
    q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, *, band: int, block: int,
    scale: float, matmul_dtype, bounds_ref=None, slim_stats: bool = False,
):
    """One (batch*head, q-block) program.

    q_ref: (1, B, Dh); k_ref/v_ref: (1, T_pad, Dh); o_ref: (1, B, Dh);
    valid_ref: (1, 1) SMEM int32 — the real (unpadded) sequence length as a
    *dynamic* operand, so one compiled program serves every beatmap length in
    a bucket (keys at index >= valid are masked);
    lse_ref: (1, B, LANE) or None (inference skips it);
    bounds_ref: optional (1, 2) SMEM int32 [k_lo, k_hi) — a *dynamic* valid-key
    range used by the context-parallel halo path, where edge shards must mask
    the neighbor halo they did not receive (parallel/context.py).
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

    # static trim: kb = j - reach + w with j in [0, n_kb) can only be valid for
    # w in [reach - n_kb + 1, reach + n_kb - 1]. At T = band = block (training
    # at the window size) this collapses the loop to ONE iteration.
    for w in range(max(0, reach - n_kb + 1), min(2 * reach, reach + n_kb - 1) + 1):
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
            & (k_idx < valid_ref[0, 0])
            & kb_valid
        )
        if bounds_ref is not None:
            allowed = allowed & (k_idx >= bounds_ref[0, 0]) & (k_idx < bounds_ref[0, 1])
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
    if lse_ref is not None:
        lse = m + jnp.log(jnp.maximum(l, 1e-30))
        if slim_stats:
            # (1, B) row of the (n*h, SUBLANE, t_pad) LSE residual, replicated
            # over the SUBLANE axis to satisfy the (8, 128) minimum f32 tile
            lse_ref[0] = jnp.broadcast_to(
                _col_to_row(lse), (SUBLANE, block)
            ).astype(lse_ref.dtype)
        else:
            lse_ref[0] = jnp.broadcast_to(lse, (block, LANE)).astype(lse_ref.dtype)


def _pad_bh(a, t_pad):
    n, h, t, dh = a.shape
    return jnp.pad(a, [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]).reshape(
        n * h, t_pad, dh
    )


def _smem_scalar_spec():
    return pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)


def _banded_flash_fwd_impl(
    q, k, v, band: int, block: int, matmul_dtype, t_real=None,
    with_lse: bool = False, slim_stats: bool = False,
):
    n, h, t, dh = q.shape
    # callers that pre-pad T (e.g. Sampler length bucketing) pass the unpadded
    # length so real queries near the pad boundary don't attend garbage keys.
    # It is a TRACED operand: one compiled program per bucket, any real length.
    valid = jnp.asarray(t if t_real is None else t_real, jnp.int32).reshape(1, 1)
    t_pad = _cdiv(t, block) * block
    qp, kp, vp = _pad_bh(q, t_pad), _pad_bh(k, t_pad), _pad_bh(v, t_pad)
    scale = 1.0 / (dh ** 0.5)

    grid = (n * h, t_pad // block)
    q_spec = pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n * h, t_pad, dh), q.dtype)]
    out_specs = [q_spec]
    if with_lse:
        if slim_stats:
            out_shape.append(
                jax.ShapeDtypeStruct((n * h, SUBLANE, t_pad), jnp.float32)
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, SUBLANE, block), lambda i, j: (i, 0, j),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            out_shape.append(jax.ShapeDtypeStruct((n * h, t_pad, LANE), jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, block, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
            )
    kernel = functools.partial(
        _banded_attn_fwd_kernel, band=band, block=block,
        scale=scale, matmul_dtype=matmul_dtype, slim_stats=slim_stats,
    )
    if not with_lse:
        kernel = functools.partial(kernel, lse_ref=None)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, _smem_scalar_spec()],
        out_specs=out_specs,
    )(qp, kp, vp, valid)
    out = outs[0].reshape(n, h, t_pad, dh)[:, :, :t, :]
    if with_lse:
        # slim: the sublane-packed (n*h, SUBLANE, t_pad) residual as-is;
        # lane layout: slice the (n*h, t_pad) row out of the 128x-wide write
        return out, (outs[1] if slim_stats else outs[1][:, :, 0])
    return out


def _ranged_fwd_impl(q, k, v, bounds, band: int, block: int, matmul_dtype,
                     with_lse: bool = False):
    n, h, t, dh = q.shape
    assert t % block == 0, (t, block)
    qp = q.reshape(n * h, t, dh)
    kp = k.reshape(n * h, t, dh)
    vp = v.reshape(n * h, t, dh)
    scale = 1.0 / (dh ** 0.5)
    bounds2d = bounds.reshape(1, 4)
    valid = jnp.full((1, 1), t, jnp.int32)  # [k_lo, k_hi) already bounds keys

    def kernel(q_ref, k_ref, v_ref, bounds_ref, valid_ref, o_ref, lse_ref=None):
        _banded_attn_fwd_kernel(
            q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, band=band,
            block=block, scale=scale, matmul_dtype=matmul_dtype,
            bounds_ref=bounds_ref,
        )

    out_shape = [jax.ShapeDtypeStruct((n * h, t, dh), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    ]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((n * h, t, LANE), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, block, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        )
    else:
        kernel = functools.partial(kernel, lse_ref=None)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n * h, t // block),
        in_specs=[
            pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            _smem_scalar_spec(),
        ],
        out_specs=out_specs,
    )(qp, kp, vp, bounds2d, valid)
    out = outs[0].reshape(n, h, t, dh)
    if with_lse:
        return out, outs[1][:, :, 0]
    return out, None


def banded_flash_attention_ranged(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, band: int,
    k_lo: jnp.ndarray, k_hi: jnp.ndarray,
    block: int = DEFAULT_BLOCK, matmul_dtype=jnp.bfloat16,
    q_lo=None, q_hi=None,
) -> jnp.ndarray:
    """Banded flash attention with a DYNAMIC valid-key range [k_lo, k_hi).

    Used by context-parallel attention (parallel/context.py): q/k/v are one
    shard's halo-extended slices, and the valid range depends on the shard's
    position on the mesh axis (a traced value — edge shards mask the halo
    that has no neighbor). T must already be a multiple of `block`.

    DIFFERENTIABLE (round-3: CP training): the custom VJP reuses the
    block-local dq/dkv kernels with the dynamic bounds. `q_lo`/`q_hi` bound
    the VALID QUERY rows (the non-pad region [halo, halo + t_loc) in the CP
    layout) — backward needs them so pad-query rows, whose forward LSE is
    -inf, contribute exact zeros to dk/dv instead of garbage.
    """
    t = q.shape[2]
    bounds = jnp.stack([
        jnp.asarray(k_lo, jnp.int32),
        jnp.asarray(k_hi, jnp.int32),
        jnp.asarray(0 if q_lo is None else q_lo, jnp.int32),
        jnp.asarray(t if q_hi is None else q_hi, jnp.int32),
    ])
    return _ranged_vjp(q, k, v, bounds, band, block, matmul_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ranged_vjp(q, k, v, bounds, band, block, matmul_dtype):
    return _ranged_fwd_impl(q, k, v, bounds, band, block, matmul_dtype)[0]


def _ranged_fwd(q, k, v, bounds, band, block, matmul_dtype):
    out, lse = _ranged_fwd_impl(
        q, k, v, bounds, band, block, matmul_dtype, with_lse=True
    )
    return out, (q, k, v, out, lse, bounds)


def _ranged_bwd(band, block, matmul_dtype, res, g):
    q, k, v, o, lse, bounds = res
    dq, dk, dv = _ranged_bwd_impl(
        q, k, v, o, lse, g, bounds, band, block, matmul_dtype
    )
    import numpy as np

    return dq, dk, dv, np.zeros(bounds.shape, dtype=jax.dtypes.float0)


_ranged_vjp.defvjp(_ranged_fwd, _ranged_bwd)


def _ranged_bwd_impl(q, k, v, o, lse, g, bounds, band: int, block: int,
                     matmul_dtype):
    """dq/dk/dv with dynamic [k_lo, k_hi) x [q_lo, q_hi) bounds. T is already
    a multiple of `block` (the ranged-call contract)."""
    n, h, t, dh = q.shape
    qp = q.reshape(n * h, t, dh)
    kp = k.reshape(n * h, t, dh)
    vp = v.reshape(n * h, t, dh)
    gp = g.reshape(n * h, t, dh)
    scale = 1.0 / (dh ** 0.5)
    bounds2d = bounds.reshape(1, 4)
    valid = jnp.full((1, 1), t, jnp.int32)

    delta = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    delta_b = jnp.broadcast_to(
        delta.reshape(n * h, t)[:, :, None], (n * h, t, LANE)
    )
    lse_b = jnp.broadcast_to(lse[:, :, None], (n * h, t, LANE))

    grid = (n * h, t // block)
    blk = lambda: pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    stat_blk = pl.BlockSpec((1, block, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    stat_full = pl.BlockSpec((1, t, LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    bounds_spec = pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    dq = pl.pallas_call(
        functools.partial(
            _banded_attn_bwd_dq_kernel, band=band, block=block,
            scale=scale, matmul_dtype=matmul_dtype, has_bounds=True,
        ),
        out_shape=jax.ShapeDtypeStruct((n * h, t, dh), q.dtype),
        grid=grid,
        in_specs=[blk(), full(), full(), blk(), stat_blk, stat_blk,
                  _smem_scalar_spec(), bounds_spec],
        out_specs=blk(),
    )(qp, kp, vp, gp, lse_b, delta_b, valid, bounds2d)

    dk, dv = pl.pallas_call(
        functools.partial(
            _banded_attn_bwd_dkv_kernel, band=band, block=block,
            scale=scale, matmul_dtype=matmul_dtype, has_bounds=True,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n * h, t, dh), k.dtype),
            jax.ShapeDtypeStruct((n * h, t, dh), v.dtype),
        ],
        grid=grid,
        in_specs=[full(), blk(), blk(), full(), stat_full, stat_full,
                  _smem_scalar_spec(), bounds_spec],
        out_specs=[blk(), blk()],
    )(qp, kp, vp, gp, lse_b, delta_b, valid, bounds2d)

    reshape = lambda a: a.reshape(n, h, t, dh)
    return reshape(dq), reshape(dk), reshape(dv)


def _banded_attn_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, s1_ref, s2_ref, valid_ref, *refs,
    band: int, block: int, scale: float, matmul_dtype, has_bounds: bool = False,
    slim_stats: bool = False,
):
    if has_bounds:
        bounds_ref, dq_ref = refs
    else:
        bounds_ref, (dq_ref,) = None, refs
    """dq for one (batch*head, q-block): dq = sum_kb (p*(dp-delta)) @ k * scale.

    q_ref/do_ref/dq_ref: (1, B, Dh) blocked; k_ref/v_ref: (1, T_pad, Dh) full.
    Row stats: lane-broadcast mode reads s1=LSE, s2=delta as (1, B, LANE)
    blocked tiles; slim mode reads s1=o (1, B, Dh) blocked and s2=LSE
    (1, SUBLANE, B) sublane-packed, deriving delta = sum_d o·do in-kernel
    (the HBM-traffic experiment, PARITY.md "Long-T flash block sweep").
    """
    j = pl.program_id(1)
    t_pad = k_ref.shape[1]
    n_kb = t_pad // block
    dh = q_ref.shape[2]

    q = (q_ref[0].astype(jnp.float32) * scale).astype(matmul_dtype)
    do = do_ref[0].astype(matmul_dtype)
    if slim_stats:
        o_ref, lse_ref = s1_ref, s2_ref
        # lse_ref: (1, SUBLANE, B) sublane-replicated; any one row is the stat
        lse = _row_to_col(lse_ref[0, :1, :].astype(jnp.float32))  # (B, 1)
        delta = jnp.sum(
            o_ref[0].astype(jnp.float32) * do_ref[0].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
    else:
        lse_ref, delta_ref = s1_ref, s2_ref
        lse = lse_ref[0][:, :1].astype(jnp.float32)      # (B, 1)
        delta = delta_ref[0][:, :1].astype(jnp.float32)  # (B, 1)
    q_idx = j * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)

    reach = _cdiv(band, block)
    dq = jnp.zeros((block, dh), dtype=jnp.float32)

    # static trim (see forward kernel): only window slots that can be in-range
    for w in range(max(0, reach - n_kb + 1), min(2 * reach, reach + n_kb - 1) + 1):
        kb = j - reach + w
        kb_valid = jnp.logical_and(kb >= 0, kb < n_kb)
        kb_c = jnp.clip(kb, 0, n_kb - 1)
        start = pl.multiple_of(kb_c * block, block)
        k_blk = k_ref[0, pl.ds(start, block), :].astype(matmul_dtype)
        v_blk = v_ref[0, pl.ds(start, block), :].astype(matmul_dtype)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_idx = kb_c * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        allowed = (
            (k_idx > q_idx - band)
            & (k_idx <= q_idx + band)
            & (k_idx < valid_ref[0, 0])
            & (q_idx < valid_ref[0, 0])
            & kb_valid
        )
        if bounds_ref is not None:
            # dynamic [k_lo, k_hi) x [q_lo, q_hi): the q bounds zero out
            # pad-query rows whose forward LSE is -inf (exp would overflow)
            allowed = (
                allowed
                & (k_idx >= bounds_ref[0, 0]) & (k_idx < bounds_ref[0, 1])
                & (q_idx >= bounds_ref[0, 2]) & (q_idx < bounds_ref[0, 3])
            )
        p = jnp.where(allowed, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq = dq + jax.lax.dot_general(
            ds.astype(matmul_dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _banded_attn_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, s1_ref, s2_ref, valid_ref, *refs,
    band: int, block: int, scale: float, matmul_dtype, has_bounds: bool = False,
    slim_stats: bool = False,
):
    if has_bounds:
        bounds_ref, dk_ref, dv_ref = refs
    else:
        bounds_ref, (dk_ref, dv_ref) = None, refs
    """dk/dv for one (batch*head, key-block).

    k_ref/v_ref/dk_ref/dv_ref: (1, B, Dh) blocked; q_ref/do_ref: (1, T_pad, Dh)
    full. Row stats: lane-broadcast mode reads s1=LSE, s2=delta as
    (1, T_pad, LANE) full slabs; slim mode reads s1=o (1, T_pad, Dh) full and
    s2=LSE (1, SUBLANE, T_pad) sublane-packed, deriving per-q-block delta
    in-kernel. A key at
    index k is seen by queries q in [k - L, k + L) (the transpose of
    q - L < k <= q + L), so the same block reach applies.
    """
    i = pl.program_id(1)
    t_pad = q_ref.shape[1]
    n_qb = t_pad // block
    dh = k_ref.shape[2]

    k_blk = k_ref[0].astype(matmul_dtype)
    v_blk = v_ref[0].astype(matmul_dtype)
    k_idx = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)

    reach = _cdiv(band, block)
    dk = jnp.zeros((block, dh), dtype=jnp.float32)
    dv = jnp.zeros((block, dh), dtype=jnp.float32)

    # static trim (see forward kernel): only window slots that can be in-range
    for w in range(max(0, reach - n_qb + 1), min(2 * reach, reach + n_qb - 1) + 1):
        qb = i - reach + w
        qb_valid = jnp.logical_and(qb >= 0, qb < n_qb)
        qb_c = jnp.clip(qb, 0, n_qb - 1)
        start = pl.multiple_of(qb_c * block, block)
        q_blk = (
            q_ref[0, pl.ds(start, block), :].astype(jnp.float32) * scale
        ).astype(matmul_dtype)
        do_blk = do_ref[0, pl.ds(start, block), :].astype(matmul_dtype)
        if slim_stats:
            o_ref, lse_ref = s1_ref, s2_ref
            # lse_ref: (1, SUBLANE, T_pad) sublane-replicated full slab
            lse_q = _row_to_col(
                lse_ref[0, :1, pl.ds(start, block)].astype(jnp.float32)
            )
            delta_q = jnp.sum(
                o_ref[0, pl.ds(start, block), :].astype(jnp.float32)
                * do_ref[0, pl.ds(start, block), :].astype(jnp.float32),
                axis=-1, keepdims=True,
            )
        else:
            lse_ref, delta_ref = s1_ref, s2_ref
            lse_q = lse_ref[0, pl.ds(start, block), :1].astype(jnp.float32)
            delta_q = delta_ref[0, pl.ds(start, block), :1].astype(jnp.float32)

        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk)
        q_idx = qb_c * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        allowed = (
            (k_idx > q_idx - band)
            & (k_idx <= q_idx + band)
            & (k_idx < valid_ref[0, 0])
            & (q_idx < valid_ref[0, 0])
            & qb_valid
        )
        if bounds_ref is not None:
            allowed = (
                allowed
                & (k_idx >= bounds_ref[0, 0]) & (k_idx < bounds_ref[0, 1])
                & (q_idx >= bounds_ref[0, 2]) & (q_idx < bounds_ref[0, 3])
            )
        p = jnp.where(allowed, jnp.exp(s - lse_q), 0.0)
        # dv += p^T @ do
        dv = dv + jax.lax.dot_general(
            p.astype(matmul_dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_q)
        # dk += ds^T @ (q*scale)  — q_blk already carries the scale
        dk = dk + jax.lax.dot_general(
            ds.astype(matmul_dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _banded_flash_bwd_impl(
    q, k, v, o, lse, g, band: int, block: int, matmul_dtype,
    t_real, slim_stats: bool = False,
):
    n, h, t, dh = q.shape
    valid = jnp.asarray(t if t_real is None else t_real, jnp.int32).reshape(1, 1)
    t_pad = _cdiv(t, block) * block
    qp, kp, vp = _pad_bh(q, t_pad), _pad_bh(k, t_pad), _pad_bh(v, t_pad)
    gp = _pad_bh(g, t_pad)
    scale = 1.0 / (dh ** 0.5)

    if slim_stats:
        # the kernels read o (already a saved residual) and the sublane-packed
        # (n*h, SUBLANE, t_pad) LSE; delta = sum_d o·do is derived in-kernel,
        # so no lane-broadcast stat array ever exists in HBM
        s1 = _pad_bh(o, t_pad)
        s2 = lse  # forward already emitted it at (n*h, SUBLANE, t_pad)
        assert s2.shape == (n * h, SUBLANE, t_pad), s2.shape
        stat1_dq = pl.BlockSpec(
            (1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        stat2_dq = pl.BlockSpec(
            (1, SUBLANE, block), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        stat1_dkv = pl.BlockSpec(
            (1, t_pad, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
        stat2_dkv = pl.BlockSpec(
            (1, SUBLANE, t_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        # delta_i = sum_d o_i do_i (softmax-jacobian row term), lane-broadcast
        delta = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
        delta = jnp.pad(delta.reshape(n * h, t), [(0, 0), (0, t_pad - t)])
        s2 = jnp.broadcast_to(delta[:, :, None], (n * h, t_pad, LANE))
        s1 = jnp.broadcast_to(lse[:, :, None], (n * h, t_pad, LANE))
        stat1_dq = stat2_dq = pl.BlockSpec(
            (1, block, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        stat1_dkv = stat2_dkv = pl.BlockSpec(
            (1, t_pad, LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )

    grid = (n * h, t_pad // block)
    blk = lambda: pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _banded_attn_bwd_dq_kernel, band=band, block=block,
            scale=scale, matmul_dtype=matmul_dtype, slim_stats=slim_stats,
        ),
        out_shape=jax.ShapeDtypeStruct((n * h, t_pad, dh), q.dtype),
        grid=grid,
        in_specs=[blk(), full(), full(), blk(), stat1_dq, stat2_dq,
                  _smem_scalar_spec()],
        out_specs=blk(),
    )(qp, kp, vp, gp, s1, s2, valid)

    dk, dv = pl.pallas_call(
        functools.partial(
            _banded_attn_bwd_dkv_kernel, band=band, block=block,
            scale=scale, matmul_dtype=matmul_dtype, slim_stats=slim_stats,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n * h, t_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((n * h, t_pad, dh), v.dtype),
        ],
        grid=grid,
        in_specs=[full(), blk(), blk(), full(), stat1_dkv, stat2_dkv,
                  _smem_scalar_spec()],
        out_specs=[blk(), blk()],
    )(qp, kp, vp, gp, s1, s2, valid)

    unpad = lambda a: a.reshape(n, h, t_pad, dh)[:, :, :t, :]
    return unpad(dq), unpad(dk), unpad(dv)


def _xla_banded_attention(q, k, v, band: int, t_real: int | None = None) -> jnp.ndarray:
    """Dense-mask reference path (differentiable; tests compare against it)."""
    from osu_diffusion_tpu.ops.attention import banded_attention_mask, dot_product_attention

    t = q.shape[2]
    mask = banded_attention_mask(t, band)
    if t_real is not None and t_real != t:
        mask = mask & (jnp.arange(t)[None, :] < t_real)
    return dot_product_attention(q, k, v, mask)


def banded_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    band: int, block: int = DEFAULT_BLOCK, matmul_dtype=jnp.bfloat16,
    t_real=None, slim_stats: bool | None = None,
) -> jnp.ndarray:
    """q,k,v: (N, H, T, Dh) -> (N, H, T, Dh), band half-width L (static).

    `t_real`: the real (unpadded) sequence length when the caller already
    padded T — keys (and, in the backward, queries) at index >= t_real are
    masked out. It may be a Python int OR a traced scalar: it rides into the
    kernels as an SMEM operand, so ONE compiled program serves every real
    length within a padded bucket (the Sampler's compile-once-per-bucket
    contract).

    `slim_stats` (None = SLIM_STATS_DEFAULT): store the LSE residual
    sublane-packed (n*h, SUBLANE, t_pad) and derive delta in the backward
    kernels — identical math (exact transposes, same f32 reductions), 16x
    less stat HBM traffic than the lane-broadcast layout and no delta array
    at all. Requires a lane-aligned block: the stat tiles are blocked
    (1, SUBLANE, block) and Mosaic requires the minor block dim to be a
    multiple of 128 (or the full axis)."""
    valid = jnp.asarray(q.shape[2] if t_real is None else t_real, jnp.int32)
    slim = SLIM_STATS_DEFAULT if slim_stats is None else slim_stats
    if slim is None:  # auto: slim wherever Mosaic's lane rule allows it
        slim = block % LANE == 0
    elif slim and block % LANE != 0 and jax.default_backend() != "cpu":
        # Mosaic-only restriction: CPU interpret mode (tests) has no lane rule
        raise ValueError(
            f"slim_stats requires block % {LANE} == 0 (got block={block}): "
            f"the sublane-packed LSE is blocked (1, {SUBLANE}, block) with "
            "block on a lane axis"
        )
    return _banded_flash_vjp(q, k, v, valid, band, block, matmul_dtype, slim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _banded_flash_vjp(q, k, v, valid, band, block, matmul_dtype, slim_stats):
    return _banded_flash_fwd_impl(q, k, v, band, block, matmul_dtype, valid)


def _fwd(q, k, v, valid, band, block, matmul_dtype, slim_stats):
    out, lse = _banded_flash_fwd_impl(
        q, k, v, band, block, matmul_dtype, valid, with_lse=True,
        slim_stats=slim_stats,
    )
    return out, (q, k, v, out, lse, valid)


def _bwd(band, block, matmul_dtype, slim_stats, res, g):
    q, k, v, o, lse, valid = res
    dq, dk, dv = _banded_flash_bwd_impl(
        q, k, v, o, lse, g, band, block, matmul_dtype, valid,
        slim_stats=slim_stats,
    )
    # valid is int32: its cotangent is the symbolic-zero float0
    import numpy as np

    dvalid = np.zeros(valid.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dvalid


_banded_flash_vjp.defvjp(_fwd, _bwd)
