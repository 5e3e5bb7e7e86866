"""Weight-only int8 matmul kernel for serving.

Why a kernel at all: XLA already halves f32 weight traffic by hoisting the
f32→bf16 operand converts out of the denoise-loop scan (loop-invariant code
motion materializes one bf16 copy), but it cannot go below bf16: an int8
tree with an XLA-level `astype(bf16) * scale` would just get LICM-hoisted
into the same bf16 copy, winning nothing. Reading the int8 weights per tile
REQUIRES the dequantization to live inside the matmul's operand pipeline —
which is exactly what this Pallas kernel does: int8 blocks are DMA'd
HBM→VMEM (half the bytes of bf16), upcast in-register, and fed to the MXU,
with the per-output-channel scale, bias, and optionally the MLP's tanh-GELU
folded into the epilogue.

When it pays (measured, PARITY.md "int8 weight-only serving"): the regime
where the weight stream binds, i.e. few tokens per weight byte — batch 2
T=32 sampling is 1.33x f32 with the fused block kernels (adaln_mlp_quant +
int8_modulated_matmul + int8_out_residual: four dispatches per block, every
adaLN elementwise op folded in). At the headline batch-2 T=128 shape the
chain is MXU-bound (~72% of peak) and XLA fully overlaps the hoisted bf16
weight stream with compute, so halving the bytes cannot win; the fused
quant chain measures 0.98x (was 0.89x with one dispatch per projection) —
use f32 there. Rule of thumb on v5e: int8 helps below ~128 tokens per
dispatch (bf16 FLOP:byte ratio ~240).

No reference equivalent (the torch reference serves f32 end-to-end).
Quantization scheme: symmetric per-output-channel int8 (absmax / 127), the
standard near-lossless weight-only recipe for transformer serving.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization.

    w: (..., K, M) float kernel (a leading depth axis is allowed for the
    scanned block layout). Returns (w_q int8 same shape, scale float32
    (..., M)) with w ≈ w_q * scale[..., None, :].
    """
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.round(w / scale[..., None, :]).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def _interp_kwargs(interpret: bool) -> dict:
    """The CPU backend cannot compile Pallas — always interpret there; TPU
    callers may force interpret=True for debugging. Shared by every entry
    point so the backend-keying policy lives in exactly one place."""
    if interpret or jax.default_backend() == "cpu":
        return {"interpret": True}
    return {}


def _block_t_for(t: int, block_t: int) -> int:
    """Clamp the T block to the sublane-aligned real length: padding short
    sequences to a fixed 128-row block multiplies the row work 128/T-fold
    and erases the int8 win exactly in its weight-bound home regime
    (measured 0.78x at T=32 before this clamp)."""
    return min(block_t, -(-t // 16) * 16)


# rows-per-program cap for _batch_block: 512 measured best at dispatch
# batch 32 T=32 (1024 rows fits VMEM but see PARITY "int8 weight-only
# serving" for the A/B); module-level so benchmarks can sweep it
BATCH_BLOCK_MAX_ROWS = 512


def _batch_block(n: int, block_t: int, max_rows: int | None = None) -> int:
    """Batch-block factor c: how many batch rows one program processes.

    The fused kernels' grids walk (batch, T-blocks) with the weight axis
    innermost, so an int8 weight block is re-streamed once per (batch-row,
    T-block) visit — at dispatch batch 32, T=32 that is a 32x redundant
    weight stream, which is why the per-batch-row layout measured 0.51x
    (PARITY.md "int8 weight-only serving", round-4 item 4). Blocking c
    batch rows into one program divides the weight traffic by c (and feeds
    the MXU c*block_t rows per dot). Capped so a block stays a small slice
    of VMEM; c must divide n for even blocks."""
    if max_rows is None:
        max_rows = BATCH_BLOCK_MAX_ROWS
    c = max(1, min(n, max_rows // max(block_t, 1)))
    while n % c:
        c -= 1
    return c


def _modulated_kernel(x_ref, shift_ref, scale_ref, w_ref, s_ref, b_ref, o_ref,
                      *, eps: float, c: int):
    """modulate(LN(x)) @ w_int8 — the attention-side analogue of the fused
    MLP prologue: the non-affine LayerNorm and the adaLN shift/scale fold
    into the int8 qkv projection so the modulated activation never round
    trips through HBM. Processes `c` batch rows per program (see
    _batch_block) with per-row modulation sliced from the whole-array
    shift/scale residents."""
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)  # (C, BT, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    shift = shift_ref[pl.ds(i * c, c), :].astype(jnp.float32)  # (C, D)
    scale = scale_ref[pl.ds(i * c, c), :].astype(jnp.float32)
    h = xn * (1.0 + scale[:, None, :]) + shift[:, None, :]
    hb = h.reshape(-1, h.shape[-1]).astype(jnp.bfloat16)  # (C*BT, D)
    acc = jnp.dot(hb, w_ref[...].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    y = acc * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[...] = y.reshape(o_ref.shape).astype(o_ref.dtype)


def int8_modulated_matmul(x, shift, scale, w_q, s, b, block_t: int = 128,
                          block_m: int = 768, eps: float = 1e-6,
                          interpret: bool = False):
    """(N, T, M) = modulate(LN(x), shift, scale) @ (w_q * s) + b with int8
    w_q. x: (N, T, D); shift/scale: (N, D); s/b: (M,). Serving-only (no
    VJP). Interprets on the CPU backend."""
    n, t, d = x.shape
    k, m = w_q.shape
    assert k == d, (x.shape, w_q.shape)
    bm = _block_of(m, k, block_m)
    block_t = _block_t_for(t, block_t)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        x = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])
    c = _batch_block(n, block_t)
    s2 = s.astype(jnp.float32).reshape(1, m)
    b2 = b.astype(jnp.float32).reshape(1, m)
    grid = (n // c, t_pad // block_t, m // bm)
    kwargs = _interp_kwargs(interpret)
    out = pl.pallas_call(
        functools.partial(_modulated_kernel, eps=eps, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, block_t, d), lambda i, j, q: (i, j, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (N, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec((d, bm), lambda i, j, q: (0, q)),
            pl.BlockSpec((1, bm), lambda i, j, q: (0, q)),
            pl.BlockSpec((1, bm), lambda i, j, q: (0, q)),
        ],
        out_specs=pl.BlockSpec((c, block_t, bm), lambda i, j, q: (i, j, q)),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, m), x.dtype),
        **kwargs,
    )(x, shift, scale, w_q, s2, b2)
    return out[:, :t, :]


def _out_residual_kernel(o_ref, res_ref, gate_ref, w_ref, s_ref, b_ref, y_ref,
                         *, bm: int, c: int):
    """res + gate * (o @ w_int8 * s + b) — the attention out-projection with
    the adaLN gate and the residual add folded into the epilogue. `c` batch
    rows per program (see _batch_block)."""
    i = pl.program_id(0)
    q = pl.program_id(2)
    o = o_ref[...].astype(jnp.bfloat16)  # (C, BT, D)
    ob = o.reshape(-1, o.shape[-1])
    acc = jnp.dot(ob, w_ref[...].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    y = acc * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y = y.reshape(c, -1, bm)
    # gate rides whole as (N, D): slice the batch rows AND this program's
    # output-channel block (bm < d whenever d has no large-enough divisor —
    # DiT-L d=1024 -> bm=512, DiT-XL d=1152 -> bm=384)
    gate = gate_ref[pl.ds(i * c, c), pl.ds(q * bm, bm)].astype(jnp.float32)
    y_ref[...] = (
        res_ref[...].astype(jnp.float32) + gate[:, None, :] * y
    ).astype(y_ref.dtype)


def int8_out_residual(o, res, gate, w_q, s, b, block_t: int = 128,
                      block_m: int = 768, interpret: bool = False):
    """(N, T, D) = res + gate * (o @ (w_q * s) + b) with int8 w_q.
    o/res: (N, T, D); gate: (N, D). Serving-only. Interprets on CPU."""
    n, t, d = o.shape
    k, m = w_q.shape
    assert k == d == m, (o.shape, w_q.shape)
    bm = _block_of(m, k, block_m)
    block_t = _block_t_for(t, block_t)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0)]
        o = jnp.pad(o, pad)
        res = jnp.pad(res, pad)
    c = _batch_block(n, block_t)
    s2 = s.astype(jnp.float32).reshape(1, m)
    b2 = b.astype(jnp.float32).reshape(1, m)
    grid = (n // c, t_pad // block_t, m // bm)
    kwargs = _interp_kwargs(interpret)
    out = pl.pallas_call(
        functools.partial(_out_residual_kernel, bm=bm, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, block_t, d), lambda i, j, q: (i, j, 0)),
            pl.BlockSpec((c, block_t, bm), lambda i, j, q: (i, j, q)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate (N, D)
            pl.BlockSpec((d, bm), lambda i, j, q: (0, q)),
            pl.BlockSpec((1, bm), lambda i, j, q: (0, q)),
            pl.BlockSpec((1, bm), lambda i, j, q: (0, q)),
        ],
        out_specs=pl.BlockSpec((c, block_t, bm), lambda i, j, q: (i, j, q)),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, m), o.dtype),
        **kwargs,
    )(o, res, gate, w_q, s2, b2)
    return out[:, :t, :]


def _gelu_tanh(y: jnp.ndarray) -> jnp.ndarray:
    # GELU-tanh, bit-matching nn.gelu(approximate=True) in f32
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, activation: str | None):
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 upcast in-register
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = acc * s_ref[...] + b_ref[...]
    if activation == "gelu_tanh":
        y = _gelu_tanh(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _block_of(m: int, k: int, want: int) -> int:
    # largest divisor first: fewer grid steps amortize per-step overhead
    # (on-chip sweep: m=2304 bm768 ~16us vs bm384 ~25us); cap the resident
    # int8 weight block (k*bm bytes) to stay well inside VMEM next to the
    # activation block and double buffering
    for cand in (want, 768, 512, 384, 256, 128):
        if cand <= m and m % cand == 0 and k * cand <= (1 << 20):
            return cand
    return m


def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    activation: str | None = None,
    block_r: int = 256,
    block_m: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = activation((x @ (w_q * scale)) + bias), reading w_q as int8.

    x: (..., K) float; w_q: (K, M) int8; scale/bias: (M,) f32.
    Returns (..., M) in `out_dtype` (default x.dtype). The dot runs
    bf16×bf16→f32 on the MXU — the same single-pass precision as the
    XLA default on this hardware — scale/bias/GELU apply in f32.
    """
    if activation not in (None, "gelu_tanh"):
        raise ValueError(f"unknown activation: {activation}")
    k, m = w_q.shape
    lead = x.shape[:-1]
    assert x.shape[-1] == k, (x.shape, w_q.shape)
    r = 1
    for d in lead:
        r *= d
    x2 = x.reshape(r, k)
    out_dtype = out_dtype or x.dtype

    bm = _block_of(m, k, block_m)
    # 16-row alignment covers the bf16 sublane tile (f32 needs only 8)
    br = min(block_r, -(-r // 16) * 16)
    r_pad = -(-r // br) * br
    if r_pad != r:
        x2 = jnp.pad(x2, ((0, r_pad - r), (0, 0)))
    s2 = scale.astype(jnp.float32).reshape(1, m)
    b2 = bias.astype(jnp.float32).reshape(1, m)

    grid = (m // bm, r_pad // br)  # M outer: weight blocks stay resident
    # quant serving has no XLA fallback — interpret on the CPU backend so
    # the CLI works everywhere. Keyed on == "cpu", NOT != "tpu": the real
    # chip must never silently fall into the interpreter (axon registers
    # as "tpu").
    kwargs = _interp_kwargs(interpret)
    out = pl.pallas_call(
        functools.partial(_kernel, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, k), lambda j, i: (i, 0)),
            pl.BlockSpec((k, bm), lambda j, i: (0, j)),
            pl.BlockSpec((1, bm), lambda j, i: (0, j)),
            pl.BlockSpec((1, bm), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((br, bm), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((r_pad, m), out_dtype),
        **kwargs,
    )(x2, w_q, s2, b2)
    return out[:r].reshape(*lead, m)
