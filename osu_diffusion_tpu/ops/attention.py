"""Multi-head attention with optional banded (local) masking.

The reference uses torch.nn.MultiheadAttention with a boolean (T, T) mask where
True = blocked (models.py:130-135,164-170); the mask is built at sample time
(sample.py:82-84) so a model trained at T=128 can sample arbitrary lengths.

TPU-native design: the band is *structure*, not data — a Pallas block-local
flash-attention kernel (ops/pallas_attention.py) skips fully-masked key blocks
entirely. This module holds the XLA reference path (used on CPU/tests and as a
fallback) plus the mask construction, with the exact reference band semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def banded_attention_mask(seq_len: int, half_width: int) -> jnp.ndarray:
    """Boolean (T, T) mask, True = attention ALLOWED.

    Exact parity with the reference loop (sample.py:82-84):
        for i: attn_mask[max(0, i-L) : min(T, i+L), i] = False   # False = allowed
    which allows query q to attend key k iff  q - L < k <= q + L.

    Note the polarity is inverted relative to torch (we use True=allowed, the
    jnp.where convention), and the band is deliberately asymmetric by one.
    """
    q = jnp.arange(seq_len)[:, None]
    k = jnp.arange(seq_len)[None, :]
    return (k > q - half_width) & (k <= q + half_width)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention. q,k,v: (N, H, T, Dh); mask (T, T) True=allowed."""
    dh = q.shape[-1]
    scores = jnp.einsum(
        "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
        scores = jnp.where(mask, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", probs, v, preferred_element_type=jnp.float32).astype(v.dtype)


def multi_head_attention(
    x: jnp.ndarray,
    qkv_kernel: jnp.ndarray,
    qkv_bias: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
    num_heads: int,
    mask: jnp.ndarray | None = None,
    band: int | None = None,
    use_pallas: bool = False,
    valid_len: int | None = None,
    cp_mesh=None,
    cp_axis: str = "model",
    layout: str = "packed",
    quant_scales: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    quant_mod: tuple | None = None,
    flash_block: int = 128,
) -> jnp.ndarray:
    """Self-attention over x (N, T, D) with packed qkv projection.

    qkv_kernel: (D, 3D) packed [q|k|v] along the output axis — same packing as
    torch MultiheadAttention's in_proj (transposed), easing checkpoint conversion.

    `layout`: "packed" (default) = one (D, 3D) einsum then split + per-tensor
    head transposes; "einsum" = three (D, H, Dh) einsums producing (N, H, T,
    Dh) directly and an output einsum contracting (H, Dh) — no split copies,
    every transpose folded into a matmul. Numerically identical (tested); a
    perf experiment against the profiled qkv-split/transpose residue
    (PARITY.md MFU ceiling notes).

    If `band` is given and `use_pallas`, dispatch to the fused block-local Pallas
    kernel (TPU); otherwise apply the dense mask through XLA.

    `valid_len`: real (unpadded) sequence length when T was pre-padded (e.g. by
    the Sampler's length bucketing); keys at index >= valid_len are masked out.

    `cp_mesh`/`cp_axis`: context parallelism — shard the sequence axis over the
    given mesh axis with neighbor halo exchange (parallel/context.py); requires
    `band` and T divisible by axis_size * 128. Capability beyond the reference
    (whose banded mask is single-device, sample.py:82-84).
    """
    n, t, d = x.shape
    dh = d // num_heads
    # cast weights to the stream dtype at use (f32 master params): bf16
    # operands keep every cotangent/elementwise op in bf16 instead of f32
    if quant_scales is not None:
        # int8 weight-only serving: qkv_kernel/out_kernel are int8 with
        # per-output-channel scales; the projections run through Pallas
        # kernels that read them as int8 from HBM (ops/pallas_quant.py). The
        # attention CORE below is unchanged — quant composes with the dense
        # mask, the banded flash kernel, and context parallelism alike.
        # With quant_mod=(shift, scale, gate), x is the RAW residual stream:
        # the adaLN LN+modulate folds into the qkv kernel's prologue and the
        # gate+residual into the out-projection's epilogue, so the modulated
        # activations never round trip through HBM (one dispatch each side).
        from osu_diffusion_tpu.ops.pallas_quant import (
            int8_matmul,
            int8_modulated_matmul,
            int8_out_residual,
        )

        assert layout == "packed", "int8 serving uses the packed qkv layout"
        qkv_scale, out_scale = quant_scales
        if quant_mod is not None:
            mod_shift, mod_scale, mod_gate = quant_mod
            qkv = int8_modulated_matmul(
                x, mod_shift, mod_scale, qkv_kernel, qkv_scale, qkv_bias
            )
        else:
            # quant without quant_mod (plain projections, no folded adaLN)
            # is not reachable from DiTBlock — it exists for direct callers
            # of this op (kernel-level tests, non-DiT uses); the fused
            # branch above is the maintained production path
            qkv = int8_matmul(
                x, qkv_kernel, qkv_scale, qkv_bias, out_dtype=x.dtype
            )
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(n, t, num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
    elif layout == "einsum":
        # three per-slice einsums, head axis produced by the matmul itself
        w3 = qkv_kernel.astype(x.dtype).reshape(d, 3, num_heads, dh)
        b3 = qkv_bias.astype(x.dtype).reshape(3, num_heads, 1, dh)
        q, k, v = (
            jnp.einsum(
                "ntd,dhc->nhtc", x, w3[:, s],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype) + b3[s]
            for s in range(3)
        )
    else:
        qkv = jnp.einsum(
            "ntd,de->nte", x, qkv_kernel.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + qkv_bias.astype(x.dtype)
        # split + per-tensor head transposes; measured FASTER (78.3% vs 73.8%
        # train MFU) than a fused (n,t,3,H,dh)->(3,n,H,t,dh) transpose, which
        # forces a worse intermediate layout
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(n, t, num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

    if cp_mesh is not None:
        from osu_diffusion_tpu.parallel.context import (
            context_parallel_banded_attention,
        )

        assert band is not None, "context parallelism requires a band"
        o = context_parallel_banded_attention(
            q, k, v, band, cp_mesh, axis=cp_axis, block=flash_block,
            use_pallas=use_pallas, valid_len=valid_len,
        )
    elif use_pallas and band is not None:
        from osu_diffusion_tpu.ops.pallas_attention import banded_flash_attention

        o = banded_flash_attention(
            q, k, v, band, block=flash_block, t_real=valid_len
        )
    else:
        if mask is None and band is not None:
            mask = banded_attention_mask(t, band)
        if valid_len is not None:
            # valid_len may be a TRACED scalar (the Sampler passes it as a
            # runtime argument so one compiled program serves every real
            # length in a bucket) — no Python comparison against t here
            key_valid = jnp.arange(t)[None, :] < valid_len
            mask = key_valid if mask is None else mask & key_valid
        o = dot_product_attention(q, k, v, mask)

    if layout == "einsum":
        # head-merge transpose folded into the output projection
        wo = out_kernel.astype(x.dtype).reshape(num_heads, dh, d)
        return jnp.einsum(
            "nhtc,hcd->ntd", o, wo, preferred_element_type=jnp.float32
        ).astype(x.dtype) + out_bias.astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(n, t, d)
    if quant_scales is not None:
        if quant_mod is not None:
            # x here is the raw residual (see the quant_mod note above)
            return int8_out_residual(
                o, x, mod_gate, out_kernel, out_scale, out_bias
            )
        return int8_matmul(o, out_kernel, out_scale, out_bias, out_dtype=x.dtype)
    return jnp.einsum(
        "ntd,de->nte", o, out_kernel.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + out_bias.astype(x.dtype)
