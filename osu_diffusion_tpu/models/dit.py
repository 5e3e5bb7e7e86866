"""Diffusion Transformer (DiT) with adaLN-Zero conditioning, in flax.linen.

Behavioral parity with reference models.py:21-343 (same math, same init scheme,
same registry models.py:410-431), designed TPU-native:

- Sequence layout is (N, T, C) — channels on the TPU lane axis. The reference's
  (N, C, T) <-> (N, T, C) swapaxes pair (models.py:315-316,324-325) does not
  exist here; callers work in (N, T, C) throughout.
- Attention is a packed-QKV projection + fused banded Pallas flash-attention
  kernel (ops/pallas_attention.py) or an XLA fallback, replacing
  nn.MultiheadAttention + boolean mask (models.py:130-135).
- The label-dropout RNG is an explicit 'label_dropout' flax RNG stream rather
  than global torch RNG state (models.py:56-67).
- `playfield_size` is a compile-time constant; the reference stores it as a
  frozen nn.Parameter (models.py:222-225) which the checkpoint converter
  validates and re-emits.

Parameter init parity (reference models.py:275-304): xavier-uniform for all
linears with zero bias; std-0.02 normals for the first-layer projection, the
timestep-embedder MLP and the label table; ZERO init for every adaLN modulation
and the final linear (adaLN-Zero identity start).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from osu_diffusion_tpu.ops.attention import multi_head_attention
from osu_diffusion_tpu.ops.embeddings import (
    offset_sequence_embedding,
    position_sequence_embedding,
    timestep_embedding,
)

PLAYFIELD = jnp.asarray((512.0, 384.0), dtype=jnp.float32)

xavier = nn.initializers.xavier_uniform()
normal02 = nn.initializers.normal(stddev=0.02)
zeros = nn.initializers.zeros_init()


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation. Parity: models.py:12-13 (shift/scale are (N, D))."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Non-affine LayerNorm: statistics in f32, result in x.dtype.

    Replaces nn.LayerNorm(use_bias=False, use_scale=False) — parameter-free so
    checkpoints are unaffected — because flax promotes to f32 and the promotion
    cascades: with bf16 activations the whole residual stream silently ran in
    f32, doubling every elementwise/reduce/reshape op's HBM traffic (profiled
    at ~25% of the DiT-B train step). Matches torch LayerNorm's two-pass
    variance (reference models.py:136)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class TimestepEmbedder(nn.Module):
    """256-dim sinusoid -> MLP(SiLU) -> hidden. Parity: models.py:21-38."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, kernel_init=normal02, name="fc1")(t_freq)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, kernel_init=normal02, name="fc2")(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout to the null class.

    Parity: models.py:41-74 — table has num_classes+1 rows when dropout_prob>0;
    the null class index is num_classes.
    """

    num_classes: int
    hidden_size: int
    dropout_prob: float

    @staticmethod
    def table_rows(num_classes: int, dropout_prob: float) -> int:
        """Logical rows = num_classes (+1 null class when dropout>0, parity
        models.py:48-52), padded up to a multiple of 16 so the vocab-parallel
        sharding divides evenly on any reasonable mesh (TPU-native addition;
        padded rows are never indexed and receive no gradient)."""
        logical = num_classes + int(dropout_prob > 0)
        return -(-logical // 16) * 16

    @nn.compact
    def __call__(
        self,
        labels: jnp.ndarray,
        train: bool,
        force_drop_ids: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        use_cfg_embedding = self.dropout_prob > 0
        table = nn.Embed(
            self.table_rows(self.num_classes, self.dropout_prob),
            self.hidden_size,
            embedding_init=normal02,
            name="embedding_table",
        )
        if (train and use_cfg_embedding) or (force_drop_ids is not None):
            if force_drop_ids is None:
                rng = self.make_rng("label_dropout")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


class FirstLayer(nn.Module):
    """Input fusion: per-coord 128-dim sincos of x*playfield (256) ⊕ 128-dim
    sincos of o/10 ⊕ context (144) -> Linear to hidden. Parity: models.py:199-235."""

    hidden_size: int
    frequency_embedding_size: int = 128

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, o: jnp.ndarray, c: jnp.ndarray, dtype=None
    ) -> jnp.ndarray:
        # Inputs must arrive at FULL precision: positions/offsets feed
        # high-frequency sincos tables, and quantizing them first (e.g. a bf16
        # input cast: ~2 px position error, up to ~512 ms at offset 1e5)
        # scrambles the top frequency bands. The sincos computes in f32 and
        # only the RESULT drops to the stream dtype.
        dtype = dtype or x.dtype
        x_freq = position_sequence_embedding(
            x.astype(jnp.float32) * PLAYFIELD, self.frequency_embedding_size
        )
        o_freq = offset_sequence_embedding(
            o.astype(jnp.float32) / 10.0, self.frequency_embedding_size
        )
        xoc = jnp.concatenate(
            [x_freq.astype(dtype), o_freq.astype(dtype), c.astype(dtype)],
            axis=-1,
        )
        return nn.Dense(
            self.hidden_size, kernel_init=normal02, name="proj", dtype=dtype
        )(xoc)


class SelfAttention(nn.Module):
    """Packed-QKV multi-head self-attention (torch MultiheadAttention layout:
    packed [q|k|v] projection, models.py:130-135), core in ops.attention."""

    hidden_size: int
    num_heads: int
    attn_layout: str = "packed"
    quant: bool = False
    flash_block: int = 128

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None,
        band: int | None,
        use_pallas: bool,
        valid_len: int | None = None,
        cp_mesh=None,
        cp_axis: str = "model",
        quant_mod: tuple | None = None,
    ) -> jnp.ndarray:
        d = self.hidden_size
        if self.quant:
            if self.attn_layout != "packed":
                raise ValueError(
                    "int8 weight-only serving needs the packed qkv layout "
                    "(the einsum layout reshapes the kernel per head)"
                )
            qkv_kernel = self.param("qkv_kernel_q", int8_zeros, (d, 3 * d))
            qkv_scale = self.param(
                "qkv_scale", nn.initializers.ones, (3 * d,), jnp.float32
            )
            qkv_bias = self.param("qkv_bias", zeros, (3 * d,))
            out_kernel = self.param("out_kernel_q", int8_zeros, (d, d))
            out_scale = self.param(
                "out_scale", nn.initializers.ones, (d,), jnp.float32
            )
            quant_scales = (qkv_scale, out_scale)
        else:
            # declaration order is load-bearing: flax folds a per-scope
            # counter into each param's init rng, so reordering these would
            # silently change every random init (and the golden parity tests)
            qkv_kernel = self.param("qkv_kernel", xavier, (d, 3 * d))
            qkv_bias = self.param("qkv_bias", zeros, (3 * d,))
            out_kernel = self.param("out_kernel", xavier, (d, d))
            quant_scales = None
        out_bias = self.param("out_bias", zeros, (d,))
        return multi_head_attention(
            x, qkv_kernel, qkv_bias, out_kernel, out_bias,
            num_heads=self.num_heads, mask=mask, band=band,
            use_pallas=use_pallas, valid_len=valid_len,
            cp_mesh=cp_mesh, cp_axis=cp_axis, layout=self.attn_layout,
            quant_scales=quant_scales, quant_mod=quant_mod,
            flash_block=self.flash_block,
        )


def int8_zeros(key, shape):
    return jnp.zeros(shape, jnp.int8)


class QuantDenseParams(nn.Module):
    """int8 weight-only parameter holder ({kernel_q, scale, bias}) for the
    serving path (DiTConfig.quant). Values come from
    models.quantize.quantize_params — never trained; the init exists only to
    define the tree structure."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kq = self.param(
            "kernel_q", int8_zeros, (self.features_in, self.features_out)
        )
        s = self.param(
            "scale", nn.initializers.ones, (self.features_out,), jnp.float32
        )
        b = self.param("bias", zeros, (self.features_out,))
        return kq, s, b


class DenseParams(nn.Module):
    """Parameter holder with nn.Dense-compatible tree naming ({kernel, bias}),
    so the fused kernels can consume raw weights while checkpoints stay
    layout-identical to the Dense-based path."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", xavier, (self.features_in, self.features_out))
        b = self.param("bias", zeros, (self.features_out,))
        return k, b


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block. Parity: models.py:122-175.

    adaLN output order: (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
    gate_mlp) — models.py:151-159.

    With use_pallas=True the MLP half runs as the fused adaLN-MLP Pallas kernel
    (ops/pallas_mlp.py) and attention as the banded flash kernel when a band is
    set (ops/pallas_attention.py).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_layout: str = "packed"
    mlp_bwd: str = "xla"
    # which ops use_pallas=True actually fuses ("attn,mlp" / "attn" / "mlp"):
    # at short T the XLA dense attention beats the banded flash kernel (whose
    # win is O(T*band) memory at long T), so mlp-only is the short-T training
    # configuration
    pallas_ops: str = "attn,mlp"
    # int8 weight-only serving (DiTConfig.quant): the block's projections run
    # through the ops/pallas_quant kernel reading int8 weights; the attention
    # CORE (dense or banded flash) is unchanged. With quant, use_pallas
    # selects only the attention core — the quant MLP kernel replaces the
    # fused adaLN-MLP kernel.
    quant: bool = False
    # flash-attention kernel block size (q rows per program AND key-window
    # stride) — the long-T tuning knob (PARITY.md "Long-T flash block sweep")
    flash_block: int = 128

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        band: int | None = None,
        use_pallas: bool = False,
        valid_len: int | None = None,
        cp_mesh=None,
        cp_axis: str = "model",
    ) -> jnp.ndarray:
        # dtype=x.dtype keeps the modulation vectors in the stream dtype (the
        # conditioning vector is f32); without it f32 shift/scale/gate would
        # promote the whole residual stream back to f32
        if self.quant:
            from osu_diffusion_tpu.ops.pallas_quant import int8_matmul

            kq, s, b = QuantDenseParams(
                self.hidden_size, 6 * self.hidden_size, name="adaLN"
            )()
            mod = int8_matmul(nn.silu(cond), kq, s, b, out_dtype=x.dtype)
        else:
            mod = nn.Dense(
                6 * self.hidden_size, kernel_init=zeros, bias_init=zeros,
                name="adaLN", dtype=x.dtype,
            )(nn.silu(cond))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod, 6, axis=-1
        )
        ops = self.pallas_ops.split(",")
        use_pallas_attn = use_pallas and "attn" in ops
        use_pallas_mlp = use_pallas and "mlp" in ops and not self.quant
        if self.quant:
            # fused serving path: x stays the raw residual stream — the
            # LN+modulate prologue and gate+residual epilogue live inside
            # the int8 projection kernels (ops/attention.py quant_mod note)
            x = SelfAttention(
                self.hidden_size, self.num_heads, self.attn_layout,
                self.quant, self.flash_block, name="attn"
            )(
                x, mask, band, use_pallas_attn, valid_len, cp_mesh, cp_axis,
                quant_mod=(shift_msa, scale_msa, gate_msa),
            )
        else:
            h = modulate(layer_norm(x), shift_msa, scale_msa)
            attn = SelfAttention(
                self.hidden_size, self.num_heads, self.attn_layout,
                self.quant, self.flash_block, name="attn"
            )(
                h, mask, band, use_pallas_attn, valid_len, cp_mesh, cp_axis
            )
            x = x + gate_msa[:, None, :] * attn

        mlp_hidden = int(self.hidden_size * self.mlp_ratio)
        if self.quant:
            from osu_diffusion_tpu.ops.pallas_mlp import adaln_mlp_quant

            w1q, s1, b1 = QuantDenseParams(
                self.hidden_size, mlp_hidden, name="mlp_fc1"
            )()
            w2q, s2, b2 = QuantDenseParams(
                mlp_hidden, self.hidden_size, name="mlp_fc2"
            )()
            # one fused int8 kernel for the whole MLP half (LN + modulate +
            # fc1 + GELU + fc2 + gate + residual): at serving shapes the
            # quant path's cost is per-dispatch overhead, not FLOPs — see
            # PARITY.md "int8 weight-only serving"
            return adaln_mlp_quant(
                x, shift_mlp, scale_mlp, gate_mlp, w1q, s1, b1, w2q, s2, b2
            )
        w1, b1 = DenseParams(self.hidden_size, mlp_hidden, name="mlp_fc1")()
        w2, b2 = DenseParams(mlp_hidden, self.hidden_size, name="mlp_fc2")()
        if use_pallas_mlp:
            from osu_diffusion_tpu.ops.pallas_mlp import adaln_mlp

            # mod vectors go in f32: the kernel row-indexes the (N, D) arrays
            # dynamically, and Mosaic cannot prove sublane alignment for bf16
            # (16-row tiles) there; they are tiny and the kernel computes in
            # f32 anyway
            from osu_diffusion_tpu.ops.pallas_mlp import DEFAULT_BLOCK_T

            f32 = jnp.float32
            x = adaln_mlp(
                x, shift_mlp.astype(f32), scale_mlp.astype(f32),
                gate_mlp.astype(f32), w1, b1, w2, b2,
                DEFAULT_BLOCK_T, 1e-6, jnp.bfloat16, self.mlp_bwd,
            )
        else:
            h = modulate(layer_norm(x), shift_mlp, scale_mlp)
            h = jnp.dot(
                h, w1.astype(x.dtype), preferred_element_type=jnp.float32
            ).astype(x.dtype) + b1.astype(x.dtype)
            h = nn.gelu(h, approximate=True)  # GELU-tanh, parity models.py:138
            h = jnp.dot(
                h, w2.astype(x.dtype), preferred_element_type=jnp.float32
            ).astype(x.dtype) + b2.astype(x.dtype)
            x = x + gate_mlp[:, None, :] * h
        return x


class FinalLayer(nn.Module):
    """adaLN (shift/scale) + zero-init linear head. Parity: models.py:178-196."""

    hidden_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            2 * self.hidden_size, kernel_init=zeros, bias_init=zeros,
            name="adaLN", dtype=x.dtype,
        )(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(layer_norm(x), shift, scale)
        # head stays in f32: the eps/variance outputs feed f32 diffusion math
        return nn.Dense(
            self.out_channels, kernel_init=zeros, bias_init=zeros, name="linear"
        )(x)


@flax.struct.dataclass
class DiTConfig:
    in_channels: int = 2
    context_size: int = 144
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    # rematerialize each block in the backward pass: trades ~30% more FLOPs for
    # O(depth) less activation memory — essential for large-batch training on a
    # 16 GB chip (jax.checkpoint; no reference equivalent, torch retains all)
    remat: bool = True
    # scan over the depth axis: one traced/compiled block instead of `depth`
    # unrolled copies — 4.4x faster cold compiles (measured DiT-S sampling:
    # 386s -> 87s) at ~10% runtime cost (XLA loses cross-layer optimization).
    # Params live under "blocks" with a leading (depth, ...) axis; the torch
    # checkpoint converter stacks/unstacks at the boundary. Off by default:
    # runtime (the headline benchmark) wins over compile latency, and the
    # persistent compilation cache amortizes repeat compiles anyway.
    scan_blocks: bool = False
    # attention projection layout: "packed" (one (D,3D) einsum + split +
    # transposes) or "einsum" (per-slice einsums with the head axis produced
    # and merged by the matmuls — no split copies). Numerically identical;
    # checkpoint layout unchanged. Perf experiment vs the profiled
    # qkv-split/transpose residue.
    attn_layout: str = "packed"
    # MLP-kernel backward implementation (use_pallas only): "xla" (plain-jnp
    # backward over the saved residuals — the measured default) or "fused"
    # (Pallas stage-1/stage-2 kernels folding the bias/modulation-gradient
    # reductions + LayerNorm backward into the input-grad matmuls). The fused
    # variant targeted the profiled ~6% reduction residue but measured SLOWER
    # on v5e — DiT-B b256 T=128: 3.60 vs 4.21 steps/s; b16 T=1024 band 128:
    # 92 vs 118 samples/s — Mosaic's transposed-operand matmuls lose more than
    # the saved reduction passes gain (PARITY.md "Fused MLP backward").
    mlp_bwd: str = "xla"
    # which ops use_pallas=True fuses: "attn,mlp" / "attn" / "mlp". At short T
    # XLA dense attention beats the banded flash kernel (whose win is the
    # O(T*band) memory footprint at long T), so "mlp" is the short-T training
    # configuration; the flash kernel earns its keep from T >~ 512.
    pallas_ops: str = "attn,mlp"
    # partial unrolling of the block scan: trace `scan_unroll` blocks per scan
    # iteration — recovers cross-layer XLA optimization (the source of the
    # scan runtime gap) while keeping most of the compile-time win. depth must
    # be divisible by it.
    scan_unroll: int = 1
    # int8 weight-only serving: the blocks' projection weights are stored as
    # symmetric per-output-channel int8 ({kernel_q, scale}) and read as int8
    # by the ops/pallas_quant matmul kernel — half the HBM weight stream of
    # the bf16 copy XLA's loop-invariant hoisting already gives the f32 tree.
    # Inference-only: build the model with quant=True and convert a trained
    # tree with models.quantize.quantize_params. Embedders, label table and
    # the final layer stay full-precision (~2% of weight bytes).
    quant: bool = False
    # flash-attention kernel block size (q rows per program AND key-window
    # stride; ops/pallas_attention.py). Purely a scheduling knob — outputs
    # and gradients are block-independent (tested) — exposed for the long-T
    # banded-training sweep (PARITY.md "Long-T flash block sweep").
    flash_block: int = 128

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels


class DiT(nn.Module):
    """Diffusion Transformer. Parity: models.py:238-343.

    Call convention (channels-last, all batch-leading):
        x: (N, T, C)   noised coordinates
        t: (N,)        diffusion timesteps (original-process indices)
        o: (N, T)      time offsets, milliseconds
        c: (N, T, E)   context (distance embedding ⊕ type one-hots)
        y: (N,)        class labels
    Returns (N, T, out_channels) — eps channels then variance channels.
    """

    config: DiTConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        o: jnp.ndarray,
        c: jnp.ndarray,
        y: jnp.ndarray,
        train: bool = False,
        attn_mask: jnp.ndarray | None = None,
        band: int | None = None,
        use_pallas: bool = False,
        valid_len: int | None = None,
        force_drop_ids: jnp.ndarray | None = None,
        cp_mesh=None,
        cp_axis: str = "model",
        dtype=None,
        delta_mode: str = "off",
        delta_span: tuple[int, int] | None = None,
        delta: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """`dtype`: residual-stream computation dtype (bf16 for training and
        fast serving). Inputs x/o/c stay full-precision — FirstLayer's sincos
        embeddings need them — and the stream drops to `dtype` after.

        Δ-cache acceleration (delta_mode/delta_span/delta): cross-denoise-step
        feature reuse in the style of Δ-DiT (arXiv:2406.01125) / BlockDance
        (arXiv:2503.15927) — adjacent diffusion timesteps produce nearly
        identical middle-block features, so their combined residual
        contribution Δ = x_out(hi-1) - x_in(lo) can be cached on a full step
        and reused on the next. Static modes (each its own compiled trace, no
        reference equivalent):

        - "off" (default): plain forward, returns the output array.
        - "record": run all blocks, also return Δ over the block span
          [lo, hi) as a second output.
        - "apply": run blocks [0, lo), add the caller's `delta` in place of
          blocks [lo, hi), run [hi, depth) — the mid blocks are never
          executed. Returns (out, delta-unchanged) so both modes are
          lax.cond-compatible branches.

        Requires the unrolled block layout (scan_blocks=False): the mid-block
        skip is a static slice of the depth loop."""
        cfg = self.config
        if delta_mode not in ("off", "record", "apply"):
            raise ValueError(f"unknown delta_mode: {delta_mode}")
        if delta_mode != "off":
            assert not cfg.scan_blocks, (
                "delta-cache sampling requires the unrolled block layout "
                "(scan_blocks=False); convert params with "
                "checkpoint.stacked_to_unrolled/restore_params_any"
            )
            assert delta_span is not None
            lo, hi = delta_span
            assert 0 <= lo < hi <= cfg.depth, (delta_span, cfg.depth)
            if delta_mode == "apply":
                assert delta is not None
        x = FirstLayer(cfg.hidden_size, name="xoc_embedder")(x, o, c, dtype=dtype)
        t_emb = TimestepEmbedder(cfg.hidden_size, name="t_embedder")(t)
        y_emb = LabelEmbedder(
            cfg.num_classes, cfg.hidden_size, cfg.class_dropout_prob, name="y_embedder"
        )(y, train, force_drop_ids)
        cond = t_emb + y_emb  # parity: models.py:320

        # band/use_pallas are Python statics (closure); x/cond/mask traced.
        # remat applies in training only — inference never differentiates, so
        # it would just slow tracing there.
        def block_call(mdl, h, cv, m):
            return mdl(h, cv, m, band, use_pallas, valid_len, cp_mesh, cp_axis)

        use_remat = cfg.remat and train

        if cfg.scan_blocks:
            def scan_body(mdl, carry, _):
                return block_call(mdl, carry, cond, attn_mask), None

            target = (
                nn.remat(scan_body, prevent_cse=False) if use_remat else scan_body
            )
            scan = nn.scan(
                target,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.depth,
                unroll=cfg.scan_unroll,
            )
            x, _ = scan(
                DiTBlock(
                    cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                    cfg.attn_layout, cfg.mlp_bwd, cfg.pallas_ops,
                    cfg.quant, cfg.flash_block, name="blocks"
                ),
                x,
                None,
            )
        else:
            run_block = (
                nn.remat(block_call, prevent_cse=False) if use_remat else block_call
            )
            snap = None
            new_delta = delta
            for i in range(cfg.depth):
                if delta_mode == "apply" and lo <= i < hi:
                    if i == lo:
                        x = x + delta.astype(x.dtype)
                    continue  # cached span: blocks_{lo..hi-1} never execute
                if delta_mode == "record" and i == lo:
                    snap = x
                block = DiTBlock(
                    cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                    cfg.attn_layout, cfg.mlp_bwd, cfg.pallas_ops,
                    cfg.quant, cfg.flash_block, name=f"blocks_{i}"
                )
                x = run_block(block, x, cond, attn_mask)
                if delta_mode == "record" and i == hi - 1:
                    new_delta = x - snap
        out = FinalLayer(cfg.hidden_size, cfg.out_channels, name="final_layer")(x, cond)
        if delta_mode != "off":
            return out, new_delta
        return out

    def forward_with_cfg(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        o: jnp.ndarray,
        c: jnp.ndarray,
        y: jnp.ndarray,
        cfg_scale: float,
        attn_mask: jnp.ndarray | None = None,
        band: int | None = None,
        use_pallas: bool = False,
        valid_len: int | None = None,
        cp_mesh=None,
        cp_axis: str = "model",
        dtype=None,
        delta_mode: str = "off",
        delta_span: tuple[int, int] | None = None,
        delta: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Classifier-free-guidance batched forward. Parity: models.py:327-343.

        The batch is [cond | uncond] halves sharing the same first-half x;
        guidance is applied to the eps channels ONLY (reference quirk,
        models.py:338-342). delta_mode/delta_span/delta: Δ-cache passthrough
        (see __call__); the cached Δ covers the CFG-doubled batch.
        """
        cfg = self.config
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self.__call__(
            combined, t, o, c, y, train=False,
            attn_mask=attn_mask, band=band, use_pallas=use_pallas,
            valid_len=valid_len, cp_mesh=cp_mesh, cp_axis=cp_axis, dtype=dtype,
            delta_mode=delta_mode, delta_span=delta_span, delta=delta,
        )
        if delta_mode != "off":
            model_out, new_delta = model_out
        eps, rest = (
            model_out[..., : cfg.in_channels],
            model_out[..., cfg.in_channels :],
        )
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        out = jnp.concatenate([eps, rest], axis=-1)
        if delta_mode != "off":
            return out, new_delta
        return out


def DiT_XL(**kwargs) -> DiT:
    return DiT(DiTConfig(depth=28, hidden_size=1152, num_heads=16, **kwargs))


def DiT_L(**kwargs) -> DiT:
    return DiT(DiTConfig(depth=24, hidden_size=1024, num_heads=16, **kwargs))


def DiT_B(**kwargs) -> DiT:
    return DiT(DiTConfig(depth=12, hidden_size=768, num_heads=12, **kwargs))


def DiT_S(**kwargs) -> DiT:
    return DiT(DiTConfig(depth=12, hidden_size=384, num_heads=6, **kwargs))


# Registry parity: models.py:426-431.
DiT_models: dict[str, Callable[..., DiT]] = {
    "DiT-XL": DiT_XL,
    "DiT-L": DiT_L,
    "DiT-B": DiT_B,
    "DiT-S": DiT_S,
}
