"""Convert a trained f32 DiT param tree to the int8 weight-only serving tree.

A model built with `DiTConfig.quant=True` declares its block projection
weights as {kernel_q: int8, scale: f32-per-output-channel} (dit.py
QuantDenseParams / SelfAttention quant branch); this module produces that
tree from a normal trained/restored tree. Quantization is symmetric
per-output-channel absmax (ops/pallas_quant.quantize_weight). Everything
outside the blocks — embedders, label table, final layer, and all biases —
is passed through untouched (~2% of the weight bytes).

Works on both depth layouts: unrolled ("blocks_i" modules) and scanned
("blocks" with leaves stacked on a leading depth axis — quantize_weight
reduces over axis -2 either way, giving (depth, M) stacked scales that
nn.scan slices per block).
"""
from __future__ import annotations

from typing import Any

from osu_diffusion_tpu.ops.pallas_quant import quantize_weight


def _quant_block(block: dict) -> dict:
    out: dict[str, Any] = {}
    for name, sub in block.items():
        if "qkv_kernel_q" in sub or "kernel_q" in sub:
            raise ValueError(
                f"block submodule {name!r} is already int8-quantized — "
                "quantize_params takes the full-precision tree (restore "
                "against a non-quant model; see restore_quantized)"
            )
        if name == "attn":
            qq, qs = quantize_weight(sub["qkv_kernel"])
            oq, os_ = quantize_weight(sub["out_kernel"])
            out[name] = {
                "qkv_kernel_q": qq,
                "qkv_scale": qs,
                "qkv_bias": sub["qkv_bias"],
                "out_kernel_q": oq,
                "out_scale": os_,
                "out_bias": sub["out_bias"],
            }
        elif name in ("adaLN", "mlp_fc1", "mlp_fc2"):
            kq, s = quantize_weight(sub["kernel"])
            out[name] = {"kernel_q": kq, "scale": s, "bias": sub["bias"]}
        else:
            raise ValueError(f"unexpected block submodule: {name}")
    return out


def quantize_params(params: dict) -> dict:
    """f32 DiT param tree -> int8 serving tree for DiT(quant=True)."""
    out: dict[str, Any] = {}
    for key, sub in params.items():
        if key == "blocks" or key.startswith("blocks_"):
            out[key] = _quant_block(sub)
        else:
            out[key] = sub
    return out


def restore_quantized(ckpt_path: str, model_ctor, **model_kwargs):
    """(quant model, int8 params) from a full-precision checkpoint.

    Restoring must run against a NON-quant twin (the layout converter needs
    the f32 tree structure), then the tree is quantized — this helper keeps
    the twin's constructor kwargs identical to the quant model's so the two
    trees cannot drift apart. model_ctor is a DiT_models entry (any callable
    accepting the same kwargs plus ``quant``).
    """
    from osu_diffusion_tpu.train.checkpoint import restore_params_any

    qmodel = model_ctor(**model_kwargs, quant=True)
    base = model_ctor(**model_kwargs)
    return qmodel, quantize_params(restore_params_any(ckpt_path, base))
