"""Checkpointing: orbax trees + PyTorch `.pt` interop.

The reference stores a single torch.save dict {model, ema, opt, scaler, args}
(reference train.py:285-297) and samplers load the "ema" entry
(sample.py:31-36). This framework uses orbax for its own checkpoints and
provides a bidirectional converter so reference checkpoints sample identically
here (the north-star output-parity requirement) and trained params can be
exported back to the torch layout.

Key mapping (torch state_dict -> flax param tree):
    xoc_embedder.mlp.0.{weight,bias}        -> xoc_embedder.proj.{kernel^T,bias}
    xoc_embedder.playfield_size             -> validated constant (512, 384)
    t_embedder.mlp.{0,2}.{weight,bias}      -> t_embedder.{fc1,fc2}
    y_embedder.embedding_table.weight       -> y_embedder.embedding_table.embedding
    blocks.N.attn.in_proj_{weight,bias}     -> blocks_N.attn.qkv_{kernel^T,bias}
    blocks.N.attn.out_proj.{weight,bias}    -> blocks_N.attn.out_{kernel^T,bias}
    blocks.N.mlp.fc{1,2}.{weight,bias}      -> blocks_N.mlp_fc{1,2}
    blocks.N.adaLN_modulation.1.{weight,bias} -> blocks_N.adaLN
    final_layer.linear / .adaLN_modulation.1  -> final_layer.{linear,adaLN}
(torch Linear weights are (out, in); flax kernels are (in, out) — transposed.)
"""
from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def torch_state_dict_to_params(state_dict: dict[str, Any]) -> dict:
    """Torch DiT state_dict (tensors or numpy arrays) -> flax params dict."""
    sd = {k: np.asarray(v) for k, v in _detach_numpy(state_dict).items()}
    params: dict[str, Any] = {}

    params["xoc_embedder"] = {
        "proj": {"kernel": _t(sd["xoc_embedder.mlp.0.weight"]),
                 "bias": sd["xoc_embedder.mlp.0.bias"]}
    }
    if "xoc_embedder.playfield_size" in sd:
        pf = sd["xoc_embedder.playfield_size"]
        if not np.allclose(pf, [512.0, 384.0]):
            raise ValueError(f"unexpected playfield_size in checkpoint: {pf}")
    params["t_embedder"] = {
        "fc1": {"kernel": _t(sd["t_embedder.mlp.0.weight"]),
                "bias": sd["t_embedder.mlp.0.bias"]},
        "fc2": {"kernel": _t(sd["t_embedder.mlp.2.weight"]),
                "bias": sd["t_embedder.mlp.2.bias"]},
    }
    params["y_embedder"] = {
        "embedding_table": {"embedding": sd["y_embedder.embedding_table.weight"]}
    }

    depth = 0
    while f"blocks.{depth}.adaLN_modulation.1.weight" in sd:
        depth += 1
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "attn": {
                "qkv_kernel": _t(sd[p + "attn.in_proj_weight"]),
                "qkv_bias": sd[p + "attn.in_proj_bias"],
                "out_kernel": _t(sd[p + "attn.out_proj.weight"]),
                "out_bias": sd[p + "attn.out_proj.bias"],
            },
            "mlp_fc1": {"kernel": _t(sd[p + "mlp.fc1.weight"]),
                        "bias": sd[p + "mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": _t(sd[p + "mlp.fc2.weight"]),
                        "bias": sd[p + "mlp.fc2.bias"]},
            "adaLN": {"kernel": _t(sd[p + "adaLN_modulation.1.weight"]),
                      "bias": sd[p + "adaLN_modulation.1.bias"]},
        }
    params["final_layer"] = {
        "adaLN": {"kernel": _t(sd["final_layer.adaLN_modulation.1.weight"]),
                  "bias": sd["final_layer.adaLN_modulation.1.bias"]},
        "linear": {"kernel": _t(sd["final_layer.linear.weight"]),
                   "bias": sd["final_layer.linear.bias"]},
    }
    return _to_jnp(params)


def params_to_torch_state_dict(params: dict) -> dict[str, np.ndarray]:
    """Flax params dict -> torch-layout state_dict (numpy arrays).

    Includes the frozen playfield_size parameter the reference model carries
    (models.py:222-225) so round-tripped checkpoints load strictly."""
    p = _detach_numpy(params)
    sd: dict[str, np.ndarray] = {}
    sd["xoc_embedder.mlp.0.weight"] = _t(p["xoc_embedder"]["proj"]["kernel"])
    sd["xoc_embedder.mlp.0.bias"] = np.asarray(p["xoc_embedder"]["proj"]["bias"])
    sd["xoc_embedder.playfield_size"] = np.array([512.0, 384.0], dtype=np.float32)
    sd["t_embedder.mlp.0.weight"] = _t(p["t_embedder"]["fc1"]["kernel"])
    sd["t_embedder.mlp.0.bias"] = np.asarray(p["t_embedder"]["fc1"]["bias"])
    sd["t_embedder.mlp.2.weight"] = _t(p["t_embedder"]["fc2"]["kernel"])
    sd["t_embedder.mlp.2.bias"] = np.asarray(p["t_embedder"]["fc2"]["bias"])
    sd["y_embedder.embedding_table.weight"] = np.asarray(
        p["y_embedder"]["embedding_table"]["embedding"]
    )
    i = 0
    while f"blocks_{i}" in p:
        b = p[f"blocks_{i}"]
        q = f"blocks.{i}."
        sd[q + "attn.in_proj_weight"] = _t(b["attn"]["qkv_kernel"])
        sd[q + "attn.in_proj_bias"] = np.asarray(b["attn"]["qkv_bias"])
        sd[q + "attn.out_proj.weight"] = _t(b["attn"]["out_kernel"])
        sd[q + "attn.out_proj.bias"] = np.asarray(b["attn"]["out_bias"])
        sd[q + "mlp.fc1.weight"] = _t(b["mlp_fc1"]["kernel"])
        sd[q + "mlp.fc1.bias"] = np.asarray(b["mlp_fc1"]["bias"])
        sd[q + "mlp.fc2.weight"] = _t(b["mlp_fc2"]["kernel"])
        sd[q + "mlp.fc2.bias"] = np.asarray(b["mlp_fc2"]["bias"])
        sd[q + "adaLN_modulation.1.weight"] = _t(b["adaLN"]["kernel"])
        sd[q + "adaLN_modulation.1.bias"] = np.asarray(b["adaLN"]["bias"])
        i += 1
    sd["final_layer.adaLN_modulation.1.weight"] = _t(p["final_layer"]["adaLN"]["kernel"])
    sd["final_layer.adaLN_modulation.1.bias"] = np.asarray(p["final_layer"]["adaLN"]["bias"])
    sd["final_layer.linear.weight"] = _t(p["final_layer"]["linear"]["kernel"])
    sd["final_layer.linear.bias"] = np.asarray(p["final_layer"]["linear"]["bias"])
    return sd


def load_torch_checkpoint(ckpt_path: str, prefer_ema: bool = True) -> dict:
    """Load a reference `.pt` checkpoint into a flax params tree.

    Parity with sample.py:31-36: train checkpoints carry {"model","ema",...}
    and the EMA weights are preferred; raw state_dicts load directly.
    """
    import torch  # cpu-only interop dependency

    assert os.path.isfile(ckpt_path), f"Could not find DiT checkpoint at {ckpt_path}"
    checkpoint = torch.load(
        ckpt_path, map_location="cpu", weights_only=False
    )
    if isinstance(checkpoint, dict) and "ema" in checkpoint and prefer_ema:
        checkpoint = checkpoint["ema"]
    elif isinstance(checkpoint, dict) and "model" in checkpoint and not prefer_ema:
        checkpoint = checkpoint["model"]
    return torch_state_dict_to_params(checkpoint)


def _detach_numpy(tree):
    """torch tensors / jnp arrays -> numpy, recursively."""
    if isinstance(tree, dict):
        return {k: _detach_numpy(v) for k, v in tree.items()}
    if hasattr(tree, "detach"):
        return tree.detach().cpu().numpy()
    return np.asarray(tree)


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree, dtype=jnp.float32)
