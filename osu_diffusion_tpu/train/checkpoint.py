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
    blocks.N.attn.in_proj_{weight,bias}     -> blocks.attn.qkv_{kernel^T,bias}[N]
    blocks.N.attn.out_proj.{weight,bias}    -> blocks.attn.out_{kernel^T,bias}[N]
    blocks.N.mlp.fc{1,2}.{weight,bias}      -> blocks.mlp_fc{1,2}[N]
    blocks.N.adaLN_modulation.1.{weight,bias} -> blocks.adaLN[N]
(stacked along a leading depth axis — the nn.scan layout; pass
scan_blocks=False for the unrolled blocks_N scopes)
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


def torch_state_dict_to_params(
    state_dict: dict[str, Any], scan_blocks: bool = False
) -> dict:
    """Torch DiT state_dict (tensors or numpy arrays) -> flax params dict.

    scan_blocks=True stacks the per-block tensors along a leading depth axis
    under a single "blocks" scope (the nn.scan layout); the default False
    emits the unrolled blocks_{i} scopes (the model default)."""
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
    table = sd["y_embedder.embedding_table.weight"]
    # pad vocab rows to the model's multiple-of-16 table (models/dit.py
    # LabelEmbedder.table_rows); padded rows are never indexed
    padded_rows = -(-table.shape[0] // 16) * 16
    if padded_rows != table.shape[0]:
        table = np.concatenate(
            [table, np.zeros((padded_rows - table.shape[0], table.shape[1]),
                             dtype=table.dtype)], axis=0)
    params["y_embedder"] = {"embedding_table": {"embedding": table}}

    depth = 0
    while f"blocks.{depth}.adaLN_modulation.1.weight" in sd:
        depth += 1
    per_block = []
    for i in range(depth):
        p = f"blocks.{i}."
        per_block.append({
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
        })
    if scan_blocks:
        # stacked (depth, ...) leaves under one "blocks" scope (nn.scan layout)
        import jax

        params["blocks"] = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_block)
    else:
        for i, b in enumerate(per_block):
            params[f"blocks_{i}"] = b
    params["final_layer"] = {
        "adaLN": {"kernel": _t(sd["final_layer.adaLN_modulation.1.weight"]),
                  "bias": sd["final_layer.adaLN_modulation.1.bias"]},
        "linear": {"kernel": _t(sd["final_layer.linear.weight"]),
                   "bias": sd["final_layer.linear.bias"]},
    }
    return _to_jnp(params)


def params_to_torch_state_dict(
    params: dict, num_label_rows: int | None = None
) -> dict[str, np.ndarray]:
    """Flax params dict -> torch-layout state_dict (numpy arrays).

    Includes the frozen playfield_size parameter the reference model carries
    (models.py:222-225) so round-tripped checkpoints load strictly.
    `num_label_rows`: logical label-table rows (num_classes + 1); when given,
    the padded vocab rows added by LabelEmbedder.table_rows are sliced off."""
    p = _detach_numpy(params)
    sd: dict[str, np.ndarray] = {}
    sd["xoc_embedder.mlp.0.weight"] = _t(p["xoc_embedder"]["proj"]["kernel"])
    sd["xoc_embedder.mlp.0.bias"] = np.asarray(p["xoc_embedder"]["proj"]["bias"])
    sd["xoc_embedder.playfield_size"] = np.array([512.0, 384.0], dtype=np.float32)
    sd["t_embedder.mlp.0.weight"] = _t(p["t_embedder"]["fc1"]["kernel"])
    sd["t_embedder.mlp.0.bias"] = np.asarray(p["t_embedder"]["fc1"]["bias"])
    sd["t_embedder.mlp.2.weight"] = _t(p["t_embedder"]["fc2"]["kernel"])
    sd["t_embedder.mlp.2.bias"] = np.asarray(p["t_embedder"]["fc2"]["bias"])
    table = np.asarray(p["y_embedder"]["embedding_table"]["embedding"])
    if num_label_rows is not None:
        table = table[:num_label_rows]
    sd["y_embedder.embedding_table.weight"] = table

    def _emit_block(i: int, b: dict) -> None:
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

    if "blocks" in p:
        stacked = p["blocks"]
        depth = np.asarray(stacked["adaLN"]["kernel"]).shape[0]
        import jax

        for i in range(depth):
            _emit_block(i, jax.tree.map(lambda a: np.asarray(a)[i], stacked))
    else:
        i = 0
        while f"blocks_{i}" in p:
            _emit_block(i, p[f"blocks_{i}"])
            i += 1
    sd["final_layer.adaLN_modulation.1.weight"] = _t(p["final_layer"]["adaLN"]["kernel"])
    sd["final_layer.adaLN_modulation.1.bias"] = np.asarray(p["final_layer"]["adaLN"]["bias"])
    sd["final_layer.linear.weight"] = _t(p["final_layer"]["linear"]["kernel"])
    sd["final_layer.linear.bias"] = np.asarray(p["final_layer"]["linear"]["bias"])
    return sd


def load_torch_checkpoint(
    ckpt_path: str, prefer_ema: bool = True, scan_blocks: bool = False
) -> dict:
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
    return torch_state_dict_to_params(checkpoint, scan_blocks=scan_blocks)


def restore_params_any(ckpt_path: str, model) -> dict:
    """Load sampling params from either a reference torch `.pt` file or an
    orbax checkpoint directory saved by save_train_state. EMA weights are
    preferred in both cases (parity: sample.py:34-35)."""
    if os.path.isfile(ckpt_path):
        scan = bool(model is not None and model.config.scan_blocks)
        return load_torch_checkpoint(ckpt_path, prefer_ema=True, scan_blocks=scan)
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    # abstract target from the model so orbax restores with known topology
    target = None
    if model is not None:
        cfg = model.config
        t = 8
        abstract = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, t, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, t)), jnp.zeros((1, t, cfg.context_size)),
                jnp.zeros((1,), jnp.int32),
            )
        )["params"]
    with ocp.StandardCheckpointer() as ckptr:
        if model is not None:
            try:
                return ckptr.restore(
                    os.path.abspath(ckpt_path), {"ema_params": abstract}
                )["ema_params"]
            except (ValueError, KeyError, TypeError) as e:
                # expected when the checkpoint tree doesn't match the target
                # (e.g. a full train state vs. bare params); fall back to an
                # untyped restore but validate the result below — a silent
                # wrong-layout tree must not escape (e.g. scan_blocks model
                # vs unrolled checkpoint)
                import logging

                logging.getLogger(__name__).warning(
                    "targeted orbax restore failed (%s); trying untyped restore", e
                )
        # metadata-driven restore: rebuild the on-disk tree as backend-
        # agnostic ShapeDtypeStruct targets. This is what makes train-state
        # checkpoints loadable on ANY backend: the untyped restore below
        # materializes every leaf on the device it was SAVED on, so a
        # TPU-written checkpoint would fail to load for CPU-side sampling
        # ("Device TPU v5 lite0 was not found"). Restoring opt_state too is
        # wasted IO, but StandardCheckpointer has no partial restore
        # (PLACEHOLDER is a PyTreeCheckpointHandler feature).
        restored = None
        try:
            meta = ckptr.metadata(os.path.abspath(ckpt_path))
            tree = getattr(getattr(meta, "item_metadata", None), "tree", None)
            if isinstance(tree, dict) and ("ema_params" in tree or "params" in tree):
                dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
                target = jax.tree.map(
                    lambda mm: jax.ShapeDtypeStruct(mm.shape, mm.dtype, sharding=dev),
                    tree,
                )
                restored = ckptr.restore(os.path.abspath(ckpt_path), target)
        except Exception as e:  # version-specific metadata shapes — fall back
            import logging

            logging.getLogger(__name__).warning(
                "metadata-driven orbax restore failed (%s); untyped restore", e
            )
            restored = None
        if restored is None:
            restored = ckptr.restore(os.path.abspath(ckpt_path))
    if "ema_params" in restored:
        restored = restored["ema_params"]
    elif "params" in restored:
        restored = restored["params"]
    if model is not None:
        got = jax.tree_util.tree_structure(restored)
        want = jax.tree_util.tree_structure(abstract)
        if got != want:
            # checkpoint saved in the other block layout (the trainer defaults
            # unrolled, the sample CLI defaults scan): convert in-memory
            converted = convert_block_layout(
                restored, to_scan=model.config.scan_blocks
            )
            if converted is not None and (
                jax.tree_util.tree_structure(converted) == want
            ):
                import logging

                logging.getLogger(__name__).info(
                    "converted checkpoint block layout to scan_blocks=%s",
                    model.config.scan_blocks,
                )
                return converted
            raise ValueError(
                f"checkpoint at {ckpt_path} does not match the model's param "
                f"layout (scan_blocks={model.config.scan_blocks}); "
                f"restored structure {got} != expected {want}"
            )
    return restored


def convert_block_layout(params: dict, to_scan: bool):
    """Convert a params tree between the unrolled (blocks_N scopes) and the
    nn.scan (one "blocks" scope, leading depth axis) layouts. Returns None if
    the tree is not in the opposite layout."""
    import jax
    import numpy as np

    has_scan = "blocks" in params
    has_unrolled = "blocks_0" in params
    p = dict(params)
    if to_scan and has_unrolled:
        depth = 0
        while f"blocks_{depth}" in p:
            depth += 1
        per_block = [p.pop(f"blocks_{i}") for i in range(depth)]
        p["blocks"] = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *per_block
        )
        return p
    if not to_scan and has_scan:
        stacked = p.pop("blocks")
        depth = np.asarray(
            jax.tree_util.tree_leaves(stacked)[0]
        ).shape[0]
        for i in range(depth):
            p[f"blocks_{i}"] = jax.tree.map(lambda a: np.asarray(a)[i], stacked)
        return p
    return None


# ---------------------------------------------------------------------------
# orbax-native checkpoints (replaces torch.save dicts, reference train.py:285-297)
# ---------------------------------------------------------------------------


def save_train_state(ckpt_dir: str, state, step: int) -> str:
    """Save {params, ema, opt_state, step} under ckpt_dir/<step> (orbax)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"{step:07d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "step": state.step,
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
        })
    return path


def restore_train_state(path: str, abstract_state):
    """Restore a TrainState saved by save_train_state; `abstract_state` is a
    matching TrainState (e.g. freshly initialized) providing shapes/shardings."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), {
            "step": abstract_state.step,
            "params": abstract_state.params,
            "ema_params": abstract_state.ema_params,
            "opt_state": abstract_state.opt_state,
        })
    return type(abstract_state)(
        step=restored["step"],
        params=restored["params"],
        ema_params=restored["ema_params"],
        opt_state=restored["opt_state"],
    )


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest step directory, for auto-resume (replaces the reference's
    fixed-path restart loop, train.sh:30-37)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=int))


def save_torch_compatible(
    path: str, state, args: dict | None = None,
    num_label_rows: int | None = None,
) -> None:
    """Export {model, ema} in the reference torch layout so reference tooling
    can consume checkpoints trained here.

    `num_label_rows`: logical label-table rows (num_classes + 1). Pass it so
    the vocab-parallel padding rows are sliced off — the reference model's
    strict load rejects a padded (multiple-of-16) table."""
    import torch

    # np.array (not ascontiguousarray): jax exports non-writable views, and
    # torch.from_numpy warns on them — an owning copy is required either way
    torch_sd = {
        k: torch.from_numpy(np.array(v))
        for k, v in params_to_torch_state_dict(
            state.params, num_label_rows=num_label_rows
        ).items()
    }
    torch_ema = {
        k: torch.from_numpy(np.array(v))
        for k, v in params_to_torch_state_dict(
            state.ema_params, num_label_rows=num_label_rows
        ).items()
    }
    torch.save(
        {"model": torch_sd, "ema": torch_ema, "args": args or {}}, path
    )


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
