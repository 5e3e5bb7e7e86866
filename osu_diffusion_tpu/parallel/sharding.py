"""Parameter and batch sharding rules.

Megatron-style tensor parallelism over the "model" mesh axis where it pays:
- DiT MLP: fc1 kernel column-sharded, fc2 kernel row-sharded — the activation
  stays sharded through the GELU and one psum (inferred by GSPMD) finishes fc2.
- Style embedding table (num_classes+1 = 52,671 rows × hidden): row-sharded
  (vocab-parallel) — the single biggest parameter tensor in the model
  (reference models.py:49-52).
- adaLN modulation heads: column-sharded (their outputs are elementwise
  consumers, cheap to re-gather).
Attention projections stay replicated: at hidden ≤ 1152 their FLOP share is
small and packed-qkv head sharding would force awkward collectives.

Everything not matched is replicated over "model" and all params are replicated
over "data" (pure DP on that axis, parity with the reference's DDP,
train.py:152).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_spec(path: tuple[str, ...], value: Any) -> P:
    """PartitionSpec for one parameter, keyed on its flax path.

    Axis positions are taken from the END of the shape so the rules work for
    both unrolled (in, out) kernels and nn.scan-stacked (depth, in, out) ones.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    ndim = getattr(value, "ndim", len(getattr(value, "shape", ())))

    def spec_at(axis_from_end: int) -> P:
        axes = [None] * ndim
        axes[ndim - 1 - axis_from_end] = "model"
        return P(*axes)

    if "embedding_table" in joined and names[-1] == "embedding":
        return P("model", None)
    if names[-1] == "kernel":
        if "mlp_fc1" in joined or "adaLN" in joined:
            return spec_at(0)  # column (output) shard
        if "mlp_fc2" in joined:
            return spec_at(1)  # row (input) shard
    if names[-1] == "bias":
        if "mlp_fc1" in joined or "adaLN" in joined:
            return spec_at(0)
    return P()


def params_pspec_tree(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, v: param_partition_spec(path, v), params
    )


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Downgrade sharded axes whose dimension doesn't divide the mesh axis
    (e.g. the 52,671-row embedding table on a model axis that doesn't divide
    it) to replication — device_put requires even shards."""
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis]
        out.append(axis if dim % size == 0 else None)
    return P(*out)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh according to the rules."""
    specs = params_pspec_tree(params)
    return jax.tree.map(
        lambda v, s: jax.device_put(
            v, NamedSharding(mesh, _fit_spec(s, v.shape, mesh))
        ),
        params,
        specs,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis over "data" (DDP input sharding equivalent,
    reference train.py:164-170)."""
    return NamedSharding(mesh, P("data"))
