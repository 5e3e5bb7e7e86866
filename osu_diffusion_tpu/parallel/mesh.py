"""Device mesh construction.

Replaces the reference's process-group plumbing (torch.distributed
init_process_group / DDP, reference train.py:106,152) with a single-controller
`jax.sharding.Mesh` over ("data", "model"):

- "data"  — batch (data-parallel) axis; gradient reduction is inferred by the
  pjit partitioner (the DDP all-reduce equivalent), riding ICI.
- "model" — tensor-parallel axis for the MLP blocks and the 52k-row style
  embedding table (capability the reference lacks; SURVEY.md §2 parallelism
  table).

Multi-host: call jax.distributed.initialize() before building the mesh; the
same code then spans hosts with DCN between slices.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Mesh over all (or given) devices, shaped (data, model)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % num_model != 0:
        raise ValueError(f"{n} devices not divisible by model={num_model}")
    arr = np.asarray(devices).reshape(n // num_model, num_model)
    return Mesh(arr, axis_names=("data", "model"))
