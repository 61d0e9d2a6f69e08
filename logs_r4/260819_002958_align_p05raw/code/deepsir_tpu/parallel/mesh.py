"""Device-mesh construction and sharding helpers.

All-new design — the reference is strictly single-process, single-GPU
(/root/reference/train.py:28-32; no torch.distributed anywhere, SURVEY.md
§2.5). The TPU framework scales along two mesh axes:

  * ``data``  — data parallelism over registration pairs (the batch dim).
    Gradients are combined by XLA-inserted collectives riding ICI.
  * ``model`` — point-dimension sharding of the reference cloud for very
    large clouds (see parallel/matching.py): each device owns a slice of the
    ref points and correspondence search reduces running argmins across the
    axis, ring-attention style.

Meshes are built over whatever devices JAX exposes: real TPU chips on
hardware, or virtual CPU devices under
``--xla_force_host_platform_device_count`` in tests and dry runs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: int = -1, num_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2D (data, model) mesh.

    num_data == -1 takes every device not claimed by the model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_model < 1:
        num_model = 1
    if num_data == -1:
        num_data = n // num_model
    assert num_data * num_model <= n, (
        f"mesh {num_data}x{num_model} needs more than the {n} visible devices")
    grid = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
