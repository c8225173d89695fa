"""Device mesh construction.

The reference is single-GPU with no distributed layer (SURVEY.md §2.2); here
parallelism is first-class: a 2-D ``jax.sharding.Mesh`` with axes

* ``"data"``  — batch (data-parallel) axis; gradients reduce over ICI via the
                collectives XLA inserts for sharded-batch jit.
* ``"model"`` — tensor-parallel axis for the tower weights (attention heads /
                MLP hidden), used when a model doesn't fit or to scale small
                batches.

Multi-host extension: axes can be stacked ("dcn", "ici") by passing an
explicit device array; single-host v5e-8 is the primary target
(BASELINE.json north star).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: int = -1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``dp=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp <= 0:
        tp = 1
    if dp == -1:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
