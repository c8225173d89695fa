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
PIPE_AXIS = "pipe"


def make_mesh(
    dp: int = -1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    pp: int = 1,
) -> Mesh:
    """Build a ``(data, model)`` mesh — or ``(data, pipe, model)`` when
    ``pp > 1``.  ``dp=-1`` uses all remaining devices.

    Axis order encodes ICI locality on a real slice: ``model`` (tensor
    parallel, per-layer all-reduces — the chattiest) innermost, ``pipe``
    (one activation ppermute per tick) next, ``data`` (one gradient
    reduction per step) outermost.  ``pp == 1`` keeps the legacy 2-axis
    mesh so existing shape lookups and tests are unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp <= 0:
        tp = 1
    if pp <= 0:
        pp = 1
    if dp == -1:
        if n % (tp * pp) != 0:
            raise ValueError(f"{n} devices not divisible by tp*pp={tp * pp}")
        dp = n // (tp * pp)
    if dp * tp * pp > n:
        raise ValueError(
            f"mesh {dp}x{pp}x{tp} needs {dp * tp * pp} devices, have {n}"
        )
    if pp == 1:
        grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    grid = np.asarray(devices[: dp * pp * tp]).reshape(dp, pp, tp)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1)


def make_multihost_mesh(dp_per_host: int = -1, tp: int = 1) -> Mesh:
    """Multi-host ("dcn", "ici")-aware mesh.

    DP spans hosts (gradient reduction rides DCN between hosts, ICI within),
    TP stays within a host's ICI domain.  Uses
    ``mesh_utils.create_hybrid_device_mesh`` when multiple processes are
    present; degenerates to :func:`make_mesh` on a single host.
    """
    import jax

    if jax.process_count() == 1:
        return make_mesh(dp=dp_per_host, tp=tp)
    from jax.experimental import mesh_utils

    n_local = jax.local_device_count()
    if dp_per_host == -1:
        dp_per_host = n_local // tp
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp_per_host, tp),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
        return Mesh(devices.reshape(-1, tp), (DATA_AXIS, MODEL_AXIS))
    except ValueError:
        # Devices without slice topology info (e.g. the multi-process CPU
        # simulation — no ``slice_index`` attr): group by process manually.
        # TP groups stay within one process's devices (the ICI-domain
        # analogue); DP stacks process-major so gradient reduction crosses
        # the "DCN" boundary exactly once per ring.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        grid = np.asarray(devs).reshape(jax.process_count() * dp_per_host, tp)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
