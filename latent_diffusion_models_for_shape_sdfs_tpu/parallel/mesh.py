"""Device-mesh construction and sharding specs (SURVEY.md s2.3, s5.8).

One named axis, `data`, carries every parallel dimension this workload has:
the (scene, point) training batch, the DDIM sample batch, and the flattened
grid-query axis — all embarrassingly data-parallel. Collectives (grad psum)
are emitted by XLA from sharding annotations; there is no hand-written
communication layer, by design: on TPU the runtime owns ICI transport.

The axis layout deliberately leaves room for a two-level ('dcn', 'ici')
mesh for multi-slice scale-out (jax.distributed.initialize); single-slice
v4-8 / v5e-8 needs only the flat 'data' axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first n available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2level(n_slices: int, per_slice: int,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Two-level ('dcn', 'ici') mesh for multi-slice scale-out
    (SURVEY.md s5.8): DP over both levels, with gradient psums riding ICI
    within a slice and DCN across slices. Single-slice runs use
    `make_mesh`; multi-host additionally needs jax.distributed.initialize
    before device enumeration."""
    if devices is None:
        devices = jax.devices()
    need = n_slices * per_slice
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_slices, per_slice)
    return Mesh(arr, ("dcn", DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int = 1,
                  axis: int = 0) -> NamedSharding:
    """Shard dim `axis` of an ndim-array over ALL mesh axes.

    On the flat ('data',) mesh this is plain batch-DP; on the two-level
    ('dcn', 'data') mesh the batch splits across both levels so each slice
    sees distinct data and gradient psums ride ICI within a slice and DCN
    across (SURVEY.md s5.8)."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names
    return NamedSharding(mesh, P(*spec))
