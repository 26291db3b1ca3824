"""Device mesh + sharding helpers for data-parallel training.

The reference has no real multi-device path (single-GPU Lightning,
``scripts/train.py:204-217``; SURVEY §2.9).  Here DP is first-class and
idiomatic: params/opt-state replicated, batch sharded over the ``data``
mesh axis, and XLA's GSPMD inserts the gradient all-reduces over ICI --
no hand-written collectives.  Multi-host extends the same mesh over DCN
via ``jax.distributed.initialize`` (see ``scripts/train.py`` in this
repo).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array with its leading (batch) dim split over ``data``."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
