"""Device mesh + sharding helpers.

The model is ~5K parameters, so the entire distributed story is data
parallelism over reads/sites (SURVEY.md §2.2): weights replicated, the flat
read axis of each batch sharded across a 1-D ``dp`` mesh, and XLA inserts the
(one) psum needed by the segment reductions.  Multi-host runs call
``jax.distributed.initialize`` first and shard the *site index* across hosts
(each host featurizes and feeds its own shard; results are merged host-side
as CSV shards, matching the reference's append-only CSV contract).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def read_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (flat read) axis across the dp mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Replicate the (tiny) parameter tree on every device."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def host_shard_bounds(n_items: int, n_hosts: int, host_id: int):
    """Contiguous [start, end) slice of a global site index for this host."""
    per = -(-n_items // n_hosts)
    start = min(host_id * per, n_items)
    return start, min(start + per, n_items)
