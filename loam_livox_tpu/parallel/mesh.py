"""Device mesh setup.

One 1-D mesh axis ("shard") covers this workload: the parallel
dimension is the point/residual set (SURVEY.md §5.7 — the
sequence-parallelism analogue).  Pose state is 7 scalars; there is
nothing to tensor- or pipeline-parallelize.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = SHARD_AXIS) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Multi-host runtime init (`jax.distributed.initialize`) + global
    mesh over all hosts' devices — the replacement for the reference's
    "distributed backend" (ROS pub/sub on one machine, SURVEY.md §5.8).
    On a managed TPU pod slice all arguments auto-detect; pass them
    explicitly for manual clusters."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return make_mesh()
