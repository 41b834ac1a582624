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
