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


# ---- active product mesh (trace-time) --------------------------------------
#
# The pipeline registers its mesh here before dispatching jitted work so
# pure library code (registration/icp.py) can pin the SOLVER CHAIN to a
# replicated layout at trace time.  Why: the shard-invariance contract
# (tests/test_parallel_mode.py — sharded trajectory ≡ 1-device) demands
# bit-identical gate scalars, and XLA:CPU emits different FMA
# contractions for partitioned vs whole-array elementwise loops (rare
# 1-ulp flips that the iteration-capped ICP amplifies into gate flips;
# docs/multichip.md).  Pinning the small per-frame solver chain
# replicated makes both programs run whole-array code — the heavy map
# search (kNN over the sharded reference axis) stays distributed.
_ACTIVE_MESH: list = [None]
_DETERMINISTIC: list = [False]
_DET_SOLVER: list = [True]


def set_active_mesh(mesh: Optional[Mesh],
                    deterministic: Optional[bool] = None,
                    det_solver: Optional[bool] = None) -> None:
    """Register the product mesh (or None) and the layout-deterministic
    numerics flags.  `deterministic=None` follows the mesh (AUTO).
    `det_solver` additionally gates the SOLVER-CHAIN hardening
    (gauss_newton / residuals barrier+tree-sum paths): the bitwise
    contract leg never executes the solver (registration is disabled
    throughout the contractive init window), so relaxing only the
    solver chain keeps the bitwise leg exact while returning the H/g
    build to XLA's fused einsums — the chaos-envelope leg re-verifies
    the relaxation empirically (tests/test_parallel_mode.py).
    None = harden whenever `deterministic` is active."""
    _ACTIVE_MESH[0] = mesh
    _DETERMINISTIC[0] = (mesh is not None if deterministic is None
                         else bool(deterministic))
    _DET_SOLVER[0] = True if det_solver is None else bool(det_solver)


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH[0]


def det_active() -> bool:
    """Trace-time flag: harden numerics for layout determinism?  On in
    the product mesh mode (and when parallel/deterministic forces it);
    off in the single-chip default, where XLA may fuse and
    FMA-contract freely for speed."""
    return _DETERMINISTIC[0]


def det_solver_active() -> bool:
    """Trace-time flag for the SOLVER-CHAIN hardening (see
    set_active_mesh): on when layout determinism is active AND the
    solver hardening has not been relaxed
    (`parallel/det_solver`)."""
    return _DETERMINISTIC[0] and _DET_SOLVER[0]


def det_barrier(tree):
    """`lax.optimization_barrier` when the solver-chain hardening is
    active, identity otherwise.  Read at TRACE time — callers' traces
    are keyed by a cfg that carries parallel.mesh_devices/
    deterministic/det_solver, and the pipeline re-registers the flags
    before every dispatch.  (Every det_barrier call site is in the
    solver chain — registration/residuals + gauss_newton — so this
    follows det_solver_active.)"""
    if not det_solver_active():
        return tree
    return jax.lax.optimization_barrier(tree)


def pin_replicated(tree):
    """Constrain every array in `tree` to REPLICATED on the active
    product mesh (identity when no mesh is registered).  Call inside
    jit, at trace time."""
    mesh = _ACTIVE_MESH[0]
    if mesh is None:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(a, sh), tree)


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
