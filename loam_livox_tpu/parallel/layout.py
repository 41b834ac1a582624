"""Product sharding layout of the odometry pipeline state.

This is the framework's intended multi-chip layout (SURVEY.md §5.7 /
§5.8 — the "sequence parallel" analogue for this workload): POINT /
CELL / BUCKET axes shard over the 1-D device mesh — the kNN reference
set, residual set, and cell directory are distributed, and J^T J /
top-k reductions cross the mesh as XLA collectives under GSPMD — while
the pose, scalars, and the history WINDOW axis (a time axis) replicate.
Capacity-1 placeholder structures (a matching mode's disabled maps)
carry no work and replicate.

Used by the production pipeline (`runtime.pipeline.OdometryPipeline`
when ``parallel.mesh_devices > 1``), by the driver's multichip dryrun
(`__graft_entry__.dryrun_multichip`), and by the scaling harness.

The reference has no analogue: its only process boundary is ROS pub/sub
on one machine (``package.xml:22-39``); this layout is the new
capability BASELINE.md requires.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import FeatureFrame, PointBatch
from ..map.cell_map import CellMap
from ..ops.bucket_grid import BucketGrid
from .mesh import SHARD_AXIS

REPLICATED = P()


def _ax(n: int, n_devices: int, axis: str):
    """The shardable-axis name, or None for placeholder/indivisible axes."""
    return axis if (n > 1 and n % n_devices == 0) else None


def batch_pspecs(b: PointBatch, n_devices: int,
                 axis: str = SHARD_AXIS) -> PointBatch:
    """PointBatch: shard the point axis."""
    a = _ax(b.xyz.shape[0], n_devices, axis)
    return PointBatch(xyz=P(a, None), time=P(a), mask=P(a))


def cell_map_pspecs(m: CellMap, n_devices: int,
                    axis: str = SHARD_AXIS) -> CellMap:
    """CellMap: shard the cell directory axis."""
    a = _ax(m.keys.shape[0], n_devices, axis)
    return CellMap(cell_size=REPLICATED, keys=P(a), count=P(a),
                   sum_p=P(a, None), sum_pp=P(a, None, None),
                   pts=P(a, None, None), last_update_frame=P(a),
                   create_frame=P(a), frame_idx=REPLICATED)


def bucket_grid_pspecs(g: BucketGrid, n_devices: int,
                       axis: str = SHARD_AXIS) -> BucketGrid:
    """BucketGrid: shard the bucket axis."""
    a = _ax(g.keys.shape[0], n_devices, axis)
    return BucketGrid(bucket_size=REPLICATED, keys=P(a),
                      pts=P(a, None, None), src_idx=P(a, None),
                      slot_mask=P(a, None))


def state_pspecs(state, n_devices: int, axis: str = SHARD_AXIS):
    """Explicit PartitionSpec per `OdometryState` field (see module
    docstring for the layout rationale)."""
    R = REPLICATED
    ch = _ax(state.hist_corner_xyz.shape[1], n_devices, axis)
    sh = _ax(state.hist_surf_xyz.shape[1], n_devices, axis)
    return state._replace(
        q_w=R, t_w=R, frame_count=R,
        # history: leading axis is the sliding time WINDOW — replicate
        # it, shard the per-frame point axis
        hist_corner_xyz=P(None, ch, None),
        hist_corner_mask=P(None, ch),
        hist_surf_xyz=P(None, sh, None),
        hist_surf_mask=P(None, sh),
        hist_ptr=R, hist_len=R,
        last_his_q=R, last_his_t=R, last_q_incre=R, last_t_incre=R,
        cell_corners=cell_map_pspecs(state.cell_corners, n_devices, axis),
        cell_planes=cell_map_pspecs(state.cell_planes, n_devices, axis),
        cell_full=cell_map_pspecs(state.cell_full, n_devices, axis),
        last_touched=P(_ax(state.last_touched.shape[0], n_devices, axis)),
        map_corners=batch_pspecs(state.map_corners, n_devices, axis),
        map_surface=batch_pspecs(state.map_surface, n_devices, axis),
        grid_corners=bucket_grid_pspecs(state.grid_corners, n_devices, axis),
        grid_surface=bucket_grid_pspecs(state.grid_surface, n_devices, axis),
        rng=R,
    )


def frame_pspecs(frame: FeatureFrame, n_devices: int,
                 axis: str = SHARD_AXIS) -> FeatureFrame:
    """FeatureFrame: the residual/query point axes shard (the per-step
    work set); scalars replicate."""
    return FeatureFrame(
        corners=batch_pspecs(frame.corners, n_devices, axis),
        surface=batch_pspecs(frame.surface, n_devices, axis),
        full=batch_pspecs(frame.full, n_devices, axis),
        time_min=REPLICATED, time_max=REPLICATED,
    )


def shard_tree(tree, spec_tree, mesh: Mesh):
    """device_put every leaf with its NamedSharding from `spec_tree`."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        tree, spec_tree,
        is_leaf=lambda x: isinstance(x, P))


def shard_state(state, mesh: Mesh, axis: str = SHARD_AXIS):
    """Place an `OdometryState` on the mesh with the product layout."""
    n = mesh.shape[axis]
    return shard_tree(state, state_pspecs(state, n, axis), mesh)


def shard_frame(frame: FeatureFrame, mesh: Mesh, axis: str = SHARD_AXIS):
    """Place a `FeatureFrame` on the mesh with the product layout."""
    n = mesh.shape[axis]
    return shard_tree(frame, frame_pspecs(frame, n, axis), mesh)


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated on the mesh (raw sensor inputs)."""
    sh = NamedSharding(mesh, REPLICATED)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), tree)
