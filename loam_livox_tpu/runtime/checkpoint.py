"""Checkpoint / resume of the odometry state — the TPU-native
counterpart of the reference's "maps saving and reload" (reference:
``Points_cloud_map::save_to_file`` / ``load_mapping_from_file``,
``cell_map_keyframe.hpp:818-960``; README.md:9).

Two formats:

* **orbax** array checkpoint of the full `OdometryState` pytree —
  byte-exact resume of pose, history, cell maps, and matching buffer
  (the TPU-native path; use for crash recovery / session splits),
* the reference-compatible **JSON cell map** via `io.serialization`
  for interop (`export_reference_map`).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from .odometry import OdometryState, init_state


def save_state(state: OdometryState, path: str) -> None:
    """Write an orbax checkpoint of the state pytree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def load_state(path: str, cfg) -> OdometryState:
    """Restore a state checkpoint; `cfg` must match the capacities the
    checkpoint was written with (shapes are validated)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = jax.device_get(init_state(cfg))
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=template)
    ref = init_state(cfg)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(ref)):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"checkpoint shape {np.shape(a)} != config shape "
                f"{np.shape(b)} — capacities differ")
    return jax.tree_util.tree_map(
        lambda a, b: jax.device_put(np.asarray(a).astype(b.dtype)),
        restored, ref)


def export_reference_map(state: OdometryState, path: str) -> int:
    """Dump the plane cell map in the reference's JSON schema."""
    from ..io.serialization import save_cell_map_json

    return save_cell_map_json(state.cell_planes, path)


# ---- loop-service checkpointing --------------------------------------------
#
# The reference persists keyframes to JSON as the run goes
# (``laser_mapping.hpp:972-977`` if_dump_keyframe_data) and can refine
# offline purely from disk (``ceres_pose_graph_3d.hpp:540-583``) — so a
# restarted reference process still has every keyframe's cloud on disk.
# The TPU runtime's analogue: serialize the `LoopCloser`'s host state
# (completed keyframes with descriptors + era snapshots, the open
# accumulator cursors, the waiting list, the one-shot flag/result) so a
# resumed run can still close a loop whose first visit predates the
# checkpoint.

def save_loop_state(closer, path: str) -> None:
    """Write the `LoopCloser` host state to `<path>` (one .npz file)."""
    import io as _io
    import json as _json

    arrays = {}
    meta = {"closed": closer.closed,
            "dropped_keyframes": closer.dropped_keyframes,
            "pair_idx": closer._pair_idx,
            "n_keyframes": len(closer.keyframes),
            "n_waiting": len(closer.waiting),
            "updating": [{"frames": acc.frames} for acc in closer.updating],
            "result": None}
    if closer.result is not None:
        r = closer.result
        meta["result"] = {"accepted": r.accepted, "his_idx": r.his_idx,
                          "cur_idx": r.cur_idx, "icp_score": r.icp_score}
        if r.q_opt is not None:
            arrays["result_q_opt"] = np.asarray(r.q_opt)
            arrays["result_t_opt"] = np.asarray(r.t_opt)

    def pack_record(prefix: str, rec) -> None:
        arrays[f"{prefix}_keys"] = np.asarray(rec.keys, np.int32)
        arrays[f"{prefix}_q"] = np.asarray(rec.q, np.float32)
        arrays[f"{prefix}_t"] = np.asarray(rec.t, np.float32)
        arrays[f"{prefix}_end"] = np.int64(rec.ending_frame_idx)
        if rec.descriptor is not None:
            for fname, val in zip(rec.descriptor._fields, rec.descriptor):
                arrays[f"{prefix}_d_{fname}"] = np.asarray(val)
        for s in ("snap_line", "snap_plane", "snap_full"):
            v = getattr(rec, s)
            if v is not None:
                arrays[f"{prefix}_{s}"] = np.asarray(v, np.float32)

    for i, rec in enumerate(closer.keyframes):
        pack_record(f"kf{i}", rec)
    for i, item in enumerate(closer.waiting):
        # waiting entries are (record, cell-map snapshot) pairs; only
        # the record persists — load re-attaches the restored live map
        pack_record(f"wait{i}", item[0] if isinstance(item, tuple) else item)
    for i, acc in enumerate(closer.updating):
        arrays[f"acc{i}_keys"] = np.fromiter(
            sorted(acc.keys), np.int64, len(acc.keys))
    arrays["meta_json"] = np.frombuffer(
        _json.dumps(meta).encode(), np.uint8)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_loop_state(path: str, cfg, cell_map=None):
    """Restore a `LoopCloser` saved by `save_loop_state`.  `cell_map`
    (the restored run's live full-cloud cell map) is attached to any
    restored waiting keyframes; without one they are dropped at
    processing time like a waiting-list overflow."""
    import json as _json

    from ..loop.keyframe import KeyframeDescriptor
    from .loop_service import (
        KeyframeRecord,
        LoopCloser,
        LoopClosureResult,
        _Accumulator,
    )

    z = np.load(path)
    meta = _json.loads(bytes(z["meta_json"]).decode())
    closer = LoopCloser(cfg)
    closer.closed = bool(meta["closed"])
    closer.dropped_keyframes = int(meta["dropped_keyframes"])
    closer._pair_idx = int(meta["pair_idx"])

    def unpack_record(prefix: str) -> KeyframeRecord:
        desc = None
        if f"{prefix}_d_img_line" in z:
            desc = KeyframeDescriptor(*[
                z[f"{prefix}_d_{fname}"]
                for fname in KeyframeDescriptor._fields])
        return KeyframeRecord(
            keys=np.asarray(z[f"{prefix}_keys"], np.int32),
            q=np.asarray(z[f"{prefix}_q"], np.float32),
            t=np.asarray(z[f"{prefix}_t"], np.float32),
            ending_frame_idx=int(z[f"{prefix}_end"]),
            descriptor=desc,
            snap_line=(np.asarray(z[f"{prefix}_snap_line"])
                       if f"{prefix}_snap_line" in z else None),
            snap_plane=(np.asarray(z[f"{prefix}_snap_plane"])
                        if f"{prefix}_snap_plane" in z else None),
            snap_full=(np.asarray(z[f"{prefix}_snap_full"])
                       if f"{prefix}_snap_full" in z else None),
        )

    closer.keyframes = [unpack_record(f"kf{i}")
                        for i in range(int(meta["n_keyframes"]))]
    closer.waiting = [(unpack_record(f"wait{i}"), cell_map)
                      for i in range(int(meta["n_waiting"]))]
    closer.updating = []
    for i, acc_meta in enumerate(meta["updating"]):
        acc = _Accumulator()
        acc.frames = int(acc_meta["frames"])
        acc.keys = set(int(k) for k in z[f"acc{i}_keys"])
        closer.updating.append(acc)
    if not closer.updating:
        closer.updating = [_Accumulator()]
    if meta["result"] is not None:
        r = meta["result"]
        closer.result = LoopClosureResult(
            accepted=bool(r["accepted"]), his_idx=int(r["his_idx"]),
            cur_idx=int(r["cur_idx"]), icp_score=float(r["icp_score"]),
            q_opt=(np.asarray(z["result_q_opt"])
                   if "result_q_opt" in z else None),
            t_opt=(np.asarray(z["result_t_opt"])
                   if "result_t_opt" in z else None),
        )
    return closer


def save_pipeline(pipe, directory: str) -> None:
    """Checkpoint a full `OdometryPipeline`: the odometry state pytree
    (orbax) + the loop-service host state, together — a resumed run
    continues mapping AND can still close a loop spanning the
    checkpoint (reference analogue: keyframe JSON persistence +
    offline refine, ``laser_mapping.hpp:972-977``)."""
    os.makedirs(directory, exist_ok=True)
    pipe.flush()
    save_state(pipe.state, os.path.join(directory, "odometry"))
    if pipe.scheduler is not None:
        # the adaptive capacity tier the state arrays are shaped at
        # (runtime/capacity_schedule.py) — load_pipeline must rebuild
        # cfg_active before restoring the pytree
        with open(os.path.join(directory, "capacity_scale.txt"), "w") as f:
            f.write(str(pipe.scheduler.scale))
    if pipe.loop_closer is not None:
        save_loop_state(pipe.loop_closer,
                        os.path.join(directory, "loop_state.npz"))


def load_pipeline(directory: str, cfg):
    """Restore a pipeline checkpointed by `save_pipeline`."""
    from .pipeline import OdometryPipeline

    pipe = OdometryPipeline(cfg)
    scale_path = os.path.join(directory, "capacity_scale.txt")
    if pipe.scheduler is not None:
        # restore the capacity tier the checkpointed arrays are shaped
        # at (a checkpoint without a tier file predates the schedule —
        # its arrays are at the full configured capacities, scale 1)
        from .capacity_schedule import scaled_caps

        if os.path.exists(scale_path):
            with open(scale_path) as f:
                pipe.scheduler.scale = max(1, int(f.read().strip()))
        else:
            pipe.scheduler.scale = 1
        pipe.scheduler.cfg = scaled_caps(cfg, pipe.scheduler.scale)
        pipe.cfg_active = pipe.scheduler.cfg
    pipe.state = load_state(os.path.join(directory, "odometry"),
                            pipe.cfg_active)
    if pipe.mesh is not None:
        from ..parallel.layout import shard_state

        pipe.state = shard_state(pipe.state, pipe.mesh)
    loop_path = os.path.join(directory, "loop_state.npz")
    if pipe.loop_closer is not None and os.path.exists(loop_path):
        pipe.loop_closer.shutdown()
        pipe.loop_closer = load_loop_state(loop_path, cfg,
                                           cell_map=pipe.state.cell_full)
    # state.frame_count counts odometry steps (= executed pieces); the
    # pipeline's frame index counts raw frames (odom_mode 0 runs only
    # piece 0 per frame — pipeline.py bounds[:1]; the velodyne path
    # runs exactly ONE step per raw frame regardless of
    # piecewise_number, _process_raw_frame_body)
    pieces = (1 if (cfg.common.if_motion_deblur or cfg.common.odom_mode == 0
                    or cfg.common.lidar_type == "velodyne")
              else max(1, cfg.common.piecewise_number))
    pipe._frame_idx = int(pipe.state.frame_count) // pieces
    return pipe
