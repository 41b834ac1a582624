"""Loop-closure service — host-side driver re-designing the reference's
`service_loop_detection` thread (reference:
``source/laser_mapping.hpp:874-1148``) plus the keyframe production in
`process_new_scan` (``:1523-1564``).

Like the reference (detached `service_loop_detection` thread,
``laser_mapping.hpp:1683-1686``), the heavy per-keyframe work —
descriptor build, similarity scan, up-to-N scene-alignment ICPs, the
pose-graph solve — runs on a BACKGROUND host thread consuming a
bounded waiting list, so a keyframe completion never stalls frame
registration: the frame thread only updates accumulators and enqueues
(``loop_closure/if_loop_service_async``, default on; 0 = inline, the
deterministic mode unit tests pin).  The waiting list is bounded by
``maximum_keyframe_in_waiting_list`` with drop-oldest (reference
:1552-1555) — a bound that only binds when the consumer can lag the
producer, i.e. exactly in async mode.  The heavy numerics are jitted
device programs either way; the worker's dispatches interleave with
the frame programs at device granularity instead of serializing the
whole candidate scan into one drain call.

Behavioral parity:
* overlapping keyframe accumulators: a new one every
  ``scans_between_two_keyframe`` frames, each completes after
  ``scans_of_each_keyframe`` frames (reference :1533-1560),
* cells with ≥3 points this frame join every open accumulator
  (reference append_cloud's cell_vec filter),
* candidate gates in order (reference :988-1033): minimum keyframe
  index separation; nonzero-ratio floors (plane 0.05 / line 0.03);
  |roi_range difference| ≤ 5 m; similarity (plane > planar-threshold,
  OR line > linear-threshold AND plane > 0.92); cell-count balance —
  NOTE the reference's expression
  ``(a.size()-b.size())/(a.size()+b.size())*0.1`` is unsigned integer
  arithmetic whose de-facto effect is "skip iff candidate has more
  cells than the current keyframe"; reproduced as exactly that,
* ICP verification: score > 2× threshold → skip 10 candidates ahead;
  accept < threshold; in between → skip 5 (reference :1048-1108),
* on accept: pose graph (odometry chain + one loop edge) solved, poses
  output, service ends (one-shot ``if_end``; reference :1110-1147).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.config import SlamConfig
from ..loop.keyframe import KeyframeDescriptor, describe_keyframe, max_similarity
from ..loop.pose_graph import (
    PoseGraph,
    add_loop_edge,
    build_odometry_chain,
    optimize_pose_graph,
)
from ..loop.scene_alignment import align_keyframes, extract_cells_of_type
from ..map.cell_map import (
    FEATURE_LINE,
    FEATURE_PLANE,
    CellMap,
    member_mask_from_keys,
)



@dataclass
class KeyframeRecord:
    keys: np.ndarray              # member cell keys (int32)
    q: np.ndarray                 # (4,) world pose at completion
    t: np.ndarray                 # (3,)
    ending_frame_idx: int
    descriptor: Optional[KeyframeDescriptor] = None
    # Era snapshots of the member cells' point pools, captured at
    # completion (compressed, world frame).  The reference keeps a
    # historical cell ALIVE when the live map resets it on revisit
    # (`m_previous_visited_cell` chain, cell_map_keyframe.hpp:734-755),
    # so a historical keyframe's cloud stays internally consistent; the
    # fixed-slot TPU directory resets in place, so the keyframe record
    # snapshots its era's points instead — same observable behavior
    # (scene alignment sees each keyframe's own-era cloud), no pointer
    # chains on device.
    snap_line: Optional[np.ndarray] = None   # (Nl, 3) float32
    snap_plane: Optional[np.ndarray] = None  # (Np, 3)
    snap_full: Optional[np.ndarray] = None   # (Nf, 3)


@dataclass
class _Accumulator:
    keys: set = field(default_factory=set)
    frames: int = 0


@dataclass
class LoopClosureResult:
    accepted: bool
    his_idx: int
    cur_idx: int
    icp_score: float
    q_opt: Optional[np.ndarray] = None   # optimized keyframe poses
    t_opt: Optional[np.ndarray] = None


class LoopCloser:
    def __init__(self, cfg: SlamConfig, dump_dir: Optional[str] = None):
        import threading

        self.cfg = cfg
        self.lc = cfg.loop_closure
        self.keyframes: List[KeyframeRecord] = []
        self.updating: List[_Accumulator] = [_Accumulator()]
        # Completed keyframes awaiting analysis, bounded by
        # loop_closure/maximum_keyframe_in_waiting_list — beyond the
        # bound the OLDEST waiting keyframe is dropped unprocessed
        # (reference m_keyframe_need_precession_list pop_front,
        # laser_mapping.hpp:1552-1555).  Entries carry the cell map
        # snapshot (functional pytree) the keyframe completed against.
        self.waiting: List = []
        self.dropped_keyframes = 0
        self.closed = False
        self.result: Optional[LoopClosureResult] = None
        self.gate_trace: List[dict] = []
        # artifact directory for loop.g2o / poses_ori.txt / poses_opm.txt
        # (reference laser_mapping.hpp:1080-1087)
        self.dump_dir = dump_dir
        # screen_out gate, reference-inverted semantics (0 = echo;
        # tools_logger.hpp:51-80)
        self._screen = cfg.common.if_verbose_screen_printf == 0
        # cell statistics source (common/if_update_mean_and_cov_incrementally)
        self._incremental = bool(cfg.common.if_update_mean_and_cov_incrementally)
        self._pair_idx = 0  # alignment-dump pair counter
        # Background worker (reference: the detached
        # service_loop_detection thread, laser_mapping.hpp:1683-1686).
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._busy = False
        self._stop = False
        self._worker: Optional[threading.Thread] = None
        if self.lc.if_loop_service_async:
            self._worker = threading.Thread(
                target=self._service_loop, name="loop_detection",
                daemon=True)
            self._worker.start()
            # join the worker at GC/interpreter exit — a daemon thread
            # torn down inside Condition.wait aborts the process
            # ("FATAL: exception not rethrown") under some runtimes
            import weakref

            self._finalizer = weakref.finalize(
                self, LoopCloser._shutdown_parts,
                self._lock, self._work, self._worker,
                weakref.ref(self))

    @staticmethod
    def _shutdown_parts(lock, cond, worker, self_ref) -> None:
        obj = self_ref()
        with lock:
            if obj is not None:
                obj._stop = True
            cond.notify_all()
        if obj is None:
            # object already collected: wake the worker; it exits via
            # its own stop/closed checks once notified
            return
        worker.join(timeout=5.0)

    # ---- per-frame accumulation (frame thread) ---------------------------
    def on_frame(self, cell_full: CellMap, touched: jax.Array,
                 q_w, t_w, frame_idx: int) -> Optional[KeyframeRecord]:
        """Feed one registered frame's touched-cell mask.  Returns the
        completed keyframe record when one closes (in async mode it is
        analyzed later by the worker)."""
        if self.closed:
            return None
        tkeys = np.asarray(cell_full.keys)[np.asarray(touched)].tolist()
        for acc in self.updating:
            acc.keys.update(tkeys)
            acc.frames += 1

        completed = None
        if self.updating[0].frames >= self.lc.scans_of_each_keyframe:
            acc = self.updating.pop(0)
            completed = KeyframeRecord(
                keys=np.fromiter(acc.keys, np.int32, len(acc.keys)),
                q=np.asarray(q_w), t=np.asarray(t_w),
                ending_frame_idx=frame_idx,
            )
            # reference order (laser_mapping.hpp:1541,1552-1555): enqueue,
            # THEN drop the oldest if the waiting list exceeds the bound,
            # then the service consumes from the front.
            with self._lock:
                self.waiting.append((completed, cell_full))
                if (len(self.waiting)
                        > self.lc.maximum_keyframe_in_waiting_list):
                    self.waiting.pop(0)
                    self.dropped_keyframes += 1
                self._work.notify()
            if self._worker is None:
                self._drain_waiting()
        if (not self.updating or self.updating[-1].frames
                >= self.lc.scans_between_two_keyframe):
            self.updating.append(_Accumulator())
        return completed

    def _drain_waiting(self) -> None:
        """Consume the waiting list inline (sync mode / final drain)."""
        while True:
            with self._lock:
                if not self.waiting or self.closed:
                    return
                rec, m = self.waiting.pop(0)
                if m is None:         # restored without a live map
                    self.dropped_keyframes += 1
                    continue
                self._busy = True
            try:
                self.process_keyframe(rec, m)
            finally:
                with self._lock:
                    self._busy = False
                    self._work.notify_all()

    def _service_loop(self) -> None:
        """Worker thread: pop completed keyframes, analyze, scan for a
        loop; exits once a loop is accepted (one-shot `if_end`,
        reference :1110,1143-1147) or on stop."""
        while True:
            with self._lock:
                while not self.waiting and not self._stop and not self.closed:
                    self._work.wait()
                if self._stop or self.closed:
                    return
                rec, m = self.waiting.pop(0)
                if m is None:         # restored without a live map
                    self.dropped_keyframes += 1
                    continue
                self._busy = True
            try:
                self.process_keyframe(rec, m)
            finally:
                with self._lock:
                    self._busy = False
                    self._work.notify_all()

    def drain(self, timeout: float | None = None) -> None:
        """Block until every queued keyframe has been processed (or the
        service closed).  The pipeline calls this from `flush()` so
        results are complete when the trajectory is read."""
        if self._worker is None:
            self._drain_waiting()
            return
        with self._lock:
            self._work.wait_for(
                lambda: self.closed or (not self.waiting
                                        and not self._busy),
                timeout=timeout)

    def shutdown(self) -> None:
        with self._lock:
            self._stop = True
            self._work.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=5.0)
            self._worker = None

    # ---- keyframe analysis + loop scan ----------------------------------
    def _member(self, m: CellMap, rec: KeyframeRecord) -> jax.Array:
        cap = m.capacity
        keys = np.full((max(len(rec.keys), 1),), 2**31 - 1, np.int32)
        keys[: len(rec.keys)] = rec.keys
        return member_mask_from_keys(m, jnp.asarray(keys))

    def process_keyframe(self, rec: KeyframeRecord, m: CellMap) -> None:
        member = self._member(m, rec)
        rec.descriptor = jax.device_get(
            describe_keyframe(m, member, incremental=self._incremental))

        def compress(batch) -> np.ndarray:
            xyz, mask = jax.device_get((batch.xyz, batch.mask))
            return np.ascontiguousarray(xyz[mask], np.float32)

        from ..map.cell_map import gather_cell_points

        rec.snap_line = compress(
            extract_cells_of_type(m, member, FEATURE_LINE,
                                  incremental=self._incremental))
        rec.snap_plane = compress(
            extract_cells_of_type(m, member, FEATURE_PLANE,
                                  incremental=self._incremental))
        rec.snap_full = compress(gather_cell_points(m, member))
        self.keyframes.append(rec)
        if self.lc.if_dump_keyframe_data and self.dump_dir:
            # per-keyframe JSON in the reference's cell-map schema
            # (reference laser_mapping.hpp:972-977)
            import os

            from ..io.serialization import cell_map_to_json
            import json as _json

            os.makedirs(self.dump_dir, exist_ok=True)
            member_np = np.asarray(member)
            cells = [c for i, c in zip(
                np.nonzero(np.asarray(m.valid()))[0],
                cell_map_to_json(m)) if member_np[i]]
            with open(os.path.join(
                    self.dump_dir,
                    f"keyframe_{rec.ending_frame_idx}.json"), "w") as f:
                _json.dump(cells, f)
        if self.closed or not self.lc.if_enable_loop_closure:
            return
        self._scan_for_loop(m)

    def _trace(self, his: int, stage: str, **vals) -> None:
        """Per-candidate gate record — the analogue of the reference's
        screen printf of ratio/similarity/ICP values during the loop
        scan (laser_mapping.hpp:1002-1057 `screen_out` lines; echoed to
        stdout when common/if_verbose_screen_printf == 0)."""
        entry = {"cur": len(self.keyframes) - 1,
                 "his": his, "stage": stage, **vals}
        self.gate_trace.append(entry)
        if self._screen:
            print(f"[loop] {entry}", flush=True)

    def _scan_for_loop(self, m: CellMap) -> None:
        last = self.keyframes[-1]
        d_last = last.descriptor
        n = len(self.keyframes)
        his = 0
        while his < n - 1:
            if n - his < self.lc.minimum_keyframe_differen:
                break  # all further candidates are too recent
            d_his = self.keyframes[his].descriptor
            if (d_his.ratio_nonzero_plane < self.lc.avail_ratio_plane
                    and d_his.ratio_nonzero_line < self.lc.avail_ratio_line):
                self._trace(his, "ratio",
                            rz_plane=float(d_his.ratio_nonzero_plane),
                            rz_line=float(d_his.ratio_nonzero_line))
                his += 1
                continue
            if abs(float(d_his.roi_range) - float(d_last.roi_range)) > 5.0:
                self._trace(his, "roi", roi_his=float(d_his.roi_range),
                            roi_last=float(d_last.roi_range))
                his += 1
                continue
            sim_plane = float(max_similarity(
                jnp.asarray(d_last.img_plane), jnp.asarray(d_his.img_plane)))
            sim_line = float(max_similarity(
                jnp.asarray(d_last.img_line), jnp.asarray(d_his.img_line)))
            ok = ((sim_line > self.lc.minimum_similarity_linear
                   and sim_plane > 0.92)
                  or sim_plane > self.lc.minimum_similarity_planar)
            self._trace(his, "similarity", sim_plane=sim_plane,
                        sim_line=sim_line, passed=ok)
            if not ok:
                his += 1
                continue
            # cell-count balance — the reference's de-facto behavior
            # (see module docstring)
            if int(d_his.n_cells) > int(d_last.n_cells):
                self._trace(his, "cell_balance",
                            n_his=int(d_his.n_cells),
                            n_last=int(d_last.n_cells))
                his += 1
                continue
            res = self._verify_icp(m, last, self.keyframes[his])
            score = float(res.inlier_threshold)
            self._trace(his, "icp", score=score)
            if score > 2.0 * self.lc.map_alignment_inlier_threshold:
                his += 11
                continue
            if score < self.lc.map_alignment_inlier_threshold:
                self._accept_loop(his, n - 1, res)
                return
            his += 6

    def _verify_icp(self, m: CellMap, last: KeyframeRecord,
                    his: KeyframeRecord):
        # Era snapshots, not live-map gathers: the live directory may
        # have revisit-reset a historical keyframe's cells with
        # current-pass points, which would hand the aligner an
        # internally-inconsistent mix of two eras (see KeyframeRecord).
        cap = m.capacity * m.pool_size  # keep the live-gather jit shape

        def batch(xyz: np.ndarray):
            from ..core.types import PointBatch

            n = min(len(xyz), cap)
            buf = np.zeros((cap, 3), np.float32)
            buf[:n] = xyz[:n]
            mask = np.zeros((cap,), bool)
            mask[:n] = True
            return PointBatch(xyz=jnp.asarray(buf),
                              time=jnp.zeros((cap,), jnp.float32),
                              mask=jnp.asarray(mask))

        # init_t = 0, NOT the reference's center difference: both
        # keyframe clouds live in the same drifted world frame, so the
        # true misalignment is the accumulated drift (sub-meter) while
        # the center difference is dominated by coverage asymmetry —
        # measured seeding the aligner into phantom-correction basins
        # that pass the accept gate and make the map WORSE (the payoff
        # scoring that exposed it: eval/loop_payoff.py; forensics in
        # align_keyframes' docstring).
        res = align_keyframes(
            batch(last.snap_line), batch(last.snap_plane),
            batch(his.snap_line), batch(his.snap_plane),
            jnp.asarray(last.descriptor.center),
            jnp.asarray(his.descriptor.center),
            self.cfg, init_t=jnp.zeros(3, jnp.float32))
        if (self.lc.map_alignment_if_dump_matching_result
                and self.dump_dir):
            self._dump_matching_pair(last, his, res)
        return res

    def _dump_matching_pair(self, last: KeyframeRecord,
                            his: KeyframeRecord, res) -> None:
        """Per-alignment dump (loop_closure/map_alignment_if_dump_
        matching_result — reference scene_alignment.hpp:356-379 saves
        keyframe A, keyframe B, and B transformed by the solved pose as
        ``{pair}_a/_b/_c``): here the two keyframe clouds and the
        transformed historical cloud as PCDs plus the transform/score
        as JSON."""
        import json as _json
        import os

        from ..io.serialization import save_pcd

        os.makedirs(self.dump_dir, exist_ok=True)
        i = self._pair_idx
        self._pair_idx += 1
        a = np.concatenate([last.snap_line, last.snap_plane], axis=0)
        b = np.concatenate([his.snap_line, his.snap_plane], axis=0)
        q, t = np.asarray(res.q), np.asarray(res.t)
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        c = b @ R.T + t
        save_pcd(os.path.join(self.dump_dir, f"{i}_a.pcd"), a)
        save_pcd(os.path.join(self.dump_dir, f"{i}_b.pcd"), b)
        save_pcd(os.path.join(self.dump_dir, f"{i}_c.pcd"), c)
        with open(os.path.join(self.dump_dir, f"{i}_pair.json"), "w") as f:
            _json.dump({"q_wxyz": q.tolist(), "t": t.tolist(),
                        "inlier_threshold": float(res.inlier_threshold)},
                       f)

    def _accept_loop(self, his_idx: int, cur_idx: int, align) -> None:
        qs = jnp.asarray(np.stack([k.q for k in self.keyframes]), jnp.float32)
        ts = jnp.asarray(np.stack([k.t for k in self.keyframes]), jnp.float32)
        n = qs.shape[0]
        g = build_odometry_chain(qs, ts, capacity_edges=n)
        # loop edge cur → his: the alignment moved the HISTORICAL
        # keyframe cloud into the CURRENT (drifted) frame, so the
        # corrected world pose of `his` is icp ∘ pose_his; the measured
        # relative pose is T_cur⁻¹ ∘ (icp ∘ T_his)
        # (reference laser_mapping.hpp:1062-1083 +
        # scene_alignment.hpp:97-129 — composed into one step here).
        icp_q, icp_t = align.q, align.t
        q_cur = qs[cur_idx]
        t_cur = ts[cur_idx]
        rel_q = se3.quat_multiply(
            se3.quat_conjugate(q_cur),
            se3.quat_multiply(icp_q, qs[his_idx]))
        rel_t = se3.quat_rotate(
            se3.quat_conjugate(q_cur),
            se3.quat_rotate(icp_q, ts[his_idx]) + icp_t - t_cur)
        g = add_loop_edge(g, n - 1, cur_idx, his_idx, rel_q, rel_t)
        q_opt, t_opt, cost = optimize_pose_graph(g)
        self.closed = True   # one-shot (reference if_end, :1110)
        self.result = LoopClosureResult(
            accepted=True, his_idx=his_idx, cur_idx=cur_idx,
            icp_score=float(align.inlier_threshold),
            q_opt=np.asarray(q_opt), t_opt=np.asarray(t_opt),
        )
        if self.dump_dir:
            self._dump_artifacts(g, np.asarray(qs), np.asarray(ts))

    def _dump_artifacts(self, g, qs_ori, ts_ori) -> None:
        """loop.g2o + poses_ori.txt / poses_opm.txt in the reference's
        formats (laser_mapping.hpp:1080-1087)."""
        import os

        from ..io.serialization import save_g2o, save_poses_txt

        os.makedirs(self.dump_dir, exist_ok=True)
        mask = np.asarray(g.edge_mask)
        edges = [
            {"id_begin": int(np.asarray(g.edge_i)[e]),
             "id_end": int(np.asarray(g.edge_j)[e]),
             "t": np.asarray(g.rel_t)[e],
             "q_wxyz": np.asarray(g.rel_q)[e]}
            for e in np.nonzero(mask)[0]
        ]
        save_g2o(os.path.join(self.dump_dir, "loop.g2o"),
                 ts_ori, qs_ori, edges)
        save_poses_txt(os.path.join(self.dump_dir, "poses_ori.txt"),
                       ts_ori, qs_ori)
        save_poses_txt(os.path.join(self.dump_dir, "poses_opm.txt"),
                       self.result.t_opt, self.result.q_opt)

    # ---- map refinement (reference Mapping_refine, ------------------
    # ceres_pose_graph_3d.hpp:437-500) ---------------------------------
    def _keyframe_cloud(self, m: CellMap, idx: int) -> np.ndarray:
        """World-frame member cell points of keyframe `idx` — the era
        snapshot (points as mapped with that keyframe's own drifted
        poses, which is what the pose correction math expects)."""
        rec = self.keyframes[idx]
        if rec.snap_full is not None:
            return rec.snap_full
        from ..map.cell_map import gather_cell_points

        pts = gather_cell_points(m, self._member(m, rec))
        return np.asarray(pts.xyz)[np.asarray(pts.mask)]

    def refine_keyframe_cloud(self, m: CellMap, idx: int) -> np.ndarray:
        """Member cell points of keyframe `idx`, re-transformed by
        (T_opt · T_ori⁻¹) — the post-loop map correction."""
        assert self.result is not None and self.result.accepted
        from ..loop.map_refine import refine_points

        rec = self.keyframes[idx]
        return refine_points(self._keyframe_cloud(m, idx), rec.q, rec.t,
                             self.result.q_opt[idx],
                             self.result.t_opt[idx])

    def corrected_map(self, m: CellMap, stride: int = 2,
                      resolution: float = 0.0) -> np.ndarray:
        """The corrected GLOBAL map after an accepted loop: every
        `stride`-th keyframe's cloud re-transformed and merged — what
        the reference republishes on /pc_aft_loop_closure
        (laser_mapping.hpp:1091-1100, stride 2)."""
        assert self.result is not None and self.result.accepted
        from ..loop.map_refine import rebuild_corrected_map

        clouds = [self._keyframe_cloud(m, i)
                  for i in range(len(self.keyframes))]
        qs = np.stack([k.q for k in self.keyframes])
        ts = np.stack([k.t for k in self.keyframes])
        return rebuild_corrected_map(
            clouds, (ts, qs), (self.result.t_opt, self.result.q_opt),
            stride=stride, resolution=resolution)
