"""Generate artifacts in the REFERENCE C++ implementation's on-disk
schemas, from geometry that io/simulator never touches — the
cross-implementation interop substitute (no real capture can enter this
environment; VERDICT round-2 item 6).

The emitters below mirror the C++ writers field-for-field:

* cell-map / keyframe JSON — ``Points_cloud_cell::to_json_string``
  (``cell_map_keyframe.hpp:107-162``): a JSON array of
  ``{Pt_num, Res, Center, Mean, Cov, Icov, Eig_vec, Eig_val, Pt_vec}``
  objects; Eigen matrices flatten COLUMN-major
  (``tools_json.hpp:24-31``), Pt_vec at 3 decimal places
  (``SetMaxDecimalPlaces(3)``), identity Cov/Eig + [1,1,1] eigenvalues
  for cells with ≤ 5 points;
* ``poses_ori.txt`` / ``poses_opm.txt`` — `OutputPoses`
  (``ceres_pose_graph_3d.hpp:259-278``): ``id x y z qx qy qz qw``;
* ``loop.g2o`` — `Scene_alignment::save_edge_and_vertex_to_g2o`
  (``scene_alignment.hpp:132-212``): VERTEX_SE3:QUAT + EDGE_SE3:QUAT
  with an information matrix upper triangle.

The scene is a HAND-BUILT corridor-and-rooms world (numpy only); the
"capture" is a drifted keyframe trajectory (poses_ori) whose corrected
poses (poses_opm) are the ground truth — exactly the state a reference
run leaves on disk after its loop closure.

Usage: python scripts/make_reference_artifacts.py <out_dir>
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np


# ---------------------------------------------------------------------------
# hand-built world (numpy only — deliberately NOT io.simulator)
# ---------------------------------------------------------------------------

def build_world(rng: np.random.Generator, pts_per_m2: float = 60.0
                ) -> np.ndarray:
    """Corridor (20 m) joining two rooms, with pillars — dense surface
    samples (walls + floors)."""
    quads = []  # (origin, edge_u, edge_v)

    def box_walls(cx, cy, hx, hy, h=3.0):
        quads.extend([
            ((cx - hx, cy - hy, 0), (2 * hx, 0, 0), (0, 0, h)),
            ((cx - hx, cy + hy, 0), (2 * hx, 0, 0), (0, 0, h)),
            ((cx - hx, cy - hy, 0), (0, 2 * hy, 0), (0, 0, h)),
            ((cx + hx, cy - hy, 0), (0, 2 * hy, 0), (0, 0, h)),
            ((cx - hx, cy - hy, 0), (2 * hx, 0, 0), (0, 2 * hy, 0)),  # floor
        ])

    box_walls(0.0, 0.0, 5.0, 4.0)          # room A
    box_walls(25.0, 0.0, 5.0, 4.0)         # room B
    box_walls(12.5, 0.0, 7.5, 1.5)         # corridor
    for px, py in [(-2, -1.5), (2, 1.5), (24, -1.5), (27, 1.0)]:
        box_walls(px, py, 0.3, 0.3, h=2.5)  # pillars

    pts = []
    for origin, u, v in quads:
        o = np.asarray(origin, np.float64)
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        area = np.linalg.norm(np.cross(u, v))
        n = max(8, int(area * pts_per_m2))
        a = rng.uniform(0, 1, (n, 1))
        b = rng.uniform(0, 1, (n, 1))
        pts.append(o + a * u + b * v)
    world = np.concatenate(pts).astype(np.float32)
    return world + rng.normal(0, 0.01, world.shape).astype(np.float32)


# ---------------------------------------------------------------------------
# quaternion helpers (wxyz)
# ---------------------------------------------------------------------------

def q_yaw(yaw: float) -> np.ndarray:
    return np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], np.float64)


def q_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def q_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def q_rot(q, v):
    qv = np.concatenate([[0.0], np.asarray(v, np.float64)])
    return q_mul(q_mul(q, qv), q_conj(q))[1:]


def rot_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


# ---------------------------------------------------------------------------
# the reference cell JSON writer (field-for-field port of
# cell_map_keyframe.hpp:107-162)
# ---------------------------------------------------------------------------

def cells_to_reference_json(pts: np.ndarray, resolution: float = 0.5,
                            max_pts_per_cell: int = 50) -> list:
    coords = np.round(pts / resolution - 0.5).astype(np.int64)
    uniq, inv = np.unique(coords, axis=0, return_inverse=True)
    cells = []
    for ci in range(len(uniq)):
        cp = pts[inv == ci][:max_pts_per_cell].astype(np.float64)
        n = len(cp)
        center = (uniq[ci] + 0.5) * resolution
        mean = cp.mean(axis=0)
        cell = {
            "Pt_num": int(n),
            "Res": resolution,
            "Center": [float(v) for v in center],
            "Mean": [float(v) for v in mean],
        }
        if n > 5:
            cov = np.cov(cp.T, ddof=1)
            try:
                icov = np.linalg.inv(cov)
            except np.linalg.LinAlgError:
                icov = np.eye(3)
            val, vec = np.linalg.eigh(cov)      # ascending, like Eigen
            # column-major flatten (tools_json.hpp reads linear index)
            cell["Cov"] = [float(v) for v in cov.flatten(order="F")]
            cell["Icov"] = [float(v) for v in icov.flatten(order="F")]
            cell["Eig_vec"] = [float(v) for v in vec.flatten(order="F")]
            cell["Eig_val"] = [float(v) for v in val]
        else:
            eye = np.eye(3).flatten()
            cell["Cov"] = eye.tolist()
            cell["Icov"] = eye.tolist()
            cell["Eig_vec"] = eye.tolist()
            cell["Eig_val"] = [1.0, 1.0, 1.0]
        cell["Pt_vec"] = [round(float(v), 3) for v in cp.flatten()]
        cells.append(cell)
    return cells


def write_g2o(path: str, ts, qs_wxyz, edges) -> None:
    """EDGE/VERTEX_SE3:QUAT in the reference's g2o layout
    (scene_alignment.hpp:132-212: identity information upper triangle)."""
    with open(path, "w") as f:
        for i, (t, q) in enumerate(zip(ts, qs_wxyz)):
            f.write(f"VERTEX_SE3:QUAT {i} {t[0]} {t[1]} {t[2]} "
                    f"{q[1]} {q[2]} {q[3]} {q[0]}\n")
        info = "1 0 0 0 0 0 1 0 0 0 0 1 0 0 0 1 0 0 1 0 1"
        for (i, j, rt, rq) in edges:
            f.write(f"EDGE_SE3:QUAT {i} {j} {rt[0]} {rt[1]} {rt[2]} "
                    f"{rq[1]} {rq[2]} {rq[3]} {rq[0]} {info}\n")


def write_poses_txt(path: str, ts, qs_wxyz) -> None:
    with open(path, "w") as f:
        for i, (t, q) in enumerate(zip(ts, qs_wxyz)):
            f.write(f"{i} {t[0]} {t[1]} {t[2]} "
                    f"{q[1]} {q[2]} {q[3]} {q[0]}\n")


# ---------------------------------------------------------------------------
# the "reference run": drifted keyframes over the world
# ---------------------------------------------------------------------------

def generate(out_dir: str, seed: int = 0, n_keyframes: int = 9) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    world = build_world(rng)

    # true keyframe poses: OUT along the corridor AND BACK — the loop
    # edge then ties two nearby poses (a real revisit; a long-baseline
    # "loop" lets the solver absorb translation residuals into end-node
    # yaw, which no real loop closure exhibits)
    s = np.linspace(0.0, 1.0, n_keyframes)
    xs = 25.0 * np.sin(np.pi * s)
    t_true = np.stack([xs, np.zeros_like(xs), np.full_like(xs, 1.2)], 1)
    yaws = np.where(s <= 0.5, 0.0, np.pi)     # outbound / inbound heading
    q_true = np.stack([q_yaw(y + 0.03 * i) for i, y in enumerate(yaws)])

    # drift grows linearly (yaw + translation), zero at keyframe 0
    t_ori, q_ori = [], []
    for i in range(n_keyframes):
        f = i / max(n_keyframes - 1, 1)
        dq = q_yaw(0.06 * f)
        q_ori.append(q_mul(dq, q_true[i]))
        t_ori.append(t_true[i] + f * np.array([0.4, -0.6, 0.15]))
    t_ori = np.asarray(t_ori)
    q_ori = np.stack(q_ori)

    # keyframe clouds: world points near the TRUE pose, mapped into the
    # world with the DRIFTED pose (what a drifted reference run dumps):
    # p_drifted = T_ori · T_true⁻¹ · p_world
    for i in range(n_keyframes):
        near = world[np.linalg.norm(world[:, :2] - t_true[i][:2],
                                    axis=1) < 8.0]
        sel = near[rng.choice(len(near), min(4000, len(near)),
                              replace=False)]
        local = (sel - t_true[i]) @ rot_mat(q_true[i])       # R^T (p - t)
        drifted = local @ rot_mat(q_ori[i]).T + t_ori[i]
        cells = cells_to_reference_json(drifted.astype(np.float32))
        with open(os.path.join(out_dir, f"keyframe_{i * 100 + 300}.json"),
                  "w") as f:
            json.dump(cells, f)

    # the full map as the reference's mapping.json (drifted world of the
    # LAST keyframe era — enough structure for registration tests)
    all_cells = cells_to_reference_json(world.astype(np.float32))
    with open(os.path.join(out_dir, "mapping.json"), "w") as f:
        json.dump(all_cells, f)

    write_poses_txt(os.path.join(out_dir, "poses_ori.txt"), t_ori, q_ori)
    write_poses_txt(os.path.join(out_dir, "poses_opm.txt"), t_true, q_true)

    # odometry chain + one loop edge (last → first), reference g2o layout
    edges = []
    for i in range(n_keyframes - 1):
        qi_inv = q_conj(q_ori[i])
        rq = q_mul(qi_inv, q_ori[i + 1])
        rt = q_rot(qi_inv, t_ori[i + 1] - t_ori[i])
        edges.append((i, i + 1, rt, rq))
    qe_inv = q_conj(q_true[-1])
    edges.append((n_keyframes - 1, 0,
                  q_rot(qe_inv, t_true[0] - t_true[-1]),
                  q_mul(qe_inv, q_true[0])))
    write_g2o(os.path.join(out_dir, "loop.g2o"), t_ori, q_ori, edges)

    return {"out_dir": out_dir, "n_keyframes": n_keyframes,
            "world_points": len(world), "cells": len(all_cells)}


if __name__ == "__main__":
    out = generate(sys.argv[1] if len(sys.argv) > 1 else "ref_artifacts")
    print(json.dumps(out))
