"""Generate the committed bag-replay fixture: a small simulated Livox
capture encoded as a REAL ROS1 v2.0 bag (livox_ros_driver/CustomMsg in a
bz2 chunk) + its ground-truth trajectory.

The CI test tests/test_bag_replay.py replays this through the full
ingest path (bag container → CustomMsg decode → frontend → odometry)
and asserts ATE against the ground truth — so the wire-format decoding,
frame streaming, and pipeline wiring are all regression-guarded.

Run from repo root:  python scripts/make_fixture_bag.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from loam_livox_tpu.io.rosbag import BagWriter, encode_livox_custommsg
from loam_livox_tpu.io.serialization import save_poses_txt
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig, Trajectory

FRAMES = 24
POINTS = 4096
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    # standstill ramp covering the init-accumulation window (10 frames
    # in the replay test's config), like a real capture's startup hold
    sim = LivoxSimulator(SimConfig(points_per_frame=POINTS, seed=42),
                         traj=Trajectory(ramp_t0=1.2))
    bag_path = os.path.join(OUT_DIR, "sim_livox.bag")
    gts_t, gts_q, times = [], [], []
    with BagWriter(bag_path, compression="bz2") as w:
        for i in range(FRAMES):
            xyz, inten, t0 = sim.frame(i)
            # reflectivity channel is 0..255 in the driver
            refl = np.clip(inten * 255.0, 0, 255)
            w.write("/livox/lidar", "livox_ros_driver/CustomMsg", t0,
                    encode_livox_custommsg(t0, xyz, refl))
            q, p = sim.gt_pose_at(t0)
            gts_q.append(q)
            gts_t.append(p)
            times.append(t0)
    save_poses_txt(os.path.join(OUT_DIR, "sim_livox_gt.txt"),
                   np.asarray(gts_t), np.asarray(gts_q))
    size = os.path.getsize(bag_path)
    print(f"wrote {bag_path} ({size / 1e6:.2f} MB), {FRAMES} frames")


if __name__ == "__main__":
    main()
