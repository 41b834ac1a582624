"""Run the odometry/mapping pipeline — the CLI replacing the
reference's roslaunch entry points (reference: ``launch/rosbag.launch``
and friends: load a YAML profile, apply per-scenario overrides, start
the nodes).

Data sources:
* ``--source sim``        synthetic Livox rosette stream (io.simulator)
* ``--source pcd:<dir>``  directory of per-frame .pcd files named in
                          frame order (the interop path for converted
                          rosbags)
* ``--source bag:<file>[:<topic>]``  ROS1 bag (format 2.0) replay —
                          sensor_msgs/PointCloud2 or
                          livox_ros_driver/CustomMsg, no ROS required
                          (reference README.md:76-137 rosbag datasets)
* ``--source lvx:<file>`` Livox .lvx capture (regrouped to 0.1 s frames)

Examples:
    python -m loam_livox_tpu.cli.run_odometry --profile realtime --frames 100
    python -m loam_livox_tpu.cli.run_odometry --config configs/performance_precision.yaml \
        --source pcd:/data/hku_zym --save-poses poses.txt --save-map map.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", help="YAML config (reference schema)")
    p.add_argument("--profile",
                   choices=["precision", "realtime", "realtime_racing",
                            "largescale"],
                   default="precision")
    p.add_argument("--caps", choices=["default", "bounded"],
                   default="default",
                   help="capacity preset: 'bounded' sizes the static-"
                        "shape buffers for bounded scenes (~4x measured "
                        "P99 fills — +36%% fps; NOT for large worlds; "
                        "core/config.py bounded_scene_caps)")
    p.add_argument("--source", default="sim",
                   help="'sim', 'pcd:<dir>', 'bag:<file>[:<topic>]', "
                        "or 'lvx:<file>'")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--piecewise", type=int, default=None,
                   help="override common/piecewise_number")
    p.add_argument("--loop-closure", action="store_true")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--save-poses", default=None,
                   help="write trajectory (reference OutputPoses format)")
    p.add_argument("--save-map", default=None,
                   help="write the plane cell map as reference-format JSON")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="run the odometry step sharded over an N-device "
                        "mesh (parallel/mesh_devices; the multi-chip "
                        "product mode — map/matching-buffer axes shard, "
                        "reductions cross the mesh as collectives)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--follow", action="store_true",
                   help="stream one JSON line per registered frame to "
                        "stdout ({frame, t, q, accepted}) as results "
                        "become observable — the `/aft_mapped_to_init` "
                        "odometry publication analogue "
                        "(laser_mapping.hpp:1566-1601)")
    p.add_argument("--set", action="append", default=[], metavar="NS/KEY=V",
                   help="override one config field, e.g. "
                        "loop_closure/minimum_keyframe_differen=20 "
                        "(repeatable — the reference's per-launch "
                        "<param> overrides, launch/rosbag_loop.launch:10-11)")
    return p.parse_args(argv)


def build_config(args):
    from ..core import config as C

    cfg = {"precision": C.precision_profile,
           "realtime": C.realtime_profile,
           "realtime_racing": C.realtime_racing_profile,
           "largescale": C.largescale_profile}[args.profile]()
    if args.caps == "bounded":
        cfg = cfg.replace(capacity=C.bounded_scene_caps())
    if args.config:
        cfg = C.load_yaml(args.config, base=cfg)
    overrides = {}
    if args.piecewise is not None:
        overrides.setdefault("common", {})["piecewise_number"] = args.piecewise
    if args.loop_closure:
        overrides.setdefault("loop_closure", {})["if_enable_loop_closure"] = 1
    if args.mesh is not None:
        overrides.setdefault("parallel", {})["mesh_devices"] = args.mesh
    for item in args.set:
        try:
            path, val = item.split("=", 1)
            ns, key = path.replace(".", "/").split("/", 1)
        except ValueError:
            raise SystemExit(f"--set expects NS/KEY=VALUE, got {item!r}")
        cur = getattr(getattr(cfg, ns), key)   # raises on unknown field
        typ = type(cur)
        overrides.setdefault(ns, {})[key] = (
            typ(float(val)) if typ in (int, float) else val)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def frame_stream(args, cfg):
    if args.source == "sim":
        from ..io.simulator import LivoxSimulator, SimConfig

        sim = LivoxSimulator(SimConfig(seed=args.seed))
        for i in range(args.frames):
            yield sim.frame(i)
    elif args.source.startswith("pcd:"):
        from ..io import native

        d = args.source[4:]
        if not glob.glob(os.path.join(d, "*.pcd")):
            raise SystemExit(f"no .pcd files under {d}")
        period = 0.1
        for i, (xyz, inten) in enumerate(native.pcd_dir_stream(d)):
            if i >= args.frames:
                break
            if inten is None:
                import numpy as np

                inten = np.ones(len(xyz), np.float32)
            yield xyz, inten, i * period
    elif args.source.startswith("bag:"):
        from ..io.rosbag import bag_frame_stream

        spec = args.source[4:]
        # 'bag:file.bag' or 'bag:file.bag:/livox/lidar'
        if ":" in spec:
            path, topic = spec.split(":", 1)
        else:
            path, topic = spec, None
        for i, (xyz, inten, stamp) in enumerate(
                bag_frame_stream(path, topic)):
            if i >= args.frames:
                break
            yield xyz, inten, stamp
    elif args.source.startswith("lvx:"):
        from ..io.lvx import LvxReader

        reader = LvxReader(args.source[4:])
        for i, (xyz, refl, stamp) in enumerate(reader.frames()):
            if i >= args.frames:
                break
            yield xyz, refl, stamp
    else:
        raise SystemExit(f"unknown source {args.source!r}")


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)

    from ..runtime.pipeline import OdometryPipeline

    pipe = OdometryPipeline(cfg, log_dir=args.log_dir)
    if args.follow:
        # --follow streams poses as frames drain; the default lazy
        # drain defers materialization to flush() (runtime/pipeline.py)
        pipe.eager_drain = True

    followed = 0

    def emit_follow():
        # stream newly-observable poses (with pipelining they appear up
        # to `maximum_parallel_thread` frames after ingestion)
        nonlocal followed
        tr = pipe.trajectory
        while followed < len(tr.positions):
            print(json.dumps({
                "frame": followed,
                "t": [round(float(v), 6) for v in tr.positions[followed]],
                "q": [round(float(v), 6) for v in tr.quaternions[followed]],
                "accepted": bool(tr.accepted[followed]),
            }), flush=True)
            followed += 1

    t0 = time.perf_counter()
    n = 0
    for xyz, inten, stamp in frame_stream(args, cfg):
        pipe.process_raw(xyz, inten, stamp)
        n += 1
        if args.follow:
            emit_follow()
        if not args.quiet and n % 10 == 0 and pipe.trajectory.positions:
            import numpy as np

            print(f"frame {n}: t_w="
                  f"{np.round(pipe.trajectory.positions[-1], 3).tolist()}",
                  file=sys.stderr)
    pipe.flush()
    if args.follow:
        emit_follow()
    wall = time.perf_counter() - t0

    if args.save_poses:
        import numpy as np

        from ..io.serialization import save_poses_txt

        save_poses_txt(args.save_poses,
                       np.asarray(pipe.trajectory.positions),
                       np.asarray(pipe.trajectory.quaternions))
    if args.save_map:
        from ..io.serialization import save_cell_map_json

        save_cell_map_json(pipe.state.cell_planes, args.save_map)

    summary = {
        "frames": n,
        "mesh_devices": int(cfg.parallel.mesh_devices),
        "wall_s": round(wall, 3),
        "fps": round(n / wall, 3) if wall > 0 else None,
        "accepted": int(sum(pipe.trajectory.accepted)),
        "steps": len(pipe.trajectory.accepted),
        "loop_closed": bool(pipe.loop_closer and pipe.loop_closer.closed),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
