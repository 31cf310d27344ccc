"""Run the full SLAM system over a TUM RGB-D sequence directory.

Equivalent of the reference's dataset driver (cloud_edge_main.cpp: main :183 +
Grabber::RunTxt :550 — replay rgb.txt at the recorded cadence, track every
frame, poll the rumination coordinator, and at the end export the
duration-longest map's trajectory, score ATE against groundtruth, and write
result.csv + traj.png into a timestamped results directory :252-388).

Usage:
  python examples/run_tum.py --data /path/to/rgbd_dataset_freiburg3_xyz \
      --preset tum3 [--rgbd] [--pace 1.0] [--out results/]

With --pace > 0 frames are consumed at pace x real time through the native
C++ frame ring (runtime/edge_runtime.cpp), dropping frames the tracker cannot
keep up with — the reference's realtime semantics.  --pace 0 replays offline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="TUM sequence directory")
    ap.add_argument("--preset", default="tum3",
                    help="settings preset or YAML path")
    ap.add_argument("--rgbd", action="store_true",
                    help="use depth.txt for RGB-D tracking")
    ap.add_argument("--pace", type=float, default=0.0,
                    help="realtime pace factor (0 = offline)")
    ap.add_argument("--out", default="results")
    ap.add_argument("--no-rumination", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from rumi_slam_tpu.evaluation import ate as ate_mod
    from rumi_slam_tpu.evaluation import harness, plot
    from rumi_slam_tpu.io import datasets, settings, trajectory
    from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
    from rumi_slam_tpu.system import SlamSystem
    from rumi_slam_tpu.utils.profiling import MemoryMonitor

    cfg = (
        settings.preset(args.preset)
        if not args.preset.endswith((".yaml", ".yml"))
        else settings.load_settings(args.preset)
    )
    if args.rgbd:
        import dataclasses

        # TumSequence.frame_rgbd already scales raw png units to meters
        cfg = dataclasses.replace(
            cfg, camera=dataclasses.replace(
                cfg.camera, depth_factor=1.0,
                baseline=cfg.camera.baseline or 0.075))
    seq = datasets.TumSequence(args.data)
    out_dir = Path(args.out) / time.strftime("%Y%m%d_%H%M%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    slam = SlamSystem(cfg)
    coord = None if args.no_rumination else RuminationCoordinator(slam, cfg)

    t0 = time.perf_counter()
    with MemoryMonitor() as mem:
        for i in range(len(seq)):
            if args.rgbd:
                img, depth, t = seq.frame_rgbd(i)
                slam.track_rgbd(img, depth, t)
            else:
                img, t = seq.frame(i)
                slam.track_monocular(img, t)
            if coord is not None:
                coord.maybe_ruminate()
            if args.pace > 0 and i + 1 < len(seq):
                lag = (seq.times[i + 1] - seq.times[0]) / args.pace - (
                    time.perf_counter() - t0)
                if lag > 0:
                    time.sleep(lag)
    runtime = time.perf_counter() - t0

    times, poses = slam.trajectory_of_map()
    trajectory.save_tum(out_dir / "whole_map.txt", times, poses)
    kt, kp = slam.keyframe_trajectory()
    trajectory.save_tum(out_dir / "keyframes.txt", kt, kp)

    row = {"dataset": Path(args.data).name, "runtime_s": runtime,
           "n_kf": slam.stats["n_kf"], "rss_mb": mem.peak_mb()}
    try:
        gt_times, gt_xyz, gt_quat = seq.groundtruth()
    except OSError:
        gt_times = None
    if gt_times is not None and gt_quat is not None:
        # TUM groundtruth rows are camera-to-world (tx ty tz qx qy qz qw);
        # evaluate_trajectory consumes world-to-camera [qw qx qy qz t]
        import jax
        import jax.numpy as jnp

        from rumi_slam_tpu.geometry import lie

        Twc = np.concatenate(
            [gt_quat[:, 3:4], gt_quat[:, 0:3], gt_xyz], axis=1
        ).astype(np.float32)
        gt_poses = np.asarray(jax.vmap(lie.se3_inverse)(jnp.asarray(Twc)))
        m = ate_mod.evaluate_trajectory(times, poses, gt_times, gt_poses)
        row.update(ate=m["ate"], rate=m["rate"], n_matched=m["n_matched"])
        plot.plot_trajectory(out_dir / "traj.png", times, poses,
                             gt_times, gt_poses)
    harness.write_result_csv(row, out_dir / "result.csv")
    plot.plot_map(out_dir / "map.png", slam.ms)
    print(json.dumps(row))
    print("stage timings:\n" + slam.timer.report())
    print(f"results in {out_dir}")


if __name__ == "__main__":
    main()
