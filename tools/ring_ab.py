"""A/B: local-BA fixed boundary ring on vs off (VERDICT r3 missing #4).

Runs the revisit-heavy synthetic sweep trajectory (the camera re-observes
the same structure repeatedly — exactly where out-of-window KFs share points
with the window and the reference's fixed ring, Optimizer.cc:1041-1055,
prevents shared points from being dragged against frozen views) over N
seeds with MapConfig.lba_fixed_ring = 0 vs 6, and prints the paired ATE
table.  The result (improvement or null) is recorded in PARITY.md.

Usage: python tools/ring_ab.py [--repeats 4] [--frames 150]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--frames", type=int, default=150)
    args = ap.parse_args()

    import numpy as np

    from rumi_slam_tpu.config import tiny_config
    from rumi_slam_tpu.evaluation import harness
    from rumi_slam_tpu.io.synthetic import SyntheticSequence

    out = {}
    for ring in (0, 6):
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, mapping=dataclasses.replace(cfg.mapping,
                                             lba_fixed_ring=ring))
        ates = []
        for r in range(args.repeats):
            seq = SyntheticSequence(
                n_frames=args.frames, width=320, height=240, n_points=2000,
                seed=20 + r, patch=3, trajectory="sweep")
            row = harness.run_once(seq, cfg, seed=r,
                                   enable_rumination=False)
            ates.append(row["ate"])
            print(f"[ring={ring} seed={r}] ate={row['ate']:.4f}",
                  file=sys.stderr, flush=True)
        out[f"ring_{ring}"] = {
            "ates": [round(a, 5) for a in ates],
            "median": round(float(np.median(ates)), 5),
            "mean": round(float(np.mean(ates)), 5),
        }
    out["delta_median"] = round(
        out["ring_0"]["median"] - out["ring_6"]["median"], 5)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
