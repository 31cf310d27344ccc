import sys, os; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
import rumi_slam_tpu.tracking.tracker as TR
import numpy as np

mode = os.environ.get("FILT", "both")
src = open("rumi_slam_tpu/tracking/tracker.py").read()
seq = SyntheticSequence(n_frames=45, width=320, height=240, n_points=1500, seed=4, patch=3)
slam = SlamSystem(tiny_config())
ok = 0
import rumi_slam_tpu.evaluation.ate as A
for i in range(len(seq)):
    img, t = seq.frame(i)
    ok += slam.track_monocular(img, t).name == "OK"
ts, ps = slam.trajectory_of_map()
gt = np.stack([np.asarray(p) for p in seq.poses_gt])
r = A.evaluate_trajectory(ts, ps, seq.times, gt)
print(f"mode={mode}: ok={ok}/45 ate={r['ate']:.4f}")
