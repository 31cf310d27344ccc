import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
seq = SyntheticSequence(n_frames=45, width=320, height=240, n_points=1500, seed=4, patch=3)
slam = SlamSystem(tiny_config())
ok = 0
for i in range(len(seq)):
    img, t = seq.frame(i)
    st = slam.track_monocular(img, t)
    ok += st.name == "OK"
print(slam.stats, "ok_frames:", ok, "/", len(seq))
import numpy as np
from rumi_slam_tpu.evaluation import ate as A
ts, ps = slam.trajectory_of_map()
gt = np.stack([np.asarray(p) for p in seq.poses_gt])
idx = [int(round(t*30)) for t in ts]
r = A.evaluate_trajectory(ts, ps, seq.times, gt)
print("ATE:", r)
