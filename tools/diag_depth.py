import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.geometry import lie, camera

seq = SyntheticSequence(n_frames=50, width=320, height=240, n_points=2000, seed=11, patch=4)
cfg = tiny_config()
slam = SlamSystem(cfg)
W = jnp.asarray(seq.world.xyz)
for i in range(45):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
ms = slam.ms
kp = np.asarray(ms.kf_point)
ratios = []
for k in np.flatnonzero(np.asarray(ms.kf_valid)):
    gi = int(round(float(ms.kf_time[k])*30))
    Tgt = seq.poses_gt[gi]
    uvgt, depgt = camera.project_world(slam.K, Tgt, W)
    uvgt = np.asarray(uvgt); depgt = np.asarray(depgt)
    obs = np.flatnonzero(kp[k] >= 0)
    uvo = np.asarray(ms.kf_uv)[k][obs]
    du = np.linalg.norm(uvo[:, None] - uvgt[None], axis=-1)
    du[:, depgt <= 0.3] = 1e9
    lid = du.argmin(1); ld = du.min(1)
    sel = ld < 2.0
    X = np.asarray(ms.pt_xyz)[kp[k][obs[sel]]]
    zc = np.asarray(lie.se3_apply(jnp.broadcast_to(jnp.asarray(ms.kf_pose[k]), (len(X),7)), jnp.asarray(X)))[:, 2]
    zgt = depgt[lid[sel]]
    ratios.append(zc / zgt)
r = np.concatenate(ratios)
print(f"n={len(r)} est_depth/gt_depth: median {np.median(r):.4f} "
      f"p10 {np.percentile(r,10):.3f} p90 {np.percentile(r,90):.3f} "
      f"frac within 5% of median: {(np.abs(r/np.median(r)-1)<0.05).mean():.2f} "
      f"within 20%: {(np.abs(r/np.median(r)-1)<0.2).mean():.2f}")
