import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.geometry import lie, camera, triangulation
from rumi_slam_tpu.ops import matcher

seq = SyntheticSequence(n_frames=30, width=320, height=240, n_points=2000, seed=11, patch=4)
cfg = tiny_config()
slam = SlamSystem(cfg)
W = jnp.asarray(seq.world.xyz)
fa, fb = 0, 8   # baseline ~0.5
f1 = slam._extract(jnp.asarray(seq.frame(fa)[0]))
f2 = slam._extract(jnp.asarray(seq.frame(fb)[0]))
T1, T2 = seq.poses_gt[fa], seq.poses_gt[fb]
mask = matcher.radius_mask(f1.uv, f2.uv, 100.0)
idx, _ = matcher.match_descriptors(f1, f2, mask=mask, max_dist=50.0, ratio=0.9)
m = np.asarray(idx) >= 0
r1 = camera.unproject(slam.K, f1.uv)
r2 = camera.unproject(slam.K, f2.uv[jnp.clip(idx, 0)])
X = triangulation.triangulate_dlt(jnp.broadcast_to(T1, (len(r1),7)), jnp.broadcast_to(T2, (len(r1),7)), r1, r2)
# gt identity via pixel
uvgt, depgt = camera.project_world(slam.K, T1, W)
du = np.linalg.norm(np.asarray(f1.uv)[:, None] - np.asarray(uvgt)[None], axis=-1)
du[:, np.asarray(depgt) <= 0.3] = 1e9
lid, ld = du.argmin(1), du.min(1)
sel = m & (ld < 2.0)
z_est = np.asarray(lie.se3_apply(jnp.broadcast_to(T1, (len(r1),7)), X))[:, 2][sel]
z_gt = np.asarray(depgt)[lid[sel]]
r = z_est / z_gt
print(f"isolated triangulation (GT poses): n={sel.sum()} median {np.median(r):.4f} p10 {np.percentile(r,10):.3f} p90 {np.percentile(r,90):.3f}")
# and with uv quantization check: feature detection offset
print("feature-to-gt-projection px offset: median", np.median(ld[sel]))
