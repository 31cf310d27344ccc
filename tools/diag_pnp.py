import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import pnp
from rumi_slam_tpu.geometry import camera as cam

seq = SyntheticSequence(n_frames=45, width=320, height=240, n_points=2000, seed=11, patch=3)
cfg = tiny_config()
slam = SlamSystem(cfg)
for i in range(40):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
print("state:", slam.state.name, "n_kf:", slam.stats["n_kf"], "n_pt:", int(slam.ms.n_pt))
# frame 40: tracked normally — try prior-free map reloc
img, t = seq.frame(40)
feats = slam._extract(jnp.asarray(img))
ms = slam.ms
dist = matcher.hamming_matrix(feats.desc, ms.pt_desc)
idx, _ = matcher.match(dist, feats.valid, ms.pt_valid, max_dist=matcher.TH_LOW, ratio=0.9)
matched = idx >= 0
X = ms.pt_xyz[jnp.clip(idx, 0)]
res = pnp.pnp_ransac(jax.random.PRNGKey(0), slam.K, X, feats.uv, matched)
print("self-frame: matches", int(jnp.sum(matched)), "pnp_inl", int(res.n_inliers))
# reproject matched points with the TRACKED pose: how many are actually right?
uvp, dep = cam.project_world(slam.K, slam.last_pose, X)
err = jnp.linalg.norm(uvp - feats.uv, axis=-1)
print("matches with reproj err < 3px at tracked pose:", int(jnp.sum(matched & (err < 3) & (dep > 0))))
