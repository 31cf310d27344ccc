import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import pnp
import rumi_slam_tpu.tracking.local_mapping as LM

seq = SyntheticSequence(n_frames=60, width=320, height=240, n_points=2000, seed=11,
                        patch=4, trajectory="sweep")
LM_fuse = LM.fuse_with_neighbors
LM.fuse_with_neighbors = lambda ms, K, kid, **kw: (ms, jnp.int32(0))
slam = SlamSystem(tiny_config())
for i in range(45):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
ms = slam.ms
obs_desc = ms.kf_desc.reshape(-1, 8)
obs_pt = jnp.where(ms.kf_valid[:, None], ms.kf_point, -1).reshape(-1)
obs_ok = (obs_pt >= 0) & ms.pt_valid[jnp.clip(obs_pt, 0)]
for fidx in [40, 44, 50, 57]:
    feats = slam._extract(jnp.asarray(seq.frame(fidx)[0]))
    dist = matcher.hamming_matrix(feats.desc, obs_desc)
    idx, mdist = matcher.match(dist, feats.valid, obs_ok, max_dist=60.0, ratio=0.9)
    pt = jnp.where(idx >= 0, obs_pt[jnp.clip(idx, 0)], -1)
    matched = pt >= 0
    X = ms.pt_xyz[jnp.clip(pt, 0)]
    res = pnp.pnp_ransac(jax.random.PRNGKey(0), slam.K, X, feats.uv, matched, quality=60.0-mdist)
    print(f"frame {fidx}: obs-matches={int(jnp.sum(matched))} inl={int(res.n_inliers)}")
