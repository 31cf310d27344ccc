import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.geometry import camera

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=4, lost_span=(45, 55), trajectory="sweep")
cfg = tiny_config()
slam = SlamSystem(cfg)
W = jnp.asarray(seq.world.xyz)

def ident(fidx, feats):
    uvgt, dep = camera.project_world(slam.K, seq.poses_gt[fidx], W)
    du = np.linalg.norm(np.asarray(feats.uv)[:, None] - np.asarray(uvgt)[None], axis=-1)
    du[:, np.asarray(dep) <= 0.3] = 1e9
    return du.argmin(1), du.min(1)

fa, fb = 38, 62
f1 = slam._extract(jnp.asarray(seq.frame(fa)[0]))
f2 = slam._extract(jnp.asarray(seq.frame(fb)[0]))
id1, d1 = ident(fa, f1); id2, d2 = ident(fb, f2)
for md, rt in [(50.0, 0.9), (80.0, 0.9), (100.0, 0.95)]:
    idx, _ = matcher.match_descriptors(f1, f2, max_dist=md, ratio=rt)
    idx = np.asarray(idx)
    sel = np.flatnonzero(idx >= 0)
    okm = sum(1 for f in sel if d1[f] < 2 and d2[idx[f]] < 2 and id1[f] == id2[idx[f]])
    print(f"frames {fa}->{fb}: md={md} matches={len(sel)} correct={okm}")
