import jax, jax.numpy as jnp
from functools import partial
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu import system as S
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import two_view as tv
from rumi_slam_tpu.geometry import camera as cam

seq = SyntheticSequence(n_frames=8, width=320, height=240, n_points=1500, seed=4, patch=3)
slam = S.SlamSystem(tiny_config())
f0 = slam._extract(jnp.asarray(seq.frame(0)[0]))
for gap in (1, 3, 5, 7):
    f1 = slam._extract(jnp.asarray(seq.frame(gap)[0]))
    mask = matcher.radius_mask(f0.uv, f1.uv, 100.0)
    idx, _ = matcher.match_descriptors(f0, f1, mask=mask, max_dist=matcher.TH_LOW, ratio=0.9)
    matched = idx >= 0
    r1 = cam.unproject(slam.K, f0.uv)
    r2 = cam.unproject(slam.K, f1.uv[jnp.clip(idx, 0)])
    res = tv.two_view_init(jax.random.PRNGKey(0), r1, r2, matched,
                           min_inliers=60, focal=float(slam.K[0]))
    print("gap", gap, "matches", int(jnp.sum(matched)),
          "n_inl", int(res.n_inliers), "ok", bool(res.ok))
