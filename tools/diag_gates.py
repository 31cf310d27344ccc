import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import two_view
from rumi_slam_tpu.geometry import camera as cam, lie

cfg = tiny_config(); o = cfg.orb
seq = SyntheticSequence(n_frames=30, width=320, height=240, n_points=2000, seed=11, patch=3)
slam = SlamSystem(cfg)
f0 = slam._extract(jnp.asarray(seq.frame(0)[0]))
for k in [8, 12]:
    fk = slam._extract(jnp.asarray(seq.frame(k)[0]))
    mask = matcher.radius_mask(f0.uv, fk.uv, 100.0)
    idx, _ = matcher.match_descriptors(f0, fk, mask=mask, max_dist=matcher.TH_HIGH, ratio=0.95)
    res = two_view.two_view_init(jax.random.PRNGKey(1), cam.unproject(slam.K, f0.uv),
        cam.unproject(slam.K, fk.uv[jnp.clip(idx, 0)]), idx>=0,
        min_inliers=cfg.tracking.init_min_inliers, focal=float(slam.K[0]))
    good, X, T21 = res.inliers, res.points, res.T_21
    c2 = lie.se3_t(lie.se3_inverse(T21))
    d1, d2 = X, X - c2
    cosp = jnp.sum(d1*d2,-1)/jnp.maximum(jnp.linalg.norm(d1,axis=-1)*jnp.linalg.norm(d2,axis=-1),1e-12)
    npar = int(jnp.sum(good & (cosp < jnp.cos(jnp.deg2rad(1.0)))))
    print(f"gap {k}: n_inl={int(res.n_inliers)} (need {cfg.tracking.init_min_inliers}) "
          f"n_parallax={npar} (need {cfg.tracking.init_min_inliers//8}) ok={bool(res.ok)}")
    # gt baseline
    Tk = seq.poses_gt[k]; T0 = seq.poses_gt[0]
    c0 = lie.se3_t(lie.se3_inverse(T0)); ck = lie.se3_t(lie.se3_inverse(Tk))
    print("   gt baseline:", float(jnp.linalg.norm(ck-c0)))
print("min_inliers:", cfg.tracking.init_min_inliers, "min_matches:", cfg.tracking.init_min_matches)
