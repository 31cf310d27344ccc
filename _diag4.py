import jax, jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu import system as S
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import two_view as tv
from rumi_slam_tpu.geometry import camera as cam, lie

seq = SyntheticSequence(n_frames=8, width=320, height=240, n_points=1500, seed=4, patch=3)
slam = S.SlamSystem(tiny_config())
f0 = slam._extract(jnp.asarray(seq.frame(0)[0]))
f1 = slam._extract(jnp.asarray(seq.frame(7)[0]))
mask = matcher.radius_mask(f0.uv, f1.uv, 100.0)
idx, _ = matcher.match_descriptors(f0, f1, mask=mask, max_dist=matcher.TH_LOW, ratio=0.9)
matched = idx >= 0
r1 = cam.unproject(slam.K, f0.uv)
r2 = cam.unproject(slam.K, f1.uv[jnp.clip(idx, 0)])
st = (2.0 / float(slam.K[0]))**2

Tg = lie.se3_compose(seq.poses_gt[7], lie.se3_inverse(seq.poses_gt[0]))
Rg = lie.quat_to_matrix(Tg[:4]); tg = Tg[4:7]
Eg = lie.hat(tg/jnp.linalg.norm(tg)) @ Rg
err_gt = tv._sampson_err(Eg, r1, r2)
print("GT E: inliers", int(jnp.sum((err_gt < st) & matched)), "of", int(jnp.sum(matched)))
print("GT E: median err(matched)/thresh", float(jnp.median(jnp.where(matched, err_gt, jnp.nan))/st))

# LS fit on all matched
w = matched.astype(jnp.float32)
E_ls = tv._to_essential(tv._eight_point(r1, r2, w))
err_ls = tv._sampson_err(E_ls, r1, r2)
print("LS E: inliers", int(jnp.sum((err_ls < st) & matched)))
# direction of translation from decomposition
for name, E in (("gt", Eg), ("ls", E_ls)):
    cands = tv._decompose_E(E)
    print(name, "cand t dirs:", np.round(np.asarray(cands[:, 4:7]), 3).tolist())
print("gt t dir", np.asarray(tg/jnp.linalg.norm(tg)))
