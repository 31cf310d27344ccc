import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.rumination.backend import RuminationBackend
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import pnp

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=4, lost_span=(45, 55), trajectory="sweep")
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
slam = SlamSystem(cfg)
coord = RuminationCoordinator(slam, cfg)
def spy(self, bundle):
    slam2 = SlamSystem(self.cfg)
    for f in bundle:
        slam2.track_monocular(jnp.asarray(f.image), f.time)
    ms = slam2.ms
    obs_desc = ms.kf_desc.reshape(-1, 8)
    obs_pt = jnp.where(ms.kf_valid[:, None], ms.kf_point, -1).reshape(-1)
    obs_ok = ((obs_pt >= 0) & ms.pt_valid[jnp.clip(obs_pt, 0)]
              & (ms.pt_map_id[jnp.clip(obs_pt, 0)] == 0))
    b = 9
    desc = ms.kf_desc[b]; uv = ms.kf_uv[b]; fv = ms.kf_feat_valid[b]
    dist = matcher.hamming_matrix(desc, obs_desc)
    idx, mdist = matcher.match(dist, fv, obs_ok, max_dist=80.0, ratio=0.9)
    pt = jnp.where(idx >= 0, obs_pt[jnp.clip(idx, 0)], -1)
    matched = pt >= 0
    X = ms.pt_xyz[jnp.clip(pt, 0)]
    for th in [5.0, 10.0, 16.0, 24.0]:
        res = pnp.pnp_ransac(jax.random.PRNGKey(3), slam2.K, X, uv, matched,
                             quality=80.0-mdist, reproj_thresh=th, n_hyp=2048)
        print(f"  th={th}: m={int(jnp.sum(matched))} inl={int(res.n_inliers)}")
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    if coord.maybe_ruminate(): break
