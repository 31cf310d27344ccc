import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState
from rumi_slam_tpu.rumination.backend import RuminationBackend
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
from rumi_slam_tpu.tracking import tracker
from rumi_slam_tpu.mapstate import map_state as M
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import pnp

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=4, lost_span=(45, 55))
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
slam = SlamSystem(cfg)
coord = RuminationCoordinator(slam, cfg)
def spy(self, bundle):
    slam2 = SlamSystem(self.cfg)
    for f in bundle:
        st = slam2.track_monocular(jnp.asarray(f.image), f.time)
        if st == TrackState.RECENTLY_LOST and f.time > 1.85:
            feats = slam2._extract(jnp.asarray(f.image))
            ms = slam2.ms
            cand, sc = tracker.relocalization_candidates(ms, feats)
            B = M.incidence(ms)
            Wg = M.covisibility(ms)
            for r in range(2):
                kf = int(cand[r])
                grp = (Wg[kf] > 0) | (jnp.arange(ms.max_kf) == kf)
                vis = jnp.any(B & grp[:, None], axis=0)
                dist = matcher.hamming_matrix(feats.desc, ms.pt_desc)
                for md, rt in [(50.0, 0.9), (80.0, 0.8)]:
                    idx, _ = matcher.match(dist, feats.valid, vis, max_dist=md, ratio=rt)
                    matched = idx >= 0
                    X = ms.pt_xyz[jnp.clip(idx, 0)]
                    res = pnp.pnp_ransac(jax.random.PRNGKey(1), slam2.K, X, feats.uv, matched)
                    print(f"  t={f.time:.3f} kf={kf} grp_pts={int(jnp.sum(vis))} md={md} m={int(jnp.sum(matched))} inl={int(res.n_inliers)}")
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    if coord.maybe_ruminate(): break
