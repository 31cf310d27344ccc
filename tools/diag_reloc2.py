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
        st = slam2.track_monocular(jnp.asarray(f.image), f.time)
        if st == TrackState.RECENTLY_LOST and f.time > 1.85:
            feats = slam2._extract(jnp.asarray(f.image))
            tr, ref = tracker.relocalize_map(jax.random.PRNGKey(0), slam2.ms, slam2.K, feats)
            print(f"  t={f.time:.3f} map-reloc: cands={int(tr.n_candidates)} inl={int(tr.n_inliers)} need={self.cfg.tracking.min_track_inliers}")
    print("  backend map: n_pt", int(jnp.sum(slam2.ms.pt_valid)), "n_kf", slam2.stats["n_kf"])
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    if coord.maybe_ruminate(): break
