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

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=3, lost_span=(45, 55))
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
slam = SlamSystem(cfg)
coord = RuminationCoordinator(slam, cfg)
orig_build = RuminationBackend.build
def spy(self, bundle):
    slam2 = SlamSystem(self.cfg)
    for f in bundle:
        st = slam2.track_monocular(jnp.asarray(f.image), f.time)
        if st == TrackState.RECENTLY_LOST and f.time > 1.85:
            feats = slam2._extract(jnp.asarray(f.image))
            cand, sc = tracker.relocalization_candidates(slam2.ms, feats)
            print(f"  t={f.time:.3f} cand={np.asarray(cand)} scores={np.asarray(sc)}")
            for r in range(3):
                kf = int(cand[r])
                tr = tracker.relocalize_pnp(jax.random.PRNGKey(r), slam2.ms, slam2.K, feats, kf)
                tr2 = tracker.track_reference_kf(slam2.ms, slam2.K, feats, kf, slam2.ms.kf_pose[kf])
                print(f"    kf={kf} pnp_inl={int(tr.n_inliers)} refkf_inl={int(tr2.n_inliers)} need={self.cfg.tracking.min_track_inliers}")
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    info = coord.maybe_ruminate()
    if info: break
