import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.rumination.backend import RuminationBackend
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
from rumi_slam_tpu.tracking import tracker
from rumi_slam_tpu.ops import orb

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
    kf_map = np.asarray(ms.kf_map_id); kf_v = np.asarray(ms.kf_valid)
    src_rows = np.flatnonzero(kf_v & (kf_map == 1))
    print("src rows:", src_rows)
    for rank, b in enumerate(src_rows[:5]):
        feats = orb.Features(uv=ms.kf_uv[b], response=jnp.zeros_like(ms.kf_angle[b]),
            angle=ms.kf_angle[b], octave=ms.kf_octave[b], desc=ms.kf_desc[b],
            valid=ms.kf_feat_valid[b])
        tr, _ = tracker.relocalize_map(jax.random.PRNGKey(1000+rank), ms, slam2.K, feats, map_id=0)
        print(f"  src kf{b} t={float(ms.kf_time[b]):.2f}: cands={int(tr.n_candidates)} inl={int(tr.n_inliers)}")
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    if coord.maybe_ruminate(): break
