import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState
from rumi_slam_tpu.rumination.backend import RuminationBackend
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.tracking import loop_closing as LC

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
    dst_rows = np.flatnonzero(kf_v & (kf_map == 0))
    src_rows = np.flatnonzero(kf_v & (kf_map == 1))
    for a in dst_rows[-4:]:
        for b in src_rows:
            d = matcher.hamming_matrix(ms.kf_desc[a], ms.kf_desc[b])
            ok_a = (ms.kf_point[a] >= 0) & ms.kf_feat_valid[a]
            ok_b = (ms.kf_point[b] >= 0) & ms.kf_feat_valid[b]
            idx, _ = matcher.match(d, ok_a, ok_b, max_dist=80.0, ratio=0.9)
            sc = int(jnp.sum(idx >= 0))
            S, n_inl, _ = LC.verify_loop(jax.random.PRNGKey(0), slam2.K, ms, int(a), int(b),
                n_hyp=256, thresh_px=8.0, max_hamming=80.0, nn_ratio=0.9)
            print(f"  pair kf{a}(t={float(ms.kf_time[a]):.2f}) x kf{b}(t={float(ms.kf_time[b]):.2f}): score={sc} sim3_inl={int(n_inl)}")
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    if coord.maybe_ruminate(): break
