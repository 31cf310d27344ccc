import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState
from rumi_slam_tpu.rumination.backend import RuminationBackend
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=4, lost_span=(45, 55), trajectory="sweep")
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
slam = SlamSystem(cfg)
coord = RuminationCoordinator(slam, cfg)
orig_build = RuminationBackend.build
def spy(self, bundle):
    slam2 = SlamSystem(self.cfg)
    for f in bundle:
        st = slam2.track_monocular(jnp.asarray(f.image), f.time)
    print("backend: n_maps", int(slam2.ms.n_maps), "stats", slam2.stats)
    kf_v = np.asarray(slam2.ms.kf_valid)
    print("backend KF (time, map):", [(round(float(t),2), int(m)) for t, m, v in
          zip(np.asarray(slam2.ms.kf_time), np.asarray(slam2.ms.kf_map_id), kf_v) if v])
    cm = orig_build(self, bundle)
    if cm is not None:
        print("cloudmap KF times:", [round(float(t),2) for t, v in
              zip(np.asarray(cm.kf_time), np.asarray(cm.kf_valid)) if v])
    # edge-back KF times for comparison
    msE = slam.ms
    print("edge-back KF times:", [round(float(t),2) for t, m, v in
          zip(np.asarray(msE.kf_time), np.asarray(msE.kf_map_id), np.asarray(msE.kf_valid))
          if v and int(m) == 1])
    return cm
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    info = coord.maybe_ruminate()
    if info:
        print("result:", info.get("result"), info.get("back_merge"))
        break
