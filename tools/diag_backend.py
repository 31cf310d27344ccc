import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState
from rumi_slam_tpu.rumination.sampler import BundleAssembler
from rumi_slam_tpu.rumination.backend import RuminationBackend

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=3, lost_span=(45, 55))
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))

# run the edge to produce the bundle via the coordinator's sampler
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
slam = SlamSystem(cfg)
coord = RuminationCoordinator(slam, cfg)  # sync
bundle_holder = {}
orig_build = RuminationBackend.build
def spy(self, bundle):
    bundle_holder['b'] = bundle
    slam2 = SlamSystem(self.cfg)
    for f in bundle:
        st = slam2.track_monocular(jnp.asarray(f.image), f.time)
        print(f"  backend t={f.time:.3f} -> {st.name} kf={slam2.stats['n_kf']} maps={slam2.stats['n_new_maps']}", flush=True)
    return orig_build(self, bundle)
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    info = coord.maybe_ruminate()
    if info:
        print("coord:", {k: v for k, v in info.items() if k != 'cloud_merge'}, flush=True)
        break
