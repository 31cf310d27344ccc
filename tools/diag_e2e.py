import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=3, lost_span=(45, 55))
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
slam = SlamSystem(cfg)
import time
t0=time.time()
for i in range(30):
    img, t = seq.frame(i)
    st = slam.track_monocular(img, t)
    print(i, st.name, slam.stats["n_kf"], f"{time.time()-t0:.1f}s", flush=True)
