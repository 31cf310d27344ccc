import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator

for span in [(45, 51), (45, 55)]:
    seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                            patch=4, lost_span=span, trajectory="sweep")
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
    slam = SlamSystem(cfg)
    coord = RuminationCoordinator(slam, cfg)
    res = None
    for i in range(len(seq)):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
        info = coord.maybe_ruminate()
        if info:
            res = info
            break
    print(f"span={span}: stats={slam.stats}")
    print(f"  result={ {k: v for k, v in (res or {}).items()} }", flush=True)
