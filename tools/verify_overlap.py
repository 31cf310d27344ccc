import sys; sys.path.insert(0, "/root/repo")
import jax, dataclasses, time
jax.config.update("jax_platforms", "cpu")
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
import numpy as np

seq = SyntheticSequence(n_frames=45, width=320, height=240, n_points=1500, seed=4, patch=3)
for mode in [False, True]:
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, mapping=dataclasses.replace(cfg.mapping, overlapped=mode))
    slam = SlamSystem(cfg)
    lat = []
    ok = 0
    for i in range(len(seq)):
        img, t = seq.frame(i)
        t0 = time.perf_counter()
        st = slam.track_monocular(img, t)
        lat.append(time.perf_counter() - t0)
        ok += st.name == "OK"
    slam.sync_mapping()
    from rumi_slam_tpu.evaluation import ate as A
    ts, ps = slam.trajectory_of_map()
    gt = np.stack([np.asarray(p) for p in seq.poses_gt])
    r = A.evaluate_trajectory(ts, ps, seq.times, gt)
    lat = np.array(lat[10:]) * 1000
    print(f"overlapped={mode}: ok={ok}/45 ate={r['ate']:.4f} "
          f"lat p50={np.percentile(lat,50):.0f}ms p95={np.percentile(lat,95):.0f}ms max={lat.max():.0f}ms "
          f"stats={slam.stats}")
    if slam.mapper: slam.mapper.shutdown()
