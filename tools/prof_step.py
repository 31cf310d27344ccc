import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import entry
from rumi_slam_tpu.config import Config
from rumi_slam_tpu.ops import orb
from rumi_slam_tpu.tracking import tracker
from rumi_slam_tpu.geometry import lie

step, (img, ms, pose) = entry()
cfg = Config(); o = cfg.orb; K = cfg.intrinsics()
H, W = cfg.camera.height, cfg.camera.width

ext = jax.jit(lambda im: orb.extract_orb(im, n_features=o.n_features, n_levels=o.n_levels,
    scale_factor=o.scale_factor, threshold=o.ini_th_fast, min_threshold=o.min_th_fast,
    cell=o.cell, k_cell=o.k_cell))
feats = ext(img); jax.block_until_ready(feats)
trk = jax.jit(lambda f, p: tracker.track_frame(ms, K, f, p, cfg.tracking.match_radius, img_w=W, img_h=H, fused=True))
out = trk(feats, pose); jax.block_until_ready(out)

def bench(f, *a, n=60):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [f(*a) for _ in range(n)]
    jax.block_until_ready(rs)
    return (time.perf_counter()-t0)/n*1000

print("extract ms:", round(bench(ext, img),3))
print("track   ms:", round(bench(trk, feats, pose),3))
sj = jax.jit(step)
r = sj(img, ms, pose); jax.block_until_ready(r)
print("full    ms:", round(bench(sj, img, ms, pose),3))
