import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.ops import matcher

cfg = tiny_config()
seq = SyntheticSequence(n_frames=30, width=320, height=240, n_points=2000, seed=11, patch=3)
slam = SlamSystem(cfg)
f0 = slam._extract(jnp.asarray(seq.frame(0)[0]))
row, rowl = [], []
for k in [2,4,6,8,10,14,20]:
    fk = slam._extract(jnp.asarray(seq.frame(k)[0]))
    mask = matcher.radius_mask(f0.uv, fk.uv, 100.0)
    idx, _ = matcher.match_descriptors(f0, fk, mask=mask, max_dist=matcher.TH_LOW, ratio=0.9)
    row.append(int(jnp.sum(idx >= 0)))
    idx, _ = matcher.match_descriptors(f0, fk, mask=mask, max_dist=matcher.TH_HIGH, ratio=0.95)
    rowl.append(int(jnp.sum(idx >= 0)))
print("tight matches 0->[2,4,6,8,10,14,20]:", row)
print("loose matches 0->[2,4,6,8,10,14,20]:", rowl)
