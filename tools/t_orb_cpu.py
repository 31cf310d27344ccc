import numpy as np, jax, jax.numpy as jnp
from rumi_slam_tpu.ops import orb
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0,255,(240,320)).astype(np.float32))
import time
t0=time.time()
f = orb.extract_orb(img, n_features=512, n_levels=4)
jax.block_until_ready(f.desc)
print("cpu compile+run s:", round(time.time()-t0,1), "valid:", int(f.valid.sum()))
# shift invariance quick check
img2 = jnp.roll(img, 2, axis=1)
f2 = orb.extract_orb(img2, n_features=512, n_levels=4)
from rumi_slam_tpu.ops import matcher
d = matcher.hamming_matrix(f.desc[:50], f2.desc)
print("min hamming of first 50 kps vs shifted:", float(jnp.median(jnp.min(d, axis=1))))
