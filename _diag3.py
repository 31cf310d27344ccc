import jax, jax.numpy as jnp
from functools import partial
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu import system as S
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.optim import two_view as tv
from rumi_slam_tpu.geometry import camera as cam, lie, triangulation

@jax.jit
def diag(key, ray1, ray2, valid, focal):
    st = (2.0 / focal) ** 2
    n = ray1.shape[0]
    probs = valid.astype(jnp.float32); probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.categorical(key, jnp.log(jnp.maximum(probs,1e-12))[None,:].repeat(256*8,0)).reshape(256,8)
    Es = jax.vmap(lambda ii: tv._eight_point(ray1[ii], ray2[ii]))(idx)
    errs = jax.vmap(lambda E: tv._sampson_err(E, ray1, ray2))(Es)
    scores = jnp.sum((errs < st) & valid[None,:], axis=-1)
    E = Es[jnp.argmax(scores)]
    U,_,Vt = jnp.linalg.svd(E); E = U @ jnp.diag(jnp.array([1.,1.,0.])) @ Vt
    cands = tv._decompose_E(E)
    T1 = jnp.broadcast_to(lie.se3_identity(), (n,7))
    def score_cand(T21):
        T2 = jnp.broadcast_to(T21, (n,7))
        X = triangulation.triangulate_dlt(T1, T2, ray1, ray2)
        z1 = X[:,2]; z2 = lie.se3_apply(T21, X)[:,2]
        err = tv._sampson_err(E, ray1, ray2)
        good = valid & (z1>1e-3) & (z2>1e-3) & (err<st)
        return jnp.sum(good), X, good
    counts, Xs, goods = jax.vmap(score_cand)(cands)
    bi = jnp.argmax(counts)
    T21, X, good = cands[bi], Xs[bi], goods[bi]
    c2 = lie.se3_t(lie.se3_inverse(T21))
    d1 = X; d2 = X - c2
    cosp = jnp.sum(d1*d2,-1)/jnp.maximum(jnp.linalg.norm(d1,axis=-1)*jnp.linalg.norm(d2,axis=-1),1e-12)
    mz = jnp.nanmedian(jnp.where(good, X[:,2], jnp.nan))
    medcos = jnp.nanmedian(jnp.where(good, cosp, jnp.nan))
    return counts, jnp.sum(good & (cosp<0.9998)), mz, medcos, T21

seq = SyntheticSequence(n_frames=8, width=320, height=240, n_points=1500, seed=4, patch=3)
slam = S.SlamSystem(tiny_config())
f0 = slam._extract(jnp.asarray(seq.frame(0)[0]))
f1 = slam._extract(jnp.asarray(seq.frame(7)[0]))
mask = matcher.radius_mask(f0.uv, f1.uv, 100.0)
idx, _ = matcher.match_descriptors(f0, f1, mask=mask, max_dist=matcher.TH_LOW, ratio=0.9)
matched = idx >= 0
r1 = cam.unproject(slam.K, f0.uv)
r2 = cam.unproject(slam.K, f1.uv[jnp.clip(idx, 0)])
counts, n_par, mz, medcos, T21 = diag(jax.random.PRNGKey(0), r1, r2, matched, float(slam.K[0]))
print("counts", counts, "n w/ parallax", int(n_par))
print("median depth (t=1 units)", float(mz), "median cosp", float(medcos))
import numpy as np
print("T21", np.asarray(T21))
# ground truth relative pose
Tg = lie.se3_compose(seq.poses_gt[7], lie.se3_inverse(seq.poses_gt[0]))
print("T21 gt", np.asarray(Tg), " |t| gt", float(jnp.linalg.norm(Tg[4:7])))
