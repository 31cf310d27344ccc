import time, jax, jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import Config
from rumi_slam_tpu.ops import orb, image, fast, select

cfg = Config(); o = cfg.orb
H, W = cfg.camera.height, cfg.camera.width
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0,255,(H,W)).astype(np.float32))

def bench(f, *a, n=60):
    r=f(*a); jax.block_until_ready(r)
    t0=time.perf_counter()
    rs=[f(*a) for _ in range(n)]
    jax.block_until_ready(rs)
    return (time.perf_counter()-t0)/n*1000

nl, sf = o.n_levels, o.scale_factor
pyr_j = jax.jit(lambda im: image.build_pyramid(im, nl, sf))
pyr = pyr_j(img)
print("pyramid     ms:", round(bench(pyr_j, img),3))

def fast_all(im):
    pyr = image.build_pyramid(im, nl, sf)
    outs=[]
    for lvl in range(nl):
        s,w = fast.fast_score_pair(pyr[lvl], o.ini_th_fast, o.min_th_fast)
        outs.append((fast.nms3x3(s), fast.nms3x3(w)))
    return outs
fa = jax.jit(fast_all)
print("pyr+FAST+nms ms:", round(bench(fa, img),3))

budgets = orb.level_budgets(o.n_features, nl, sf)
def thru_select(im):
    pyr = image.build_pyramid(im, nl, sf)
    res=[]
    for lvl in range(nl):
        s,w = fast.fast_score_pair(pyr[lvl], o.ini_th_fast, o.min_th_fast)
        s=fast.nms3x3(s); w=fast.nms3x3(w)
        score = jnp.where(s>0, s+1e6, w)
        res.append(select.select_keypoints(score, budgets[lvl], cell=o.cell, k_cell=o.k_cell))
    return res
ts = jax.jit(thru_select)
print("+select      ms:", round(bench(ts, img),3))

def thru_patches(im):
    pyr = image.build_pyramid(im, nl, sf)
    pl=[]
    for lvl in range(nl):
        s,w = fast.fast_score_pair(pyr[lvl], o.ini_th_fast, o.min_th_fast)
        s=fast.nms3x3(s); w=fast.nms3x3(w)
        score = jnp.where(s>0, s+1e6, w)
        yx,resp,valid = select.select_keypoints(score, budgets[lvl], cell=o.cell, k_cell=o.k_cell)
        pl.append(image.gather_patches(pyr[lvl], yx, orb.PATCH_R))
    return pl
tp = jax.jit(thru_patches)
print("+patches     ms:", round(bench(tp, img),3))

full = jax.jit(lambda im: orb.extract_orb(im, n_features=o.n_features, n_levels=nl,
   scale_factor=sf, threshold=o.ini_th_fast, min_threshold=o.min_th_fast, cell=o.cell, k_cell=o.k_cell))
print("full extract ms:", round(bench(full, img),3))

# descriptor matmul alone
patches = jnp.concatenate(tp(img),0)
ang = orb._orientation(patches)
blur_j = jax.jit(image.blur_patches)
print("blur_patches ms:", round(bench(blur_j, patches),3))
desc_j = jax.jit(orb._descriptors)
blurred = blur_j(patches)
print("descriptors  ms:", round(bench(desc_j, blurred, ang),3))
