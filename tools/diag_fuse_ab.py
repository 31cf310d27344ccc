import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.tracking import tracker
import rumi_slam_tpu.tracking.mapping_worker as MW
import rumi_slam_tpu.tracking.local_mapping as LM

seq = SyntheticSequence(n_frames=60, width=320, height=240, n_points=2000, seed=11,
                        patch=4, trajectory="sweep")
orig_fuse = LM.fuse_with_neighbors
for fuse_on in [True, False]:
    LM.fuse_with_neighbors = orig_fuse if fuse_on else (lambda ms, K, kid, **kw: (ms, jnp.int32(0)))
    slam = SlamSystem(tiny_config())
    for i in range(45):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
    ms = slam.ms
    outs = []
    for fidx in [40, 44, 50, 57]:
        feats = slam._extract(jnp.asarray(seq.frame(fidx)[0]))
        tr, ref = tracker.relocalize_map(jax.random.PRNGKey(0), ms, slam.K, feats)
        outs.append(f"{fidx}:{int(tr.n_inliers)}/{int(tr.n_candidates)}")
    print(f"fuse={fuse_on}: n_pt={int(jnp.sum(ms.pt_valid))} reloc inl/cands: {' '.join(outs)} stats={ {k:v for k,v in slam.stats.items() if 'fused' in k or k=='n_kf'} }")
