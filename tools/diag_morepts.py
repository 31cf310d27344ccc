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
from rumi_slam_tpu.mapstate import map_state as M

orig = MW.run_mapping_round
def fat_round(ms, K, cfg, kf_id, *, use_stereo, key, kf_count):
    snap = ms
    events = {"n_new": 0, "n_fused": 0, "loop": False}
    cam = cfg.camera
    ids, valid_w = M.local_window(ms, kf_id, window=5)
    for j in range(1, 5):
        if bool(valid_w[j]) and int(ids[j]) != int(kf_id):
            ms, n_new = LM.triangulate_with_neighbor(ms, K, kf_id, int(ids[j]))
            events["n_new"] += int(n_new)
    ms, n_fused = LM.fuse_with_neighbors(ms, K, kf_id, window=4, img_w=cam.width, img_h=cam.height)
    events["n_fused"] = int(n_fused)
    ms = LM.local_bundle_adjustment(ms, K, kf_id, window=cfg.mapping.local_window,
        n_iters=cfg.mapping.local_ba_iters, use_stereo=use_stereo, bf=cam.bf)
    ms = LM.cull_points(ms)
    ms = M.refresh_point_descriptors(ms, kf_id)
    return MW.MappingOutcome(snap=snap, mapped=ms, events=events)

for mode in ["base", "fat"]:
    MW.run_mapping_round = orig if mode == "base" else fat_round
    seq = SyntheticSequence(n_frames=60, width=320, height=240, n_points=2000, seed=11,
                            patch=4, trajectory="sweep")
    slam = SlamSystem(tiny_config())
    for i in range(46):
        img, t = seq.frame(i)
        slam.track_monocular(img, t)
    ms = slam.ms
    outs = []
    for fidx in [44, 50, 57]:
        feats = slam._extract(jnp.asarray(seq.frame(fidx)[0]))
        tr, _ = tracker.relocalize_map(jax.random.PRNGKey(0), ms, slam.K, feats)
        outs.append(f"{fidx}:{int(tr.n_inliers)}/{int(tr.n_candidates)}")
    print(f"{mode}: n_pt={int(jnp.sum(ms.pt_valid))} reloc {' '.join(outs)}")
