import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState
from rumi_slam_tpu.rumination.backend import RuminationBackend
from rumi_slam_tpu.rumination.coordinator import RuminationCoordinator
from rumi_slam_tpu.ops import matcher
from rumi_slam_tpu.geometry import lie, alignment, camera

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=4, lost_span=(45, 55))
cfg = tiny_config()
cfg = dataclasses.replace(cfg, tracking=dataclasses.replace(cfg.tracking, reloc_window_s=0.1))
slam = SlamSystem(cfg)
coord = RuminationCoordinator(slam, cfg)
W = np.asarray(seq.world.xyz)

def spy(self, bundle):
    slam2 = SlamSystem(self.cfg)
    for f in bundle:
        slam2.track_monocular(jnp.asarray(f.image), f.time)
    ms = slam2.ms
    # align backend KF centers to GT camera centers by timestamp
    kf_sel = np.asarray(ms.kf_valid)
    kf_t = np.asarray(ms.kf_time)[kf_sel]
    kf_T = np.asarray(ms.kf_pose)[kf_sel]
    gt_idx = [int(round(t*30)) for t in kf_t]
    c_est = np.stack([np.asarray(lie.se3_t(lie.se3_inverse(jnp.asarray(T)))) for T in kf_T])
    c_gt = np.stack([np.asarray(lie.se3_t(lie.se3_inverse(seq.poses_gt[i]))) for i in gt_idx])
    S = alignment.umeyama_alignment(jnp.asarray(c_est), jnp.asarray(c_gt))  # sim3 est->gt
    # transform map points to GT world
    P = np.asarray(ms.pt_xyz)[np.asarray(ms.pt_valid)]
    Pw = np.asarray(lie.sim3_apply(S, jnp.asarray(P)))
    # identity: nearest GT landmark
    d = np.linalg.norm(Pw[:, None, :] - W[None, :2000:1, :], axis=-1)
    nn = d.argmin(1); nnd = d.min(1)
    print(f"backend map: {len(P)} pts; median dist to nearest GT landmark: {np.median(nnd):.3f}")
    print(f"  frac within 0.1: {(nnd<0.1).mean():.2f}, within 0.3: {(nnd<0.3).mean():.2f}")
    # now check cross-gap matches: frame t=1.967
    fidx = 59
    img, t = seq.frame(fidx)
    feats = slam2._extract(jnp.asarray(img))
    uvgt, depgt = camera.project_world(slam2.K, seq.poses_gt[fidx], jnp.asarray(W))
    # feature identity = nearest projected visible GT landmark
    vis = (depgt > 0.3)
    du = np.linalg.norm(np.asarray(feats.uv)[:, None, :] - np.asarray(uvgt)[None], axis=-1)
    du[:, ~np.asarray(vis)] = 1e9
    fid = du.argmin(1); fdist = du.min(1)
    dist = matcher.hamming_matrix(feats.desc, ms.pt_desc)
    idx, _ = matcher.match(dist, feats.valid, ms.pt_valid, max_dist=50.0, ratio=0.9)
    idx = np.asarray(idx)
    rows = np.flatnonzero(np.asarray(ms.pt_valid))
    rowpos = {r: i for i, r in enumerate(rows)}
    ok = wrong = 0
    for fi in np.flatnonzero(idx >= 0):
        mp = idx[fi]
        if mp in rowpos and fdist[fi] < 3:
            if nn[rowpos[mp]] == fid[fi] and nnd[rowpos[mp]] < 0.3:
                ok += 1
            else:
                wrong += 1
    print(f"  cross-gap matches: correct={ok} wrong={wrong}")
    return None
RuminationBackend.build = spy
for i in range(len(seq)):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
    if coord.maybe_ruminate(): break
