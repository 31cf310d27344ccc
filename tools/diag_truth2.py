import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, dataclasses
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem
from rumi_slam_tpu.geometry import lie, alignment

seq = SyntheticSequence(n_frames=110, width=320, height=240, n_points=2000, seed=11,
                        patch=4, lost_span=(45, 55))
cfg = tiny_config()
slam = SlamSystem(cfg)
W = np.asarray(seq.world.xyz)
for i in range(45):
    img, t = seq.frame(i)
    slam.track_monocular(img, t)
ms = slam.ms
kf_sel = np.asarray(ms.kf_valid)
kf_t = np.asarray(ms.kf_time)[kf_sel]
kf_T = np.asarray(ms.kf_pose)[kf_sel]
gt_idx = [int(round(t*30)) for t in kf_t]
c_est = np.stack([np.asarray(lie.se3_t(lie.se3_inverse(jnp.asarray(T)))) for T in kf_T])
c_gt = np.stack([np.asarray(lie.se3_t(lie.se3_inverse(seq.poses_gt[i]))) for i in gt_idx])
S = alignment.umeyama_alignment(jnp.asarray(c_est), jnp.asarray(c_gt))
res = np.asarray(lie.sim3_apply(S, jnp.asarray(c_est))) - c_gt
print("edge traj align rms:", float(np.sqrt((res**2).sum(1).mean())))
P = np.asarray(ms.pt_xyz)[np.asarray(ms.pt_valid)]
Pw = np.asarray(lie.sim3_apply(S, jnp.asarray(P)))
d = np.linalg.norm(Pw[:, None, :] - W[None], axis=-1)
nnd = d.min(1)
print(f"edge map: {len(P)} pts; median nearest-landmark dist {np.median(nnd):.3f}; "
      f"<0.1: {(nnd<0.1).mean():.2f} <0.3: {(nnd<0.3).mean():.2f}")

# decompose point error: along viewing ray vs perpendicular (from ref KF)
ref = np.asarray(ms.pt_ref_kf)[np.asarray(ms.pt_valid)]
centers = np.stack([np.asarray(lie.se3_t(lie.se3_inverse(jnp.asarray(T)))) for T in np.asarray(ms.kf_pose)])
cw = np.asarray(lie.sim3_apply(S, jnp.asarray(centers)))  # in GT world
nnid = d.argmin(1)
Lgt = W[nnid]
err = Pw - Lgt
c = cw[np.clip(ref, 0, len(cw)-1)]
ray = Pw - c
rayn = ray / np.maximum(np.linalg.norm(ray, axis=1, keepdims=True), 1e-9)
along = np.abs((err * rayn).sum(1))
perp = np.linalg.norm(err - (err * rayn).sum(1, keepdims=True) * rayn, axis=1)
print(f"median along-ray err {np.median(along):.3f}, median perp err {np.median(perp):.3f}")
# gt depth of points
print("median |err|:", np.median(np.linalg.norm(err,axis=1)))

# self-consistency: reproject associated points into their KFs
from rumi_slam_tpu.geometry import camera
kp = np.asarray(ms.kf_point)
errs = []
for k in np.flatnonzero(kf_sel):
    obs = np.flatnonzero(kp[k] >= 0)
    if len(obs) == 0: continue
    X = np.asarray(ms.pt_xyz)[kp[k][obs]]
    uvp, dep = camera.project_world(slam.K, jnp.asarray(ms.kf_pose[k]), jnp.asarray(X))
    e = np.linalg.norm(np.asarray(uvp) - np.asarray(ms.kf_uv)[k][obs], axis=1)
    errs.append(e)
errs = np.concatenate(errs)
print(f"self reprojection: n={len(errs)} median={np.median(errs):.2f}px p90={np.percentile(errs,90):.2f}px")

# identity via GT projection proximity per KF feature
from rumi_slam_tpu.geometry import camera as cam2
along_l, perp_l, absd = [], [], []
for k in np.flatnonzero(kf_sel):
    gi = int(round(float(ms.kf_time[k])*30))
    uvgt, depgt = cam2.project_world(slam.K, seq.poses_gt[gi], jnp.asarray(W))
    uvgt = np.asarray(uvgt); visg = np.asarray(depgt) > 0.3
    obs = np.flatnonzero(kp[k] >= 0)
    uvo = np.asarray(ms.kf_uv)[k][obs]
    du = np.linalg.norm(uvo[:, None] - uvgt[None], axis=-1)
    du[:, ~visg] = 1e9
    lid = du.argmin(1); ld = du.min(1)
    sel = ld < 2.0
    Xp = np.asarray(ms.pt_xyz)[kp[k][obs[sel]]]
    Xw = np.asarray(lie.sim3_apply(S, jnp.asarray(Xp)))
    L = W[lid[sel]]
    e = Xw - L
    gc = np.asarray(lie.se3_t(lie.se3_inverse(seq.poses_gt[gi])))
    ray = L - gc; rayn = ray/np.maximum(np.linalg.norm(ray,axis=1,keepdims=True),1e-9)
    along_l.append(np.abs((e*rayn).sum(1)))
    perp_l.append(np.linalg.norm(e - (e*rayn).sum(1,keepdims=True)*rayn, axis=1))
    absd.append(np.linalg.norm(e, axis=1))
along_l = np.concatenate(along_l); perp_l = np.concatenate(perp_l); absd = np.concatenate(absd)
print(f"identity-based: n={len(absd)} median |err| {np.median(absd):.3f} along {np.median(along_l):.3f} perp {np.median(perp_l):.3f}")
print("frac err<0.1:", (absd<0.1).mean(), "err<0.3:", (absd<0.3).mean())

print("S scale:", float(lie.sim3_scale(S)))
k = int(np.flatnonzero(kf_sel)[5])
gi = int(round(float(ms.kf_time[k])*30))
obs = np.flatnonzero(kp[k] >= 0)[:5]
Xp = np.asarray(ms.pt_xyz)[kp[k][obs]]
Xw = np.asarray(lie.sim3_apply(S, jnp.asarray(Xp)))
uvp, dep = cam2.project_world(slam.K, seq.poses_gt[gi], jnp.asarray(Xw))
print("stored uv:", np.asarray(ms.kf_uv)[k][obs].round(1))
print("aligned-point reproj in GT cam:", np.asarray(uvp).round(1), "depth:", np.asarray(dep).round(2))
ce = np.asarray(lie.sim3_apply(S, jnp.asarray(lie.se3_t(lie.se3_inverse(jnp.asarray(ms.kf_pose[k]))))))
cg = np.asarray(lie.se3_t(lie.se3_inverse(seq.poses_gt[gi])))
print("centers est-aligned vs gt:", ce.round(2), cg.round(2))

# alignment conditioned on orientation: centers + forward-axis virtual pts
def cam_axes(T_cw):
    T_wc = lie.se3_inverse(jnp.asarray(T_cw))
    c = lie.se3_t(T_wc)
    z = lie.quat_rotate(T_wc[:4], jnp.asarray([0.0, 0.0, 1.0]))
    return np.asarray(c), np.asarray(z)
src, dst = [], []
for k in np.flatnonzero(kf_sel):
    gi = int(round(float(ms.kf_time[k])*30))
    ce, ze = cam_axes(ms.kf_pose[k])
    cg, zg = cam_axes(seq.poses_gt[gi])
    # note: est axis length scales with map scale; use unit axes on both and
    # let scale come from centers only is impossible in one Umeyama — instead
    # add axis endpoints at a moderate arm so scale is still center-dominated
    src += [ce, ce + 1.0*ze]
    dst += [cg, cg + 1.0*zg]
S2 = alignment.umeyama_alignment(jnp.asarray(np.stack(src)), jnp.asarray(np.stack(dst)))
print("S2 scale:", float(lie.sim3_scale(S2)))
Xw2 = np.asarray(lie.sim3_apply(S2, jnp.asarray(np.asarray(ms.pt_xyz)[np.asarray(ms.pt_valid)])))
d2 = np.linalg.norm(Xw2[:, None, :] - W[None], axis=-1)
nnd2 = d2.min(1)
print(f"edge map vs landmarks (orient-anchored): median {np.median(nnd2):.3f} <0.1: {(nnd2<0.1).mean():.2f} <0.3: {(nnd2<0.3).mean():.2f}")

s_traj = float(lie.sim3_scale(S))
print("traj scale:", s_traj)
src, dst = [], []
for k in np.flatnonzero(kf_sel):
    gi = int(round(float(ms.kf_time[k])*30))
    ce, ze = cam_axes(ms.kf_pose[k])
    cg, zg = cam_axes(seq.poses_gt[gi])
    src += [ce, ce + (1.0/s_traj)*ze]   # arm = 1 GT unit in est scale
    dst += [cg, cg + 1.0*zg]
S3 = alignment.umeyama_alignment(jnp.asarray(np.stack(src)), jnp.asarray(np.stack(dst)))
print("S3 scale:", float(lie.sim3_scale(S3)))
Xw3 = np.asarray(lie.sim3_apply(S3, jnp.asarray(np.asarray(ms.pt_xyz)[np.asarray(ms.pt_valid)])))
d3 = np.linalg.norm(Xw3[:, None, :] - W[None], axis=-1)
nnd3 = d3.min(1)
print(f"orient+scale-anchored: median {np.median(nnd3):.3f} <0.1: {(nnd3<0.1).mean():.2f} <0.3: {(nnd3<0.3).mean():.2f}")

rows = np.flatnonzero(kf_sel)
print("per-consecutive-KF scale ratio (est_baseline*12/gt_baseline):")
for a, b in zip(rows[:-1], rows[1:]):
    ga, gb = int(round(float(ms.kf_time[a])*30)), int(round(float(ms.kf_time[b])*30))
    ca, _ = cam_axes(ms.kf_pose[a]); cb, _ = cam_axes(ms.kf_pose[b])
    cga, _ = cam_axes(seq.poses_gt[ga]); cgb, _ = cam_axes(seq.poses_gt[gb])
    be = np.linalg.norm(cb-ca) * s_traj
    bg = np.linalg.norm(cgb-cga)
    print(f"  kf{a}->{b} t={float(ms.kf_time[b]):.2f}: {be/max(bg,1e-9):.2f}")

print("kf0 pose:", np.asarray(ms.kf_pose[rows[0]]))
print("kf1 pose:", np.asarray(ms.kf_pose[rows[1]]))
print("kf0 time:", float(ms.kf_time[rows[0]]), "kf1 time:", float(ms.kf_time[rows[1]]))
print("centers:", cam_axes(ms.kf_pose[rows[0]])[0], cam_axes(ms.kf_pose[rows[1]])[0])
