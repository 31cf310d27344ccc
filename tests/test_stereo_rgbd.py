"""Stereo/RGB-D frontend + tracking tests (reference TrackStereo/TrackRGBD,
System.h:79-143; Frame::ComputeStereoMatches / ComputeStereoFromRGBD)."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu import system as S
from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.evaluation import ate
from rumi_slam_tpu.geometry import camera, lie
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.ops import stereo


BASELINE = 0.08


def _rgbd_cfg():
    cfg = tiny_config()
    cam = dataclasses.replace(cfg.camera, baseline=BASELINE, th_depth=30.0,
                              depth_factor=1.0)
    return dataclasses.replace(cfg, camera=cam)


def test_depth_from_rgbd_roundtrip():
    cfg = _rgbd_cfg()
    K = cfg.intrinsics()
    h, w = 240, 320
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 8.0, size=(h, w)).astype(np.float32)
    uv = jnp.asarray(rng.uniform([2, 2], [w - 3, h - 3], size=(50, 2)),
                     jnp.float32)
    ur, z = stereo.depth_from_rgbd(jnp.asarray(depth), uv, cfg.camera.bf,
                                   depth_factor=1.0)
    iy = np.round(np.asarray(uv[:, 1])).astype(int)
    ix = np.round(np.asarray(uv[:, 0])).astype(int)
    np.testing.assert_allclose(np.asarray(z), depth[iy, ix], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ur), np.asarray(uv[:, 0]) - cfg.camera.bf / depth[iy, ix],
        rtol=1e-5,
    )
    # zero depth -> invalid
    ur0, z0 = stereo.depth_from_rgbd(jnp.zeros((h, w)), uv, cfg.camera.bf)
    assert np.all(np.asarray(ur0) < 0) and np.all(np.asarray(z0) < 0)


def test_match_stereo_recovers_depth():
    # wide test baseline: at 0.3 m disparities span ~4-40 px, so +-0.5 px
    # keypoint quantization stays under ~12% depth error
    wide_b = 0.3
    cfg = _rgbd_cfg()
    seq = SyntheticSequence(n_frames=2, width=320, height=240, n_points=1200,
                            seed=3, patch=3)
    img_l, img_r, _ = seq.frame_stereo(0, wide_b)
    slam = S.SlamSystem(cfg)
    fl = slam._extract(jnp.asarray(img_l))
    fr = slam._extract(jnp.asarray(img_r))
    K = seq.K
    bf = float(K[0]) * wide_b
    ur, z = stereo.match_stereo(fl, fr, bf, min_z=0.3)
    # oracle: the rendered depth map at the left pose
    from rumi_slam_tpu.io.synthetic import render_depth

    dmap = np.asarray(render_depth(seq.world, K, seq.poses_gt[0],
                                   width=320, height=240, patch=3))
    ok = np.asarray((z > 0) & fl.valid)
    assert ok.sum() > 30, "stereo matcher found too few correspondences"
    uvl = np.asarray(fl.uv)[ok]
    zm = np.asarray(z)[ok]
    iy = np.clip(np.round(uvl[:, 1]).astype(int), 0, 239)
    ix = np.clip(np.round(uvl[:, 0]).astype(int), 0, 319)
    z_true = dmap[iy, ix]
    have = z_true > 0.3
    rel = np.abs(zm[have] - z_true[have]) / z_true[have]
    assert len(rel) > 20
    # majority of matches within 12% of the rendered depth; ambiguous
    # repeated-texture outliers are expected and rejected downstream by the
    # chi2 gates of pose optimization
    assert np.mean(rel < 0.12) > 0.6, float(np.mean(rel < 0.12))
    assert np.median(rel) < 0.12, float(np.median(rel))


def test_backproject_new_points():
    K = jnp.asarray([260.0, 260.0, 159.5, 119.5])
    T_cw = lie.se3(lie.so3_exp(jnp.asarray([0.02, -0.1, 0.05])),
                   jnp.asarray([0.3, -0.2, 0.6]))
    rng = np.random.default_rng(1)
    X_w = jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 8], size=(40, 3)),
                      jnp.float32)
    uv, z = camera.project_world(K, T_cw, X_w)
    has = jnp.zeros(40, bool).at[:10].set(True)  # first 10 already associated
    xyz, make = stereo.backproject_new_points(
        K, T_cw, uv, z, has, jnp.ones(40, bool), th_depth=40.0
    )
    assert not bool(jnp.any(make[:10]))
    sel = np.asarray(make)
    np.testing.assert_allclose(np.asarray(xyz)[sel], np.asarray(X_w)[sel],
                               atol=1e-4)


@pytest.mark.parametrize("mode", ["rgbd", "stereo"])
def test_tracking_metric_scale(mode):
    """RGB-D/stereo tracking must recover the trajectory at METRIC scale
    (ATE evaluated without Sim3 scale alignment)."""
    cfg = _rgbd_cfg()
    seq = SyntheticSequence(n_frames=25, width=320, height=240, n_points=1500,
                            seed=5, patch=3)
    slam = S.SlamSystem(cfg)
    for i in range(len(seq)):
        if mode == "rgbd":
            img, depth, t = seq.frame_rgbd(i)
            slam.track_rgbd(img, depth, t)
        else:
            img_l, img_r, t = seq.frame_stereo(i, BASELINE)
            slam.track_stereo(img_l, img_r, t)
    assert slam.state == S.TrackState.OK
    times, poses = slam.trajectory_of_map()
    assert len(times) >= 20

    gt_times = np.asarray(seq.times)
    gt_poses = np.stack([np.asarray(p) for p in seq.poses_gt])
    res = ate.evaluate_trajectory(times, poses, gt_times, gt_poses,
                                  with_scale=False)
    # depth quantization at an 8 cm synthetic baseline bounds stereo accuracy
    tol = 0.05 if mode == "rgbd" else 0.12
    assert res["ate"] < tol, res
    # and the recovered scale must be metric (scale-aligned ATE similar)
    res_s = ate.evaluate_trajectory(times, poses, gt_times, gt_poses,
                                    with_scale=True)
    assert res["ate"] < max(2.0 * res_s["ate"], tol)
