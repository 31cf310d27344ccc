"""Radtan distortion / undistortion (reference Frame::UndistortKeyPoints)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.geometry import distortion

pytestmark = pytest.mark.core


K = jnp.asarray([517.3, 516.5, 318.6, 255.3])
# TUM1's real coefficients (reference config/TUM1.yaml commented block)
DIST = jnp.asarray([0.262383, -0.953104, -0.005358, 0.002628, 1.163314])


def test_undistort_roundtrip():
    rng = np.random.default_rng(0)
    # ideal pixels inside the image
    uv_ideal = jnp.asarray(rng.uniform([80, 80], [560, 400], (200, 2)),
                           jnp.float32)
    # distort them: normalized -> distort -> pixels
    fx, fy, cx, cy = K
    xy = jnp.stack([(uv_ideal[:, 0] - cx) / fx, (uv_ideal[:, 1] - cy) / fy], -1)
    xyd = distortion.distort_normalized(xy, DIST)
    uv_dist = jnp.stack([xyd[:, 0] * fx + cx, xyd[:, 1] * fy + cy], -1)
    # undistort must invert
    uv_back = distortion.undistort_points(K, DIST, uv_dist, n_iters=10)
    err = np.linalg.norm(np.asarray(uv_back - uv_ideal), axis=1)
    assert np.median(err) < 0.05
    assert np.max(err) < 0.5


def test_zero_distortion_identity():
    uv = jnp.asarray([[100.0, 200.0], [320.0, 240.0]])
    out = distortion.undistort_points(K, jnp.zeros(5), uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-4)
    assert not distortion.has_distortion((0.0, 0.0, 0.0, 0.0, 0.0))
    assert distortion.has_distortion((0.1, 0.0, 0.0, 0.0, 0.0))


def test_system_wires_distortion():
    import dataclasses

    from rumi_slam_tpu.config import tiny_config
    from rumi_slam_tpu.system import SlamSystem

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, k1=0.1, k2=-0.2)
    )
    slam = SlamSystem(cfg)
    assert slam._dist is not None
    slam0 = SlamSystem(tiny_config())
    assert slam0._dist is None
