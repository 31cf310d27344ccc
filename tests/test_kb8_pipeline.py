"""KB8 fisheye input through the system pipeline (keypoint rectification)."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.geometry import camera as cam
from rumi_slam_tpu.geometry import camera_kb8 as kb8
from rumi_slam_tpu.io import settings as st


KB = (0.05, -0.01, 0.003, -0.001)


def test_kb8_rectification_math():
    """unproject(kb8) -> project(pinhole) must map fisheye pixels of known
    3D points onto their ideal pinhole pixels."""
    K = jnp.asarray([280.0, 280.0, 159.5, 119.5])
    P8 = jnp.concatenate([K, jnp.asarray(KB, jnp.float32)])
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform([-1.5, -1, 2], [1.5, 1, 8], (100, 3)),
                    jnp.float32)
    uv_fish = kb8.project(P8, X)
    uv_ideal = cam.project(K, X)
    # rectify
    rays = kb8.unproject(P8, uv_fish)
    uv_rect = cam.project(K, rays)
    np.testing.assert_allclose(np.asarray(uv_rect), np.asarray(uv_ideal),
                               atol=0.05)


def test_settings_kb8_branch(tmp_path):
    p = tmp_path / "fish.yaml"
    p.write_text(
        "%YAML:1.0\n"
        'Camera.type: "KannalaBrandt8"\n'
        "Camera1.fx: 190.9\nCamera1.fy: 190.9\n"
        "Camera1.cx: 254.9\nCamera1.cy: 256.8\n"
        "Camera1.k1: 0.0034\nCamera1.k2: 0.0007\n"
        "Camera1.k3: -0.0034\nCamera1.k4: 0.0009\n"
        "Camera.width: 512\nCamera.height: 512\n"
    )
    cfg = st.load_settings(p)
    assert cfg.camera.model == "kb8"
    assert cfg.camera.kb_coeffs == (0.0034, 0.0007, -0.0034, 0.0009)
    assert cfg.camera.k1 == 0.0  # radtan stays off in fisheye mode


def test_system_extract_rectifies():
    from rumi_slam_tpu.io.synthetic import SyntheticSequence
    from rumi_slam_tpu.system import SlamSystem

    cfg = tiny_config()
    cfg_fish = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, model="kb8", kb_coeffs=KB)
    )
    seq = SyntheticSequence(n_frames=1, width=320, height=240, n_points=1200,
                            seed=3, patch=3)
    img, _ = seq.frame(0)
    s_fish = SlamSystem(cfg_fish)
    s_pin = SlamSystem(cfg)
    f_fish = s_fish._extract(jnp.asarray(img))
    f_pin = s_pin._extract(jnp.asarray(img))
    sel = np.asarray(f_fish.valid & f_pin.valid)
    # same detector -> same raw pixels; fisheye path must have MOVED them
    # (rectification is only identity at the principal point)
    duv = np.linalg.norm(
        np.asarray(f_fish.uv)[sel] - np.asarray(f_pin.uv)[sel], axis=1)
    center = np.linalg.norm(
        np.asarray(f_pin.uv)[sel] - np.asarray([159.5, 119.5]), axis=1)
    off_center = center > 80
    assert duv[off_center].mean() > 0.5
    assert np.all(np.isfinite(np.asarray(f_fish.uv)))
