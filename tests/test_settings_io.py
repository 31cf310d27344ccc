"""Settings reader, dataset presets, trajectory formats, visualization."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from rumi_slam_tpu.config import Config
from rumi_slam_tpu.geometry import lie
from rumi_slam_tpu.io import settings as st
from rumi_slam_tpu.io import trajectory as tio

pytestmark = pytest.mark.core


REF_YAML = """\
%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 535.4
Camera1.fy: 539.2
Camera1.cx: 320.1
Camera1.cy: 247.6
Camera1.k1: 0.0
# a comment line
Camera.fps: 30
Camera.RGB: 1
Camera.width: 640
Camera.height: 480
Camera.bf: 40.0
RGBD.DepthMapFactor: 5000.0
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Viewer.KeyFrameSize: 0.05
"""


def test_parse_opencv_yaml(tmp_path):
    p = tmp_path / "tum3.yaml"
    p.write_text(REF_YAML)
    d = st.parse_opencv_yaml(p)
    assert d["Camera1.fx"] == 535.4
    assert d["Camera.width"] == 640
    assert d["Camera.type"] == "PinHole"
    assert d["ORBextractor.nFeatures"] == 2000
    assert "a comment line" not in repr(d)


def test_config_from_settings(tmp_path):
    p = tmp_path / "tum3.yaml"
    p.write_text(REF_YAML)
    cfg = st.load_settings(p)
    assert cfg.camera.fx == pytest.approx(535.4)
    assert cfg.camera.cy == pytest.approx(247.6)
    assert cfg.orb.n_features == 2000
    assert cfg.orb.n_levels == 8
    # Camera.bf=40 at fx=535.4 -> baseline ~ 7.47 cm
    assert cfg.camera.baseline == pytest.approx(40.0 / 535.4)
    assert cfg.camera.bf == pytest.approx(40.0)
    assert cfg.camera.depth_factor == pytest.approx(5000.0)


def test_presets():
    for name in ("tum1", "tum2", "tum3", "euroc", "icl"):
        cfg = st.preset(name)
        assert isinstance(cfg, Config)
        assert cfg.camera.fx > 100
    assert st.preset("tum3").orb.n_features == 2000
    assert st.preset("euroc").camera.width == 752
    with pytest.raises(KeyError):
        st.preset("kitti99")


def _random_traj(n=10, seed=0):
    rng = np.random.default_rng(seed)
    qs = []
    for _ in range(n):
        q = rng.normal(size=4)
        qs.append(q / np.linalg.norm(q))
    poses = np.concatenate(
        [np.abs(np.asarray(qs))[:, :1], np.asarray(qs)[:, 1:],
         rng.normal(size=(n, 3))], axis=1
    ).astype(np.float32)
    times = np.arange(n) / 30.0
    return times, poses


def test_tum_roundtrip(tmp_path):
    times, poses = _random_traj()
    p = tmp_path / "traj.txt"
    tio.save_tum(p, times, poses)
    t2, p2 = tio.load_tum(p)
    np.testing.assert_allclose(t2, times, atol=1e-5)
    # compare camera centers (quaternion sign may flip)
    c1 = np.asarray(lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(poses))))
    c2 = np.asarray(lie.se3_t(jax.vmap(lie.se3_inverse)(jnp.asarray(p2))))
    np.testing.assert_allclose(c1, c2, atol=1e-4)


def test_euroc_format(tmp_path):
    times, poses = _random_traj(5)
    p = tmp_path / "euroc.txt"
    tio.save_euroc(p, times, poses)
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 5
    first = lines[1].split()
    assert len(first) == 8
    # nanosecond integer stamps
    assert int(first[0]) == round(times[1] * 1e9)


def test_kitti_format(tmp_path):
    times, poses = _random_traj(4)
    p = tmp_path / "kitti.txt"
    tio.save_kitti(p, poses)
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 4
    M = np.asarray([float(v) for v in lines[2].split()]).reshape(3, 4)
    Twc = np.asarray(lie.se3_inverse(jnp.asarray(poses[2])))
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(Twc[:4])))
    np.testing.assert_allclose(M[:, :3], R, atol=1e-5)
    np.testing.assert_allclose(M[:, 3], Twc[4:7], atol=1e-5)


def test_draw_frame_and_covisibility(tmp_path):
    pytest.importorskip("matplotlib")
    from rumi_slam_tpu.evaluation import plot
    from rumi_slam_tpu.mapstate import map_state as M
    from rumi_slam_tpu.ops.orb import Features

    n = 32
    feats = Features(
        uv=jnp.asarray(np.random.default_rng(0).uniform(0, 100, (n, 2)),
                       jnp.float32),
        response=jnp.ones(n),
        angle=jnp.zeros(n),
        octave=jnp.zeros(n, jnp.int32),
        desc=jnp.zeros((n, 8), jnp.uint32),
        valid=jnp.ones(n, bool),
    )
    img = np.random.default_rng(1).uniform(0, 255, (120, 160))
    assoc = jnp.where(jnp.arange(n) % 2 == 0, 1, -1)
    plot.draw_frame(tmp_path / "frame.png", img, feats, assoc)
    assert (tmp_path / "frame.png").stat().st_size > 1000

    ms = M.empty(8, n, 64)
    plot.plot_covisibility(tmp_path / "covis.png", ms)
    assert (tmp_path / "covis.png").stat().st_size > 1000
