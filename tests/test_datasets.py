"""Dataset loader tests against the vendored groundtruth fixtures
(read-only at /root/reference/src/rumi-slam/groundtruth)."""

import os

import numpy as np
import pytest

from rumi_slam_tpu.io import datasets

pytestmark = pytest.mark.core

GT_ROOT = "/root/reference/src/rumi-slam/groundtruth"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(GT_ROOT), reason="reference groundtruth not mounted"
)


@needs_fixtures
class TestTimestampFiles:
    def test_parse_rgb_txt(self):
        t, paths = datasets.read_timestamp_file(
            f"{GT_ROOT}/slam-tum/rgbd_dataset_freiburg1_floor/rgb.txt")
        assert len(t) == len(paths) > 100
        assert np.all(np.diff(t) > 0)
        assert paths[0].startswith("rgb/")

    def test_groundtruth_tum(self):
        t, xyz, quat = datasets.load_groundtruth(
            f"{GT_ROOT}/slam-tum/rgbd_dataset_freiburg1_floor/groundtruth.txt")
        assert xyz.shape == (len(t), 3)
        assert quat.shape == (len(t), 4)

    def test_groundtruth_icl_axis_flip(self):
        p = f"{GT_ROOT}/slam-icl/traj0_frei_png/groundtruth.txt"
        _, xyz_q, _ = datasets.load_groundtruth(p, dataset_quirks=True)
        _, xyz_raw, _ = datasets.load_groundtruth(p, dataset_quirks=False)
        np.testing.assert_allclose(xyz_q[:, 1], -xyz_raw[:, 1])
        np.testing.assert_allclose(xyz_q[:, 0], xyz_raw[:, 0])

    def test_resolve_groundtruth(self):
        p = datasets.resolve_groundtruth(GT_ROOT, "rgbd_dataset_freiburg1_floor")
        assert p.exists()
        with pytest.raises(KeyError):
            datasets.resolve_groundtruth(GT_ROOT, "nope")


class TestAssociate:
    def test_nearest_within_tolerance(self):
        ta = np.array([0.0, 1.0, 2.0, 3.0])
        tb = np.array([0.005, 1.5, 2.001, 2.9999])
        ia, ib = datasets.associate(ta, tb, max_dt=0.02)
        assert list(zip(ia.tolist(), ib.tolist())) == [(0, 0), (2, 2), (3, 3)]

    def test_one_to_one(self):
        ta = np.array([0.0, 0.004])
        tb = np.array([0.002])
        ia, ib = datasets.associate(ta, tb, max_dt=0.02)
        assert len(ia) == 1 and ib[0] == 0

    def test_empty(self):
        ia, ib = datasets.associate(np.zeros(0), np.array([1.0]))
        assert len(ia) == 0 and len(ib) == 0
