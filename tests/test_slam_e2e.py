"""End-to-end integration: monocular SLAM on a synthetic sequence.

The moral equivalent of the reference's dataset-replay integration test
(SURVEY.md §4): run the full tracking+mapping pipeline over a rendered
sequence and score ATE RMSE against exact groundtruth after Sim3 alignment.
"""

import numpy as np
import pytest

from rumi_slam_tpu.config import tiny_config
from rumi_slam_tpu.evaluation import ate
from rumi_slam_tpu.io.synthetic import SyntheticSequence
from rumi_slam_tpu.system import SlamSystem, TrackState


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(
        n_frames=45, width=320, height=240, n_points=1500, seed=4, patch=3
    )


class TestEndToEnd:
    def test_tracks_synthetic_sequence(self, seq):
        cfg = tiny_config()
        slam = SlamSystem(cfg)
        states = []
        for i in range(len(seq)):
            img, t = seq.frame(i)
            states.append(slam.track_monocular(img, t))

        ok_frames = sum(1 for s in states if s == TrackState.OK)
        assert ok_frames > len(seq) * 0.6, f"only {ok_frames} OK frames"
        assert slam.stats["n_kf"] >= 2

        times, poses = slam.trajectory_of_map()
        assert len(times) >= 10
        gt_times = np.asarray(seq.times)
        gt_poses = np.stack([np.asarray(p) for p in seq.poses_gt])
        m = ate.evaluate_trajectory(times, poses, gt_times, gt_poses)
        # scene spans ~3m; a healthy run aligns to a few cm
        assert m["ate"] < 0.15, f"ATE {m['ate']}"
        assert m["n_matched"] >= 10
