"""Tests for pose graph, loop closing, checkpoint, trajectory IO, harness."""

import jax
import jax.numpy as jnp
import numpy as np

from rumi_slam_tpu.geometry import camera, lie
from rumi_slam_tpu.mapstate import checkpoint, map_state as M
from rumi_slam_tpu.optim import pose_graph
from rumi_slam_tpu.io import trajectory

RNG = np.random.default_rng(41)


class TestPoseGraph:
    def _chain(self, K=6, drift=0.3):
        """Ground-truth chain of poses + drifted estimate (drift on last)."""
        truth = []
        for i in range(K):
            truth.append(lie.se3(lie.quat_identity(), jnp.asarray([0.5 * i, 0.0, 0.0])))
        truth = jnp.stack(truth)
        S_true = lie.sim3_from_se3(truth)
        # drifted: last vertex translated
        est = truth.at[K - 1, 4].add(drift)
        return truth, est

    def test_loop_edge_pulls_back_drift(self):
        K = 6
        truth, est = self._chain(K)
        S_est = lie.sim3_from_se3(est)
        # sequential edges measured from TRUTH (odometry was good)
        S_truth = lie.sim3_from_se3(truth)
        e_i, e_j, e_S, e_w = [], [], [], []
        for a in range(K - 1):
            e_i.append(a); e_j.append(a + 1)
            e_S.append(pose_graph.relative_sim3(S_truth[a], S_truth[a + 1]))
            e_w.append(1.0)
        # loop edge 0 <-> K-1 also from truth
        e_i.append(0); e_j.append(K - 1)
        e_S.append(pose_graph.relative_sim3(S_truth[0], S_truth[K - 1]))
        e_w.append(3.0)
        edges = pose_graph.PoseGraphEdges(
            i=jnp.asarray(e_i, jnp.int32), j=jnp.asarray(e_j, jnp.int32),
            S_ij=jnp.stack(e_S), weight=jnp.asarray(e_w, jnp.float32))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        S_opt = pose_graph.optimize_pose_graph(S_est, edges, fixed, n_iters=10)
        # drift removed
        err = float(jnp.linalg.norm(S_opt[K - 1, 4:7] - truth[K - 1, 4:7]))
        assert err < 0.02

    def test_point_correction_follows_ref_kf(self):
        K = 2
        S_old = jnp.stack([lie.sim3_identity(), lie.sim3_identity()])
        shift = lie.sim3_make(lie.quat_identity(), jnp.asarray([1.0, 0.0, 0.0]),
                              jnp.asarray(1.0))
        # KF1's corrected pose: world moved by shift^-1 as seen from cam
        S_new = S_old.at[1].set(lie.sim3_compose(S_old[1], shift))
        pts = jnp.asarray([[0.0, 0.0, 5.0], [1.0, 1.0, 4.0]])
        ref = jnp.asarray([0, 1], jnp.int32)
        out = pose_graph.correct_points(pts, ref, jnp.ones(2, bool), S_old, S_new)
        np.testing.assert_allclose(out[0], pts[0], atol=1e-6)  # ref KF 0 unmoved
        # point 1 moved by shift^-1
        np.testing.assert_allclose(out[1], pts[1] - jnp.asarray([1.0, 0, 0]), atol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        ms = M.empty(max_kf=8, max_feat=16, max_pt=64)
        ms = ms._replace(
            pt_xyz=ms.pt_xyz.at[0].set(jnp.asarray([1.0, 2.0, 3.0])),
            pt_valid=ms.pt_valid.at[0].set(True),
            n_pt=jnp.int32(1),
        )
        p = tmp_path / "map.ckpt"
        digest = checkpoint.save(ms, p)
        assert len(digest) == 64
        ms2 = checkpoint.load(p)
        for name in ms._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(ms, name)), np.asarray(getattr(ms2, name)),
                err_msg=name)

    def test_corruption_detected(self, tmp_path):
        ms = M.empty(max_kf=4, max_feat=8, max_pt=16)
        p = tmp_path / "map.ckpt"
        checkpoint.save(ms, p)
        data = bytearray(p.read_bytes())
        data[-1] ^= 0xFF
        p.write_bytes(bytes(data))
        import pytest

        with pytest.raises(ValueError, match="sha256"):
            checkpoint.load(p)


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        n = 10
        q = RNG.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        poses = jnp.concatenate(
            [jnp.asarray(q), jnp.asarray(RNG.normal(size=(n, 3)).astype(np.float32))],
            axis=1)
        times = np.arange(n) / 30.0
        p = tmp_path / "traj.txt"
        trajectory.save_tum(p, times, poses)
        t2, p2 = trajectory.load_tum(p)
        np.testing.assert_allclose(t2, times, atol=1e-6)
        x = jnp.asarray(RNG.normal(size=(n, 3)).astype(np.float32))
        np.testing.assert_allclose(
            lie.se3_apply(poses, x), lie.se3_apply(jnp.asarray(p2), x), atol=1e-4)


class TestHarness:
    def test_result_csv_schema(self, tmp_path):
        from rumi_slam_tpu.evaluation import harness

        row = {k: 0 for k in harness.RESULT_COLUMNS}
        harness.write_result_csv(row, tmp_path / "result.csv")
        hdr = (tmp_path / "result.csv").read_text().splitlines()[0]
        assert hdr.split(",") == harness.RESULT_COLUMNS
        assert "ate" in hdr and "rate" in hdr and "front_cloud_match_num" in hdr
