"""Distributed BA on a virtual 8-device CPU mesh: numerical parity with the
single-device Schur engine."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rumi_slam_tpu.geometry import camera, lie
from rumi_slam_tpu.optim import ba
from rumi_slam_tpu.parallel import sharded_ba

K = jnp.asarray([300.0, 300.0, 127.5, 95.5])


def make_problem(n_cams=6, n_pts=64, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-3, -2, 4], [3, 2, 9], size=(n_pts, 3)).astype(np.float32)
    poses = []
    for i in range(n_cams):
        q = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(scale=0.02, size=3).astype(np.float32))))
        t = np.array([0.3 * i, 0, 0], np.float32)
        poses.append(np.concatenate([q, t]))
    poses = jnp.asarray(np.stack(poses))
    uv = np.zeros((n_cams, n_pts, 2), np.float32)
    for i in range(n_cams):
        p, _ = camera.project_world(K, poses[i], jnp.asarray(X))
        uv[i] = np.asarray(p) + rng.normal(scale=0.3, size=(n_pts, 2))
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    conf = np.ones(n_cams * n_pts, np.float32)
    # perturb
    poses_n = jax.vmap(lie.se3_retract)(
        poses, jnp.asarray(rng.normal(scale=0.01, size=(n_cams, 6)).astype(np.float32)))
    poses_n = poses_n.at[0].set(poses[0]).at[1].set(poses[1])
    X_n = jnp.asarray(X + rng.normal(scale=0.05, size=X.shape).astype(np.float32))
    return poses, poses_n, X_n, cam_idx, pt_idx, uv.reshape(-1, 2), conf


class TestShardedBA:
    def test_matches_single_device(self):
        import pytest

        from conftest import cpu_mesh_devices

        devs = cpu_mesh_devices(8)
        if devs is None:
            pytest.skip("needs XLA_FLAGS=--xla_force_host_platform_device_count=8 "
                        "set before Python starts")
        mesh = Mesh(np.array(devs), ("ba",))
        D = 8
        poses, poses_n, X_n, cam_idx, pt_idx, uv, conf = make_problem()
        n_pts = X_n.shape[0]
        cam_free = jnp.asarray([False, False] + [True] * (poses.shape[0] - 2))

        part = sharded_ba.partition_problem(cam_idx, pt_idx, uv, conf, n_pts, D)
        Pl = part["pts_per_shard"]
        # scatter points shard-major
        pts_sh = np.zeros((D, Pl, 3), np.float32)
        rows = part["point_rows"]
        X_np = np.asarray(X_n)
        for d in range(D):
            valid_rows = rows[d] < n_pts
            pts_sh[d, valid_rows] = X_np[rows[d][valid_rows]]

        res_poses, res_pts, cost = sharded_ba.sharded_bundle_adjust(
            mesh, K, poses_n,
            jnp.asarray(pts_sh.reshape(D * Pl, 3)),
            jnp.asarray(part["cam_idx"].reshape(-1)),
            jnp.asarray(part["pt_local"].reshape(-1)),
            jnp.asarray(part["uv"].reshape(-1, 2)),
            jnp.asarray(part["conf"].reshape(-1)),
            cam_free, n_iters=8,
        )

        # single-device reference
        ref = ba.bundle_adjust(
            K, poses_n, X_n, jnp.asarray(cam_idx), jnp.asarray(pt_idx),
            jnp.asarray(uv), jnp.asarray(conf), cam_free,
            jnp.ones(n_pts, bool), n_iters=8,
        )

        # both should reach the same optimum (same math, different layout)
        for i in range(2, poses.shape[0]):
            e = lie.se3_log(lie.se3_compose(res_poses[i], lie.se3_inverse(ref.poses[i])))
            assert float(jnp.linalg.norm(e)) < 1e-3, f"cam {i} diverged"

        # reprojection error must be at noise level
        pts_back = np.zeros((n_pts, 3), np.float32)
        res_pts_np = np.asarray(res_pts).reshape(D, Pl, 3)
        for d in range(D):
            valid_rows = rows[d] < n_pts
            pts_back[rows[d][valid_rows]] = res_pts_np[d][valid_rows]
        pc = lie.se3_apply(res_poses[jnp.asarray(cam_idx)], jnp.asarray(pts_back)[jnp.asarray(pt_idx)])
        err = jnp.linalg.norm(camera.project(K, pc) - jnp.asarray(uv), axis=-1)
        assert float(jnp.mean(err)) < 1.0

    def test_pcg_matches_single_device(self):
        """Matrix-free PCG Schur solve reaches the same optimum as the dense
        replicated solve (r4: the scaling-wall fix)."""
        import pytest

        from conftest import cpu_mesh_devices

        devs = cpu_mesh_devices(8)
        if devs is None:
            pytest.skip("needs virtual CPU mesh")
        mesh = Mesh(np.array(devs), ("ba",))
        D = 8
        poses, poses_n, X_n, cam_idx, pt_idx, uv, conf = make_problem()
        n_pts = X_n.shape[0]
        n_cams = poses.shape[0]
        cam_free = jnp.asarray([False, False] + [True] * (n_cams - 2))

        part = sharded_ba.partition_problem_grouped(
            cam_idx, pt_idx, uv, conf, n_pts, D, obs_per_point=n_cams)
        assert part["dropped_obs"] == 0
        Pl = part["pts_per_shard"]
        pts_sh = np.zeros((D, Pl, 3), np.float32)
        rows = part["point_rows"]
        X_np = np.asarray(X_n)
        for d in range(D):
            ok = rows[d] < n_pts
            pts_sh[d, ok] = X_np[rows[d][ok]]

        res_poses, res_pts, cost = sharded_ba.sharded_bundle_adjust_pcg(
            mesh, K, poses_n,
            jnp.asarray(pts_sh.reshape(D * Pl, 3)),
            jnp.asarray(part["cam_idx"].reshape(D * Pl, -1)),
            jnp.asarray(part["uv"].reshape(D * Pl, -1, 2)),
            jnp.asarray(part["conf"].reshape(D * Pl, -1)),
            cam_free, n_iters=8, cg_iters=24,
        )

        ref = ba.bundle_adjust(
            K, poses_n, X_n, jnp.asarray(cam_idx), jnp.asarray(pt_idx),
            jnp.asarray(uv), jnp.asarray(conf), cam_free,
            jnp.ones(n_pts, bool), n_iters=8,
        )
        for i in range(2, n_cams):
            e = lie.se3_log(lie.se3_compose(
                res_poses[i], lie.se3_inverse(ref.poses[i])))
            assert float(jnp.linalg.norm(e)) < 2e-3, f"cam {i} diverged"

        pts_back = np.zeros((n_pts, 3), np.float32)
        res_np = np.asarray(res_pts).reshape(D, Pl, 3)
        for d in range(D):
            ok = rows[d] < n_pts
            pts_back[rows[d][ok]] = res_np[d][ok]
        pc = lie.se3_apply(res_poses[jnp.asarray(cam_idx)],
                           jnp.asarray(pts_back)[jnp.asarray(pt_idx)])
        err = jnp.linalg.norm(camera.project(K, pc) - jnp.asarray(uv), axis=-1)
        assert float(jnp.mean(err)) < 1.0
