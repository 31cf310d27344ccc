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

    def test_sharded_gba_on_mapstate(self):
        """global_bundle_adjustment(mesh=...) — the in-system distributed
        GBA path — must reduce reprojection error on a perturbed submap
        like the dense path does."""
        import pytest

        from conftest import cpu_mesh_devices
        from rumi_slam_tpu.mapstate import map_state as M
        from rumi_slam_tpu.ops.orb import Features
        from rumi_slam_tpu.tracking import local_mapping

        devs = cpu_mesh_devices(4)
        if devs is None:
            pytest.skip("needs virtual CPU mesh")
        mesh = Mesh(np.array(devs[:4]), ("ba",))

        rng = np.random.default_rng(5)
        n_pts, F, C = 128, 64, 6
        ms = M.empty(max_kf=8, max_feat=F, max_pt=256)
        X = jnp.asarray(rng.uniform([-2, -1.5, 3], [2, 1.5, 8],
                                    (n_pts, 3)).astype(np.float32))
        desc = jnp.asarray(rng.integers(0, 2**32, (n_pts, 8),
                                        dtype=np.uint32))
        ms, ids = M.add_points(ms, X, desc, jnp.ones(n_pts, bool), 0)
        poses_true = []
        for i in range(C):
            q = np.asarray(lie.so3_exp(jnp.asarray(
                rng.normal(scale=0.02, size=3).astype(np.float32))))
            poses_true.append(np.concatenate(
                [q, np.array([0.25 * i, 0, 0], np.float32)]))
        for i in range(C):
            T = jnp.asarray(poses_true[i])
            uv, _ = camera.project_world(K, T, X)
            take = jnp.asarray((np.arange(F) + i * 16) % n_pts)
            feats = Features(
                uv=uv[take], response=jnp.ones(F), angle=jnp.zeros(F),
                octave=jnp.zeros(F, jnp.int32), desc=desc[take],
                valid=jnp.ones(F, bool))
            ms, _ = M.insert_keyframe(ms, T, feats, float(i), ids[take])

        # perturb poses (keep 2 anchors) and points
        kfp = np.asarray(ms.kf_pose).copy()
        kfp[2:C, 4:7] += rng.normal(scale=0.05, size=(C - 2, 3))
        ptx = np.asarray(ms.pt_xyz).copy()
        ptx[:n_pts] += rng.normal(scale=0.05, size=(n_pts, 3))
        ms = ms._replace(kf_pose=jnp.asarray(kfp), pt_xyz=jnp.asarray(ptx))

        def reproj_err(ms_):
            tot, n = 0.0, 0
            for i in range(C):
                pt = np.asarray(ms_.kf_point[i])
                sel = pt >= 0
                Xw = np.asarray(ms_.pt_xyz)[pt[sel]]
                uv, _ = camera.project_world(
                    K, ms_.kf_pose[i], jnp.asarray(Xw))
                tot += float(np.sum(np.linalg.norm(
                    np.asarray(uv) - np.asarray(ms_.kf_uv[i])[sel], axis=-1)))
                n += int(sel.sum())
            return tot / max(n, 1)

        e0 = reproj_err(ms)
        ms2 = local_mapping.global_bundle_adjustment(
            ms, K, 0, n_iters=10, mesh=mesh)
        e1 = reproj_err(ms2)
        assert e1 < 0.25 * e0, (e0, e1)

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
