"""Optimizer tests on synthetic problems with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from rumi_slam_tpu.geometry import camera, lie
from rumi_slam_tpu.optim import ba, pnp, pose_opt, two_view

RNG = np.random.default_rng(7)
K = jnp.asarray([525.0, 525.0, 319.5, 239.5])


def make_scene(n_pts=120, n_cams=5, noise_px=0.3, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-3, -2, 4], [3, 2, 10], size=(n_pts, 3)).astype(np.float32)
    poses = []
    for i in range(n_cams):
        omega = rng.normal(scale=0.03, size=3).astype(np.float32)
        t = np.array([0.4 * i, 0.02 * i, 0.0], np.float32) + rng.normal(
            scale=0.02, size=3
        ).astype(np.float32)
        poses.append(np.concatenate([np.asarray(lie.so3_exp(jnp.asarray(omega))), t]))
    poses = jnp.asarray(np.stack(poses))
    uv = []
    for i in range(n_cams):
        p, _ = camera.project_world(K, poses[i], jnp.asarray(X))
        uv.append(np.asarray(p) + rng.normal(scale=noise_px, size=(n_pts, 2)))
    return jnp.asarray(X), poses, jnp.asarray(np.stack(uv).astype(np.float32))


class TestPoseOpt:
    def test_recovers_perturbed_pose(self):
        X, poses, uv = make_scene(noise_px=0.0)
        true_pose = poses[2]
        pert = lie.se3_retract(
            true_pose, jnp.asarray([0.03, -0.02, 0.04, 0.1, -0.1, 0.05])
        )
        res = pose_opt.pose_optimization(
            K, pert, X, uv[2], jnp.ones(X.shape[0], bool)
        )
        err = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(true_pose)))
        assert float(jnp.linalg.norm(err)) < 1e-3
        assert int(res.n_inliers) == X.shape[0]

    def test_rejects_outliers(self):
        X, poses, uv = make_scene(noise_px=0.2)
        uv2 = uv[2].at[:20].add(60.0)  # 20 gross outliers
        pert = lie.se3_retract(poses[2], jnp.asarray([0.01, 0.01, 0.0, 0.05, 0.0, 0.0]))
        res = pose_opt.pose_optimization(K, pert, X, uv2, jnp.ones(X.shape[0], bool))
        inl = np.asarray(res.inliers)
        assert inl[:20].sum() == 0
        assert inl[20:].sum() > 90
        err = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(poses[2])))
        assert float(jnp.linalg.norm(err)) < 5e-3


class TestBA:
    def _problem(self, noise_px=0.3, pose_noise=0.01, pt_noise=0.05):
        X, poses, uv = make_scene(n_pts=100, n_cams=4, noise_px=noise_px)
        C, P = 4, 100
        cam_idx = np.repeat(np.arange(C), P).astype(np.int32)
        pt_idx = np.tile(np.arange(P), C).astype(np.int32)
        uv_flat = uv.reshape(C * P, 2)
        conf = jnp.ones(C * P)
        rng = np.random.default_rng(11)
        poses_n = jax.vmap(lie.se3_retract)(
            poses, jnp.asarray(rng.normal(scale=pose_noise, size=(C, 6)).astype(np.float32))
        )
        # keep cam0 and cam1 at truth and fixed (6-DoF gauge + monocular scale)
        poses_n = poses_n.at[0].set(poses[0]).at[1].set(poses[1])
        X_n = X + jnp.asarray(rng.normal(scale=pt_noise, size=(P, 3)).astype(np.float32))
        return X, poses, X_n, poses_n, jnp.asarray(cam_idx), jnp.asarray(pt_idx), uv_flat, conf

    def test_local_ba_converges(self):
        X, poses, X_n, poses_n, cam_idx, pt_idx, uv, conf = self._problem()
        cam_free = jnp.asarray([False, False, True, True])
        pt_free = jnp.ones(100, bool)
        res = ba.bundle_adjust(
            K, poses_n, X_n, cam_idx, pt_idx, uv, conf, cam_free, pt_free, n_iters=12
        )
        # reprojection error should drop to noise level
        pc = lie.se3_apply(res.poses[cam_idx], res.points[pt_idx])
        err = jnp.linalg.norm(camera.project(K, pc) - uv, axis=-1)
        assert float(jnp.mean(err)) < 1.0
        # fixed camera untouched
        np.testing.assert_allclose(res.poses[0], poses[0], atol=1e-6)
        # poses close to truth
        for i in range(2, 4):
            e = lie.se3_log(lie.se3_compose(res.poses[i], lie.se3_inverse(poses[i])))
            assert float(jnp.linalg.norm(e)) < 0.02

    def test_fixed_points_stay(self):
        X, poses, X_n, poses_n, cam_idx, pt_idx, uv, conf = self._problem()
        cam_free = jnp.asarray([False, True, True, True])
        pt_free = jnp.zeros(100, bool).at[50:].set(True)
        res = ba.bundle_adjust(
            K, poses_n, X_n, cam_idx, pt_idx, uv, conf, cam_free, pt_free, n_iters=5
        )
        np.testing.assert_allclose(res.points[:50], X_n[:50], atol=1e-7)

    def test_invalid_obs_ignored(self):
        X, poses, X_n, poses_n, cam_idx, pt_idx, uv, conf = self._problem()
        uv_bad = uv.at[:150].add(500.0)
        conf2 = conf.at[:150].set(0.0)
        cam_free = jnp.asarray([False, True, True, True])
        res = ba.bundle_adjust(
            K, poses_n, X_n, cam_idx, pt_idx, uv_bad, conf2, cam_free,
            jnp.ones(100, bool), n_iters=8
        )
        pc = lie.se3_apply(res.poses[cam_idx[150:]], res.points[pt_idx[150:]])
        err = jnp.linalg.norm(camera.project(K, pc) - uv[150:], axis=-1)
        assert float(jnp.mean(err)) < 1.0


class TestTwoView:
    def test_init_recovers_motion(self):
        X, poses, uv = make_scene(n_pts=200, n_cams=2, noise_px=0.2, seed=9)
        r1 = camera.unproject(K, uv[0])
        r2 = camera.unproject(K, uv[1])
        res = two_view.two_view_init(
            jax.random.PRNGKey(0), r1, r2, jnp.ones(200, bool), min_inliers=40
        )
        assert bool(res.ok)
        # relative pose: T_21 = T2 * T1^-1 up to scale
        T_rel = lie.se3_compose(poses[1], lie.se3_inverse(poses[0]))
        # rotation must match closely
        dq = lie.so3_log(
            lie.quat_mul(lie.quat_conj(res.T_21[:4]), T_rel[:4])
        )
        assert float(jnp.linalg.norm(dq)) < 0.01
        # translation direction matches
        t_est = res.T_21[4:] / jnp.linalg.norm(res.T_21[4:])
        t_true = T_rel[4:] / jnp.linalg.norm(T_rel[4:])
        assert float(jnp.abs(jnp.dot(t_est, t_true))) > 0.999

    def test_init_planar_scene(self):
        # pure-planar structure: the 8-point essential DLT is rank-degenerate
        # here; the homography path (4-point DLT + Faugeras decomposition,
        # TwoViewReconstruction.cc ReconstructH) must rescue initialization.
        rng = np.random.default_rng(21)
        n = 220
        xy = rng.uniform([-3, -2], [3, 2], (n, 2)).astype(np.float32)
        X = jnp.asarray(np.concatenate(
            [xy, np.full((n, 1), 6.0, np.float32)], axis=1))
        T1 = lie.se3_identity()
        T2 = lie.se3(
            lie.so3_exp(jnp.asarray([0.02, -0.05, 0.01])),
            jnp.asarray([0.4, 0.1, 0.05]),
        )
        uv1, _ = camera.project_world(K, T1, X)
        uv2, _ = camera.project_world(K, T2, X)
        uv1 = uv1 + jnp.asarray(rng.normal(0, 0.2, (n, 2)).astype(np.float32))
        uv2 = uv2 + jnp.asarray(rng.normal(0, 0.2, (n, 2)).astype(np.float32))
        res = two_view.two_view_init(
            jax.random.PRNGKey(4),
            camera.unproject(K, uv1),
            camera.unproject(K, uv2),
            jnp.ones(n, bool),
            min_inliers=60,
        )
        assert bool(res.ok)
        dq = lie.so3_log(lie.quat_mul(lie.quat_conj(res.T_21[:4]), T2[:4]))
        assert float(jnp.linalg.norm(dq)) < 0.01
        t_est = res.T_21[4:] / jnp.linalg.norm(res.T_21[4:])
        t_true = T2[4:] / jnp.linalg.norm(T2[4:])
        assert float(jnp.abs(jnp.dot(t_est, t_true))) > 0.995

    def test_rejects_pure_rotation(self):
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 10], (150, 3)).astype(np.float32))
        T1 = lie.se3_identity()
        T2 = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.08, 0.0])), jnp.zeros(3))
        uv1, _ = camera.project_world(K, T1, X)
        uv2, _ = camera.project_world(K, T2, X)
        res = two_view.two_view_init(
            jax.random.PRNGKey(1),
            camera.unproject(K, uv1),
            camera.unproject(K, uv2),
            jnp.ones(150, bool),
        )
        assert not bool(res.ok)


class TestPnP:
    def test_relocalization(self):
        X, poses, uv = make_scene(n_pts=150, n_cams=1, noise_px=0.3, seed=13)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(2), K, X, uv[0], jnp.ones(150, bool)
        )
        assert bool(res.ok)
        e = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(poses[0])))
        assert float(jnp.linalg.norm(e)) < 5e-3

    def test_with_outliers(self):
        X, poses, uv = make_scene(n_pts=150, n_cams=1, noise_px=0.3, seed=17)
        uv_bad = uv[0].at[:40].add(jnp.asarray(RNG.uniform(50, 200, (40, 2)).astype(np.float32)))
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(3), K, X, uv_bad, jnp.ones(150, bool)
        )
        assert bool(res.ok)
        e = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(poses[0])))
        assert float(jnp.linalg.norm(e)) < 1e-2


def test_marginalize_schur():
    """optim.ba.marginalize == dense Schur complement (Optimizer.h:94-96)."""
    import numpy.linalg as la

    from rumi_slam_tpu.optim import ba

    rng = np.random.default_rng(3)
    A = rng.normal(size=(9, 9))
    H = A @ A.T + np.eye(9) * 0.1
    b = rng.normal(size=9)
    Ho, bo = ba.marginalize(
        jnp.asarray(H, jnp.float32), jnp.asarray(b, jnp.float32), 3, 6
    )
    keep, m = [0, 1, 2, 6, 7, 8], [3, 4, 5]
    Hs = H[np.ix_(keep, keep)] - H[np.ix_(keep, m)] @ la.inv(
        H[np.ix_(m, m)]) @ H[np.ix_(m, keep)]
    bs = b[keep] - H[np.ix_(keep, m)] @ la.inv(H[np.ix_(m, m)]) @ b[m]
    assert np.allclose(np.asarray(Ho)[np.ix_(keep, keep)], Hs, atol=1e-3)
    assert np.allclose(np.asarray(bo)[keep], bs, atol=1e-3)
    assert np.allclose(np.asarray(Ho)[3:6, :], 0)
