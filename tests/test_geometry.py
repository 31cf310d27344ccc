"""Unit tests for the Lie/camera/triangulation/alignment core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rumi_slam_tpu.geometry import alignment, camera, lie, triangulation

pytestmark = pytest.mark.core

RNG = np.random.default_rng(0)


def rand_quat(n=()):
    q = RNG.normal(size=n + (4,)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def rand_se3(n=()):
    q = rand_quat(n)
    t = jnp.asarray(RNG.normal(size=n + (3,)).astype(np.float32))
    return lie.se3(q, t)


class TestSO3:
    def test_exp_log_roundtrip(self):
        omega = jnp.asarray(RNG.normal(size=(64, 3)).astype(np.float32))
        back = lie.so3_log(lie.so3_exp(omega))
        np.testing.assert_allclose(back, omega, atol=1e-4)

    def test_small_angle(self):
        omega = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]])
        q = lie.so3_exp(omega)
        np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(lie.so3_log(q), omega, atol=1e-7)

    def test_rotate_matches_matrix(self):
        q = rand_quat((32,))
        v = jnp.asarray(RNG.normal(size=(32, 3)).astype(np.float32))
        R = lie.quat_to_matrix(q)
        np.testing.assert_allclose(
            lie.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5
        )

    def test_matrix_roundtrip(self):
        q = rand_quat((64,))
        q_signed = jnp.where(q[:, :1] < 0, -q, q)
        back = lie.quat_from_matrix(lie.quat_to_matrix(q))
        np.testing.assert_allclose(back, q_signed, atol=1e-5)


class TestSE3:
    def test_compose_apply(self):
        A, B = rand_se3((16,)), rand_se3((16,))
        x = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32))
        lhs = lie.se3_apply(lie.se3_compose(A, B), x)
        rhs = lie.se3_apply(A, lie.se3_apply(B, x))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_inverse(self):
        T = rand_se3((16,))
        I = lie.se3_compose(T, lie.se3_inverse(T))
        np.testing.assert_allclose(np.abs(I[:, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(I[:, 4:], 0.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        tau = jnp.asarray(RNG.normal(size=(64, 6)).astype(np.float32))
        # keep |omega| < pi: log maps back to the principal branch
        tau = tau.at[:, :3].multiply(0.5)
        back = lie.se3_log(lie.se3_exp(tau))
        np.testing.assert_allclose(back, tau, atol=2e-4)

    def test_matrix_roundtrip(self):
        T = rand_se3((8,))
        M = lie.se3_to_matrix(T)
        assert M.shape == (8, 4, 4)
        T2 = lie.se3_from_matrix(M)
        x = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
        np.testing.assert_allclose(lie.se3_apply(T, x), lie.se3_apply(T2, x), atol=1e-5)


class TestSim3:
    def test_compose_apply(self):
        tau = jnp.asarray(RNG.normal(size=(16, 7)).astype(np.float32) * 0.5)
        A = lie.sim3_exp(tau)
        B = lie.sim3_exp(jnp.roll(tau, 1, axis=0))
        x = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32))
        lhs = lie.sim3_apply(lie.sim3_compose(A, B), x)
        rhs = lie.sim3_apply(A, lie.sim3_apply(B, x))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_inverse(self):
        S = lie.sim3_exp(jnp.asarray(RNG.normal(size=(16, 7)).astype(np.float32) * 0.5))
        I = lie.sim3_compose(S, lie.sim3_inverse(S))
        np.testing.assert_allclose(np.abs(I[:, 0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(I[:, 4:7], 0.0, atol=1e-4)
        np.testing.assert_allclose(I[:, 7], 0.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        tau = jnp.asarray(RNG.normal(size=(64, 7)).astype(np.float32) * 0.7)
        back = jax.vmap(lie.sim3_log)(jax.vmap(lie.sim3_exp)(tau))
        np.testing.assert_allclose(back, tau, atol=1e-3)

    def test_scale_action(self):
        S = lie.sim3_make(lie.quat_identity(), jnp.zeros(3), jnp.asarray(2.0))
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(lie.sim3_apply(S, x), 2.0 * x, atol=1e-6)


class TestCamera:
    K = jnp.asarray([525.0, 525.0, 319.5, 239.5])

    def test_project_unproject(self):
        x = jnp.asarray(RNG.normal(size=(32, 3)).astype(np.float32))
        x = x.at[:, 2].set(jnp.abs(x[:, 2]) + 1.0)
        uv = camera.project(self.K, x)
        back = camera.unproject(self.K, uv, x[:, 2])
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_jacobians_match_autodiff(self):
        # well-conditioned pose: small rotation, point stays at depth ~4
        # (a fully random pose can place the point near z=0 where float32
        # Jacobian magnitudes explode and AD-vs-analytic diverges in noise)
        T = lie.se3(
            lie.so3_exp(jnp.asarray([0.05, -0.1, 0.08])),
            jnp.asarray([0.2, -0.3, 0.1]),
        )
        X = jnp.asarray([0.3, -0.2, 4.0])
        uv = jnp.asarray([100.0, 120.0])
        r, J_pose, J_point, depth = camera.reproj_residual_and_jacobians(
            self.K, T, X, uv
        )

        def res_of_tau(tau):
            return camera.project(self.K, lie.se3_apply(lie.se3_retract(T, tau), X)) - uv

        def res_of_X(Xp):
            return camera.project(self.K, lie.se3_apply(T, Xp)) - uv

        J_pose_ad = jax.jacfwd(res_of_tau)(jnp.zeros(6))
        J_point_ad = jax.jacfwd(res_of_X)(X)
        # entries scale with fx≈525 — float32 tolerance must be relative
        np.testing.assert_allclose(J_pose, J_pose_ad, atol=0.05, rtol=1e-3)
        np.testing.assert_allclose(J_point, J_point_ad, atol=0.05, rtol=1e-3)


class TestTriangulation:
    K = jnp.asarray([525.0, 525.0, 319.5, 239.5])

    def test_recovers_points(self):
        X = jnp.asarray(RNG.uniform(-2, 2, size=(128, 3)).astype(np.float32))
        X = X.at[:, 2].add(6.0)
        T1 = lie.se3_identity()
        T2 = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])), jnp.asarray([-0.5, 0.0, 0.0]))
        r1 = lie.se3_apply(T1, X)
        r2 = lie.se3_apply(T2, X)
        Xr = triangulation.triangulate_dlt(
            jnp.broadcast_to(T1, (128, 7)), jnp.broadcast_to(T2, (128, 7)), r1, r2
        )
        np.testing.assert_allclose(Xr, X, atol=1e-2)
        uv1 = camera.project(self.K, r1)
        uv2 = camera.project(self.K, r2)
        ok = triangulation.triangulation_checks(self.K, T1, T2, uv1, uv2, Xr)
        assert bool(jnp.all(ok))

    def test_checks_reject_behind_camera(self):
        T1 = lie.se3_identity()
        T2 = lie.se3(lie.quat_identity(), jnp.asarray([-0.5, 0.0, 0.0]))
        X_bad = jnp.asarray([[0.0, 0.0, -3.0]])
        ok = triangulation.triangulation_checks(
            self.K, T1, T2, jnp.zeros((1, 2)), jnp.zeros((1, 2)), X_bad
        )
        assert not bool(ok[0])


class TestAlignment:
    @pytest.mark.parametrize("solver", [alignment.umeyama_alignment, alignment.horn_alignment])
    def test_exact_recovery(self, solver):
        src = jnp.asarray(RNG.normal(size=(60, 3)).astype(np.float32))
        S_true = lie.sim3_make(
            rand_quat(), jnp.asarray([0.4, -1.0, 2.0]), jnp.asarray(1.7)
        )
        dst = lie.sim3_apply(S_true, src)
        S = solver(src, dst)
        np.testing.assert_allclose(
            lie.sim3_apply(S, src), dst, atol=2e-2
        )
        np.testing.assert_allclose(lie.sim3_scale(S), 1.7, atol=2e-2)

    def test_weighted_ignores_outliers(self):
        src = jnp.asarray(RNG.normal(size=(50, 3)).astype(np.float32))
        S_true = lie.sim3_make(rand_quat(), jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(0.8))
        dst = lie.sim3_apply(S_true, src)
        dst = dst.at[:10].add(100.0)  # corrupt
        w = jnp.ones(50).at[:10].set(0.0)
        S = alignment.umeyama_alignment(src, dst, w)
        np.testing.assert_allclose(lie.sim3_apply(S, src[10:]), dst[10:], atol=2e-2)

    def test_no_scale(self):
        src = jnp.asarray(RNG.normal(size=(40, 3)).astype(np.float32))
        S_true = lie.sim3_make(rand_quat(), jnp.asarray([0.0, 2.0, 0.0]), jnp.asarray(1.0))
        dst = lie.sim3_apply(S_true, src)
        S = alignment.umeyama_alignment(src, dst, with_scale=False)
        np.testing.assert_allclose(lie.sim3_scale(S), 1.0, atol=1e-6)
        np.testing.assert_allclose(lie.sim3_apply(S, src), dst, atol=2e-2)
