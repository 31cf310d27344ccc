"""KannalaBrandt8 fisheye model: round-trips, Jacobians vs autodiff,
epipolar residual (reference: CameraModels/KannalaBrandt8.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from rumi_slam_tpu.geometry import camera_kb8, lie

# EuRoC-style fisheye calibration (TUM-VI ballpark coefficients)
P = jnp.asarray([190.97, 190.97, 254.93, 256.89,
                 0.00348, 0.000715, -0.0020917, 0.000419])


class TestProjectUnproject:
    def test_on_axis(self):
        uv = camera_kb8.project(P, jnp.asarray([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(uv), [254.93, 256.89], atol=1e-4)

    def test_round_trip_wide_fov(self):
        # rays out to ~70 degrees off-axis
        rng = np.random.default_rng(0)
        n = 256
        ang = rng.uniform(0, np.deg2rad(70), n)
        azi = rng.uniform(-np.pi, np.pi, n)
        rays = np.stack(
            [np.sin(ang) * np.cos(azi), np.sin(ang) * np.sin(azi), np.cos(ang)],
            axis=-1,
        ).astype(np.float32)
        uv = camera_kb8.project(P, jnp.asarray(rays))
        back = camera_kb8.unproject(P, uv)
        back = np.array(back)
        back /= np.linalg.norm(back, axis=-1, keepdims=True)
        np.testing.assert_allclose(back, rays, atol=2e-4)

    def test_unproject_depth_scaling(self):
        uv = jnp.asarray([[300.0, 200.0]])
        d = jnp.asarray([3.5])
        pt = camera_kb8.unproject(P, uv, d)
        np.testing.assert_allclose(float(pt[0, 2]), 3.5, rtol=1e-5)


class TestJacobians:
    def test_point_jacobian_matches_autodiff(self):
        xs = jnp.asarray([
            [0.3, -0.2, 2.0],
            [1.5, 0.9, 1.2],     # ~55 deg off axis
            [-0.05, 0.02, 4.0],  # near axis
        ])
        J = jax.vmap(lambda x: camera_kb8.project_jacobian_point(P, x))(xs)
        J_ad = jax.vmap(jax.jacfwd(lambda x: camera_kb8.project(P, x)))(xs)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                                   atol=1e-2, rtol=1e-3)

    def test_pose_and_point_jacobians_match_autodiff(self):
        T = lie.se3(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.08])),
                    jnp.asarray([0.2, -0.3, 0.1]))
        X = jnp.asarray([0.4, -0.3, 3.0])
        uv = jnp.asarray([260.0, 250.0])
        r, J_pose, J_point, depth = camera_kb8.reproj_residual_and_jacobians(
            P, T, X, uv)

        def res_of_tau(tau):
            return camera_kb8.project(
                P, lie.se3_apply(lie.se3_retract(T, tau), X)) - uv

        def res_of_X(Xp):
            return camera_kb8.project(P, lie.se3_apply(T, Xp)) - uv

        np.testing.assert_allclose(np.asarray(J_pose),
                                   np.asarray(jax.jacfwd(res_of_tau)(jnp.zeros(6))),
                                   atol=5e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(J_point),
                                   np.asarray(jax.jacfwd(res_of_X)(X)),
                                   atol=5e-3, rtol=2e-3)
        assert float(depth) > 0


class TestEpipolar:
    def test_corresponding_rays_satisfy_constraint(self):
        rng = np.random.default_rng(3)
        X = rng.uniform([-1, -1, 2], [1, 1, 6], (64, 3)).astype(np.float32)
        T21 = lie.se3(lie.so3_exp(jnp.asarray([0.02, 0.3, -0.05])),
                      jnp.asarray([0.5, 0.0, 0.1]))
        x1 = jnp.asarray(X)
        x2 = lie.se3_apply(T21, x1)
        uv1 = camera_kb8.project(P, x1)
        uv2 = camera_kb8.project(P, x2)
        err = camera_kb8.epipolar_error(P, P, uv1, uv2, T21)
        assert float(jnp.max(err)) < 1e-3
        # a shuffled (wrong) pairing must violate it
        err_bad = camera_kb8.epipolar_error(P, P, uv1, jnp.roll(uv2, 7, axis=0), T21)
        assert float(jnp.median(err_bad)) > 1e-2
