"""Frame-convention adapter tests against the reference's semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.data import conventions as CV


class TestRotations:
    def test_all_convention_matrices_are_rotations(self):
        for R in [CV.ROS_FROM_LOAM, CV.ROS_FROM_VELODYNE,
                  CV.ROS_FROM_CAMERA, CV.ROS_FROM_CARLA]:
            R = np.asarray(R)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(R) == pytest.approx(1.0)

    def test_loam_axes(self):
        # LOAM: x left, y up, z fwd. A LOAM forward vector (z) is ROS x.
        v = CV.rotate_vectors(CV.ROS_FROM_LOAM, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(v), [1, 0, 0], atol=1e-12)
        # LOAM up (y) is ROS z.
        v = CV.rotate_vectors(CV.ROS_FROM_LOAM, jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0, 0, 1], atol=1e-12)

    def test_camera_axes(self):
        # Camera z (optical forward) is ROS x; camera y (down) is ROS -z.
        v = CV.rotate_vectors(CV.ROS_FROM_CAMERA, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(v), [1, 0, 0], atol=1e-12)
        v = CV.rotate_vectors(CV.ROS_FROM_CAMERA, jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0, 0, -1], atol=1e-12)

    def test_covariance_rotation(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((3, 3))
        cov = A @ A.T
        R = np.asarray(CV.ROS_FROM_LOAM)
        got = CV.rotate_covariance(CV.ROS_FROM_LOAM, jnp.asarray(cov))
        np.testing.assert_allclose(np.asarray(got), R @ cov @ R.T, rtol=1e-12)


class TestLoamOdomSwap:
    def test_cyclic_swap(self):
        pose = lie.pose_make(
            lie.quat_normalize(jnp.array([0.9, 0.1, 0.2, 0.3])),
            jnp.array([1.0, 2.0, 3.0]))
        out = CV.loam_odom_to_ros(pose)
        # position (x,y,z) <- (z,x,y)
        np.testing.assert_allclose(
            np.asarray(lie.pose_trans(out)), [3, 1, 2], atol=1e-12)
        q = np.asarray(lie.pose_quat(out))
        # quat vector part cycles the same way; w unchanged
        np.testing.assert_allclose(q[0], 0.9 / np.linalg.norm([0.9, .1, .2, .3]))
        np.testing.assert_allclose(
            q[1:] * np.linalg.norm([0.9, .1, .2, .3]), [0.3, 0.1, 0.2],
            atol=1e-12)


class TestDownsampler:
    def test_hdl64_to_vlp16(self):
        # 64 channels × 8 azimuth, channel-major layout.
        pts = np.arange(64 * 8 * 4, dtype=np.float32).reshape(-1, 4)
        out = CV.downsample_cloud(jnp.asarray(pts), channels=64,
                                  vert_downsample=4, horiz_downsample=2)
        assert out.shape == (16 * 4, 4)
        grid = pts.reshape(64, 8, 4)
        want = grid[::4, ::2].reshape(-1, 4)
        np.testing.assert_array_equal(np.asarray(out), want)

    def test_rings_major_transpose(self):
        pts = np.arange(16 * 4 * 3, dtype=np.float32).reshape(-1, 3)
        out = CV.downsample_cloud(jnp.asarray(pts), channels=16,
                                  vert_downsample=2, rings_major=True)
        grid = pts.reshape(-1, 16, 3).transpose(1, 0, 2)
        want = grid[::2].reshape(-1, 3)
        np.testing.assert_array_equal(np.asarray(out), want)


class TestImageOps:
    def test_flip(self):
        img = jnp.arange(12).reshape(3, 4)
        out = CV.flip_image(img)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.arange(12).reshape(3, 4)[::-1, ::-1])

    def test_rgb_to_mono(self):
        img = jnp.full((2, 2, 3), 100, jnp.uint8)
        out = CV.rgb_to_mono(img)
        assert out.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(out), 100)


class TestImuFilter:
    def test_moving_average(self):
        a = jnp.asarray(np.arange(10, dtype=np.float64)[:, None]
                        * np.ones((1, 3)))
        g = a * 2
        fa, fg = CV.imu_moving_average(a, g, window=3)
        assert fa.shape == a.shape
        # steady-state trailing mean of [t-2, t-1, t] = t - 1
        np.testing.assert_allclose(np.asarray(fa[5, 0]), 4.0)
        np.testing.assert_allclose(np.asarray(fg[5, 0]), 8.0)
