"""Image-driven VIO frontend tests: LiDAR depth association, tracker slot
management, and the full image→tracker→EKF loop on rendered frames —
the ROVIO capability surface incl. useDepthFromLiDAR
(gtsam_fusion/config/carla/rovio.cfg:132-138), consuming *images*, not
synthetic tracks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.data import raycast as rc
from vil_sensor_fusion_tpu.data import scenarios
from vil_sensor_fusion_tpu.frontends import vio as V
from vil_sensor_fusion_tpu.frontends.vio import frontend as F

DTYPE = jnp.float32


class TestDepthAssociation:
    def _cfg(self):
        cam = V.camera.Camera(fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                              width=128, height=96)
        return F.FrontendConfig(cam=cam, depth_radius_px=12.0)

    def test_project_and_query(self):
        cfg = self._cfg()
        # One point straight ahead at depth 5: projects to the principal
        # point (64, 48).
        pts = jnp.array([[0.0, 0.0, 5.0]], DTYPE)
        proj = F.project_sweep(cfg, pts, jnp.ones(1, DTYPE))
        assert proj.shape == (1, 3)
        np.testing.assert_allclose(np.asarray(proj[0]), [64.0, 48.0, 5.0],
                                   atol=1e-5)
        d = F.depth_at(cfg, proj, jnp.array([[64.0, 48.0]], DTYPE))
        np.testing.assert_allclose(np.asarray(d), [5.0], atol=1e-6)

    def test_nearest_in_image_wins(self):
        # Two nearby returns: the query takes the depth of the return
        # closest IN THE IMAGE — nearest-in-image association, not
        # min-depth (which foreground-biases landmark ranges and collapses
        # VIO scale). Query at (67, 51) sits nearer the (67.3, 51.3)
        # projection of the depth-3 point than the (64, 48) one.
        cfg = self._cfg()
        pts = jnp.array([[0.0, 0.0, 5.0], [0.1, 0.1, 3.0]], DTYPE)
        proj = F.project_sweep(cfg, pts, jnp.ones(2, DTYPE))
        d = F.depth_at(cfg, proj, jnp.array([[67.0, 51.0]], DTYPE))
        np.testing.assert_allclose(np.asarray(d), [3.0], atol=1e-6)
        d0 = F.depth_at(cfg, proj, jnp.array([[64.0, 48.0]], DTYPE))
        np.testing.assert_allclose(np.asarray(d0), [5.0], atol=1e-6)

    def test_invalid_points_ignored(self):
        cfg = self._cfg()
        pts = jnp.array([[0.0, 0.0, 5.0]], DTYPE)
        proj = F.project_sweep(cfg, pts, jnp.zeros(1, DTYPE))
        assert float(proj[0, 2]) == 0.0
        d = F.depth_at(cfg, proj, jnp.array([[64.0, 48.0]], DTYPE))
        assert float(d[0]) == 0.0

    def test_outside_radius_returns_zero(self):
        cfg = self._cfg()
        pts = jnp.array([[0.0, 0.0, 5.0]], DTYPE)
        proj = F.project_sweep(cfg, pts, jnp.ones(1, DTYPE))
        # Query 20 px away from the only return (radius is 12 px).
        d = F.depth_at(cfg, proj, jnp.array([[84.0, 48.0]], DTYPE))
        assert float(d[0]) == 0.0


class TestSlotManagement:
    @pytest.mark.slow
    def test_first_frame_fills_slots(self):
        """On a textured static scene with depth everywhere, frame 0 must
        initialize (enable) slots and frame 1 must track them."""
        cam = V.camera.Camera(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                              width=160, height=120)
        cfg = F.FrontendConfig(cam=cam, n_candidates=32, min_dist=10.0,
                               min_score=0.5)
        world = rc.town_world(n_boxes=20, seed=3)
        pose_ic = F.forward_camera_extrinsics(DTYPE)
        pose0 = jnp.array([1.0, 0, 0, 0, 0, 0, 1.5], DTYPE)
        pose_cam = lie.pose_compose(pose0, pose_ic)
        img = rc.render_camera(world, pose_cam, cam).astype(DTYPE)

        # Depth from a raycast sweep at the same pose, moved to cam frame.
        sweep = rc.raycast(world, pose0)
        pts, msk = F.sweep_to_camera(
            sweep.xyz[:, ::4], sweep.mask[:, ::4], lie.pose_inverse(pose_ic))

        M = 12
        ts = F.init_tracker(cfg, M, DTYPE)
        ts, (obs_uv, obs_valid, obs_depth, new_uv, new_depth,
             new_enable) = F.frontend_step(cfg, ts, img, pts, msk)
        n_new = float(jnp.sum(new_enable))
        assert n_new >= M * 0.75, f"only {n_new} slots initialized"
        # Enabled slots must carry positive depth.
        en = np.asarray(new_enable) > 0
        assert (np.asarray(new_depth)[en] > 0).all()

        # Second frame (same pose): tracking must keep nearly all slots with
        # sub-pixel motion.
        ts2, (obs_uv2, obs_valid2, *_rest) = F.frontend_step(
            cfg, ts, img, pts, msk)
        kept = np.asarray(obs_valid2)[en]
        assert kept.mean() > 0.9
        drift = np.linalg.norm(
            np.asarray(obs_uv2)[en] - np.asarray(ts.uv)[en], axis=-1)
        assert np.median(drift) < 0.5


class TestImageDrivenVio:
    @pytest.fixture(scope="class")
    def small_rig(self):
        cam = V.camera.Camera(fx=107.0, fy=107.0, cx=80.0, cy=60.0,
                              width=160, height=120)
        pose_ic = F.forward_camera_extrinsics(jnp.float64)
        vio_cfg = V.VioConfig(num_landmarks=16, update_iters=2, cam=cam,
                              pose_ic=tuple(np.asarray(pose_ic)))
        return cam, vio_cfg

    @pytest.mark.slow
    def test_full_loop_ate(self, small_rig):
        """Render a 1.5 s town drive, build frames through the tracker, run
        the EKF, and bound the trajectory error — the reference's
        image-driven VIO capability end-to-end."""
        cam, vio_cfg = small_rig
        dur = 1.5
        sc = scenarios.build(
            "town", duration=dur, vio_cfg=vio_cfg, dtype=DTYPE,
            vio_from_images=True,
            frontend_cfg=F.FrontendConfig(cam=cam, n_candidates=32,
                                          min_dist=10.0, min_score=0.5))
        # The tracker must be producing real observations.
        live = np.asarray(sc.vio_frames.obs_valid).mean(axis=1)
        assert live[2:].mean() > 0.5, f"tracker lost the scene: {live}"

        t0 = jnp.zeros((), DTYPE)
        s0 = V.init(vio_cfg, sc.traj.pose_fn(t0).astype(DTYPE),
                    sc.traj.vel_fn(t0).astype(DTYPE), jnp.zeros(6, DTYPE))
        _, out = jax.jit(lambda s, f: V.run(vio_cfg, s, f))(
            s0, sc.vio_frames)
        est = np.asarray(out.pose)
        err = np.linalg.norm(est[:, 4:7] - sc.gt_vio_poses[:, 4:7], axis=1)
        ate = float(np.sqrt((err ** 2).mean()))
        # Pure odometry drift bound over a 6 m drive.
        assert ate < 0.5, f"image-driven VIO ATE {ate}"
        # Covariance must stay finite and positive on the diagonal.
        cov = np.asarray(out.cov)
        assert np.isfinite(cov).all()
        assert (np.diagonal(cov, axis1=-2, axis2=-1) > 0).all()
