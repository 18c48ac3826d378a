"""Direct photometric patch update tests — the ROVIO filter-internals
parity mode (rovio.cfg patchSize/nLevels/UpdateNoise.pix: multi-level
intensity templates aligned inside the iterated EKF update, no separate
tracking measurement).

Covers: patch sampling against direct bilinear evaluation, gradient
finite-difference consistency, zero-residual fixed-point of the update at
the true state, photometric convergence from a perturbed state on a
rendered scene, and the full direct pipeline end-to-end on a town drive.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.data import scenarios
from vil_sensor_fusion_tpu.frontends import vio as V
from vil_sensor_fusion_tpu.frontends.vio import ekf as E
from vil_sensor_fusion_tpu.frontends.vio import frontend as F
from vil_sensor_fusion_tpu.frontends.vio import photometric as PH
from vil_sensor_fusion_tpu.frontends.vio import tracker as T

DTYPE = jnp.float32


def _texture(H=96, W=128, seed=0):
    """Smooth random texture with real gradients everywhere."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (H, W))
    # separable blur to make bilinear sampling well-behaved
    k = np.array([0.25, 0.5, 0.25])
    for _ in range(2):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    return jnp.asarray(img, DTYPE)


class TestPatchSampling:
    def test_matches_direct_bilinear(self):
        img = _texture()
        uv = jnp.array([40.3, 50.7], DTYPE)
        r = 3
        patch, gx, gy, ok = PH._sample_patch_grad(img, uv, r)
        assert bool(ok)
        offs = jnp.arange(-r, r + 1, dtype=DTYPE)
        du, dv = jnp.meshgrid(offs, offs, indexing="xy")
        pts = uv[None, :] + jnp.stack(
            [du.reshape(-1), dv.reshape(-1)], axis=-1)
        direct = T.bilinear(img, pts)
        np.testing.assert_allclose(np.asarray(patch), np.asarray(direct),
                                   rtol=0, atol=1e-3)

    def test_gradient_finite_difference(self):
        img = _texture(seed=1)
        uv = jnp.array([60.2, 30.9], DTYPE)
        r = 2
        eps = 0.5
        patch, gx, gy, ok = PH._sample_patch_grad(img, uv, r)
        pu_p, *_ = PH._sample_patch_grad(img, uv + jnp.array([eps, 0.0]), r)
        pu_m, *_ = PH._sample_patch_grad(img, uv - jnp.array([eps, 0.0]), r)
        pv_p, *_ = PH._sample_patch_grad(img, uv + jnp.array([0.0, eps]), r)
        pv_m, *_ = PH._sample_patch_grad(img, uv - jnp.array([0.0, eps]), r)
        np.testing.assert_allclose(np.asarray(gx),
                                   np.asarray((pu_p - pu_m) / (2 * eps)),
                                   atol=0.35)
        np.testing.assert_allclose(np.asarray(gy),
                                   np.asarray((pv_p - pv_m) / (2 * eps)),
                                   atol=0.35)

    def test_out_of_bounds_flagged(self):
        img = _texture()
        _, _, _, ok = PH._sample_patch_grad(
            img, jnp.array([2.0, 50.0], DTYPE), 3)
        assert not bool(ok)


def _rendered_rig(n_landmarks=10, duration=0.6):
    """Town-drive scenario with images + candidates, small camera."""
    cam = V.camera.Camera(fx=107.0, fy=107.0, cx=80.0, cy=60.0,
                          width=160, height=120)
    pose_ic = F.forward_camera_extrinsics(jnp.float64)
    vio_cfg = V.VioConfig(
        num_landmarks=n_landmarks, update_iters=2, cam=cam,
        pose_ic=tuple(np.asarray(pose_ic)),
        use_photometric=True, patch_radius=3, photo_levels=3,
        photo_sigma=4.0)
    fcfg = F.FrontendConfig(cam=cam, n_candidates=32, min_dist=10.0,
                            min_score=0.5)
    sc = scenarios.build("town", duration=duration, vio_cfg=vio_cfg,
                         dtype=DTYPE, vio_from_images=True,
                         frontend_cfg=fcfg)
    return vio_cfg, fcfg, sc


class TestPhotometricUpdate:
    @pytest.fixture(scope="class")
    def rig(self):
        vio_cfg, fcfg, sc = _rendered_rig()
        pyrs, cand_uv, cand_score, cand_depth, projs = F.precompute_frames(
            fcfg, sc.images.astype(DTYPE),
            sc.cam_points.astype(DTYPE), sc.cam_point_valid.astype(DTYPE))
        return vio_cfg, fcfg, sc, pyrs, cand_uv, cand_score, cand_depth, projs

    def _true_state_with_landmarks(self, vio_cfg, fcfg, sc, pyr0, cand,
                                   t=0.0, sigmas=(1e-3, 1e-3, 1e-2, 1e-2,
                                                  1e-3)):
        """EKF state at the true pose with landmarks from frame-0
        candidates (LiDAR depth), plus their captured templates."""
        cand_uv, cand_score, cand_depth = cand
        tq = jnp.asarray(t, DTYPE)
        s = V.init(vio_cfg, sc.traj.pose_fn(tq).astype(DTYPE),
                   sc.traj.vel_fn(tq).astype(DTYPE), jnp.zeros(6, DTYPE),
                   sigmas=sigmas)
        new_uv, new_depth, new_enable = F.assign_candidates(
            fcfg, jnp.zeros((vio_cfg.num_landmarks, 2), DTYPE),
            jnp.zeros((vio_cfg.num_landmarks,), DTYPE),
            cand_uv, cand_score, cand_depth)
        for i in range(vio_cfg.num_landmarks):
            s = E.init_landmark(vio_cfg, s, jnp.asarray(i, jnp.int32),
                                new_uv[i], new_depth[i],
                                jnp.asarray(0.05, DTYPE), new_enable[i] > 0)
        tmpl, tok = PH.extract_templates(vio_cfg, pyr0, new_uv)
        tok = tok * new_enable[:, None]
        return s, tmpl, tok, new_enable

    def test_zero_residual_fixed_point(self, rig):
        """At the template-capture state the update must (nearly) not move
        the estimate — the photometric residual is ~0 there."""
        vio_cfg, fcfg, sc, pyrs, cu, cs, cd, projs = rig
        pyr0 = tuple(p[0] for p in pyrs)
        s, tmpl, tok, en = self._true_state_with_landmarks(
            vio_cfg, fcfg, sc, pyr0, (cu[0], cs[0], cd[0]))
        assert float(jnp.sum(en)) >= vio_cfg.num_landmarks * 0.6
        s1, _chi2 = PH.photometric_update(vio_cfg, s, pyr0, tmpl, tok)
        dp = float(jnp.linalg.norm(
            lie.pose_trans(s1.pose) - lie.pose_trans(s.pose)))
        assert dp < 0.02, f"update moved true state by {dp} m"
        # Covariance contracted (information was gained) and stayed PSD.
        assert float(jnp.trace(s1.cov)) <= float(jnp.trace(s.cov)) + 1e-3
        assert np.isfinite(np.asarray(s1.cov)).all()

    def test_pulls_perturbed_attitude_back(self, rig):
        """Perturb the attitude; the iterated photometric update must
        re-align the patches — the direct-measurement analog of KLT
        convergence. (Attitude, not position: the town features sit
        20–85 m out, so centimetre position offsets move pixels far less
        than a milliradian does — rotation is the observable axis of a
        far-field monocular scene.)"""
        vio_cfg, fcfg, sc, pyrs, cu, cs, cd, projs = rig
        pyr0 = tuple(p[0] for p in pyrs)
        # Prior loose enough that the perturbation is within ~1σ — an EKF
        # with a mrad-tight prior would (correctly) refuse to move.
        s, tmpl, tok, _ = self._true_state_with_landmarks(
            vio_cfg, fcfg, sc, pyr0, (cu[0], cs[0], cd[0]),
            sigmas=(0.02, 1e-2, 1e-2, 1e-2, 1e-3))
        q_true = lie.pose_quat(s.pose)
        p0 = lie.pose_trans(s.pose)
        # ~1.6 px of uniform image shift at fx=107.
        dq = lie.so3_exp_quat(jnp.array([0.0, 0.0, 0.015], DTYPE))
        s_pert = s._replace(pose=lie.pose_make(lie.quat_mul(q_true, dq), p0))

        def rot_err(st):
            d = lie.quat_log(lie.quat_mul(
                lie.quat_conjugate(q_true), lie.pose_quat(st.pose)))
            return float(jnp.linalg.norm(d))

        err0 = rot_err(s_pert)
        cfg_it = vio_cfg._replace(update_iters=6)
        s1, _chi2 = PH.photometric_update(cfg_it, s_pert, pyr0, tmpl, tok)
        err1 = rot_err(s1)
        assert err1 < 0.35 * err0, f"photometric update {err0} -> {err1}"


class TestDepthUpdate:
    def test_depth_update_corrects_scale(self):
        vio_cfg, fcfg, sc = _rendered_rig(n_landmarks=6, duration=0.3)
        cam = vio_cfg.cam
        t0 = jnp.zeros((), DTYPE)
        s = V.init(vio_cfg, sc.traj.pose_fn(t0).astype(DTYPE),
                   sc.traj.vel_fn(t0).astype(DTYPE), jnp.zeros(6, DTYPE))
        # Landmark straight ahead at 5 m, believed at 6 m.
        uv = jnp.array([cam.cx, cam.cy], DTYPE)
        s = E.init_landmark(vio_cfg, s, jnp.asarray(0, jnp.int32), uv,
                            jnp.asarray(6.0, DTYPE),
                            jnp.asarray(2.0, DTYPE), jnp.asarray(True))
        obs_depth = jnp.zeros((vio_cfg.num_landmarks,), DTYPE).at[0].set(5.0)
        s1 = E.depth_update(vio_cfg, s, obs_depth)
        z1 = float(E._predict_cam_z(vio_cfg, s1)[0])
        assert abs(z1 - 5.0) < 0.3, f"depth update left z at {z1}"


class TestPhotometricPipeline:
    @pytest.mark.slow
    def test_full_direct_pipeline_ate(self):
        """The complete direct pipeline (no KLT anywhere): propagate →
        photometric iterated update → LiDAR depth anchor → replenish with
        template capture, scanned over a rendered town drive."""
        vio_cfg, fcfg, sc = _rendered_rig(n_landmarks=12, duration=1.5)
        pyrs, cu, cs, cd, projs = F.precompute_frames(
            fcfg, sc.images.astype(DTYPE),
            sc.cam_points.astype(DTYPE), sc.cam_point_valid.astype(DTYPE))
        t0 = jnp.zeros((), DTYPE)
        s0 = V.init(vio_cfg, sc.traj.pose_fn(t0).astype(DTYPE),
                    sc.traj.vel_fn(t0).astype(DTYPE), jnp.zeros(6, DTYPE))
        ps0 = PH.init_photo(vio_cfg, s0)
        imu_windows = (sc.vio_frames.accel, sc.vio_frames.gyro,
                       sc.vio_frames.dts)
        run = jax.jit(lambda ps, py, a, b, c, pr, iw: PH.run(
            vio_cfg, fcfg, ps, py, a, b, c, pr, iw))
        ps1, out = run(ps0, pyrs, cu, cs, cd, projs, imu_windows)
        est = np.asarray(out.pose)
        gt = sc.gt_vio_poses
        err = np.linalg.norm(est[:, 4:7] - gt[:, 4:7], axis=1)
        ate = float(np.sqrt((err ** 2).mean()))
        assert np.isfinite(est).all()
        assert ate < 0.5, f"direct photometric VIO ATE {ate}"
        cov = np.asarray(out.cov)
        assert np.isfinite(cov).all()
        assert (np.diagonal(cov, axis1=-2, axis2=-1) > 0).all()
        # Templates were captured for live slots.
        assert float(jnp.sum(ps1.tmpl_ok)) > 0
