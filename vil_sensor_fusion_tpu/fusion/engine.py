"""Fusion engine — the TPU-native replacement for the reference's
``gtsam_fusion_node`` composition (gtsam_fusion/src/gtsam_fusion_node.cpp:17-101)
plus the per-source ``SensorManagerRos`` logic
(gtsam_fusion/src/gtsam_fusion/SensorManagerRos.cpp:11-120).

Instead of an asynchronous ROS callback soup, the engine runs over a
**synchronous, replayable measurement timeline**: all odometry sources are
merged into one time-sorted event stream on the host, then the whole fusion
run is a single ``lax.scan`` over fixed-shape event records. The reference's
asynchronous bookkeeping becomes explicit data:

- ``reserveNode`` per raw sensor message (GraphManager.cpp:51-69) →
  one keyframe per event, with IMU preintegration over the inter-event gap.
- the 1 ms odometry↔key matching (SensorManagerRos.cpp:34) → exact by
  construction (events carry both).
- ``_lastValidOdom`` / ``_lastValidKey`` per source (SensorManagerRos.cpp:117-119)
  → per-source arrays in :class:`EngineState`, updated exactly when the
  reference updates them (every *arriving* odometry; degeneracy-dropped
  messages never arrive, so they do not update the chain).
- ``max_time_skip`` gap rejection (SensorManagerRos.cpp:47) → validity mask.
- the degeneracy gate (degerate_odometry_filter.cpp:29-48) → per-event
  ``keep`` weights computed up front by :func:`degeneracy.logdet_gate`.
- ``optimize_after_odom`` solve cadence (SensorManagerRos.cpp:107-111) →
  ``lax.cond`` around the GN solve.

Startup parity: the reference discards each source's first odometry message
(``_hasReceivedOdometry``) and only starts factors from the third
(SensorManagerRos.cpp:14-18 and the null ``_lastValidOdom`` check at :46).
Here every event reserves a keyframe, and the between-factor chain starts at
each source's second *kept* event — the same factor graph from the third
message onward.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core import preintegration as pre
from ..graph import smoother as S
from ..utils import health as HL
from ..graph.smoother import SmootherConfig, SmootherState
from .._precision import estimation_precision


class SensorSpec(NamedTuple):
    """Static per-source config — one entry of the reference's ``sensors:``
    registry (config/carla/fusion_params.yaml:1-20)."""

    name: str = "odom"
    # Literal reference semantics: copy the odometry message's TWIST
    # covariance into the between-factor noise (poseDiff copies
    # after->twist.covariance, SensorManagerRos.cpp:154-156, consumed as
    # Gaussian::Covariance at :84-99). The timeline's ``odo_twist_cov``
    # channel carries it; nav_msgs order (vx,vy,vz, wx,wy,wz) aligns with
    # our (rho, theta) tangent order, so the copy is verbatim here too.
    use_odom_covariance: bool = False
    # Adaptive variant (NOT in the reference): use the source's POSE
    # covariance — which grows with drift — so a drifting stream is
    # progressively downweighted (SCALING.md adaptive-noise experiment).
    use_pose_covariance: bool = False
    covariance_linear: float = 0.1      # used iff neither flag above
    covariance_angular: float = 0.1
    optimize_after_odom: bool = True
    max_time_skip: float = 0.1
    # Absolute map-anchored unary factor (PriorFactor<Pose3>) per arrived
    # message: for a scan-to-map source the odometry pose is expressed in
    # the voxel map's world frame — anchoring the fused trajectory to it
    # bounds the between-chain's own gauge drift over long horizons. The
    # anchor uses the source's reported covariance scaled by
    # ``anchor_cov_scale`` (>1 = weaker than the relative factor).
    absolute_anchor: bool = False
    anchor_cov_scale: float = 25.0


class FusionConfig(NamedTuple):
    smoother: SmootherConfig = SmootherConfig()
    sensors: tuple = (SensorSpec(),)
    max_imu_per_gap: int = 32           # static preintegration window length
    # Parity mode reproduces the reference's poseDiff quirk
    # (SensorManagerRos.cpp:122-158): translation in the before-body frame
    # but rotation composed as q2·q1⁻¹. False uses the proper SE(3) between.
    ref_pose_delta: bool = True
    # Elastic recovery (utils.health): reject an event whose solve diverges
    # (NaN/Inf state or velocity/bias blow-up) and keep the previous engine
    # state — the generalization of max_time_skip's fault masking the
    # reference lacks (SURVEY.md §5 'failure detection: none in-repo').
    guard_health: bool = True
    health_limits: HL.HealthLimits = HL.HealthLimits()


class Timeline(NamedTuple):
    """Merged, time-sorted measurement timeline (all arrays length E)."""

    times: jnp.ndarray       # (E,)
    source: jnp.ndarray      # (E,) int32 index into cfg.sensors
    odo_pose: jnp.ndarray    # (E, 7) world-frame odometry pose
    odo_cov: jnp.ndarray     # (E, 6, 6) relative-pose covariance (rho, theta)
    keep: jnp.ndarray        # (E,) degeneracy gate: 1 = arrived, 0 = dropped
    valid: jnp.ndarray       # (E,) padding mask
    # Twist covariance of the odometry message (vx,vy,vz, wx,wy,wz — the
    # reference's use_odom_covariance source, SensorManagerRos.cpp:154-156).
    odo_twist_cov: jnp.ndarray  # (E, 6, 6)


class EngineState(NamedTuple):
    smoother: SmootherState
    # Per-source last *arrived* odometry (SensorManagerRos _lastValid*):
    last_time: jnp.ndarray   # (S,)
    last_key: jnp.ndarray    # (S,) int32 global key index
    last_pose: jnp.ndarray   # (S, 7)
    has_last: jnp.ndarray    # (S,) 0/1


class FusedOutput(NamedTuple):
    """Per-event fused state — the reference's optimization-callback output
    (nav_msgs/Odometry + TF at gtsam_fusion_node.cpp:64-98)."""

    times: jnp.ndarray       # (E,)
    poses: jnp.ndarray       # (E, 7)
    vels: jnp.ndarray        # (E, 3)
    biases: jnp.ndarray      # (E, 6)
    solved: jnp.ndarray      # (E,) 1 if a solve ran at this event
    healthy: jnp.ndarray     # (E,) 0 = event rejected by the health guard


def merge_timeline(
    sources: Sequence[tuple],
) -> Timeline:
    """Host-side timeline construction (numpy — one-time, pre-jit).

    Args:
      sources: per sensor, a tuple ``(times (M,), poses (M,7), covs (M,6,6),
        keep (M,))`` with an optional fifth element ``twist_covs (M,6,6)``
        (the nav_msgs twist covariance the reference's use_odom_covariance
        consumes); when omitted the pose covariance is reused as the twist
        channel.

    Returns a time-sorted :class:`Timeline`.
    """
    ts, sid, ps, cs, ks, tw = [], [], [], [], [], []
    for i, src in enumerate(sources):
        t, p, c, k = src[:4]
        t = np.asarray(t)
        ts.append(t)
        sid.append(np.full(t.shape, i, np.int32))
        ps.append(np.asarray(p))
        cs.append(np.asarray(c))
        ks.append(np.asarray(k))
        tw.append(np.asarray(src[4]) if len(src) > 4 else np.asarray(c))
    t = np.concatenate(ts)
    order = np.argsort(t, kind="stable")
    return Timeline(
        times=jnp.asarray(t[order]),
        source=jnp.asarray(np.concatenate(sid)[order]),
        odo_pose=jnp.asarray(np.concatenate(ps)[order]),
        odo_cov=jnp.asarray(np.concatenate(cs)[order]),
        keep=jnp.asarray(np.concatenate(ks)[order]),
        valid=jnp.ones_like(jnp.asarray(t[order])),
        odo_twist_cov=jnp.asarray(np.concatenate(tw)[order]),
    )


def init(
    cfg: FusionConfig,
    pose0: jnp.ndarray,
    vel0: jnp.ndarray,
    bias0: jnp.ndarray,
    t0: jnp.ndarray,
) -> EngineState:
    dtype = pose0.dtype
    nS = len(cfg.sensors)
    return EngineState(
        smoother=S.init(cfg.smoother, pose0, vel0, bias0, t0),
        last_time=jnp.full((nS,), t0, dtype=dtype),
        last_key=jnp.zeros((nS,), jnp.int32),
        last_pose=jnp.broadcast_to(lie.pose_identity(dtype), (nS, 7)),
        has_last=jnp.zeros((nS,), dtype=dtype),
    )


def _spec_arrays(cfg: FusionConfig, dtype):
    """Stack the per-source static specs into gatherable arrays."""
    sp = cfg.sensors
    return dict(
        use_odom_cov=jnp.asarray([float(s.use_odom_covariance) for s in sp], dtype),
        use_pose_cov=jnp.asarray([float(s.use_pose_covariance) for s in sp], dtype),
        cov_lin=jnp.asarray([s.covariance_linear for s in sp], dtype),
        cov_ang=jnp.asarray([s.covariance_angular for s in sp], dtype),
        solve_after=jnp.asarray([float(s.optimize_after_odom) for s in sp], dtype),
        max_skip=jnp.asarray([s.max_time_skip for s in sp], dtype),
        anchor=jnp.asarray([float(s.absolute_anchor) for s in sp], dtype),
        anchor_scale=jnp.asarray([s.anchor_cov_scale for s in sp], dtype),
    )


@estimation_precision
def step(
    cfg: FusionConfig,
    es: EngineState,
    ev,                     # one Timeline row (scalars / (7,) / (6,6))
    imu_times: jnp.ndarray,
    imu_accel: jnp.ndarray,
    imu_gyro: jnp.ndarray,
) -> tuple[EngineState, tuple]:
    """Process one timeline event: reserve keyframe, maybe add between-factor,
    maybe solve — the whole sensorCallback→odometryCallback→solve data path
    (SURVEY.md §3.2) as one pure function."""
    dtype = es.smoother.states.poses.dtype
    es_in = es                          # pre-event state (health fallback)
    W = cfg.smoother.window
    spec = _spec_arrays(cfg, dtype)
    s = es.smoother
    sid = ev.source

    # --- reserveNode: new keyframe with IMU preintegration over the gap ----
    _, _, bias, t_prev = S.latest(s)
    pim = pre.preintegrate_window(
        imu_times, imu_accel, imu_gyro, t_prev, ev.times, bias,
        cfg.smoother.imu, max_samples=cfg.max_imu_per_gap)
    s = S.add_keyframe(cfg.smoother, s, ev.times, pim)
    new_key = s.key0 + (W - 1)          # global key of the newest slot

    # --- odometryCallback: relative pose, covariance, gap check ------------
    prev_pose = es.last_pose[sid]
    if cfg.ref_pose_delta:
        delta = lie.pose_ref_delta(prev_pose, ev.odo_pose)
    else:
        delta = lie.pose_between(prev_pose, ev.odo_pose)

    diag = jnp.concatenate([
        jnp.full((3,), 1.0, dtype) * spec["cov_lin"][sid],
        jnp.full((3,), 1.0, dtype) * spec["cov_ang"][sid],
    ])
    # Noise selection (SensorManagerRos.cpp:84-99): use_odom_covariance
    # copies the message's TWIST covariance verbatim; the pose-covariance
    # variant is this framework's adaptive extension; else constant diag.
    cov = jnp.where(
        spec["use_odom_cov"][sid] > 0.5, ev.odo_twist_cov,
        jnp.where(spec["use_pose_cov"][sid] > 0.5, ev.odo_cov,
                  jnp.diag(diag)))

    gap_ok = (ev.times - es.last_time[sid]) < spec["max_skip"][sid]
    arrived = ev.keep * ev.valid
    factor_valid = arrived * es.has_last[sid] * gap_ok.astype(dtype)

    i_window = (es.last_key[sid] - s.key0).astype(jnp.int32)
    s = S.add_between(
        cfg.smoother, s, i_window, jnp.asarray(W - 1, jnp.int32),
        delta, cov, factor_valid)

    # --- absolute map anchor (optional per source) -------------------------
    anchor_valid = arrived * spec["anchor"][sid]
    anchor_cov = ev.odo_cov * spec["anchor_scale"][sid]
    s = S.add_unary(cfg.smoother, s, jnp.asarray(W - 1, jnp.int32),
                    ev.odo_pose, anchor_cov, anchor_valid)

    # --- optimize_after_odom ------------------------------------------------
    do_solve = (spec["solve_after"][sid] * arrived) > 0.5
    s = jax.lax.cond(do_solve, lambda st: S.solve(cfg.smoother, st),
                     lambda st: st, s)

    # --- _lastValidOdom update (on every arrived message) -------------------
    upd = arrived > 0.5
    es = EngineState(
        smoother=s,
        last_time=es.last_time.at[sid].set(
            jnp.where(upd, ev.times, es.last_time[sid])),
        last_key=es.last_key.at[sid].set(
            jnp.where(upd, new_key, es.last_key[sid])),
        last_pose=es.last_pose.at[sid].set(
            jnp.where(upd, ev.odo_pose, es.last_pose[sid])),
        has_last=es.has_last.at[sid].set(
            jnp.where(upd, 1.0, es.has_last[sid])),
    )
    pose, vel, b, t = S.latest(s)
    healthy = HL.check_state(vel, b, limits=cfg.health_limits,
                             extra_tree=pose)
    if cfg.guard_health:
        # Elastic recovery with bounded coasting. For an ISOLATED bad event,
        # keeping the pre-event state verbatim is right: the next event
        # re-preintegrates the full (small) gap from the last good state.
        # But under PERSISTENT rejection the gap back to the last accepted
        # keyframe grows past the static preintegration window capacity —
        # predictions then diverge more each event and one bad solve becomes
        # a permanent stall (observed end-to-end: health acceptance 0 for
        # the rest of a long drive). So on rejection, drag the kept state's
        # time anchor forward just enough that the NEXT gap still fits the
        # window: exact single-drop semantics, graceful coasting under
        # sustained failure.
        n_imu = imu_times.shape[0]
        imu_dt = (imu_times[-1] - imu_times[0]) / jnp.maximum(n_imu - 1, 1)
        t_floor = (jnp.asarray(ev.times, dtype)
                   - 0.8 * cfg.max_imu_per_gap * imu_dt)
        t_keep = jnp.maximum(es_in.smoother.times[-1], t_floor)
        sm_keep = es_in.smoother._replace(
            times=es_in.smoother.times.at[-1].set(t_keep))
        es_keep = es_in._replace(smoother=sm_keep)
        es = HL.guarded_update(es_keep, es, healthy)
        pose, vel, b, t = S.latest(es.smoother)
    return es, (t, pose, vel, b, do_solve.astype(dtype),
                healthy.astype(dtype))


@estimation_precision
def run(
    cfg: FusionConfig,
    es: EngineState,
    timeline: Timeline,
    imu_times: jnp.ndarray,
    imu_accel: jnp.ndarray,
    imu_gyro: jnp.ndarray,
) -> tuple[EngineState, FusedOutput]:
    """Scan the engine over the whole timeline (jit-compilable end to end)."""

    def body(carry, ev):
        return step(cfg, carry, ev, imu_times, imu_accel, imu_gyro)

    es, (t, p, v, b, sv, hh) = jax.lax.scan(body, es, timeline)
    return es, FusedOutput(times=t, poses=p, vels=v, biases=b, solved=sv,
                           healthy=hh)
