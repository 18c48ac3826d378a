"""Feature detector + KLT tracker tests on synthetic images with known
ground-truth motion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu.frontends.vio import tracker as T

DTYPE = jnp.float32


def _checker_blobs(H=240, W=320, seed=0, shift=(0.0, 0.0)):
    """Smooth random blob image (differentiable texture), optionally shifted
    by a subpixel amount."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    for _ in range(40):
        cx, cy = rng.uniform(20, W - 20), rng.uniform(20, H - 20)
        s = rng.uniform(3, 9)
        a = rng.uniform(50, 255)
        img += a * np.exp(-(((xx - shift[0]) - cx) ** 2
                            + ((yy - shift[1]) - cy) ** 2) / (2 * s * s))
    return jnp.asarray(img, DTYPE)


class TestDetect:
    def test_detects_blob_centers(self):
        img = _checker_blobs()
        uv, score = T.detect(img, 32, nms_radius=6)
        assert uv.shape == (32, 2)
        assert float(score[0]) > 0
        # Detections spread out (NMS): pairwise min distance > nms radius
        p = np.asarray(uv[:16])
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        d[d == 0] = 1e9
        assert d.min() > 6


class TestKlt:
    def test_tracks_known_shift(self):
        shift = (3.7, -2.3)
        img0 = _checker_blobs(seed=1)
        img1 = _checker_blobs(seed=1, shift=shift)
        uv0, score = T.detect(img0, 24, nms_radius=8)
        valid0 = (score > 1.0).astype(DTYPE)
        p0 = T.pyramid(img0, 3)
        p1 = T.pyramid(img1, 3)
        uv1, ok = jax.jit(
            lambda a, b: T.klt_track(p0, p1, a, b, radius=5, iters=10)
        )(uv0, valid0)
        ok = np.asarray(ok) * np.asarray(valid0)
        assert ok.sum() >= 10
        flow = np.asarray(uv1 - uv0)[ok > 0]
        err = np.linalg.norm(flow - np.array(shift), axis=-1)
        # Majority of tracks recover the shift to subpixel accuracy.
        assert np.median(err) < 0.3, (np.median(err), flow[:5])

    def test_lost_tracks_flagged(self):
        img0 = _checker_blobs(seed=2)
        img1 = jnp.zeros_like(img0)  # next frame black: everything lost
        uv0, score = T.detect(img0, 16, nms_radius=8)
        p0, p1 = T.pyramid(img0, 3), T.pyramid(img1, 3)
        _, ok = T.klt_track(p0, p1, uv0, (score > 1.0).astype(DTYPE),
                            radius=5, iters=8)
        assert float(jnp.sum(ok)) == 0.0
