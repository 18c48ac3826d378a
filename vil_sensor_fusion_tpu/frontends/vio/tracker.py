"""Image feature detection + tracking: Shi-Tomasi corners and pyramidal
Lucas-Kanade — the image-processing half of the ROVIO capability (multilevel
patch features, rovio.cfg patch/pyramid parameters) as pure XLA ops:

- gradients and structure tensors are convolutions (MXU/VPU work),
- non-max suppression is a max-pool (reduce_window),
- KLT is a fixed-iteration per-feature 2×2 Gauss-Newton on bilinear-sampled
  patches, vmapped over features and run coarse-to-fine over the pyramid.

Everything static-shape: n_features slots, fixed pyramid depth, fixed
iterations — one fused kernel per frame under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _shift_conv1d(img: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """'same' 1-D correlation along ``axis`` as padded shift-and-add.

    TPU note: XLA lowers a single-channel 2-D `conv` to an MXU contraction
    with C=K=1 — a degenerate matmul that wastes essentially the whole
    systolic array (measured ~50× off HBM speed-of-light at 800×600).
    The identical arithmetic as `taps`-many shifted adds is pure VPU
    elementwise work that XLA fuses into one bandwidth-bound pass."""
    if len(taps) % 2 != 1:
        # Even-length taps would cover [j-w/2, j+w/2-1] — a one-pixel shift
        # from XLA's SAME-padding convention; all callers use odd windows.
        raise ValueError(f"_shift_conv1d requires odd tap count, got {len(taps)}")
    r = len(taps) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    p = jnp.pad(img, pad)
    n = img.shape[axis]
    out = None
    for i, t in enumerate(taps):
        if t == 0:
            continue
        term = jax.lax.slice_in_dim(p, i, i + n, axis=axis) * t
        out = term if out is None else out + term
    return out


def sobel(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients as separable shift-add passes:
    [-1 0 1]/8 ⊗ [1 2 1] (and transposed) — identical to the 3×3 kernels."""
    dx = _shift_conv1d(img, (-1.0, 0.0, 1.0), axis=-1)
    dy = _shift_conv1d(img, (-1.0, 0.0, 1.0), axis=-2)
    gx = _shift_conv1d(dx, (0.125, 0.25, 0.125), axis=-2)
    gy = _shift_conv1d(dy, (0.125, 0.25, 0.125), axis=-1)
    return gx, gy


def _box(img: jnp.ndarray, window: int) -> jnp.ndarray:
    """Separable box filter: two 1-D shift-add passes (exact)."""
    taps = (1.0 / window,) * window
    return _shift_conv1d(_shift_conv1d(img, taps, axis=-2), taps, axis=-1)


def shi_tomasi(img: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Min-eigenvalue corner score per pixel."""
    gx, gy = sobel(img)
    gxx = _box(gx * gx, window)
    gyy = _box(gy * gy, window)
    gxy = _box(gx * gy, window)
    tr = 0.5 * (gxx + gyy)
    det = jnp.sqrt(jnp.maximum((0.5 * (gxx - gyy)) ** 2 + gxy ** 2, 0.0))
    return tr - det


def detect(
    img: jnp.ndarray,
    n_features: int,
    nms_radius: int = 8,
    border: int = 12,
    approx: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-N Shi-Tomasi corners with non-max suppression.

    ``approx``: select the N best peaks with the hardware approximate top-k
    (TPU PartialReduce — several times cheaper than the sort-based top-k
    over the full pixel grid; exact fallback on other backends). Missing a
    ≥0.95-recall tail candidate only changes which spare corner refills a
    slot — detection is a candidate *pool*, not an estimate.

    Returns (uv (N, 2) float, score (N,)); low-score slots are padding."""
    H, W = img.shape
    score = shi_tomasi(img)
    # NMS: keep pixels equal to their neighborhood max. Separable max-pool
    # (rows then columns) — exact for the square window, k× cheaper.
    k = 2 * nms_radius + 1
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, 1), (1, 1), "SAME")
    mx = jax.lax.reduce_window(
        mx, -jnp.inf, jax.lax.max, (1, k), (1, 1), "SAME")
    is_peak = (score >= mx)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((yy >= border) & (yy < H - border)
              & (xx >= border) & (xx < W - border))
    masked = jnp.where(is_peak & inside, score, -jnp.inf)
    if approx:
        vals, idx = jax.lax.approx_max_k(masked.reshape(-1), n_features,
                                         recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(masked.reshape(-1), n_features)
    u = (idx % W).astype(img.dtype)
    v = (idx // W).astype(img.dtype)
    return jnp.stack([u, v], axis=-1), vals


def bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at (…, 2) pixel coords (u = x/col, v = y/row)."""
    H, W = img.shape
    u = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return ((1 - dv) * ((1 - du) * i00 + du * i01)
            + dv * ((1 - du) * i10 + du * i11))


def pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """levels×2 downsampled pyramid (2×2 average pooling)."""
    out = [img]
    for _ in range(levels - 1):
        x = out[-1]
        H2, W2 = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
        x = x[:H2, :W2]
        out.append(0.25 * (x[0::2, 0::2] + x[0::2, 1::2]
                           + x[1::2, 0::2] + x[1::2, 1::2]))
    return out


def _patch_grid(radius: int, dtype):
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    du, dv = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([du.reshape(-1), dv.reshape(-1)], axis=-1)  # (P, 2)


def _hat_mat(center, offs, win: int, dtype):
    """Linear-interpolation weight matrix: row i holds the bilinear hat
    weights of window columns for sample position ``center + offs[i]``
    (local window coordinates). Shape (P, win)."""
    pos = center + offs                                    # (P,)
    j = jnp.arange(win, dtype=dtype)                       # (win,)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - j[None, :]))


def klt_track(
    prev_pyr: list[jnp.ndarray],
    next_pyr: list[jnp.ndarray],
    uv_prev: jnp.ndarray,       # (N, 2)
    valid: jnp.ndarray,         # (N,)
    radius: int = 4,
    iters: int = 8,
    max_error: float = 12.0,
    margin: int = 6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramidal KLT: track features from prev to next frame.

    TPU-native formulation: per level, a single (win × win) pixel window is
    extracted around each feature from both images (one dynamic-slice each);
    every GN iteration then evaluates the bilinear patch samples as two
    tiny interpolation-matrix products ``A_v @ W @ A_uᵀ`` — dense VMEM
    arithmetic with **zero gathers in the loop**. Per-feature capture range
    per level is ±``margin`` px (the pyramid gives the usual multi-scale
    reach); displacements beyond it fail the photometric check and are
    invalidated — the same contract as classic window-based KLT.

    Returns (uv_next (N, 2), valid (N,)); tracks failing convergence, image
    bounds, or the final photometric-error check are invalidated."""
    dtype = uv_prev.dtype
    levels = len(prev_pyr)
    r = radius
    win = 2 * (radius + margin) + 1
    offs = jnp.arange(-r, r + 1, dtype=dtype)              # (P,) per axis

    def extract_window(img, center_uv):
        """(win, win) window whose top-left pixel is
        round(center)−(r+margin), clamped inside the image. Returns
        (window, corner (2,))."""
        H, W = img.shape
        c = jnp.round(center_uv).astype(jnp.int32) - (r + margin)
        cx = jnp.clip(c[0], 0, max(W - win, 0))
        cy = jnp.clip(c[1], 0, max(H - win, 0))
        w = jax.lax.dynamic_slice(img, (cy, cx), (win, win))
        return w, jnp.stack([cx, cy]).astype(dtype)

    def sample(Wimg, local_uv):
        """Bilinear (2r+1)² patch at local window coords via hat matmuls."""
        Au = _hat_mat(local_uv[0], offs, win, dtype)        # (P, win)
        Av = _hat_mat(local_uv[1], offs, win, dtype)
        return Av @ Wimg @ Au.T                             # (P, P)

    def track_level(uv_p, uv_n, prev_img, next_img):
        """One feature, one level. uv in this level's pixel scale."""
        Wp, corner_p = extract_window(prev_img, uv_p)
        Wn, corner_n = extract_window(next_img, uv_n)
        lp = uv_p - corner_p                               # template center
        tpl = sample(Wp, lp)
        # Gradients: central differences at ±0.5 px (same smoothing as a
        # bilinear resample), evaluated with shifted hat matrices.
        eps = jnp.asarray(0.5, dtype)
        Au_p = _hat_mat(lp[0] + eps, offs, win, dtype)
        Au_m = _hat_mat(lp[0] - eps, offs, win, dtype)
        Av_p = _hat_mat(lp[1] + eps, offs, win, dtype)
        Av_m = _hat_mat(lp[1] - eps, offs, win, dtype)
        Av0 = _hat_mat(lp[1], offs, win, dtype)
        Au0 = _hat_mat(lp[0], offs, win, dtype)
        gx = Av0 @ Wp @ (Au_p - Au_m).T / (2 * eps)
        gy = (Av_p - Av_m) @ Wp @ Au0.T / (2 * eps)
        Gxx = jnp.sum(gx * gx)
        Gxy = jnp.sum(gx * gy)
        Gyy = jnp.sum(gy * gy)
        det = Gxx * Gyy - Gxy * Gxy
        ok_G = det > 1e-6

        def it(_, uv):
            cur = sample(Wn, uv - corner_n)
            e = cur - tpl
            bx = jnp.sum(e * gx)
            by = jnp.sum(e * gy)
            dn = jnp.where(ok_G, det, 1.0)
            du = -(Gyy * bx - Gxy * by) / dn
            dv = -(-Gxy * bx + Gxx * by) / dn
            step = jnp.where(ok_G, jnp.stack([du, dv]), jnp.zeros(2, dtype))
            return uv + step

        uv_out = jax.lax.fori_loop(0, iters, it, uv_n)
        # Final patch error at this level's solution (reused by the level-0
        # photometric check).
        err = jnp.mean(jnp.abs(sample(Wn, uv_out - corner_n) - tpl))
        return uv_out, ok_G, err

    def track_one(uv0, v0):
        scale = 2.0 ** (levels - 1)
        uv = uv0 / scale
        ok = v0 > 0
        err = jnp.zeros((), dtype)
        for lvl in range(levels - 1, -1, -1):
            s = 2.0 ** lvl
            uv_p = uv0 / s
            uv, ok_G, err = track_level(uv_p, uv, prev_pyr[lvl],
                                        next_pyr[lvl])
            ok = ok & ok_G
            if lvl > 0:
                uv = uv * 2.0
        # Final validity: in bounds + level-0 photometric error.
        H, W = next_pyr[0].shape
        inb = ((uv[0] > radius + 1) & (uv[0] < W - radius - 2)
               & (uv[1] > radius + 1) & (uv[1] < H - radius - 2))
        ok = ok & inb & (err < max_error)
        return uv, ok.astype(dtype)

    return jax.vmap(track_one)(uv_prev, valid)
