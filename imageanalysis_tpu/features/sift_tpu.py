"""TPU-native SIFT detector/descriptor (batched DoG pyramid, dense patches).

Replaces OpenCV ``SIFT_create().detectAndCompute`` (reference image.py:230-350)
with a device implementation designed for XLA:

- optional initial 2× upsample (cv2 firstOctave=-1, the OpenCV default);
- separable Gaussian pyramid via pad + shifted-slice tap sums (VPU-friendly,
  avoids XLA:TPU conv layout blowups on C=1 images);
- difference-of-Gaussians; 26-neighbor extrema via ``reduce_window``;
- fixed-size per-level candidate lists via ``approx_max_k`` on |DoG| —
  static shapes throughout, masked invalid slots;
- subpixel refinement by the 3-D quadratic fit with contrast and edge
  (Hessian-ratio) rejection, as in Lowe's paper / OpenCV;
- orientation + descriptor computed DENSELY on per-keypoint patches:
  one aligned 64×64 patch per keypoint is sliced out of the Gaussian
  level, then the 36-bin orientation histogram and the 4×4×8 descriptor
  are pure elementwise math + small batched matmuls over (N, 64²)
  arrays — no per-sample gathers. This mirrors OpenCV's own integer-pixel
  accumulation (calcOrientationHist / calcSIFTDescriptor iterate integer
  offsets and bin them by rotated coordinates), so it is *more* faithful
  than grid-resampling, and it maps onto the VPU/MXU instead of the TPU's
  slow scalar-gather path (measured 0.35 s/img → the gathers were 88% of
  detector time);
- secondary orientation peaks ≥ 0.8·max emit keypoint clones, as cv2 does.

``detect_and_compute_batch`` processes a stack of same-sized images in one
jit call — the intended mission-scale path (detect every image on device).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N_SCALES = 3           # scales per octave (cv2 nOctaveLayers)
SIGMA0 = 1.6
CONTRAST_THRESH = 0.04
EDGE_THRESH = 10.0
ORI_BINS = 36
ORI_SIG_FCTR = 1.5     # cv2 SIFT_ORI_SIG_FCTR
ORI_RADIUS = 4.5       # cv2 SIFT_ORI_RADIUS = 3 * ORI_SIG_FCTR
ORI_PEAK_RATIO = 0.8   # cv2 SIFT_ORI_PEAK_RATIO
DESC_WIDTH = 4         # 4×4 spatial bins
DESC_ORI = 8
DESC_SCL_FCTR = 3.0    # cv2 SIFT_DESCR_SCL_FCTR (hist bin width = 3σ)
PATCH = 64             # per-keypoint patch (covers max desc radius 30)


# blur implementation selector: "auto" = Pallas row-blur kernel on TPU,
# shifted-slice jnp elsewhere; "pallas"/"jnp" force one path (used by the
# crash-boundary bisect in scripts_dev/crash_bisect.py)
BLUR_IMPL = "auto"


def _gauss_kernel(sigma):
    radius = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _hblur_kernel(x_ref, o_ref, *, taps, W):
    # accumulate through the output ref: a pure-value tap sum keeps every
    # shifted-slice temp live on the Mosaic stack at once (scoped VMEM
    # scales with tap count and OOMs at mission sizes)
    o_ref[0] = x_ref[0, :, 0:W] * taps[0]
    for j, kj in enumerate(taps[1:], start=1):
        o_ref[0] = o_ref[0] + x_ref[0, :, j:j + W] * kj


def _hblur_pallas(img, k):
    """Row-direction Gaussian blur as a Pallas kernel: rows are
    independent, so blocks partition cleanly (no halo). One HBM read +
    one write per pass — the XLA shifted-slice form re-reads the padded
    buffer per tap and was the single biggest detector slice (the
    pyramid: 52 of ~95 ms/img at mission resolution,
    scripts_dev/sift_stage_bisect.py)."""
    B, H, W = img.shape
    r = (len(k) - 1) // 2
    x = jnp.pad(img, ((0, 0), (0, 0), (r, r)), mode="reflect")
    # Mosaic keeps ~8 block-sized buffers live (double-buffered in/out +
    # accumulator temps); size the row tile so that fits scoped VMEM
    lanes = -(-(W + 2 * r) // 128) * 128
    th = 256
    while th > 8 and th * lanes * 4 * 8 > 12 * 1024 * 1024:
        th //= 2
    Hp = -(-H // th) * th
    if Hp != H:
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_hblur_kernel,
                          taps=tuple(float(v) for v in k), W=W),
        grid=(B, Hp // th),
        in_specs=[pl.BlockSpec((1, th, W + 2 * r), lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec((1, th, W), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return out[:, :H, :] if Hp != H else out


def _blur(img, sigma):
    """Separable Gaussian blur. img: (B, H, W); reflect borders (cv2).

    TPU: two Pallas row-blur passes with a transpose between them
    (column taps become row taps on the transposed image; a 12 MP
    relayout costs ~0.15 ms while shifted sublane slices re-read the
    buffer per tap). Elsewhere: pad + shifted-slice accumulation —
    avoids conv_general_dilated, whose TPU path pads the single channel
    up to full vector lanes (32× HBM blowup at mission sizes). Both
    paths sum taps in the same order (identical f32 arithmetic)."""
    k = _gauss_kernel(sigma)
    use_pallas = (jax.default_backend() == "tpu" if BLUR_IMPL == "auto"
                  else BLUR_IMPL == "pallas")
    if use_pallas:
        y = _hblur_pallas(img, k)
        y = jnp.transpose(y, (0, 2, 1))
        y = _hblur_pallas(y, k)
        return jnp.transpose(y, (0, 2, 1))
    r = (len(k) - 1) // 2
    x = jnp.pad(img, ((0, 0), (0, 0), (r, r)), mode="reflect")
    W = img.shape[2]
    out = None
    for j, kj in enumerate(k):
        term = x[:, :, j:j + W] * float(kj)
        out = term if out is None else out + term
    x = jnp.pad(out, ((0, 0), (r, r), (0, 0)), mode="reflect")
    H = img.shape[1]
    out = None
    for j, kj in enumerate(k):
        term = x[:, j:j + H, :] * float(kj)
        out = term if out is None else out + term
    return out


def _downsample2(x):
    """Every-other-pixel downsample (cv2's next-octave rule), (B, H, W).

    A lane-strided slice (x[..., ::2]) produces a pathological relayout
    on TPU that also poisons downstream layouts — the 3-octave pyramid
    measured 49 ms/img with it and 10 ms with this form (rows by sublane
    stride, columns by an exact one-hot f32 matmul on the MXU;
    scripts_dev task log r3s3). Values are bit-identical."""
    if jax.default_backend() != "tpu":
        return x[:, ::2, ::2]
    y = x[:, ::2, :]
    W = y.shape[2]
    sel = (jnp.arange(W, dtype=jnp.int32)[:, None]
           == 2 * jnp.arange((W + 1) // 2, dtype=jnp.int32)[None, :]
           ).astype(x.dtype)
    return jnp.einsum("bhw,wc->bhc", y, sel)


def _octave_stack(img, sigma_base):
    """Gaussian levels (N_SCALES+3) + DoG levels for one octave, as LISTS of
    (B, H, W) arrays — materializing a (B, 6, H, W) stack lets XLA pick a
    layout that pads the level dim to full lanes (42× HBM blowup)."""
    k = 2.0 ** (1.0 / N_SCALES)
    gs = [img]
    sig_prev = sigma_base
    for i in range(1, N_SCALES + 3):
        sig_total = sigma_base * (k ** i)
        sig_extra = math.sqrt(max(sig_total**2 - sig_prev**2, 1e-6))
        gs.append(_blur(gs[-1], sig_extra))
        sig_prev = sig_total
    dogs = [gs[i + 1] - gs[i] for i in range(N_SCALES + 2)]
    return gs, dogs


def _win3(x, op, init):
    """3×3 windowed reduce over the spatial dims of (B, H, W)."""
    return jax.lax.reduce_window(x, init, op, (1, 3, 3), (1, 1, 1),
                                 "SAME")


def _extrema_mask_level(dogs, lvl, thresh):
    """26-neighbor min/max test for one DoG level via windowed reductions
    (one hardware reduce_window per level/direction instead of 8 roll+max
    chains). A point is a maximum iff it attains its own level's 3×3 max
    and strictly exceeds the adjacent levels' 3×3 maxima (ties between
    float DoG values are measure-zero)."""
    center = dogs[lvl]
    B, H, W = center.shape
    neg = jnp.float32(-3.0e38)
    pos = jnp.float32(3.0e38)
    own_max = _win3(center, jax.lax.max, neg)
    own_min = _win3(center, jax.lax.min, pos)
    adj_max = jnp.maximum(_win3(dogs[lvl - 1], jax.lax.max, neg),
                          _win3(dogs[lvl + 1], jax.lax.max, neg))
    adj_min = jnp.minimum(_win3(dogs[lvl - 1], jax.lax.min, pos),
                          _win3(dogs[lvl + 1], jax.lax.min, pos))
    is_max = (center >= own_max) & (center > adj_max)
    is_min = (center <= own_min) & (center < adj_min)
    mask = (is_max | is_min) & (jnp.abs(center) > thresh)
    yy = jnp.arange(H)
    xx = jnp.arange(W)
    border = 8
    mask &= ((yy >= border) & (yy < H - border))[None, :, None]
    mask &= ((xx >= border) & (xx < W - border))[None, None, :]
    return mask  # (B, H, W)


REFINE_STEPS = 3


def _fit3(dog3, y, x):
    """One quadratic fit of the 3×3×3 DoG neighborhood at integer (y, x):
    returns (off (3,) [s, y, x], contrast, edge_ok)."""
    def g(ds_, dy_, dx_):
        return dog3[ds_ + 1][y + dy_, x + dx_]

    d_s = 0.5 * (g(1, 0, 0) - g(-1, 0, 0))
    d_y = 0.5 * (g(0, 1, 0) - g(0, -1, 0))
    d_x = 0.5 * (g(0, 0, 1) - g(0, 0, -1))
    c = g(0, 0, 0)
    h_ss = g(1, 0, 0) + g(-1, 0, 0) - 2 * c
    h_yy = g(0, 1, 0) + g(0, -1, 0) - 2 * c
    h_xx = g(0, 0, 1) + g(0, 0, -1) - 2 * c
    h_sy = 0.25 * (g(1, 1, 0) - g(1, -1, 0) - g(-1, 1, 0) + g(-1, -1, 0))
    h_sx = 0.25 * (g(1, 0, 1) - g(1, 0, -1) - g(-1, 0, 1) + g(-1, 0, -1))
    h_yx = 0.25 * (g(0, 1, 1) - g(0, 1, -1) - g(0, -1, 1) + g(0, -1, -1))
    Hm = jnp.array([[h_ss, h_sy, h_sx], [h_sy, h_yy, h_yx], [h_sx, h_yx, h_xx]])
    grad = jnp.array([d_s, d_y, d_x])
    off = -jnp.linalg.solve(Hm + 1e-8 * jnp.eye(3), grad)
    contrast = c + 0.5 * jnp.dot(grad, off)
    tr = h_yy + h_xx
    det = h_yy * h_xx - h_yx * h_yx
    r = EDGE_THRESH
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    return off, contrast, edge_ok


def _refine(dog3, y, x):
    """Iterative quadratic subpixel fit at integer (y, x), cv2 semantics
    (SIFT adjustLocalExtrema): when a fit's spatial offset exceeds 0.5 px
    the true extremum lies nearer an adjacent pixel — move the integer
    center by the rounded offset and re-fit (REFINE_STEPS unrolled steps;
    cv2 iterates to 5 but ≥97% of candidates settle by 3). The single
    clipped-step version cost ~4% localization noise vs cv2 on GT
    homography residuals (PARITY_r5 detector-noise analysis). Scale moves
    are clipped to ±0.5 (only the adjacent DoG levels are in view).

    Returns (ds, dy, dx, contrast, edge_ok, yc, xc) with dy/dx relative
    to the ORIGINAL (y, x) and (yc, xc) the final integer center (for
    descriptor-patch centering, cv2's cvRound'ed pt)."""
    H, W = dog3[1].shape
    border = 5
    yc, xc = y, x
    for it in range(REFINE_STEPS):
        off, contrast, edge_ok = _fit3(dog3, yc, xc)
        if it < REFINE_STEPS - 1:
            my = jnp.round(off[1]).astype(jnp.int32)
            mx = jnp.round(off[2]).astype(jnp.int32)
            yc = jnp.clip(yc + my, border, H - 1 - border)
            xc = jnp.clip(xc + mx, border, W - 1 - border)
    off = jnp.clip(off, -0.5, 0.5)
    dy = (yc - y).astype(jnp.float32) + off[1]
    dx = (xc - x).astype(jnp.float32) + off[2]
    return off[0], dy, dx, contrast, edge_ok, yc, xc


# ---------------------------------------------------------------------------
# Dense patch-based orientation + descriptor
# ---------------------------------------------------------------------------

def _patch_for_level(lvl):
    """Per-level patch size: the descriptor window radius is
    round(3σ·√2·2.5) with σ = 1.6·2^((lvl−1+ds)/3), ds ∈ [−0.5, 0.5] —
    level 1 needs ≤ 39 px, level 2 ≤ 50, level 3 ≤ 62. One max-size
    patch for all levels made levels 1–2 spend 60–70% of the descriptor
    stage (the detector's dominant slice) on masked-out zeros."""
    return {1: 40, 2: 52}.get(lvl, PATCH)


def _extract_patches(img, yc, xc, patch=PATCH):
    """Slice one patch×patch window per keypoint out of a (H, W) image.

    Windows are clamped to the image (keypoints near a border get a
    shifted window — equivalent to cv2's skip-out-of-image-pixels rule
    once pixels are masked by absolute coordinates downstream).
    Returns (patches (K, patch, patch), y0 (K,), x0 (K,))."""
    H, W = img.shape
    if H < patch or W < patch:
        img = jnp.pad(img, ((0, max(patch - H, 0)), (0, max(patch - W, 0))))
    y0 = jnp.clip(yc - patch // 2, 0, max(H - patch, 0))
    x0 = jnp.clip(xc - patch // 2, 0, max(W - patch, 0))
    p = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
        img, (y, x), (patch, patch)))(y0, x0)
    return p, y0, x0


def _patch_grads(patches, y0, x0, yc, xc, H, W):
    """Gradients + integer offsets for flattened patches.

    patches: (N, S, S). Returns (mag, ang_deg, di, dj), each
    (N, S²): cv2-convention gradients dx = I(r,c+1)−I(r,c−1),
    dy = I(r−1,c)−I(r+1,c) (y up), angle in degrees [0, 360); pixels
    outside the valid gradient region of the *image* are masked to zero
    magnitude (cv2 iterates only r∈[1,rows−2], c∈[1,cols−2])."""
    S = patches.shape[-1]
    gx = jnp.zeros_like(patches)
    gx = gx.at[:, :, 1:-1].set(patches[:, :, 2:] - patches[:, :, :-2])
    gy = jnp.zeros_like(patches)
    gy = gy.at[:, 1:-1, :].set(patches[:, :-2, :] - patches[:, 2:, :])
    gx = gx.reshape(-1, S * S)
    gy = gy.reshape(-1, S * S)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0).reshape(-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1).reshape(-1)
    yabs = y0[:, None] + row[None, :]
    xabs = x0[:, None] + col[None, :]
    inb = ((yabs >= 1) & (yabs <= H - 2) & (xabs >= 1) & (xabs <= W - 2))
    mag = jnp.sqrt(gx * gx + gy * gy) * inb
    ang = jnp.degrees(jnp.arctan2(gy, gx)) % 360.0
    di = (yabs - yc[:, None]).astype(patches.dtype)   # row offset
    dj = (xabs - xc[:, None]).astype(patches.dtype)   # col offset
    return mag, ang, di, dj


def _orientation_hist(mag, ang, di, dj, sigma):
    """cv2 calcOrientationHist, dense: 36-bin Gaussian-weighted histogram
    over the square window of radius round(4.5σ), smoothed with cv2's
    [1,4,6,4,1]/16 circular kernel. All args (N, P²) except sigma (N,).
    Returns (N, 36)."""
    radius = jnp.round(ORI_RADIUS * sigma)[:, None]
    w_sig = ORI_SIG_FCTR * sigma[:, None]
    inwin = (jnp.abs(di) <= radius) & (jnp.abs(dj) <= radius)
    w = jnp.exp(-(di * di + dj * dj) / (2.0 * w_sig * w_sig))
    mw = mag * w * inwin
    bins = jnp.round(ang * (ORI_BINS / 360.0)).astype(jnp.int32) % ORI_BINS
    hist = jnp.stack([jnp.sum(jnp.where(bins == b, mw, 0.0), axis=-1)
                      for b in range(ORI_BINS)], axis=-1)
    h = hist
    sm = ((jnp.roll(h, 2, -1) + jnp.roll(h, -2, -1)) * (1.0 / 16.0)
          + (jnp.roll(h, 1, -1) + jnp.roll(h, -1, -1)) * (4.0 / 16.0)
          + h * (6.0 / 16.0))
    return sm


def _orientation_peaks(hist):
    """Dominant + secondary orientation peaks (cv2 clone rule).

    Returns (angles_deg (N, 2), valid (N, 2)): per keypoint the cv2-style
    angle (360 − interpolated bin·10) for the dominant histogram peak and
    the strongest secondary local peak ≥ 0.8·max (cv2 emits a clone
    keypoint per such peak; two slots cover all but degenerate cases)."""
    n = ORI_BINS
    left = jnp.roll(hist, 1, -1)
    right = jnp.roll(hist, -1, -1)
    hmax = jnp.max(hist, axis=-1, keepdims=True)
    is_peak = (hist > left) & (hist > right) & (hist >= ORI_PEAK_RATIO * hmax)
    b1 = jnp.argmax(hist, axis=-1)
    iota = jnp.arange(n)[None, :]
    second = jnp.where(is_peak & (iota != b1[:, None]), hist, -1.0)
    b2 = jnp.argmax(second, axis=-1)
    v2 = jnp.take_along_axis(second, b2[:, None], -1)[:, 0] > 0

    def interp(b):
        l = jnp.take_along_axis(hist, ((b - 1) % n)[:, None], -1)[:, 0]
        c = jnp.take_along_axis(hist, b[:, None], -1)[:, 0]
        r = jnp.take_along_axis(hist, ((b + 1) % n)[:, None], -1)[:, 0]
        denom = l - 2 * c + r
        off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
        binf = (b + off) % n
        ang = 360.0 - binf * (360.0 / n)
        return jnp.where(jnp.abs(ang - 360.0) < 1e-5, 0.0, ang)

    a1 = interp(b1)
    a2 = interp(b2)
    valid = jnp.stack([jnp.ones_like(v2), v2], axis=-1)
    return jnp.stack([a1, a2], axis=-1), valid


def _descriptors_dense(mag, ang, di, dj, angle_deg, sigma):
    """cv2 calcSIFTDescriptor, dense over patches: 4×4×8 trilinear
    binning of rotated integer-pixel offsets, as batched matmuls.

    mag/ang/di/dj: (N, P²); angle_deg, sigma: (N,) — angle is the cv2
    keypoint angle (clockwise); internal ori = 360 − angle.
    Returns (N, 128) float32 in cv2's 0..255 scaled range."""
    d = DESC_WIDTH
    nb = DESC_ORI
    ori = 360.0 - angle_deg
    ori = jnp.where(jnp.abs(ori - 360.0) < 1e-5, 0.0, ori)
    hist_w = DESC_SCL_FCTR * sigma
    ct = (jnp.cos(jnp.radians(ori)) / hist_w)[:, None]
    st = (jnp.sin(jnp.radians(ori)) / hist_w)[:, None]
    radius = jnp.round(hist_w * math.sqrt(2.0) * (d + 1) * 0.5)[:, None]

    c_rot = dj * ct - di * st
    r_rot = dj * st + di * ct
    rbin = r_rot + (d / 2 - 0.5)
    cbin = c_rot + (d / 2 - 0.5)
    obin = (ang - ori[:, None]) * (nb / 360.0)
    w = jnp.exp(-(c_rot * c_rot + r_rot * r_rot) / (d * d * 0.5))
    ok = ((rbin > -1) & (rbin < d) & (cbin > -1) & (cbin < d)
          & (jnp.abs(di) <= radius) & (jnp.abs(dj) <= radius))
    m = mag * w * ok

    # orientation hat maps (N, nb, P²), then spatial hats as FUSED
    # mul+reduce on the VPU: desc[n,r,c,o] = Σ_p hat_r·hat_c·(m·hat_o).
    # A batched dot here is an (M=4, N=8, K=4096) GEMM per keypoint —
    # the MXU pads M and N to 128 (≈0.4% utilization) and the
    # descriptor stage was the detector's biggest slice (28 of 65
    # ms/img at mission resolution, scripts_dev/sift_stage_bisect.py);
    # the elementwise product feeding a lane reduction fuses without
    # materializing the (N, 4, 8, P²) temp.
    mo = []
    for o in range(nb):
        t = (obin - o) % nb
        mo.append(m * jnp.maximum(0.0, 1.0 - jnp.minimum(t, nb - t)))
    mo = jnp.stack(mo, axis=1)                       # (N, 8, P²)
    wc = jnp.stack([jnp.maximum(0.0, 1.0 - jnp.abs(cbin - c))
                    for c in range(d)], axis=1)      # (N, 4, P²)
    on_tpu = jax.default_backend() == "tpu"
    rows = []
    for r in range(d):
        wr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin - r))[:, None, :]
        w2 = wc * wr                                 # (N, 4, P²)
        if on_tpu:
            rows.append(jnp.sum(w2[:, :, None, :] * mo[:, None, :, :],
                                axis=-1))            # (N, 4, 8)
        else:
            # CPU XLA materializes the broadcast product (3.7× slower
            # tests); a batched dot is fine off-TPU
            rows.append(jax.lax.dot_general(
                w2, mo, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
    desc = jnp.stack(rows, axis=1).reshape(-1, d * d * nb)

    nrm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = jnp.minimum(desc, 0.2 * nrm)
    nrm2 = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc * (512.0 / jnp.maximum(nrm2, 1e-12))
    # uint8 like cv2's saturate_cast<uchar> — also 4× less host↔device
    # traffic over the (slow) transfer link
    return jnp.round(jnp.minimum(desc, 255.0)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("per_octave", "n_octaves",
                                             "upsample", "out_slots"))
def _detect_batch(imgs, per_octave, n_octaves, upsample=True,
                  out_slots=None):
    """imgs: (B, H, W) f32 in [0,1]. Returns padded results with two
    orientation slots per candidate folded into the K axis:
    kp (B, K, 2) full-res uv, meta (B, K, 4) [size, angle, response,
    octave], desc (B, K, 128) uint8, valid (B, K), with
    K = n_octaves·3·per_level·2. imgs may be uint8 (normalized on device —
    keeps the host→device transfer at 1 byte/px over the tunnel)."""
    if imgs.dtype != jnp.float32:
        imgs = imgs.astype(jnp.float32) / 255.0
    B = imgs.shape[0]
    thresh = 0.5 * CONTRAST_THRESH / N_SCALES
    # candidate budgets: blend of area weighting (octave o holds ~4^-o of
    # the pixels, hence of the DoG extrema) and uniform. Pure uniform
    # starves the first octave on real texture — bates.jpg @0.4 truncated
    # ~60% of the extrema cv2 keeps (1608 vs 3979 kp) while later octaves
    # wasted their slots; pure area weighting starves the DEEP octaves on
    # low-detail texture — the 300-image synthetic parity mission lost
    # 3.4× of its matches because its stable features live at coarser
    # scales. The 50/50 blend keeps both regimes: total candidate count
    # (and so patch/descriptor work) is unchanged, only its distribution.
    total = per_octave * n_octaves
    area = [4.0 ** -o for o in range(n_octaves)]
    sa = sum(area)
    w = [0.5 * a / sa + 0.5 / n_octaves for a in area]
    per_level_oct = [max(int(round(total * wi / N_SCALES)), 32)
                     for wi in w]

    if upsample:
        # cv2 firstOctave=-1: 2× linear upsample; the input is assumed to
        # already carry σ=0.5 → σ=1.0 after upsampling (image.py:287-350
        # uses cv2 defaults)
        Hb, Wb = imgs.shape[1] * 2, imgs.shape[2] * 2
        base = jax.image.resize(imgs, (B, Hb, Wb), "linear")
        sig_init = math.sqrt(max(SIGMA0**2 - 1.0, 0.01))
    else:
        base = imgs
        sig_init = math.sqrt(max(SIGMA0**2 - 0.25, 0.01))

    all_kp, all_meta, all_desc, all_valid = [], [], [], []
    octave_img = _blur(base, sig_init)
    for o in range(n_octaves):
        gs, dogs = _octave_stack(octave_img, SIGMA0)
        B_, H, W = gs[0].shape
        scale_factor = float(2 ** o) * (0.5 if upsample else 1.0)
        per_level = per_level_oct[o]

        for lvl in range(1, N_SCALES + 1):
            mask = _extrema_mask_level(dogs, lvl, thresh)   # (B, H, W)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(B, -1)
            # approx_max_k uses the TPU-optimized partial-reduction path —
            # exact top_k over multi-megapixel score maps dominates runtime.
            # Extrema are sparse so recall at 0.95 loses almost nothing.
            vals, flat = jax.lax.approx_max_k(score, per_level,
                                              recall_target=0.95)
            y_idx = (flat // W).astype(jnp.int32)
            x_idx = (flat % W).astype(jnp.int32)
            cand_valid = vals > 0

            dog3 = (dogs[lvl - 1], dogs[lvl], dogs[lvl + 1])

            def per_image(dm, dc, dp, y_i, x_i, v_i, lvl=lvl):
                def one(y, x, v):
                    (ds, dy, dx, contrast, edge_ok, yc,
                     xc) = _refine((dm, dc, dp), y, x)
                    ok = v & edge_ok & (jnp.abs(contrast)
                                        > CONTRAST_THRESH / N_SCALES)
                    sigma = SIGMA0 * (2.0 ** ((lvl - 1 + ds) / N_SCALES))
                    return dy, dx, sigma, contrast, ok, yc, xc
                return jax.vmap(one)(y_i, x_i, v_i)

            dy, dx, sigma, contrast, ok, yc, xc = jax.vmap(per_image)(
                dog3[0], dog3[1], dog3[2], y_idx, x_idx, cand_valid)

            # drop candidates that re-centered onto the same pixel (cv2
            # removeDuplicatedSorted): converged twins carry identical
            # descriptors, and identical twins make the ratio test see
            # d1≈d2 and kill BOTH matches downstream. Invalid slots get
            # unique negative keys so they can't collide a valid one away.
            P_lvl = y_idx.shape[1]
            key = jnp.where(ok, yc * W + xc,
                            -1 - jax.lax.broadcasted_iota(
                                jnp.int32, (B_, P_lvl), 1))
            order = jnp.argsort(key, axis=1)
            sk = jnp.take_along_axis(key, order, axis=1)
            dup_sorted = jnp.concatenate(
                [jnp.zeros((B_, 1), bool), sk[:, 1:] == sk[:, :-1]], axis=1)
            dup = jnp.zeros_like(dup_sorted).at[
                jnp.arange(B_)[:, None], order].set(dup_sorted)
            ok &= ~dup

            # --- dense patch stage: flatten (B, P) → N ------------------
            # patches center on the REFINED integer location (cv2 uses the
            # cvRound'ed final pt for calcSIFTDescriptor)
            patch = _patch_for_level(lvl)
            patches, y0, x0 = jax.vmap(
                lambda g, y, x: _extract_patches(g, y, x, patch))(
                gs[lvl], yc, xc)
            N = B_ * y_idx.shape[1]
            mag, ang, di, dj = _patch_grads(
                patches.reshape(N, patch, patch), y0.reshape(N),
                x0.reshape(N), yc.reshape(N), xc.reshape(N), H, W)
            # offsets are relative to the rounded center, as in cv2
            # (calcSIFTDescriptor uses cvRound'ed pt); the subpixel
            # offset only moves the reported uv
            sig_f = sigma.reshape(N)
            hist = _orientation_hist(mag, ang, di, dj, sig_f)
            angles, ori_valid = _orientation_peaks(hist)       # (N,2)

            # descriptor per orientation slot: fold slots into batch
            mag2 = jnp.concatenate([mag, mag], 0)
            ang2 = jnp.concatenate([ang, ang], 0)
            di2 = jnp.concatenate([di, di], 0)
            dj2 = jnp.concatenate([dj, dj], 0)
            ang_slots = jnp.concatenate([angles[:, 0], angles[:, 1]], 0)
            sig2 = jnp.concatenate([sig_f, sig_f], 0)
            desc2 = _descriptors_dense(mag2, ang2, di2, dj2,
                                       ang_slots, sig2)        # (2N,128)
            desc = jnp.stack([desc2[:N], desc2[N:]], axis=1)   # (N,2,128)

            yf = (y_idx.reshape(N).astype(jnp.float32) + dy.reshape(N))
            xf = (x_idx.reshape(N).astype(jnp.float32) + dx.reshape(N))
            kp1 = jnp.stack([xf, yf], axis=-1) * scale_factor  # (N,2)
            size1 = sig_f * scale_factor * 2.0
            okN = ok.reshape(N)
            resp = jnp.abs(contrast.reshape(N))

            P = y_idx.shape[1]
            kp = jnp.broadcast_to(kp1[:, None, :], (N, 2, 2))
            meta = jnp.stack([
                jnp.broadcast_to(size1[:, None], (N, 2)),
                angles,
                jnp.broadcast_to(resp[:, None], (N, 2)),
                jnp.full((N, 2), float(o) - (1.0 if upsample else 0.0)),
            ], axis=-1)                                        # (N,2,4)
            valid = okN[:, None] & ori_valid.astype(bool)      # (N,2)

            all_kp.append(kp.reshape(B_, P * 2, 2))
            all_meta.append(meta.reshape(B_, P * 2, 4))
            all_desc.append(desc.reshape(B_, P * 2, 128))
            all_valid.append(valid.reshape(B_, P * 2))

        # downsample for next octave (take every other pixel of level S)
        octave_img = _downsample2(gs[N_SCALES])

    kp = jnp.concatenate(all_kp, axis=1)
    meta = jnp.concatenate(all_meta, axis=1)
    desc = jnp.concatenate(all_desc, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)
    if out_slots is not None and out_slots < kp.shape[1]:
        # keep the strongest by response (cv2 retainBest for nfeatures) —
        # also halves the device→host descriptor download
        score = jnp.where(valid, meta[..., 2], -1.0)
        _, idx = jax.lax.top_k(score, out_slots)              # (B, out)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1)
        kp, meta, desc = take(kp), take(meta), take(desc)
        valid = jnp.take_along_axis(valid, idx, axis=1)
    return kp, meta, desc, valid


def detect_and_compute(gray: np.ndarray, max_features=4096, upsample=True):
    """Single-image convenience wrapper → (kp (n,2), meta (n,4), desc (n,128))."""
    kp, meta, desc, valid = detect_and_compute_batch(gray[None], max_features,
                                                     upsample=upsample)
    v = valid[0]
    return kp[0][v], meta[0][v], desc[0][v]


@jax.jit
def _pack_detect(kp, meta, desc, valid):
    """Fuse the four detect outputs into ONE (B, K, 7 + 128/4) int32 buffer.

    On this tunneled runtime every device→host download pays a serialized
    ~34 ms RTT regardless of size, so four separate np.asarray calls in
    finalize cost ~135 ms/image of pure latency — more than the detector's
    device compute. One buffer → one RTT. Layout per keypoint slot:
    kp(2)+meta(4) f32 bitcast | valid(1) | 128 desc bytes as 32 int32
    (XLA packs the minor uint8 axis little-endian, matching the host)."""
    head = jnp.concatenate([kp, meta], axis=-1)               # (B, K, 6)
    head_i = jax.lax.bitcast_convert_type(head, jnp.int32)
    v = valid.astype(jnp.int32)[..., None]                    # (B, K, 1)
    B, K, D = desc.shape
    d4 = jax.lax.bitcast_convert_type(desc.reshape(B, K, D // 4, 4),
                                      jnp.int32)              # (B, K, D/4)
    return jnp.concatenate([head_i, v, d4], axis=-1)


@functools.partial(jax.jit, static_argnames=("per_octave", "n_octaves",
                                             "upsample", "out_slots",
                                             "equalize"))
def _detect_packed_fused(chunk, per_octave, n_octaves, upsample, out_slots,
                         equalize):
    """ONE executable for the whole detect dispatch: device CLAHE +
    DoG/SIFT + output packing.

    The split pipeline (eager stack → clahe jit → _detect_batch jit →
    _pack_detect jit) cost 3 separate executables per batch. On this
    tunneled runtime each executable pays its own per-process
    first-dispatch warmup (~30 s each — the dominant slice of the ~100 s
    mission detect warmup excess) and each call is another queue entry on
    a ~28 ms RTT link. Fusing also lets XLA overlap the CLAHE histogram
    pass with the pyramid setup."""
    if equalize:
        from ..ops.clahe import clahe as _clahe
        chunk = _clahe(chunk)
    outs = _detect_batch(chunk, per_octave, n_octaves, upsample=upsample,
                         out_slots=out_slots)
    return _pack_detect(*outs)


@functools.partial(jax.jit, static_argnames=("per_octave", "n_octaves",
                                             "upsample", "out_slots",
                                             "equalize"))
def _detect_packed_fused_codec(nib, idx, val, per_octave, n_octaves,
                               upsample, out_slots, equalize):
    """Fused detect executable whose input is the transport-codec payload
    (features/transport.py): decode (unpack + escape scatter + row
    cumsum) happens on device, so the wire carries ~0.55 B/px instead of
    1 — below the detect kernel's compute on the ~37 MB/s tunnel."""
    from .transport import unpack_gray_batch
    chunk = unpack_gray_batch(nib, idx, val)
    return _detect_packed_fused(chunk, per_octave, n_octaves,
                                upsample=upsample, out_slots=out_slots,
                                equalize=equalize)


def detect_dispatch_codec(nib, idx, val, shape, max_features=4096,
                          upsample=True, equalize=False):
    """detect_dispatch twin for codec-packed batches. nib/idx/val are the
    (possibly already device_put) stacked transport payload; shape is the
    decoded (H, W)."""
    H, W = shape
    base_min = min(H, W) * (2 if upsample else 1)
    n_octaves = max(int(math.log2(base_min / 32.0)), 1)
    per_octave = max(max_features // n_octaves, 64)
    return _detect_packed_fused_codec(nib, idx, val, per_octave, n_octaves,
                                      upsample=upsample,
                                      out_slots=int(max_features),
                                      equalize=equalize)


def detect_dispatch(grays, max_features=4096, upsample=True,
                    equalize=False):
    """Dispatch one image's — or a small batch of same-shape images' —
    detection WITHOUT synchronizing.

    grays: (H, W) or (B, H, W) or a list of (H, W) arrays. Returns an
    opaque device array for detect_finalize. Lets callers double-buffer:
    dispatch batch i, then download batch i−1 while the device works — on
    tunneled runtimes the per-image transfer (and its ~34 ms RTT) is a
    large slice of detector wall-clock; batching additionally amortizes
    the RTT over B images. Callers pick B by total-pixel budget
    (features/detect.py _auto_device_batch; the r2/r3 worker wedges at
    B>1 near 3 MP did not reproduce in the r4 bisect — transient worker
    condition, scripts_dev/crash_bisect.py).

    equalize=True runs cv2-equivalent CLAHE on DEVICE (ops/clahe.py)
    before detection — at mission resolution host cv2 CLAHE is ~80 ms of
    single-core CPU per image, a visible slice of detect wall-clock.
    Requires uint8 input."""
    # already-on-device inputs (loaders call jax.device_put right after
    # decode so the upload pipelines ahead of the compute queue — with the
    # upload inside dispatch the loop serializes upload→compute→download
    # on the tunnel: measured 185 ms/img with 173 ms of finalize wait)
    def on_device(g):
        return isinstance(g, jax.Array)

    if isinstance(grays, (list, tuple)):
        if all(on_device(g) for g in grays):
            chunk = jnp.stack(list(grays))
        else:
            chunk = jnp.asarray(np.stack([np.asarray(g) for g in grays]))
    elif on_device(grays):
        chunk = grays
    else:
        chunk = jnp.asarray(np.asarray(grays))
    if chunk.ndim == 2:
        chunk = chunk[None]
    if chunk.dtype not in (jnp.uint8, jnp.float32):
        chunk = chunk.astype(jnp.float32)
    H, W = chunk.shape[-2:]
    base_min = min(H, W) * (2 if upsample else 1)
    n_octaves = max(int(math.log2(base_min / 32.0)), 1)
    per_octave = max(max_features // n_octaves, 64)
    if equalize and chunk.dtype != jnp.uint8:
        raise ValueError("device CLAHE needs uint8 input")
    if chunk.dtype == jnp.float32:
        chunk = chunk / 255.0
    return _detect_packed_fused(chunk, per_octave, n_octaves,
                                upsample=upsample,
                                out_slots=int(max_features),
                                equalize=equalize)


def detect_finalize(outs):
    """Materialize a single-image detect_dispatch → (kp, meta, desc)."""
    return detect_finalize_batch(outs)[0]


def detect_finalize_batch(outs):
    """Materialize a detect_dispatch result → [(kp, meta, desc), ...] per
    image. ONE download for the whole batch (see _pack_detect), decoded
    host-side with views."""
    buf = np.asarray(outs)                      # (B, K, 7 + D/4) int32
    results = []
    for b in range(buf.shape[0]):
        head = np.ascontiguousarray(buf[b, :, :6]).view(np.float32)
        v = buf[b, :, 6].astype(bool)
        desc = np.ascontiguousarray(buf[b, :, 7:]).view(np.uint8)
        results.append((head[v, :2], head[v, 2:6],
                        desc[v].astype(np.float32)))
    return results


def detect_and_compute_batch(grays: np.ndarray, max_features=4096,
                             max_chunk=None, upsample=True):
    """Batched detection. grays: (B, H, W) uint8/float. Returns numpy
    (kp, meta, desc, valid) padded to a static K (two orientation-clone
    slots per DoG candidate, invalid slots masked)."""
    grays = np.asarray(grays)
    # keep uint8 inputs as uint8: the device normalizes, and the upload is
    # 4× smaller (the tunnel link, not the TPU, dominates detector e2e)
    imgs = grays if grays.dtype == np.uint8 else grays.astype(np.float32)
    if imgs.ndim == 2:
        imgs = imgs[None]
    H, W = imgs.shape[-2:]
    if max_chunk is None:
        import jax as _jax
        on_tpu = _jax.default_backend() == "tpu"
        # chunk policy mirrors features/detect.py _auto_device_batch:
        # small frames by total-pixel budget (B*area <= ~13 MP), frames
        # > 0.56 MP chunk at 2 (the production-measured optimum; see the
        # policy docstring there for the numbers + wedge history).
        # Dispatches are async and results only sync after all chunks are
        # queued, so chunks pipeline on device.
        if not on_tpu:
            max_chunk = len(imgs)
        elif H * W > 560_000:
            max_chunk = 2 if 2 * H * W <= 13_000_000 else 1
        else:
            max_chunk = max(min(len(imgs), 13_000_000 // max(H * W, 1)), 1)
    base_min = min(H, W) * (2 if upsample else 1)
    n_octaves = max(int(math.log2(base_min / 32.0)), 1)
    per_octave = max(max_features // n_octaves, 64)
    outs = []
    for s in range(0, len(imgs), max_chunk):
        chunk = jnp.asarray(imgs[s:s + max_chunk])
        if chunk.dtype == jnp.float32:
            chunk = chunk / 255.0
        outs.append(_detect_batch(chunk, per_octave, n_octaves,
                                  upsample=upsample,
                                  out_slots=int(max_features)))
    # sync/download only after every chunk is queued: uploads, compute and
    # downloads pipeline across chunks on the device
    kp = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
    meta = np.concatenate([np.asarray(o[1]) for o in outs], axis=0)
    desc = np.concatenate([np.asarray(o[2]) for o in outs], axis=0)
    valid = np.concatenate([np.asarray(o[3]) for o in outs], axis=0)
    return kp, meta, desc.astype(np.float32), valid
