"""Device CLAHE (contrast-limited adaptive histogram equalization).

The reference equalizes every image with cv2.createCLAHE(3.0, (8,8))
before detection (reference image.py:99-135). At mission resolution that
is ~80 ms of single-core host CPU per image — a visible slice of the
detect stage's wall-clock once the detector itself runs on device
(features/detect.py). This moves the equalization into the detect jit:

- tile histograms as fused compare+reduce (no host loops);
- cv2's clip/redistribute rule: limit = max(1, clip·area/256), uniform
  redistribution of the excess plus cv2's stride rule for the residual;
- per-tile LUT = round(cdf · 255/area);
- bilinear blending of the 4 neighboring tile LUTs per pixel. With
  H, W divisible by the tile grid this matches cv2's tile-center
  geometry exactly (pixel y maps to grid coordinate (y+0.5)/th − 0.5);
  non-divisible inputs use the same continuous mapping against cv2's
  ceil-sized tiles — a sub-pixel geometry difference confined to the
  last row/column band.

The LUT lookup is the interesting TPU part: per-pixel table lookups are
serialized gathers, so the blend runs as 32 chunks of 8 intensities —
each chunk bilinearly upsamples the (gh, gw, 8) LUT slab to pixel
resolution with two small matmuls and accumulates masked values, an
(H·W·256)-element fused compare/mul/reduce stream instead of 4 gathers
per pixel.

Parity: mean |Δ| vs cv2.createCLAHE < 1 gray level on random and
natural-statistics images (tests/test_ops_knn.py::test_clahe_matches_cv2
— the detector's DoG thresholds are far coarser than that).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resize_mat(n_px, n_tiles, tile):
    """(n_px, n_tiles) bilinear weights from tile-center grid to pixels:
    pixel p sits at grid coordinate (p+0.5)/tile − 0.5, clamped."""
    g = (np.arange(n_px) + 0.5) / tile - 0.5
    g = np.clip(g, 0.0, n_tiles - 1.0)
    lo = np.minimum(np.floor(g).astype(np.int32), n_tiles - 2) \
        if n_tiles > 1 else np.zeros(n_px, np.int32)
    w = g - lo
    M = np.zeros((n_px, n_tiles), np.float32)
    M[np.arange(n_px), lo] = 1.0 - w
    if n_tiles > 1:
        M[np.arange(n_px), lo + 1] += w
    return M


@functools.partial(jax.jit, static_argnames=("grid", "clip_limit", "chunk"))
def clahe(img, clip_limit=3.0, grid=(8, 8), chunk=8):
    """CLAHE on (H, W) or (B, H, W) uint8 images → same shape uint8."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    B, H, W = img.shape
    gh, gw = grid
    th, tw = -(-H // gh), -(-W // gw)          # cv2 ceil tile size
    ph, pw = th * gh - H, tw * gw - W
    padded = jnp.pad(img, ((0, 0), (0, ph), (0, pw)), mode="edge") \
        if (ph or pw) else img
    area = th * tw
    v = padded.astype(jnp.int32)
    tiles = v.reshape(B, gh, th, gw, tw).transpose(0, 1, 3, 2, 4) \
        .reshape(B, gh * gw, area)

    k = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum((tiles[..., None] == k).astype(jnp.int32), axis=2)

    limit = max(int(clip_limit * area / 256.0), 1)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    batch = excess // 256
    residual = excess - batch * 256
    clipped = clipped + batch
    # cv2 residual rule: +1 at bins 0, s, 2s, … for the first `residual`
    # strides, s = max(256 // residual, 1)
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bump = ((k % step) == 0) & (k // step < residual)
    clipped = clipped + bump.astype(jnp.int32)

    scale = 255.0 / float(area)
    lut = jnp.clip(jnp.round(jnp.cumsum(clipped, axis=-1) * scale),
                   0, 255).astype(jnp.float32)       # (B, gh*gw, 256)
    lut = lut.reshape(B, gh, gw, 256)

    Ry = jnp.asarray(_resize_mat(H, gh, th))          # (H, gh)
    Rx = jnp.asarray(_resize_mat(W, gw, tw))          # (W, gw)
    vimg = img.astype(jnp.int32)
    out = jnp.zeros((B, H, W), jnp.float32)
    for k0 in range(0, 256, chunk):
        slab = lut[..., k0:k0 + chunk]                # (B, gh, gw, c)
        rows = jnp.einsum("hi,bijc->bhjc", Ry, slab)  # (B, H, gw, c)
        full = jnp.einsum("wj,bhjc->bhwc", Rx, rows)  # (B, H, W, c)
        mask = (vimg[..., None] == (k0 + jnp.arange(chunk)))
        out = out + jnp.sum(jnp.where(mask, full, 0.0), axis=-1)
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out[0] if squeeze else out
