"""GMS (Grid-based Motion Statistics) match filter, vectorized.

Replaces cv2.xfeatures2d.matchGMS (reference matcher.py:285; the reference
repo also archived a pure-python port at scripts/lib/archive/gms_matcher.py).
Idea (Bian et al., CVPR 2017): true matches are supported by their
neighbors. Partition both images into G×G grids; for each cell pair (i→j)
count supporting matches; matches in cell pairs whose neighborhood support
exceeds τ = α·√(avg matches per supporting cell) are kept.

This implementation is one scatter + one 3×3 convolution over the
(G², G²) cell-pair vote matrix — fully batched, jit-clean, no python loops.
Rotation/scale variants of the original are unnecessary here because the
caller aligns orientation via the homography seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ALPHA = 6.0  # GMS paper's τ = α·√n factor (cv2 default)


@functools.partial(jax.jit, static_argnames=("grid",))
def gms_filter(uv_a, uv_b, valid, wh_a, wh_b, grid=20, alpha=ALPHA):
    """uv_a/uv_b: (N, 2) matched keypoint coords; valid: (N,) bool;
    wh_a/wh_b: (2,) image sizes. Returns (N,) bool of GMS survivors."""
    g = grid

    def cell_of(uv, wh):
        cx = jnp.clip((uv[:, 0] / wh[0] * g).astype(jnp.int32), 0, g - 1)
        cy = jnp.clip((uv[:, 1] / wh[1] * g).astype(jnp.int32), 0, g - 1)
        return cy * g + cx

    ca = cell_of(uv_a, wh_a)           # (N,) in [0, g²)
    cb = cell_of(uv_b, wh_b)
    w = valid.astype(jnp.float32)

    # vote matrix V[ca, cb]
    votes = jnp.zeros((g * g, g * g), jnp.float32)
    votes = votes.at[ca, cb].add(w)

    # neighborhood support: sum votes over the 3×3 neighborhoods of BOTH
    # cells — a separable 3×3 convolution on each grid axis
    V = votes.reshape(g, g, g, g)      # (ay, ax, by, bx)

    def conv3(x, axis):
        lo = jnp.roll(x, 1, axis=axis)
        hi = jnp.roll(x, -1, axis=axis)
        # zero the wrapped edges
        idx = jnp.arange(x.shape[axis])
        shape = [1] * x.ndim
        shape[axis] = -1
        first = (idx == 0).reshape(shape)
        last = (idx == x.shape[axis] - 1).reshape(shape)
        lo = jnp.where(first, 0.0, lo)
        hi = jnp.where(last, 0.0, hi)
        return x + lo + hi

    S = V
    for ax in range(4):
        S = conv3(S, ax)
    S = S.reshape(g * g, g * g)

    # cells with any vote in the 3×3 neighborhood (for the mean divisor)
    occ = (votes > 0).astype(jnp.float32).reshape(g, g, g, g)
    n_cells = occ
    for ax in range(4):
        n_cells = conv3(n_cells, ax)
    n_cells = n_cells.reshape(g * g, g * g)

    mean_per_cell = S / jnp.maximum(n_cells, 1.0)
    tau = alpha * jnp.sqrt(jnp.maximum(mean_per_cell, 0.0))
    accept_cell = S > tau

    return valid & accept_cell[ca, cb]
