"""Streaming Dynamic Mode Decomposition on device.

Replaces the reference's vendored dmdtools StreamingDMD
(motion/streaming_dmd.py:13-124, Hemati, Williams & Rowley, "Dynamic mode
decomposition for large and streaming datasets", Phys. Fluids 26, 2014):
rank-limited incremental updates of paired snapshot bases with
Gram–Schmidt expansion and POD-compression, maintaining the small matrices
(Gx, Gy, A) from which DMD eigenpairs are recovered at any time.

All linear algebra is jnp (device): the per-snapshot update is two
matvec-projections + outer-product accumulations — tiny, but the snapshot
vectors themselves are full frames, so keeping them on device avoids a
host↔device copy per frame.
"""

from __future__ import annotations

import numpy as np


class StreamingDMD:
    def __init__(self, max_rank=0, ngram=5, epsilon=np.finfo(np.float32).eps):
        self.max_rank = max_rank
        self.ngram = ngram
        self.eps = epsilon
        self.Qx = None   # (n, rx) orthonormal basis for x-snapshots
        self.Qy = None
        self.A = None    # (ry, rx)
        self.Gx = None   # (rx, rx) gram
        self.Gy = None

    def update(self, x, y):
        """Process one snapshot pair y ≈ A_full x."""
        import jax.numpy as jnp

        x = jnp.asarray(x, dtype=jnp.float32).ravel()
        y = jnp.asarray(y, dtype=jnp.float32).ravel()
        normx = float(jnp.linalg.norm(x))
        normy = float(jnp.linalg.norm(y))

        if self.Qx is None:
            self.Qx = (x / max(normx, 1e-30))[:, None]
            self.Qy = (y / max(normy, 1e-30))[:, None]
            self.Gx = jnp.zeros((1, 1))
            self.Gy = jnp.zeros((1, 1))
            self.A = jnp.zeros((1, 1))

        # -- Gram-Schmidt: expand bases if the residual is significant -----
        xtilde = self.Qx.T @ x
        ytilde = self.Qy.T @ y
        for _ in range(self.ngram):
            ex = x - self.Qx @ xtilde
            xtilde = xtilde + self.Qx.T @ ex
            ey = y - self.Qy @ ytilde
            ytilde = ytilde + self.Qy.T @ ey
        ex = x - self.Qx @ xtilde
        ey = y - self.Qy @ ytilde
        if float(jnp.linalg.norm(ex)) / max(normx, 1e-30) > self.eps ** 0.5:
            self.Qx = jnp.concatenate([self.Qx,
                                       (ex / jnp.linalg.norm(ex))[:, None]], 1)
            self.Gx = jnp.pad(self.Gx, ((0, 1), (0, 1)))
            self.A = jnp.pad(self.A, ((0, 0), (0, 1)))
        if float(jnp.linalg.norm(ey)) / max(normy, 1e-30) > self.eps ** 0.5:
            self.Qy = jnp.concatenate([self.Qy,
                                       (ey / jnp.linalg.norm(ey))[:, None]], 1)
            self.Gy = jnp.pad(self.Gy, ((0, 1), (0, 1)))
            self.A = jnp.pad(self.A, ((0, 1), (0, 0)))

        # -- POD compression when over rank budget -------------------------
        if self.max_rank:
            if self.Qx.shape[1] > self.max_rank:
                evals, evecs = jnp.linalg.eigh(self.Gx)
                q = evecs[:, -self.max_rank:][:, ::-1]
                self.Qx = self.Qx @ q
                self.A = self.A @ q
                self.Gx = jnp.diag(evals[-self.max_rank:][::-1])
            if self.Qy.shape[1] > self.max_rank:
                evals, evecs = jnp.linalg.eigh(self.Gy)
                q = evecs[:, -self.max_rank:][:, ::-1]
                self.Qy = self.Qy @ q
                self.A = q.T @ self.A
                self.Gy = jnp.diag(evals[-self.max_rank:][::-1])

        # -- rank-1 accumulation -------------------------------------------
        xtilde = self.Qx.T @ x
        ytilde = self.Qy.T @ y
        self.Gx = self.Gx + jnp.outer(xtilde, xtilde)
        self.Gy = self.Gy + jnp.outer(ytilde, ytilde)
        self.A = self.A + jnp.outer(ytilde, xtilde)
        return self

    def compute_modes(self):
        """Returns (modes (n, r) complex, eigenvalues (r,) complex)."""
        import jax.numpy as jnp
        import numpy.linalg as la

        Ktilde = np.asarray(self.Qx.T @ self.Qy) @ np.asarray(self.A) \
            @ la.pinv(np.asarray(self.Gx))
        evals, evecs = la.eig(Ktilde)
        modes = np.asarray(self.Qx) @ evecs
        return modes, evals
