"""Pinhole + Brown–Conrady camera model, NED pose plumbing, projection.

Replaces cv2.undistortPoints / cv2.projectPoints / the reference's manual
redistort loop (reference project.py:257-329) and the pose→projection chain
(reference image.py:25-54 cam2body, image.py:536-553 get_proj) with pure-jnp,
batched, differentiable equivalents — these sit inside the bundle-adjustment
residual and the matcher's ground-projection seeding, so they must be jit- and
vmap-clean.

Frames (reference image.py:41-54):

- **NED**: local north/east/down, origin at the project reference lla.
- **body**: the camera's virtual aircraft-body frame; its attitude quaternion
  is what pose files store (quat = NED→body 'rzyx' Euler).
- **cam**: optical frame — x right, y down (image), z forward (optical axis).
  ``CAM2BODY`` maps cam→body: body_x=cam_z, body_y=cam_x, body_z=cam_y.

Projection of a NED point p with camera at ``ned`` with body→NED matrix B:
``x_cam = R (p - ned)`` with ``R = BODY2CAM @ Bᵀ``; then pinhole+distortion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import quat_to_matrix, rodrigues, rodrigues_inv

# cam→body axis permutation (reference image.py:50-54). Kept as a numpy
# constant (traced into jit as a literal) so importing this module never
# initializes the JAX backend — jax.distributed.initialize() must run first
# on multi-host missions (parallel/multihost.py).
CAM2BODY = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                    dtype=np.float32)
# body→cam = CAM2BODY⁻¹ = CAM2BODYᵀ
BODY2CAM = CAM2BODY.T


class CameraModel(NamedTuple):
    """Intrinsics pytree: K (3,3), dist (5,) = [k1,k2,p1,p2,k3], size px.

    Matches the cameras/<name>.json contract (reference camera.py:58-113):
    K row-major 9 floats, 5 distortion coefficients in OpenCV order.
    """

    K: jnp.ndarray
    dist: jnp.ndarray
    width: int = 0
    height: int = 0

    @property
    def fx(self):
        return self.K[..., 0, 0]

    @property
    def fy(self):
        return self.K[..., 1, 1]

    @property
    def cx(self):
        return self.K[..., 0, 2]

    @property
    def cy(self):
        return self.K[..., 1, 2]

    @staticmethod
    def from_params(fx, fy, cx, cy, dist=None, width=0, height=0):
        K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
        d = jnp.zeros(5) if dist is None else jnp.asarray(dist, dtype=jnp.result_type(float))
        return CameraModel(K=K, dist=d, width=width, height=height)


def distort_normalized(xy, dist):
    """Brown–Conrady forward model on normalized image coords.

    Matches the reference's hand-written redistort (project.py:300-329) and
    cv2.projectPoints' distortion step: radial (k1,k2,k3) + tangential (p1,p2).
    xy: (..., 2) normalized; dist: (..., 5).
    """
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2, k3 = jnp.moveaxis(jnp.broadcast_to(dist, xy.shape[:-1] + (5,)), -1, 0)
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    xd = radial * x + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = radial * y + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_dist, dist, iters=10):
    """Iterative inverse of distort_normalized (cv2.undistortPoints algorithm).

    Fixed-point: x ← (x_d − tangential(x)) / radial(x), ``iters`` rounds
    (cv2 uses 5; 10 keeps sub-1e-4 px error at wide-angle corners). Replaces
    cv2.undistortPoints at reference project.py:268, 286.
    """
    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        k1, k2, p1, p2, k3 = jnp.moveaxis(
            jnp.broadcast_to(dist, xy.shape[:-1] + (5,)), -1, 0)
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xy_dist[..., 0] - dx) / radial
        y_new = (xy_dist[..., 1] - dy) / radial
        return jnp.stack([x_new, y_new], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_dist)


def pixels_to_normalized(uv, K):
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    return (uv - c) / f


def normalized_to_pixels(xy, K):
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    return xy * f + c


def undistort_pixels(uv, K, dist, iters=10):
    """Distorted pixel coords → undistorted pixel coords (P=K convention,
    matching the reference's cv2.undistortPoints(..., P=K) at project.py:268)."""
    return normalized_to_pixels(undistort_normalized(pixels_to_normalized(uv, K), dist, iters), K)


def redistort_pixels(uv, K, dist):
    """Undistorted pixel coords → distorted (reference project.py:300-329)."""
    return normalized_to_pixels(distort_normalized(pixels_to_normalized(uv, K), dist), K)


def undistort_pixels_np(uv, K, dist, iters=10):
    """undistort_pixels in PURE NUMPY on the host.

    The whole-project keypoint undistortion (5.7M points at 2812 images)
    is the wrong shape for this runtime's device path: flat 1-D arrays
    execute ~23× slow (1-lane layouts), and the (m, 256) form pays a
    ~110 s remote compile per process. The same fixed-point iteration is
    2.8 s of vectorized host numpy with no compile and no transfers —
    identical algorithm and operation order as the jnp form (f32
    round-off level agreement)."""
    uv = np.asarray(uv, np.float32)
    K = np.asarray(K, np.float32)
    d = np.asarray(dist, np.float32)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    k1, k2, p1, p2, k3 = (float(v) for v in d[:5])
    xd = (uv[:, 0] - cx) / fx
    yd = (uv[:, 1] - cy) / fy
    x, y = xd.copy(), yd.copy()
    for _ in range(iters):
        r2 = x * x + y * y
        r4 = r2 * r2
        radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r4 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return np.stack([x * fx + cx, y * fy + cy], axis=1).astype(np.float32)


def undistort_pixels_flat(u, v, K, dist, iters=10):
    """undistort_pixels on SEPARATE 1-D u/v arrays → (u', v').

    Bulk path for whole-mission keypoint undistortion: TPU tiles the
    trailing dims of (..., 2) arrays to (8, 128), and the (B, npad, 2)
    formulation's compile ran ~8 min through the remote-compile tunnel;
    plain 1-D arrays compile in seconds and tile perfectly."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    xd = (u - cx) / fx
    yd = (v - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        r4 = r2 * r2
        radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r4 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return (xd - dx) / radial, (yd - dy) / radial

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return x * fx + cx, y * fy + cy


# ---------------------------------------------------------------------------
# Pose plumbing
# ---------------------------------------------------------------------------

def ned_quat_to_rt(ned, quat):
    """(camera NED position, NED→body quat) → (R, t) with x_cam = R p + t.

    R = BODY2CAM @ quat_to_matrix(quat)ᵀ, t = −R·ned — the reference's
    get_proj/nedquat2rvectvec chain (image.py:542-553, optimizer.py:84-99).
    Batched over leading dims.
    """
    body2ned = quat_to_matrix(quat)
    R = BODY2CAM @ jnp.swapaxes(body2ned, -1, -2)
    t = -jnp.einsum("...ij,...j->...i", R, ned)
    return R, t


def ned_quat_to_rvec_tvec(ned, quat):
    R, t = ned_quat_to_rt(ned, quat)
    return rodrigues_inv(R), t


def rvec_tvec_to_ned_quat(rvec, tvec):
    """Inverse of ned_quat_to_rvec_tvec (reference rvectvec2nedquat)."""
    from .rotations import matrix_to_quat

    R = rodrigues(rvec)
    ned = -jnp.einsum("...ji,...j->...i", R, tvec)  # -Rᵀ t
    body2ned = jnp.swapaxes(CAM2BODY @ R, -1, -2)   # (BODY2CAMᵀ... ) see note
    # R = BODY2CAM @ ned2body  ⇒  ned2body = CAM2BODY @ R ⇒ body2ned = (CAM2BODY R)ᵀ
    quat = matrix_to_quat(body2ned)
    return ned, quat


def project_points(points_ned, R, t, K, dist):
    """cv2.projectPoints equivalent: NED 3D points → distorted pixel coords.

    points_ned: (..., 3); R: (..., 3, 3); t: (..., 3). Fully batched and
    differentiable — this is the BA residual core (reference optimizer.py:220).
    Points behind the camera (z ≤ 0) still produce finite values via a z
    floor, so autodiff stays NaN-free; callers mask them.
    """
    pc = jnp.einsum("...ij,...j->...i", R, points_ned) + t
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    xy = pc[..., :2] / z_safe[..., None]
    xy_d = distort_normalized(xy, dist)
    return normalized_to_pixels(xy_d, K), z


def project_ned_quat(points_ned, cam_ned, cam_quat, K, dist):
    R, t = ned_quat_to_rt(cam_ned, cam_quat)
    return project_points(points_ned, R, t, K, dist)


def pixel_vectors_ned(uv, body2ned, K):
    """Undistorted pixel coords → unit view vectors in NED.

    Replaces projectVectors (reference project.py:536-551):
    v = body2ned @ CAM2BODY @ K⁻¹ @ [u, v, 1], normalized. uv: (..., 2).
    """
    uvh = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    IK = jnp.linalg.inv(K)
    M = body2ned @ CAM2BODY @ IK
    v = jnp.einsum("...ij,...j->...i", M, uvh)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def intersect_ground_plane(cam_ned, ground_m, vectors):
    """Ray ∩ horizontal plane at down=ground_m (reference project.py:553-565).

    Rays pointing skyward (v_down ≤ 0) return the camera position, matching
    the reference's guard. vectors: (..., 3) NED unit vectors.
    """
    vz = vectors[..., 2]
    d_proj = -(cam_ned[..., 2] + ground_m)
    factor = d_proj / jnp.where(vz > 1e-8, vz, 1.0)
    offset = vectors * factor[..., None]
    hit = cam_ned + offset
    down = jnp.broadcast_to(-ground_m, hit[..., 2].shape)
    hit = jnp.concatenate([hit[..., :2], down[..., None]], axis=-1)
    return jnp.where((vz > 1e-8)[..., None], hit, jnp.broadcast_to(cam_ned, hit.shape))
