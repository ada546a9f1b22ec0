"""WGS-84 geodesy: lla ↔ ECEF ↔ local NED.

Replaces the reference's navpy dependency (reference image.py:9,
pose.py:149-151 ``navpy.lla2ned``, image.py:407 ``navpy.ned2lla``,
srtm.py uses both). Same conventions as navpy:

- lat/lon in **degrees**, altitude in meters above the WGS-84 ellipsoid;
- NED = [north, east, down] meters relative to a reference lla.

Two implementations are provided:

- numpy (float64) host functions — geodesy needs ~1e-9 relative precision
  (1e-7 deg ≈ 1 cm), beyond practical float32, and it runs on small pose
  arrays, so the host is the right place for it;
- jnp variants (suffix ``_j``) for use inside jitted device code where NED
  offsets (already local, |x| ≲ 10 km) keep float32 honest.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# WGS-84 ellipsoid
_A = 6378137.0                # semi-major axis (m)
_F = 1.0 / 298.257223563      # flattening
_E2 = _F * (2.0 - _F)         # first eccentricity squared


def lla2ecef(lat_deg, lon_deg, alt_m):
    """Geodetic lat/lon/alt (deg, deg, m) → ECEF xyz (m). float64 numpy."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    alt = np.asarray(alt_m, dtype=np.float64)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin_lat**2)
    x = (n + alt) * cos_lat * np.cos(lon)
    y = (n + alt) * cos_lat * np.sin(lon)
    z = (n * (1.0 - _E2) + alt) * sin_lat
    return np.stack([x, y, z], axis=-1)


def ecef2lla(xyz, iters=8):
    """ECEF xyz (m) → lat/lon/alt (deg, deg, m) by Bowring iteration."""
    xyz = np.asarray(xyz, dtype=np.float64)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1.0 - _E2))  # initial guess
    for _ in range(iters):
        sin_lat = np.sin(lat)
        n = _A / np.sqrt(1.0 - _E2 * sin_lat**2)
        alt = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - _E2 * n / (n + alt)))
    sin_lat = np.sin(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin_lat**2)
    alt = p / np.cos(lat) - n
    return np.stack([np.degrees(lat), np.degrees(lon), alt], axis=-1)


def _ecef2ned_matrix(lat_deg, lon_deg):
    lat = np.radians(float(lat_deg))
    lon = np.radians(float(lon_deg))
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    return np.array(
        [
            [-sl * co, -sl * so, cl],
            [-so, co, 0.0],
            [-cl * co, -cl * so, -sl],
        ],
        dtype=np.float64,
    )


def lla2ned(lat_deg, lon_deg, alt_m, ref_lat_deg, ref_lon_deg, ref_alt_m):
    """lla → NED (m) relative to a reference lla. navpy.lla2ned equivalent."""
    ecef = lla2ecef(lat_deg, lon_deg, alt_m)
    ref_ecef = lla2ecef(ref_lat_deg, ref_lon_deg, ref_alt_m)
    C = _ecef2ned_matrix(ref_lat_deg, ref_lon_deg)
    return (ecef - ref_ecef) @ C.T


def ned2lla(ned, ref_lat_deg, ref_lon_deg, ref_alt_m):
    """NED (m) relative to reference lla → [lat_deg, lon_deg, alt_m]."""
    ned = np.asarray(ned, dtype=np.float64)
    C = _ecef2ned_matrix(ref_lat_deg, ref_lon_deg)
    ref_ecef = lla2ecef(ref_lat_deg, ref_lon_deg, ref_alt_m)
    ecef = ref_ecef + ned @ C
    return ecef2lla(ecef)


# ---------------------------------------------------------------------------
# jnp variants for device code (float32-safe for local NED work)
# ---------------------------------------------------------------------------

def lla2ned_j(lat_deg, lon_deg, alt_m, ref_lat_deg, ref_lon_deg, ref_alt_m):
    """jnp lla→NED using the local-tangent small-angle expansion.

    Includes the second-order Earth-curvature drop; accuracy ~1e-4 relative
    (≈10 cm at 1 km) — ample for on-device terrain/projection work. Pose
    ingestion uses the exact float64 host functions above.
    """
    lat0 = jnp.radians(ref_lat_deg)
    sin0, cos0 = jnp.sin(lat0), jnp.cos(lat0)
    # radii of curvature at the reference
    rn = _A / jnp.sqrt(1.0 - _E2 * sin0**2)          # prime vertical
    rm = rn * (1.0 - _E2) / (1.0 - _E2 * sin0**2)    # meridional
    dlat = jnp.radians(lat_deg - ref_lat_deg)
    dlon = jnp.radians(lon_deg - ref_lon_deg)
    n = dlat * (rm + ref_alt_m)
    e = dlon * (rn + ref_alt_m) * cos0
    # second-order Earth-curvature drop: the tangent plane rises above the
    # ellipsoid by ~s²/2R, so a point at constant altitude appears lower
    d = -(alt_m - ref_alt_m) + (n * n + e * e) / (2.0 * (rn + ref_alt_m))
    return jnp.stack([n, e, d], axis=-1)


def ned2lla_j(ned, ref_lat_deg, ref_lon_deg, ref_alt_m):
    """jnp NED→lla inverse of lla2ned_j (same tangent-plane approximation)."""
    lat0 = jnp.radians(ref_lat_deg)
    sin0, cos0 = jnp.sin(lat0), jnp.cos(lat0)
    rn = _A / jnp.sqrt(1.0 - _E2 * sin0**2)
    rm = rn * (1.0 - _E2) / (1.0 - _E2 * sin0**2)
    lat = ref_lat_deg + jnp.degrees(ned[..., 0] / (rm + ref_alt_m))
    lon = ref_lon_deg + jnp.degrees(ned[..., 1] / ((rn + ref_alt_m) * cos0))
    s2 = ned[..., 0] ** 2 + ned[..., 1] ** 2
    alt = ref_alt_m - ned[..., 2] + s2 / (2.0 * (rn + ref_alt_m))
    return jnp.stack([lat, lon, alt], axis=-1)
