"""Minimal NavPy shim: exact WGS-84 lla<->ned, numpy float64.

The reference uses navpy.lla2ned / navpy.ned2lla (pose.py:149, image.py:407,
srtm.py:164-268). This shim implements both with the standard exact WGS-84
ECEF route (same math as imageanalysis_tpu/core/geodesy.py, which was
validated against navpy in round 1), and reproduces navpy's calling
conventions at the reference's call sites:

- lla2ned(lat, lon, alt, ref_lat, ref_lon, ref_alt) -> (3,) for scalars,
  (N, 3) for vector inputs;
- ned2lla(ned, ref_lat, ref_lon, ref_alt) -> (lat, lon, alt) tuple, each a
  scalar for a single point and an (N,) array for N points (the reference
  indexes navpy_pts[0][i], srtm.py:207-215).
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)


def _lla2ecef(lat_deg, lon_deg, alt_m):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    alt = np.asarray(alt_m, dtype=np.float64)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin_lat**2)
    x = (n + alt) * cos_lat * np.cos(lon)
    y = (n + alt) * cos_lat * np.sin(lon)
    z = (n * (1.0 - _E2) + alt) * sin_lat
    return np.stack([x, y, z], axis=-1)


def _ecef2lla(xyz, iters=10):
    xyz = np.asarray(xyz, dtype=np.float64)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1.0 - _E2))
    alt = np.zeros_like(p)
    for _ in range(iters):
        sin_lat = np.sin(lat)
        n = _A / np.sqrt(1.0 - _E2 * sin_lat**2)
        alt = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - _E2 * n / (n + alt)))
    return np.degrees(lat), np.degrees(lon), alt


def _ecef2ned_matrix(lat_deg, lon_deg):
    lat = np.radians(float(lat_deg))
    lon = np.radians(float(lon_deg))
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    return np.array([
        [-sl * co, -sl * so, cl],
        [-so, co, 0.0],
        [-cl * co, -cl * so, -sl],
    ])


def lla2ned(lat, lon, alt, lat_ref, lon_ref, alt_ref,
            latlon_unit="deg", alt_unit="m", model="wgs84"):
    ecef = _lla2ecef(lat, lon, alt)
    ecef_ref = _lla2ecef(lat_ref, lon_ref, alt_ref)
    ned = (ecef - ecef_ref) @ _ecef2ned_matrix(lat_ref, lon_ref).T
    return ned  # (3,) for scalar input, (N, 3) for vectors


def ned2lla(ned, lat_ref, lon_ref, alt_ref,
            latlon_unit="deg", alt_unit="m", model="wgs84"):
    ned = np.asarray(ned, dtype=np.float64)
    single = ned.ndim == 1 or (ned.ndim == 2 and ned.shape[0] == 1)
    ned2 = ned.reshape(-1, 3)
    ecef = ned2 @ _ecef2ned_matrix(lat_ref, lon_ref) \
        + _lla2ecef(lat_ref, lon_ref, alt_ref)
    lat, lon, alt = _ecef2lla(ecef)
    if single:
        return float(lat[0]), float(lon[0]), float(alt[0])
    return lat, lon, alt
