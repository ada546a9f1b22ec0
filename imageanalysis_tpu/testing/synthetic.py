"""Synthetic mission generator: ground-truth scenes for tests and benchmarks.

Renders a flat textured ground plane from known nadir-ish camera poses (each
view is an exact homography of the ortho texture — no distortion), writes the
JPGs + pix4d.csv into a project dir, and returns the ground truth. This plays
the role of the reference's published validation datasets (README-DataSets.md)
as an executable fixture.
"""

from __future__ import annotations

import os

import numpy as np

from ..core import geodesy
from ..core.camera import CAM2BODY
from ..core.rotations import quat_from_ypr, quat_multiply, quat_to_matrix, ypr_from_quat

D2R = np.pi / 180.0
R2D = 180.0 / np.pi

REF_LLA = (44.97, -93.26, 0.0)


def make_ground_texture(rng, size=2048, blur=2.0):
    import cv2

    tex = rng.uniform(0, 255, (size, size)).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), blur)
    # add multi-scale structure so SIFT has features at several octaves
    for s in (8, 32):
        coarse = cv2.resize(rng.uniform(0, 255, (size // s, size // s))
                            .astype(np.float32), (size, size),
                            interpolation=cv2.INTER_CUBIC)
        tex += coarse
    tex = cv2.normalize(tex, None, 0, 255, cv2.NORM_MINMAX)
    return tex.astype(np.uint8)


def make_tiled_texture(rng, size=2048, period=140, blur=1.5):
    """Periodically repeating ground texture — synthetic 'row crop / forest
    canopy' (reference README.md:54-58): every feature has a near-identical
    twin one period away, which collapses pure ratio-test matching and is
    exactly what the smart strategy's position-prior gating must survive."""
    import cv2

    cell = rng.uniform(0, 255, (period, period)).astype(np.float32)
    cell = cv2.GaussianBlur(cell, (0, 0), blur)
    reps = int(np.ceil(size / period))
    tex = np.tile(cell, (reps, reps))[:size, :size]
    tex = cv2.normalize(tex, None, 0, 255, cv2.NORM_MINMAX)
    return tex.astype(np.uint8)


class WorldTexture:
    """Deterministic unbounded ground texture, generated tile by tile.

    A single global texture caps mission size (a 2812-image grid spans
    kilometres); instead the world is divided into ``tile_m``-metre tiles
    whose texture is generated from an rng seeded by the tile coordinates
    — overlapping views see identical ground without ever materializing
    the whole world. A small LRU keeps the working set (row-major capture
    patterns revisit the same few tiles)."""

    def __init__(self, seed, res=0.15, tile_m=256.0, cache_tiles=32):
        self.seed = seed
        self.res = res
        self.tile_m = tile_m
        self.tile_px = int(round(tile_m / res))
        self._cache = {}
        self._order = []
        self.cache_tiles = cache_tiles

    def _tile(self, ti, tj):
        key = (ti, tj)
        if key in self._cache:
            return self._cache[key]
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + ti * 7919 + tj * 104729) & 0x7FFFFFFF)
        tex = make_ground_texture(rng, size=self.tile_px)
        self._cache[key] = tex
        self._order.append(key)
        if len(self._order) > self.cache_tiles:
            del self._cache[self._order.pop(0)]
        return tex

    def patch(self, n_min, e_min, n_max, e_max):
        """Texture patch covering the NED-aligned ground rect. Returns
        (tex (h, w) uint8, S 3×3 mapping texture px → world (n, e, 1))."""
        ti0 = int(np.floor(n_min / self.tile_m))
        ti1 = int(np.floor(n_max / self.tile_m))
        tj0 = int(np.floor(e_min / self.tile_m))
        tj1 = int(np.floor(e_max / self.tile_m))
        rows = []
        for ti in range(ti0, ti1 + 1):
            cols = [self._tile(ti, tj) for tj in range(tj0, tj1 + 1)]
            rows.append(np.concatenate(cols, axis=1))
        tex = np.concatenate(rows, axis=0)
        n0 = ti0 * self.tile_m
        e0 = tj0 * self.tile_m
        # pixel (px, py) → n = n0 + py·res, e = e0 + px·res
        S = np.array([[0.0, self.res, n0],
                      [self.res, 0.0, e0],
                      [0.0, 0.0, 1.0]])
        return tex, S


class SyntheticMission:
    def __init__(self, project_dir, n_images=6, img_size=(800, 600),
                 altitude=100.0, spacing=18.0, fx=700.0, texture_res=0.25,
                 yaw_jitter=3.0, pos_jitter=1.0, seed=7, rows=1,
                 texture_px=2048, world_tiles=False, texture_period=None):
        """texture_res: meters per texture pixel; texture_px: ground-plane
        texture size (raise for large missions so the grid stays on it);
        world_tiles=True switches to the unbounded procedural
        WorldTexture — required for missions spanning kilometres;
        texture_period: render a periodically tiled texture instead
        (make_tiled_texture) — repetitive-canopy robustness scenarios."""
        self.project_dir = project_dir
        self.n_images = n_images
        self.w, self.h = img_size
        self.alt = altitude
        self.fx = fx
        self.K = np.array([[fx, 0, self.w / 2.0], [0, fx, self.h / 2.0],
                           [0, 0, 1.0]])
        self.rng = np.random.default_rng(seed)
        self.texture_res = texture_res
        self.spacing = spacing
        self.yaw_jitter = yaw_jitter
        self.pos_jitter = pos_jitter
        self.rows = rows
        self.texture_px = texture_px
        self.world_tiles = world_tiles
        self.texture_period = texture_period
        self.poses = []  # (name, ned, aircraft ypr_deg)

    def generate(self, skip_existing=False):
        """skip_existing: reuse already-rendered image files (the poses are
        deterministic from the seed, so bookkeeping still rebuilds exactly);
        lets mission-scale benches rerun without the ~13 min re-render."""
        import cv2

        os.makedirs(self.project_dir, exist_ok=True)
        if self.world_tiles:
            world = WorldTexture(self.rng.integers(1 << 30),
                                 res=self.texture_res)
            tex, S = None, None
        else:
            world = None
            if self.texture_period:
                tex = make_tiled_texture(self.rng, size=self.texture_px,
                                         period=self.texture_period)
            else:
                tex = make_ground_texture(self.rng, size=self.texture_px)
            ts = tex.shape[0]
            # texture pixel (px, py) → world NED (n, e, 0): center it
            res = self.texture_res
            S = np.array([[0.0, res, -ts / 2.0 * res],  # n = (py − c)·res
                          [res, 0.0, -ts / 2.0 * res],  # e = (px − c)·res
                          [0.0, 0.0, 1.0]])
        per_row = self.n_images // self.rows or 1
        # center the grid on the texture origin so large missions stay on
        # the rendered ground plane
        n_off = (per_row - 1) * self.spacing * 0.5
        e_off = (self.rows - 1) * self.spacing * 2.5 * 0.5
        records = []
        for i in range(self.n_images):
            row, col = divmod(i, per_row)
            ned = np.array([
                col * self.spacing - n_off
                + self.rng.normal(0, self.pos_jitter),
                row * self.spacing * 2.5 - e_off
                + self.rng.normal(0, self.pos_jitter),
                -self.alt + self.rng.normal(0, self.pos_jitter),
            ])
            yaw = self.rng.normal(0, self.yaw_jitter)
            # aircraft level, camera mounted pitch -90 (nadir)
            ac_ypr = (yaw, 0.0, 0.0)
            name = f"IMG_{i:04d}.jpg"
            if skip_existing and os.path.isfile(
                    os.path.join(self.project_dir, name)):
                pass
            elif world is not None:
                # footprint with margin at this altitude/attitude
                half = (max(self.w, self.h) / self.fx) * self.alt * 0.8 + 30
                tex_i, S_i = world.patch(ned[0] - half, ned[1] - half,
                                         ned[0] + half, ned[1] + half)
                self._render(cv2, tex_i, S_i, ned, ac_ypr, name)
            else:
                self._render(cv2, tex, S, ned, ac_ypr, name)
            records.append((name, ned, ac_ypr))
        self.poses = records
        self._write_pix4d(records)
        return records

    def camera_quat(self, ac_ypr_deg):
        """NED→virtual-camera-body quat for aircraft ypr + nadir mount."""
        q_ac = quat_from_ypr(ac_ypr_deg[0] * D2R, ac_ypr_deg[1] * D2R,
                             ac_ypr_deg[2] * D2R)
        q_mount = quat_from_ypr(0.0, -90.0 * D2R, 0.0)
        return np.asarray(quat_multiply(q_ac, q_mount))

    def world_to_image_H(self, ned, ac_ypr):
        """Ground-truth homography world plane (n, e, 1) → image pixels.

        This is the exact map the renderer uses; evaluators (e.g.
        parity/run_parity.py) must call this rather than re-deriving it."""
        q_cam = self.camera_quat(ac_ypr)
        B = np.asarray(quat_to_matrix(q_cam))          # body→NED
        R = np.asarray(CAM2BODY).T @ B.T               # NED→cam
        # ground point (n, e, 0): x_cam = R[:, :2]·(n,e) + R·(−ned) ⇒
        # homography world-plane→image with t = −R·ned:
        t = -R @ ned
        return self.K @ np.column_stack([R[:, 0], R[:, 1], t])

    def _render(self, cv2, tex, S, ned, ac_ypr, name):
        H = self.world_to_image_H(ned, ac_ypr) @ S
        img = cv2.warpPerspective(tex, H, (self.w, self.h),
                                  flags=cv2.INTER_LINEAR)
        # write 3-channel JPGs: single-channel files break consumers that
        # load with IMREAD_ANYCOLOR + a BGR colorspace convert (reference
        # image.py:99-127 load_rgb/load_gray); luma is unchanged so
        # detectors see identical pixels
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        cv2.imwrite(os.path.join(self.project_dir, name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])

    def _write_pix4d(self, records):
        lines = ["File Name,Lat (decimal degrees),Lon (decimal degrees),"
                 "Alt (meters MSL),Roll (decimal degrees),"
                 "Pitch (decimal degrees),Yaw (decimal degrees)"]
        for name, ned, ac_ypr in records:
            lla = geodesy.ned2lla(ned, *REF_LLA)
            lines.append(f"{name},{lla[0]:.10f},{lla[1]:.10f},{lla[2]:.2f},"
                         f"{ac_ypr[2]:.2f},{ac_ypr[1]:.2f},{ac_ypr[0]:.2f}")
        with open(os.path.join(self.project_dir, "pix4d.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

    def camera_config(self):
        return {
            "make": "Synthetic", "model": "TestCam", "lens_model": "none",
            "K": [self.fx, 0.0, self.w / 2.0, 0.0, self.fx, self.h / 2.0,
                  0.0, 0.0, 1.0],
            "dist_coeffs": [0.0] * 5,
            "width_px": self.w, "height_px": self.h,
            "focal_len_mm": 8.0, "ccd_width_mm": 8.0 * self.w / self.fx,
            "ccd_height_mm": 8.0 * self.h / self.fx,
        }

    def true_camera_ned(self, ref_lla=None):
        """Ground-truth camera NED positions, optionally re-expressed in a
        different NED reference (e.g. the one the pipeline computed)."""
        ned = np.array([n for _, n, _ in self.poses])
        if ref_lla is None:
            return ned
        lla = geodesy.ned2lla(ned, *REF_LLA)
        return geodesy.lla2ned(lla[:, 0], lla[:, 1], lla[:, 2], *ref_lla)
