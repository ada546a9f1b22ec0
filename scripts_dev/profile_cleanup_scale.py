#!/usr/bin/env python
"""Profile link_matches / triangulate_ground / requalify_pairs at the
2812-image mission scale with synthetic in-memory inputs (no disk, no
detector) — isolates the host-stage costs BENCH_mission_2812.json reports
as link_s=46.5 / triangulate_s=34.1 / requalify_s=35.7.

Usage: JAX_PLATFORMS=cpu python scripts_dev/profile_cleanup_scale.py [--n 2812]
"""
import argparse
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class FakeImage:
    def __init__(self, name, kp, ned, quat):
        self.name = name
        self.kp = kp
        self.uv_list = None
        self.match_list = {}
        self.matches_clean = True
        self._ned = ned
        self._quat = quat

    def load_matches(self):
        pass

    def load_features(self):
        pass

    def save_matches(self):
        self.matches_clean = True

    def get_camera_pose(self, opt=False):
        return self._ned, [0, 0, 0], self._quat


class FakeProj:
    def __init__(self, images, cam_cfg):
        self.image_list = images
        self._cfg = cam_cfg

    def camera_model(self, optimized=False):
        from imageanalysis_tpu.io import camera_db
        return camera_db.to_model(self._cfg, optimized=optimized)

    def ned_reference_lla(self):
        return [44.0, -93.0, 280.0]


def build(n_img=2812, kp_per=4096, rows=112, match_per_pair=365, seed=0):
    rng = np.random.default_rng(seed)
    per_row = n_img // rows
    images = []
    for i in range(n_img):
        r, c = divmod(i, per_row)
        ned = np.array([r * 40.0, c * 40.0, -100.0], np.float64)
        quat = np.array([1.0, 0, 0, 0], np.float64)
        kp = rng.uniform(0, 2176, size=(kp_per, 2)).astype(np.float32)
        # plant some duplicate-uv keypoints (SIFT multi-orientation)
        dup = rng.integers(0, kp_per, size=kp_per // 20)
        kp[dup] = kp[rng.integers(0, kp_per, size=len(dup))]
        images.append(FakeImage("img%04d" % i, kp, ned, quat))
    # pair graph: sequential |i-j|<=3 plus cross-row neighbor
    n_pairs = 0
    for i in range(n_img):
        nbrs = [i + d for d in (1, 2, 3)] + [i + per_row, i + per_row + 1]
        for j in nbrs:
            if j >= n_img:
                continue
            m = np.stack([rng.integers(0, kp_per, match_per_pair),
                          rng.integers(0, kp_per, match_per_pair)],
                         axis=1).astype(np.int32)
            images[i].match_list[images[j].name] = m
            images[j].match_list[images[i].name] = m[:, ::-1].copy()
            n_pairs += 1
    cam_cfg = {
        "make": "Synthetic", "model": "TestCam", "lens_model": "none",
        "width_px": 2176, "height_px": 1440,
        "K": [[1400.0, 0, 1088.0], [0, 1400.0, 720.0], [0, 0, 1]],
        "dist_coeffs": [0.0] * 5,
        "mount": {"yaw_deg": 0.0, "pitch_deg": 0.0, "roll_deg": 0.0},
    }
    return FakeProj(images, cam_cfg), n_pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2812)
    ap.add_argument("--stage", default="all",
                    choices=["all", "link", "tri", "requal"])
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    from imageanalysis_tpu.match import cleanup, smart

    t0 = time.perf_counter()
    proj, n_pairs = build(args.n)
    total_m = sum(len(v) for im in proj.image_list
                  for v in im.match_list.values()) // 2
    print("built %d imgs, %d pairs, %.1fM matches in %.1fs"
          % (args.n, n_pairs, total_m / 1e6, time.perf_counter() - t0))

    def run(label, fn):
        if args.profile:
            pr = cProfile.Profile()
            pr.enable()
        t = time.perf_counter()
        r = fn()
        print("%s: %.2f s" % (label, time.perf_counter() - t))
        if args.profile:
            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
            print(s.getvalue())
        return r

    matches = None
    if args.stage in ("all", "link", "tri"):
        matches = run("link_matches", lambda: cleanup.link_matches(proj))
        print("  chains=%d obs=%d" % (len(matches),
                                      sum(len(m) - 2 for m in matches)))
    if args.stage in ("all", "tri"):
        run("triangulate_ground",
            lambda: cleanup.triangulate_ground(proj, matches))
    if args.stage in ("all", "requal"):
        import tempfile
        st = smart.SmartState(tempfile.mkdtemp(prefix="smartprof_"))
        st.save = lambda: None
        run("requalify_pairs", lambda: smart.requalify_pairs(proj, st))


if __name__ == "__main__":
    main()
