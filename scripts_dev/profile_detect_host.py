"""Host-side cost decomposition of the detect loop at mission scale.

detect is 65% of the 2812 mission (0.254 s/img, BENCH_mission_2812.json)
with device compute at ~96 ms/img (batch_detect_probe). This measures the
per-image HOST costs that share the single core with dispatch: jpeg decode,
CLAHE, resize, gzip cache writes — plus decode-reduced variants
(IMREAD_REDUCED_GRAYSCALE_2) that skip full-res decode when scale <= 0.5.
"""
import gzip
import io
import os
import pickle
import sys
import time

import cv2
import numpy as np

W, H = 2176, 1440
SCALE = 0.4
N = 20


def timeit(fn, n=N):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
    # realistic jpeg content: smooth field + texture
    yy, xx = np.mgrid[0:H, 0:W]
    base = (127 + 60 * np.sin(xx / 97.0) * np.cos(yy / 71.0)).astype(np.uint8)
    img = cv2.merge([base, base, base])
    img += rng.integers(0, 40, img.shape, dtype=np.uint8)
    path = "/tmp/_profile_detect.jpg"
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    print("jpeg size MB:", os.path.getsize(path) / 1e6)

    r = {}
    r["decode_full"] = timeit(lambda: cv2.imread(path, cv2.IMREAD_GRAYSCALE))
    r["decode_reduced2"] = timeit(
        lambda: cv2.imread(path, cv2.IMREAD_REDUCED_GRAYSCALE_2))
    gray = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    gray_r2 = cv2.imread(path, cv2.IMREAD_REDUCED_GRAYSCALE_2)
    clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
    r["clahe_full"] = timeit(lambda: clahe.apply(gray))
    r["clahe_half"] = timeit(lambda: clahe.apply(gray_r2))
    eq = clahe.apply(gray)
    r["resize_full_to_04"] = timeit(
        lambda: cv2.resize(eq, (0, 0), fx=SCALE, fy=SCALE))
    eq2 = clahe.apply(gray_r2)
    r["resize_half_to_04"] = timeit(
        lambda: cv2.resize(eq2, (0, 0), fx=0.8, fy=0.8))

    # cache writes at a realistic feature budget
    n_feat = 4096
    kp = rng.uniform(0, W, (n_feat, 2)).astype(np.float32)
    meta = rng.uniform(0, 10, (n_feat, 4)).astype(np.float32)
    des = rng.integers(0, 255, (n_feat, 128), dtype=np.uint8)
    feats = [(tuple(kp[i]), float(meta[i, 0]), float(meta[i, 1]),
              float(meta[i, 2]), int(meta[i, 3]), 0) for i in range(n_feat)]

    def w_feat(level):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=level) as f:
            pickle.dump(feats, f)
        return buf.tell()

    def w_desc(level):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=level) as f:
            np.save(f, des)
        return buf.tell()

    for lv in (6, 1):
        r[f"gzip_feat_l{lv}"] = timeit(lambda: w_feat(lv), n=10)
        r[f"gzip_desc_l{lv}"] = timeit(lambda: w_desc(lv), n=10)
    r["feat_tuple_build_ms"] = timeit(lambda: [
        (tuple(kp[i]), float(meta[i, 0]), float(meta[i, 1]),
         float(meta[i, 2]), int(meta[i, 3]), 0) for i in range(n_feat)], n=10)
    print({k: round(v, 2) for k, v in r.items()})
    host_now = (r["decode_full"] + r["clahe_full"] + r["resize_full_to_04"]
                + r["gzip_feat_l6"] + r["gzip_desc_l6"]
                + r["feat_tuple_build_ms"])
    host_alt = (r["decode_reduced2"] + r["clahe_half"] + r["resize_half_to_04"]
                + r["gzip_feat_l1"] + r["gzip_desc_l1"])
    print(f"host path now ~{host_now:.0f} ms/img; reduced-decode + gzip-1 "
          f"~{host_alt:.0f} ms/img (+ tuple build if kept)")


if __name__ == "__main__":
    main()
