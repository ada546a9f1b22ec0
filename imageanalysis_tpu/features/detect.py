"""Feature detection front-end.

The reference delegates detection to OpenCV SIFT/SURF/ORB/Star
(reference image.py:230-350 ``make_detector``/``detect_features``): load RGB,
CLAHE-equalize, scale down (default 0.4 — "less is more" for outdoor imagery),
detectAndCompute, rescale keypoints to full resolution, cache to
cache/<name>.feat|.desc.

Here detection is a pluggable interface with two backends:

- ``cv`` — OpenCV SIFT/ORB on the host (byte-compatible caches, parity
  baseline; OpenCV is a dependency of the reference so using it host-side for
  IO-adjacent work keeps compatibility while the device does the matching);
- ``tpu`` — the batched DoG/SIFT-style Pallas/jnp detector in
  features/sift_tpu.py, detecting many images per device call.

Both return (kp (n,2) float32 full-res uv, kp_meta (n,4) [size, angle,
response, octave], desc (n,128) float32).
"""

from __future__ import annotations

import numpy as np


class DetectorConfig:
    def __init__(self, detector="SIFT", scale=0.4, max_features=0,
                 equalize=True, backend="cv", device_batch=0):
        self.detector = detector
        self.scale = scale
        self.max_features = int(max_features)
        self.equalize = equalize
        self.backend = backend
        # images per TPU detect dispatch; 0 = auto by scaled image area
        # (the pyramid fusion crashes this runtime's TPU worker at B>1
        # near 3 MP — small frames batch safely and amortize the per-
        # dispatch download RTT over B images)
        self.device_batch = int(device_batch)

    def to_dict(self):
        return dict(detector=self.detector, scale=self.scale,
                    max_features=self.max_features, equalize=self.equalize,
                    backend=self.backend, device_batch=self.device_batch)

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: d[k] for k in
                      ("detector", "scale", "max_features", "equalize",
                       "backend", "device_batch")
                      if k in d})


def load_gray(path: str, equalize=True) -> np.ndarray:
    """Load + grayscale + optional CLAHE (reference image.py:99-135)."""
    import cv2

    img = cv2.imread(path, flags=cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH
                     | cv2.IMREAD_IGNORE_ORIENTATION)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    if equalize:
        clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
        img = clahe.apply(img)
    return img


def load_scaled_gray(path: str, scale: float, equalize=True):
    """Decode + downscale + optional CLAHE, returning (scaled_gray,
    (full_w, full_h)).

    This is the detect pipeline's fast load: detection runs on the scaled
    image anyway (reference image.py:287-350, default scale 0.4), so

    - JPEGs at scale <= 0.5 decode through PIL's DCT-domain ``draft`` mode
      at 1/2 (or 1/4, 1/8) resolution — ~2x faster than a full decode on
      the profiled host (scripts_dev/profile_detect_host.py) and the
      remaining resize starts from 4x fewer pixels;
    - CLAHE runs on the SCALED image, not full resolution. The reference
      equalizes full-res then resizes (image.py:99-135 + :287); CLAHE's
      8x8 tile grid is image-relative, so the local-contrast structure is
      the same and the cost drops with the pixel count (83 -> ~11 ms/img
      at scale 0.4 on the profiled host).
    """
    import cv2

    scaled = None
    full_size = None
    if scale <= 0.5:
        try:
            from PIL import Image as PILImage

            with PILImage.open(path) as im:
                full_size = (im.width, im.height)
                ratio = 2 if scale > 0.25 else (4 if scale > 0.125 else 8)
                im.draft("L", (im.width // ratio, im.height // ratio))
                gray = np.asarray(im.convert("L"))
            # draft may land on any size >= requested; resize by actual dims
            fx = scale * full_size[0] / gray.shape[1]
            fy = scale * full_size[1] / gray.shape[0]
            scaled = cv2.resize(gray, (0, 0), fx=fx, fy=fy) \
                if abs(fx - 1.0) > 1e-9 or abs(fy - 1.0) > 1e-9 else gray
        except Exception:
            scaled = None                 # non-JPEG / PIL failure: cv2 path
    if scaled is None:
        img = cv2.imread(path, flags=cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH
                         | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        full_size = (img.shape[1], img.shape[0])
        scaled = cv2.resize(img, (0, 0), fx=scale, fy=scale) \
            if scale != 1.0 else img
    if equalize:
        clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
        scaled = clahe.apply(scaled)
    return scaled, full_size


def detect(gray: np.ndarray, config: DetectorConfig):
    """Detect on a scaled copy, rescale kp coords to full resolution
    (reference image.py:287-350)."""
    import cv2

    scale = config.scale
    scaled = cv2.resize(gray, (0, 0), fx=scale, fy=scale) if scale != 1.0 else gray
    kp, kp_meta, des = detect_scaled(scaled, config)
    return kp / scale, kp_meta, des


def detect_scaled(scaled: np.ndarray, config: DetectorConfig):
    """Detect on an already-scaled image; kp coords are in SCALED pixels
    (callers divide by config.scale for full-res coords)."""
    import cv2

    if config.backend == "tpu":
        from . import sift_tpu
        kp, kp_meta, des = sift_tpu.detect_and_compute(
            scaled, max_features=config.max_features or 4096)
    elif config.detector == "SIFT":
        det = (cv2.SIFT_create(nfeatures=config.max_features)
               if config.max_features else cv2.SIFT_create())
        kps, des = det.detectAndCompute(scaled, None)
        kp = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
        kp_meta = np.array([(k.size, k.angle, k.response, k.octave)
                            for k in kps], np.float32).reshape(-1, 4)
    elif config.detector == "ORB":
        det = cv2.ORB_create(config.max_features or 10000)
        kps, des = det.detectAndCompute(scaled, None)
        kp = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
        kp_meta = np.array([(k.size, k.angle, k.response, k.octave)
                            for k in kps], np.float32).reshape(-1, 4)
        if des is not None:
            # unpack the 256-bit binary descriptor to 0/1 floats: squared-L2
            # on bit vectors equals Hamming distance, so the reference's LSH
            # Hamming matching (matcher.py:63-71) maps onto the same MXU
            # k-NN kernel the SIFT path uses
            des = np.unpackbits(des, axis=1).astype(np.float32)
    else:
        raise ValueError(f"unknown detector {config.detector}")

    if des is None:
        des = np.zeros((0, 128), np.float32)
        kp = np.zeros((0, 2), np.float32)
        kp_meta = np.zeros((0, 4), np.float32)
    return kp, kp_meta, np.ascontiguousarray(des, dtype=np.float32)


def _auto_device_batch(shape):
    """Images per TPU detect dispatch when DetectorConfig.device_batch=0.

    B>1 amortizes the per-dispatch download RTT (and host/device pipeline
    boundaries) over the batch: measured on hardware at mission scale
    (870x576): 260 -> 96 ms/img from B=1 to B=8. At full mission
    resolution (2176x1440) the SYNCHRONOUS probe favored B=4 (298/238/209
    ms/img for B=1/2/4, scripts_dev/crash_bisect.py), but the production
    pipelined path (loader-thread uploads + double-buffered dispatch,
    detect_project_features) measures B=2 best: 128/118/157 ms/img for
    B=1/2/4 (scripts_dev/detect_batch_ab.py on real mission frames) —
    large batches coarsen the double-buffer granularity and burst the
    tunnel uploads. Policy: frames <= 0.56 MP batch to B*area <= ~13 MP
    (B <= 8); larger frames B=2. Wedge history: r2/r3 saw TPU-worker
    wedges at B>1 on 0.78-3 MP frames; an r4 subprocess bisect could not
    reproduce them at any shape, but both r4 mission runs at B=4 hit
    multi-minute worker stalls (1116 s of the r4run2 detect wall was 4
    stalls — timestamp analysis in ROUND4_NOTES.md). If a mission wedges
    at B=2, set device_batch=1 (the r3-proven region). Set device_batch
    explicitly to override either way."""
    area = int(shape[0]) * int(shape[1])
    if area > 560_000:
        return 2 if 2 * area <= 13_000_000 else 1
    b = max(min(8, 13_000_000 // max(area, 1)), 1)
    return 1 << (b.bit_length() - 1)


# per-image loop-tick wall times of the most recent detect_project_features
# run — the stall watchdog for long benches: a wedged TPU worker shows up
# as a multi-minute tick, and benchmarks/mission_bench.py separates those
# from the steady-state detect wall instead of letting one wedge
# contaminate the headline number (r4run2 lost 1116 s to 4 stalls).
LAST_DETECT_TICK_S: list = []
STALL_TICK_S = 30.0            # a tick this long is logged as a stall


def detect_project_features(proj, config: DetectorConfig, use_cache=True,
                            progress=True, prefetch=4):
    """Detect (or load cached) features for every image in the project.

    Host IO (jpg decode + CLAHE + gzip cache writes) runs in worker
    threads, pipelined with the device detect calls on the main thread —
    cv2/gzip release the GIL, so per-image wall-clock is
    max(host, device) instead of their sum."""
    import concurrent.futures as cf
    import time as _time

    from ..io.logger import log, qlog

    # multi-host: each process detects its own image slice (caches are
    # per-image files on the shared FS), then everyone syncs so later
    # stages can lazily load any image's features. The shard MUST come from
    # the deterministic full image list, not the uncached-todo list — ranks
    # scan the cache at different moments and would shard inconsistently.
    n_proc = 1
    try:
        import jax
        n_proc = jax.process_count()
    except Exception:  # jax absent/uninitialized: single-process CV path
        pass
    mine = proj.image_list
    if n_proc > 1:
        from ..parallel import multihost
        mine = multihost.process_shard(proj.image_list)
        log(f"multi-host: rank {jax.process_index()} detecting "
            f"{len(mine)}/{len(proj.image_list)} images")

    todo = []
    for image in mine:
        if use_cache and image.load_features() and image.load_descriptors():
            continue
        todo.append(image)
    if not todo:
        if n_proc > 1:
            from ..parallel import multihost
            multihost.barrier("detect")
        return

    cam_w = int(proj.camera.get("width_px", 0))
    cam_h = int(proj.camera.get("height_px", 0))

    # the TPU backend equalizes ON DEVICE inside the detect dispatch
    # (ops/clahe.py, cv2-parity ±1 gray level): host cv2 CLAHE at mission
    # resolution is ~80 ms/img of single-core CPU, which does not hide
    # behind the device pipeline on a 1-core host
    device_clahe = config.equalize and config.backend == "tpu"

    def load(image):
        scaled, full_size = load_scaled_gray(
            proj.image_path(image), config.scale,
            equalize=config.equalize and not device_clahe)
        return image, scaled, full_size

    # transport codec trades loader-thread CPU for wire bytes — a win on
    # tunneled/remote device topologies (where the upload is the detect
    # floor), a pure pessimization on local devices. Auto: on iff the
    # backend is a real TPU; IMGTPU_DETECT_COMPRESS=1/0 forces.
    import os as _os
    _codec_env = _os.environ.get("IMGTPU_DETECT_COMPRESS", "")
    if _codec_env in ("0", "1"):
        use_codec = _codec_env == "1"
    else:
        try:
            import jax as _jax
            use_codec = (config.backend == "tpu"
                         and _jax.default_backend() == "tpu")
        except Exception:
            use_codec = False

    def load_batch(images, pad_to):
        """Decode a whole device batch and upload it as ONE transfer set
        from the loader thread. One upload + one dispatch per batch
        instead of B device_puts + an eager device-side stack: on the
        ~37 MB/s tunnel the upload is the detect steady-state floor, and
        every extra per-batch call is another ~28 ms RTT queue entry.

        When the transport codec applies (features/transport.py — smooth
        imagery packs to ~0.55 B/px; noisy frames fall back to raw), the
        batch ships as (nib, idx, val) planes instead of raw pixels."""
        import jax
        loaded = [load(im) for im in images]
        arrs = [s for (_, s, _) in loaded]
        if len(arrs) < pad_to:        # short tail: repeat so every
            arrs += [arrs[-1]] * (pad_to - len(arrs))  # dispatch shares one
        imgs_b = [im for (im, _, _) in loaded]
        sizes = [fs for (_, _, fs) in loaded]
        if use_codec:
            from .transport import pack_gray
            packs = [pack_gray(a) for a in arrs]
            if all(p is not None for p in packs):
                nib = jax.device_put(np.stack([p[0] for p in packs]))
                idx = jax.device_put(np.stack([p[1] for p in packs]))
                val = jax.device_put(np.stack([p[2] for p in packs]))
                return (imgs_b, ("codec", (nib, idx, val), arrs[0].shape),
                        sizes)
        dev = jax.device_put(np.stack(arrs))           # compiled shape
        return imgs_b, ("raw", dev, arrs[0].shape), sizes

    def store(image, kp, kp_meta, des):
        image.kp, image.kp_meta, image.des = kp, kp_meta, des
        image.save_features()
        image.save_descriptors()
        image.save_meta()

    use_async = config.backend == "tpu"
    if use_async:
        from . import sift_tpu

    bar = None
    if progress:
        try:
            from tqdm import tqdm
            bar = tqdm(total=len(todo), desc="detect")
        except ImportError:
            pass

    LAST_DETECT_TICK_S.clear()
    t_prev = _time.perf_counter()

    def tick(names, n):
        nonlocal t_prev
        now = _time.perf_counter()
        dt = now - t_prev
        t_prev = now
        LAST_DETECT_TICK_S.append(dt)
        if dt > STALL_TICK_S:
            log(f"detect: STALL {dt:.1f}s on tick for {names} "
                f"(TPU-worker wedge?) — recorded for the bench watchdog")
        if bar is not None:
            bar.update(n)

    def check_size(image, w, h):
        image.set_size(w, h)
        if cam_w and (w != cam_w or h != cam_h):
            raise RuntimeError(
                f"image dimensions {w}x{h} do not match camera config "
                f"{cam_w}x{cam_h} — fix the camera config vs image size "
                f"issue (reference image.py:300-306)")

    from collections import deque
    with cf.ThreadPoolExecutor(max_workers=prefetch) as loaders, \
            cf.ThreadPoolExecutor(max_workers=2) as writers:
        pending = []

        def finalize(item):
            imgs_b, packed, scale = item
            for image, (kp, kp_meta, des) in zip(
                    imgs_b, sift_tpu.detect_finalize_batch(packed)):
                pending.append(writers.submit(
                    store, image, kp / scale, kp_meta, des))

        if use_async:
            # batch shape policy needs the scaled frame size; decode the
            # first image once for it (header-size predictions mispredict
            # cv2's resize rounding)
            _, _first_scaled, _ = load(todo[0])
            dbatch = config.device_batch or \
                _auto_device_batch(_first_scaled.shape)
            del _first_scaled
            batches = [todo[i:i + dbatch]
                       for i in range(0, len(todo), dbatch)]
            # inflight depth 2: finalize batch N-2 (download + host store)
            # while batch N computes and batch N+1's upload streams — the
            # ~37 MB/s tunnel upload is the steady-state floor, so it must
            # overlap compute, not serialize with it
            depth = int(_os.environ.get("IMGTPU_DETECT_DEPTH", "2"))
            nload = max(2, (prefetch * 2 + dbatch - 1) // dbatch)
            window = deque()
            src = iter(batches)
            for b in batches[:nload]:
                window.append(loaders.submit(load_batch, b, dbatch))
                next(src)
            inflight = deque()
            for _ in range(len(batches)):
                fut = window.popleft()
                for b in src:
                    window.append(loaders.submit(load_batch, b, dbatch))
                    break
                imgs_b, payload, sizes = fut.result()
                for image, (w, h) in zip(imgs_b, sizes):
                    qlog("Detecting features/descriptors for:", image.name)
                    check_size(image, w, h)
                kind, data, shape = payload
                if kind == "codec":
                    packed = sift_tpu.detect_dispatch_codec(
                        *data, shape, config.max_features or 4096,
                        equalize=device_clahe)
                else:
                    packed = sift_tpu.detect_dispatch(
                        data, config.max_features or 4096,
                        equalize=device_clahe)
                inflight.append((imgs_b, packed, config.scale))
                if len(inflight) > depth:
                    finalize(inflight.popleft())
                tick([im.name for im in imgs_b], len(imgs_b))
            while inflight:
                finalize(inflight.popleft())
        else:
            window = deque()
            src = iter(todo)
            for im in todo[:prefetch * 2]:
                window.append(loaders.submit(load, im))
                next(src)
            for _ in range(len(todo)):
                fut = window.popleft()
                for im in src:
                    window.append(loaders.submit(load, im))
                    break
                image, scaled, (w, h) = fut.result()
                qlog("Detecting features/descriptors for:", image.name)
                check_size(image, w, h)
                kp, kp_meta, des = detect_scaled(scaled, config)
                pending.append(writers.submit(
                    store, image, kp / config.scale, kp_meta, des))
                tick(image.name, 1)
        for p in pending:
            p.result()
        tail = _time.perf_counter() - t_prev
        if LAST_DETECT_TICK_S:
            LAST_DETECT_TICK_S[-1] += tail   # drain time of the last batch
    if bar is not None:
        bar.close()
    if n_proc > 1:
        from ..parallel import multihost
        multihost.barrier("detect")
