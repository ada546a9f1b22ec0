"""Resident device descriptor store for mission-scale matching.

The reference fights memory with an LRU descriptor cache sized 20+5·√n
images (matcher.py:1012-1026) because CPU RAM holds f32 descriptors. On TPU
the whole mission fits in HBM natively: SIFT descriptors are integral
0..255, so they live as ONE uint8 array [n_images, npad, 128] (2812 images ×
8192 × 128 = 2.9 GB) alongside the undistorted keypoint uv [n_images, npad,
2] f32. Pair batches are then a device-side gather — no host↔device
descriptor traffic per pair, which is what the per-pair host assembly path
pays (B × npad × 128 f32 uploads per batch).
"""

from __future__ import annotations

import functools

import numpy as np

from ..io.logger import log


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


class DescriptorStore:
    def __init__(self, proj, images=None, npad=None, dtype="int8"):
        """dtype 'int8' stores descriptors as value−128 (SIFT is natively
        uint8; L2 distances are shift-invariant) so pair matching runs on
        the int8 MXU with exact integer distances — 2× the bf16 matmul
        rate. 'uint8' (bf16 matmul) and 'float32' remain for comparison."""
        import jax
        import jax.numpy as jnp

        images = images if images is not None else proj.image_list
        counts = []
        for im in images:
            if im.kp is None:
                im.load_features()
            counts.append(len(im.kp) if im.kp is not None else 0)
        if npad is None:
            npad = _round_up(max(max(counts, default=1), 256), 256)
        self.npad = npad
        self.names = [im.name for im in images]
        self.index = {im.name: i for i, im in enumerate(images)}
        n_img = len(images)

        d = 128
        for im in images:
            im.load_descriptors()
            if im.des is not None and im.des.shape[0]:
                d = im.des.shape[1]
                break

        # one batched device call for every image's kp undistortion —
        # per-image calls cost a dispatch round trip each
        proj.undistort_all_keypoints(images)

        np_dtype = {"int8": np.int8, "uint8": np.uint8}.get(dtype, np.float32)
        pad_val = {"int8": 127, "uint8": 255}.get(dtype, 10000.0)
        uv = np.zeros((n_img, npad, 2), np.float32)
        n = np.zeros(n_img, np.int32)
        # chunked ASYNC uploads: device_put dispatches the transfer and
        # returns, so loading chunk i+1's descriptor pickles from disk
        # overlaps chunk i's host→device copy — at mission scale the store
        # upload (GBs over a ~40 MB/s tunnel) otherwise serializes after
        # the full disk scan. Chunks are staged into ONE preallocated
        # device buffer via a donated dynamic_update_slice (in-place on
        # TPU), so peak device memory stays ~1× the store size plus one
        # chunk — a concat of all chunks would transiently hold ~2×.
        chunk = 256
        store = jnp.full((n_img, npad, d), pad_val, dtype=np_dtype)

        @functools.partial(jax.jit, donate_argnums=0)
        def _stage(buf, c, s):
            return jax.lax.dynamic_update_slice(buf, c, (s, 0, 0))

        for s in range(0, n_img, chunk):
            e = min(s + chunk, n_img)
            desc_c = np.full((e - s, npad, d), pad_val, np_dtype)
            for i in range(s, e):
                im = images[i]
                im.load_descriptors()
                if im.uv_list is None:
                    proj.undistort_image_keypoints(im)
                k = min(counts[i], npad)
                if k:
                    dsc = im.des[:k]
                    if dtype == "int8":
                        dsc = (np.clip(np.round(dsc), 0, 255)
                               .astype(np.int16) - 128).astype(np.int8)
                    elif dtype == "uint8":
                        dsc = np.clip(np.round(dsc), 0, 255).astype(np.uint8)
                    desc_c[i - s, :k] = dsc
                    uv[i, :k] = im.uv_list[:k]
                n[i] = k
                im.unload_descriptors()  # host copy no longer needed
            # chunk index arrives as a device scalar so every chunk size
            # shares one compiled _stage (the tail chunk recompiles once)
            store = _stage(store, jax.device_put(desc_c),
                           jnp.int32(s))

        self.dtype = dtype
        self.desc = store
        self.uv = jnp.asarray(uv)
        self.counts = jnp.asarray(n)
        gb = n_img * npad * d * np.dtype(np_dtype).itemsize / 1e9
        log(f"descriptor store: {n_img} images × {npad} × {d} {dtype} "
            f"({gb:.2f} GB on device)")

    def gather(self, idx):
        """idx: (B,) int array of image indices → (desc (B, npad, d)
        int8/bf16/f32, uv (B, npad, 2), counts (B,)) — all device-side.
        int8 descriptors pass through unchanged (the matcher's int8-MXU
        kernel consumes them directly)."""
        import jax.numpy as jnp

        idx = jnp.asarray(idx, dtype=jnp.int32)
        d = jnp.take(self.desc, idx, axis=0)
        if self.dtype == "uint8":
            d = d.astype(jnp.bfloat16)
        return d, jnp.take(self.uv, idx, axis=0), jnp.take(self.counts, idx)

    @staticmethod
    def fits(n_images, npad, d=128, budget_bytes=6_000_000_000):
        return n_images * npad * d <= budget_bytes
