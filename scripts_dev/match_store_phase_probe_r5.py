"""Decompose the mission match-store loop wall at mission shape
(VERDICT r4 next #4: device rate 3141 pairs/s vs mission core 1152).

Synthetic standalone (no project dir): builds an int8 DescriptorStore at
mission shape (n_img images x npad 4096 x 128), then times, for C chunks
of B=256 pairs:

  A. dispatch-only loop (gather + 2-NN + RANSAC enqueued back-to-back,
     one chained force at the end)  -> the device ceiling
  B. the production double-buffered loop (download + unpack chunk i-1
     while chunk i computes)        -> the real wall
  C. serialized loop (download + unpack after every dispatch)
  D. one chunk's phases separately: gather, dispatch, download, unpack

Timing uses the chained-scalar protocol (block_until_ready returns early
on this tunneled runtime).

Usage: python scripts_dev/match_store_phase_probe_r5.py [--chunks 8]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import imageanalysis_tpu  # noqa: F401, E402
from imageanalysis_tpu.match.matcher import (  # noqa: E402
    match_pair_batch_packed, _store_unpack)


class _FakeImage:
    __slots__ = ("name", "match_list", "matches_clean", "kp", "uv_list")

    def __init__(self, i):
        self.name = f"img{i:04d}.jpg"
        self.match_list = {}
        self.matches_clean = True
        self.kp = None
        self.uv_list = None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-img", type=int, default=64)
    ap.add_argument("--npad", type=int, default=4096)
    ap.add_argument("--n-feat", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    B, npad, d = args.batch, args.npad, 128
    print(f"backend={jax.default_backend()} B={B} npad={npad}", flush=True)

    # mission-like store: int8 (value - 128), overlapping pairs planted
    desc = rng.integers(0, 100, (args.n_img, npad, d))
    for i in range(args.n_img - 1):
        n_common = 1500
        noise = rng.normal(0, 4, (n_common, d))
        desc[i + 1, :n_common] = np.clip(
            np.round(desc[i, :n_common] + noise), 0, 255)
    desc[:, args.n_feat:] = 255
    di8 = jnp.asarray((desc.astype(np.int16) - 128).astype(np.int8))
    uv = jnp.asarray(rng.uniform(0, 4000,
                                 (args.n_img, npad, 2)).astype(np.float32))
    counts = jnp.full((args.n_img,), args.n_feat, dtype=jnp.int32)
    K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                              [0, 0, 1]], np.float32))

    def gather(idx):
        idx = jnp.asarray(idx, jnp.int32)
        return (jnp.take(di8, idx, axis=0), jnp.take(uv, idx, axis=0),
                jnp.take(counts, idx))

    pairs_per_chunk = [
        [((c * 31 + k) % (args.n_img - 1), ((c * 31 + k) % (args.n_img - 1)) + 1)
         for k in range(B)] for c in range(args.chunks)]
    kwargs = dict(ratio=0.75, thresh=7.9, transform="homography",
                  n_hyp=512, use_pallas=jax.default_backend() == "tpu",
                  bf16=True)

    def dispatch(chunk, key):
        idx = np.asarray(chunk, np.int32)
        da, ua, na = gather(idx[:, 0])
        db, ub, nb = gather(idx[:, 1])
        keys = jax.random.split(key, B)
        return match_pair_batch_packed(da, db, ua, ub, na, nb, keys, K,
                                       **kwargs)

    def force(x):
        return float(jnp.sum(jnp.maximum(x, 0)))

    # warm / compile
    out = dispatch(pairs_per_chunk[0], jax.random.PRNGKey(0))
    force(out)

    # A: device ceiling — dispatch all chunks, one chained force
    t0 = time.perf_counter()
    outs = [dispatch(c, jax.random.PRNGKey(i + 1))
            for i, c in enumerate(pairs_per_chunk)]
    s = force(sum(jnp.sum(jnp.maximum(o, 0)) for o in outs))
    t_a = time.perf_counter() - t0
    del s

    images = [_FakeImage(i) for i in range(args.n_img)]

    # B: production double-buffered loop
    for im in images:
        im.match_list = {}
    t0 = time.perf_counter()
    pending = None
    n_m = 0
    for i, c in enumerate(pairs_per_chunk):
        dev = dispatch(c, jax.random.PRNGKey(100 + i))
        if pending is not None:
            pc, pd = pending
            n_m += _store_unpack(images, pc, np.asarray(pd), 25)
        pending = (c, dev)
    pc, pd = pending
    n_m += _store_unpack(images, pc, np.asarray(pd), 25)
    t_b = time.perf_counter() - t0

    # C: serialized loop
    for im in images:
        im.match_list = {}
    t0 = time.perf_counter()
    for i, c in enumerate(pairs_per_chunk):
        dev = dispatch(c, jax.random.PRNGKey(200 + i))
        _store_unpack(images, c, np.asarray(dev), 25)
    t_c = time.perf_counter() - t0

    # D: one chunk's phases
    c = pairs_per_chunk[0]
    idx = np.asarray(c, np.int32)
    t0 = time.perf_counter()
    da, ua, na = gather(idx[:, 0])
    db, ub, nb = gather(idx[:, 1])
    force(jnp.sum(da.astype(jnp.int32)) + jnp.sum(db.astype(jnp.int32)))
    t_gather = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = dispatch(c, jax.random.PRNGKey(300))
    force(dev)
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    host = np.asarray(dev)
    t_down = time.perf_counter() - t0
    t0 = time.perf_counter()
    _store_unpack(images, c, host, 25)
    t_unpack = time.perf_counter() - t0

    # E: the r5 fused single-dispatch path (gathers + match in one jit,
    # optional lax.scan sub-batching), double-buffered like production
    from imageanalysis_tpu.match.matcher import match_pair_batch_store_scan

    fused_kwargs = dict(ratio=0.75, thresh=7.9, transform="homography",
                        n_hyp=512, use_pallas=kwargs["use_pallas"],
                        bf16=True, uint8_cast=False, gate_radius=0.0,
                        gated=False)
    t_e = {}
    for S in (1, 4):
        grp_sz = S * B
        flat_pairs = [p for c in pairs_per_chunk for p in c]
        groups_l = [flat_pairs[i:i + grp_sz]
                    for i in range(0, len(flat_pairs), grp_sz)]

        def fused_dispatch(chunk, key, S=S):
            idx = np.zeros((grp_sz, 2), np.int32)
            idx[: len(chunk)] = chunk
            keys = jax.random.split(key, grp_sz).reshape(S, B, 2)
            return match_pair_batch_store_scan(
                di8, uv, counts, jnp.asarray(idx[:, 0].reshape(S, B)),
                jnp.asarray(idx[:, 1].reshape(S, B)), keys, K,
                **fused_kwargs)

        force(fused_dispatch(groups_l[0], jax.random.PRNGKey(9)))  # compile
        for im in images:
            im.match_list = {}
        t0 = time.perf_counter()
        pending = None
        n_m2 = 0
        for gi, grp in enumerate(groups_l):
            dev = fused_dispatch(grp, jax.random.PRNGKey(400 + gi))
            if pending is not None:
                pc, pd = pending
                n_m2 += _store_unpack(images, pc,
                                      np.asarray(pd).reshape(-1, npad), 25)
            pending = (grp, dev)
        pc, pd = pending
        n_m2 += _store_unpack(images, pc,
                              np.asarray(pd).reshape(-1, npad), 25)
        t_e[S] = time.perf_counter() - t0

    n_pairs = args.chunks * B
    for S, te in t_e.items():
        print(f"E fused scan S={S}: {te:.2f}s = {n_pairs / te:.0f} pairs/s",
              flush=True)
    print(f"A dispatch-only: {t_a:.2f}s = {n_pairs / t_a:.0f} pairs/s",
          flush=True)
    print(f"B double-buffered: {t_b:.2f}s = {n_pairs / t_b:.0f} pairs/s "
          f"({n_m} matches)", flush=True)
    print(f"C serialized: {t_c:.2f}s = {n_pairs / t_c:.0f} pairs/s",
          flush=True)
    print(f"D per-chunk: gather+force {t_gather * 1e3:.0f} ms, "
          f"dispatch+force {t_disp * 1e3:.0f} ms, "
          f"download {t_down * 1e3:.0f} ms "
          f"({host.nbytes / 1e6:.1f} MB), unpack {t_unpack * 1e3:.0f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
