"""imageanalysis_tpu — TPU-native aerial survey structure-from-motion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
NorthStarUAS/ImageAnalysis (reference mounted at /root/reference): geotagged
drone photos in, explorable orthomosaic + 3D surface out.

Design (see SURVEY.md for the reference's structure):

- ``core``     — pure-jnp geometry: rotations/quaternions, WGS-84 geodesy,
                 Brown–Conrady camera model, similarity/affine transforms.
- ``ops``      — TPU compute kernels: exact k-NN descriptor matching on the
                 MXU, vmapped hypothesis-batch RANSAC, two-view / N-ray
                 triangulation, GMS grid voting, SIFT-style feature detection.
- ``match``    — pair work-list policy, batched pair-matching strategies,
                 host-side chain linking (union-find) and image grouping.
- ``ba``       — matrix-free Schur-complement Levenberg–Marquardt bundle
                 adjustment, shardable over a device mesh.
- ``surface``  — SRTM DEM grids, ray–terrain intersection, Delaunay surfaces.
- ``io``       — the reference-compatible on-disk project workspace
                 (config.json / meta / cache / matches_grouped / groups.json).
- ``render``   — surface.bin / .egg / textures / AC3D / GeoTIFF emitters.
- ``parallel`` — device-mesh helpers; sharded matching and BA.
- ``apps``     — the ``process`` pipeline CLI and stage tools.

Unlike the reference (single-threaded CPU OpenCV/scipy, SURVEY.md §2f), every
hot loop here is batched, statically shaped, and jit-compiled; multi-chip
scaling is NamedSharding/shard_map over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU f32 matmuls default to bf16 inputs (~1e-2 relative error) — fatal for
# geometry (rotation chains, DLT/SVD solves, BA normal equations). Default the
# whole framework to true-f32 matmuls; the descriptor-matching hot path opts
# back into bf16 explicitly where it is safe (ops/knn.py). Opt out with
# IMAGEANALYSIS_TPU_NO_PRECISION_OVERRIDE=1.
if not _os.environ.get("IMAGEANALYSIS_TPU_NO_PRECISION_OVERRIDE"):
    _jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: XLA compiles take 30-180 s on tunneled TPU
# runtimes; caching executables across processes makes every pipeline
# invocation after the first start instantly. Opt out / relocate with
# IMAGEANALYSIS_TPU_COMPILE_CACHE=0 or =/path.
_cache = _os.environ.get("IMAGEANALYSIS_TPU_COMPILE_CACHE", "")
if _cache != "0":
    try:
        _dir = _cache or _os.path.expanduser(
            "~/.cache/imageanalysis_tpu/jaxcache")
        _os.makedirs(_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _dir)
        # threshold 0: cache EVERY executable. On remote/tunneled runtimes
        # even a scalar `add` compile costs ~0.45 s of server round trip,
        # and a pipeline run touches ~150 distinct tiny eager-op shapes —
        # ~70 s of a warm 20-image mission wall was exactly these
        # (LATENCY_20IMG.json decomposition). Measured: a process rerun
        # drops 4.6 -> 0.9 s on a 3-op eager script once they cache.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # older jax without the knob — run uncached
        pass
