"""On-chip parity probe: fused two-launch match path vs unfused decode.

Runs ONE bench-shaped pair (n=6144, d=128, int8 store convention) through
knn_match_fused and through the unfused match_pair_dense path on the real
TPU, then diffs best_j / ok / pb and attributes divergence to ratio vs
mutual vs decode.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn

N, D = 6144, 128
rng = np.random.default_rng(0)
da = rng.integers(0, 100, (N, D)).astype(np.float32)
db = rng.integers(0, 100, (N, D)).astype(np.float32)
noise = rng.normal(0, 4, (1500, D))
db[:1500] = np.clip(np.round(da[:1500] + noise), 0, 255)
da[6000:] = 255.0
db[6000:] = 255.0
uv_b = rng.uniform(0, 4000, (N, 2)).astype(np.float32)

# int8 store convention: value - 128
da8 = jnp.asarray((da - 128).astype(np.int8))
db8 = jnp.asarray((db - 128).astype(np.int8))
uvb = jnp.asarray(uv_b)

print("backend:", jax.default_backend())

bj_f, ok_f, pb_f = knn.knn_match_fused(da8, db8, uvb, ratio=0.75)
bj_f, ok_f, pb_f = map(np.asarray, (bj_f, ok_f, pb_f))

# unfused ground truth pieces
row_d, row_i, col_d, col_i = map(np.asarray, knn.knn_top2(da8, db8))
d1 = np.maximum(row_d[:, 0], 0.0)
d2 = np.maximum(row_d[:, 1], 0.0)
ratio_ok = d1 < 0.75 ** 2 * d2
bj_u = row_i[:, 0]
mutual_ok = col_i[np.clip(bj_u, 0, N - 1)] == np.arange(N)
ok_u = ratio_ok & mutual_ok
pb_u = uv_b[np.clip(bj_u, 0, N - 1)]

print("n ok fused:", ok_f.sum(), " unfused:", ok_u.sum())
print("bj mismatch:", (bj_f != bj_u).sum())
dj = bj_f != bj_u
if dj.any():
    idx = np.where(dj)[0][:5]
    print("  rows:", idx, "fused j:", bj_f[idx], "unfused j:", bj_u[idx])
dok = ok_f != ok_u
print("ok mismatch:", dok.sum())
if dok.any():
    idx = np.where(dok)[0]
    same_j = (bj_f[idx] == bj_u[idx])
    print("  of which same best_j:", same_j.sum())
    # attribute: ratio or mutual on the fused side
    i0 = idx[:10]
    print("  sample rows:", i0)
    print("   ratio_ok(unfused):", ratio_ok[i0])
    print("   mutual_ok(unfused):", mutual_ok[i0])
    print("   ok fused:", ok_f[i0], " d1:", d1[i0], " d2:", d2[i0])
    print("   col_i[bj]:", col_i[np.clip(bj_u[i0], 0, N - 1)])
ok_both = ok_f & ok_u
dpb = np.abs(pb_f[ok_both] - pb_u[ok_both]).max() if ok_both.any() else 0.0
print("pb maxdiff on common ok:", dpb)
