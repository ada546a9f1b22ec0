"""Diagnose matcher throughput: forced-sync timings across configs."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.match.matcher import match_pair_batch
from imageanalysis_tpu.ops import knn

N_FEAT, N_PAD, DIM, PLANTED = 6000, 6144, 128, 1500
rng = np.random.default_rng(0)


def make(batch):
    da = rng.uniform(0, 360, (batch, N_PAD, DIM)).astype(np.float32)
    db = rng.uniform(0, 360, (batch, N_PAD, DIM)).astype(np.float32)
    da[:, N_FEAT:] = knn.PAD_VALUE
    db[:, N_FEAT:] = knn.PAD_VALUE
    db[:, :PLANTED] = da[:, :PLANTED] + rng.normal(0, 4, (batch, PLANTED, DIM))
    ua = rng.uniform(0, 4000, (batch, N_PAD, 2)).astype(np.float32)
    ub = (ua * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
          + rng.normal(0, 0.5, ua.shape)).astype(np.float32)
    return [jnp.asarray(x) for x in (da, db, ua, ub)]


K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500], [0, 0, 1]],
                         np.float32))
print("backend:", jax.default_backend(), flush=True)

for batch, pallas, n_hyp, transform in [
        (16, True, 512, "homography"),
        (16, False, 512, "homography"),
        (16, True, 512, "none"),
        (64, True, 512, "homography"),
        (16, True, 128, "homography"),
]:
    da, db, ua, ub = make(batch)
    na = jnp.full(batch, N_FEAT, jnp.int32)
    nb = jnp.full(batch, N_FEAT, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    kw = dict(ratio=0.75, thresh=7.9, transform=transform, n_hyp=n_hyp,
              use_pallas=pallas, bf16=True)
    out = match_pair_batch(da, db, ua, ub, na, nb, keys, K, **kw)
    _ = float(jnp.sum(out[1]))     # compile + forced warm
    steps = 8
    t0 = time.perf_counter()
    outs = []
    for s in range(steps):
        keys = jax.random.split(jax.random.PRNGKey(s + 1), batch)
        outs.append(match_pair_batch(da, db, ua, ub, na, nb, keys, K, **kw))
    _ = float(sum(jnp.sum(o[1]) for o in outs))
    dt = time.perf_counter() - t0
    print(f"batch={batch:3d} pallas={int(pallas)} n_hyp={n_hyp:3d} "
          f"tf={transform:10s}: {batch*steps/dt:9.1f} pairs/s "
          f"({dt/steps*1000:7.1f} ms/step)", flush=True)

# knn alone
da, db, ua, ub = make(16)
na = jnp.full(16, N_FEAT, jnp.int32)
nb = jnp.full(16, N_FEAT, jnp.int32)
@jax.jit
def knn_only(da, db, na, nb):
    def one(a, b, n1, n2):
        bj, ok = knn.match_pair_dense(a, b, n1, n2, ratio=0.75,
                                      use_pallas=True, bf16=True)
        return jnp.sum(ok)
    return jnp.sum(jax.vmap(one)(da, db, na, nb))
_ = float(knn_only(da, db, na, nb))
t0 = time.perf_counter()
for _ in range(8):
    _ = float(knn_only(da, db, na, nb))
dt = (time.perf_counter() - t0) / 8
print(f"knn_only pallas batch=16: {16/dt:9.1f} pairs/s ({dt*1000:.1f} ms/step)",
      flush=True)
