"""f32 vs bf16 one-hot minimal-set gather (variant C of
ransac_gather_solve_probe): bf16 truncates coordinates fed to the 4-pt
solve; f32 with the package's HIGHEST default precision is bit-exact.
Measures the same sample+gather+solve+score chain."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.ops import ransac

N_PAD = 6144
BATCH = 64
STEPS = 32
NH = 512
SP = 512

rng = np.random.default_rng(0)
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
jua, jub = jnp.asarray(uv_a), jnp.asarray(uv_b)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
ok0 = jnp.asarray(rng.random((BATCH, N_PAD)) < 0.2)


def timeit(name, fn, *args):
    acc = fn(*args, 0)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    for s in range(4):
        acc = acc + fn(*args, s)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for s in range(STEPS):
        acc = acc + fn(*args, s)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch")


def make(dt):
    @jax.jit
    def run(ua, ub, ks, v0, salt):
        def one(pa, pb, k, valid):
            pa_n, Ta = ransac._normalize_2d(pa, valid)
            pb_n, Tb = ransac._normalize_2d(pb, valid)
            ranks = ransac._valid_cumsum(valid)
            sub, sub_ok = ransac._score_subset(valid, ranks, SP)
            hi = jnp.maximum(jnp.minimum(ranks[-1], SP), 1)
            pick = jax.random.randint(k, (NH, 4), 0, hi)
            pa_s, pb_s = pa_n[sub], pb_n[sub]
            pf = pick.reshape(-1)
            oh = (pf[:, None] == jnp.arange(SP)[None, :]).astype(dt)
            ga = (oh @ pa_s.astype(dt)).astype(pa_n.dtype)
            gb = (oh @ pb_s.astype(dt)).astype(pa_n.dtype)
            gx, gy = ga[:, 0], ga[:, 1]
            hx, hy = gb[:, 0], gb[:, 1]
            Hs = ransac._homography_4pt_scalar(
                [gx[i::4] for i in range(4)], [gy[i::4] for i in range(4)],
                [hx[i::4] for i in range(4)], [hy[i::4] for i in range(4)])
            errs = jax.vmap(
                lambda H: ransac._homography_error(H, pa_s, pb_s))(Hs)
            t_norm = 7.9 * Tb[0, 0]
            scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
            return jnp.sum(Hs[jnp.argmax(scores)])

        out = jax.vmap(one)(ua, ub, ks, v0)
        return jnp.sum(out) * 0 + salt
    return run


timeit("one-hot bf16", make(jnp.bfloat16), jua, jub, keys, ok0)
timeit("one-hot f32 ", make(jnp.float32), jua, jub, keys, ok0)
