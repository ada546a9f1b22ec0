"""Bisect the scoped-VMEM OOM of _knn_kernel_fused on the real chip.

Variants compile knn_match_fused at bench shapes (n=6144, d=128, int8)
with pieces disabled via env knobs patched into the kernel source-level
flags below. Each compile is AOT (no run) — cheap and wedge-free.
"""
import os, sys, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from imageanalysis_tpu.ops import knn

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
n, d = 6144, 128
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-128, 128, (n, d)).astype(np.int8))
b = jnp.asarray(rng.integers(-128, 128, (n, d)).astype(np.int8))
uv = jnp.asarray(rng.uniform(0, 4000, (n, 2)).astype(np.float32))

_IDX_MASK = knn._IDX_MASK
_KEY_MAX = knn._KEY_MAX

def make(tile_a, tile_e, do_main, do_epi, do_pb):
    n_ia = n // tile_a
    def kern(a_ref, b_ref, na2_ref, nb2_ref, uvbt_ref, bj_ref, ok_ref,
             pbout_ref, rows_ref, colk_ref):
        ia = pl.program_id(0)
        @pl.when(ia < n_ia)
        def _main():
            if not do_main:
                return
            dn = (((1,), (1,)), ((), ()))
            ab = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                                     preferred_element_type=jnp.int32,
                                     precision=jax.lax.Precision.DEFAULT)
            na2 = na2_ref[:][:, 0]; nb2 = nb2_ref[:][:, 0]
            d2 = (na2[:, None] + nb2[None, :] - 2 * ab).astype(jnp.float32)
            bits = jax.lax.bitcast_convert_type(d2, jnp.int32) & jnp.int32(~_IDX_MASK)
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile_a, n), 1)
            rowkey = bits | cols
            m1 = jnp.min(rowkey, axis=1)
            oneh = rowkey == m1[:, None]
            m2 = jnp.min(jnp.where(oneh, jnp.int32(_KEY_MAX), rowkey), axis=1)
            rows_ref[pl.ds(ia * tile_a, tile_a), :] = jnp.concatenate(
                [m1[:, None], m2[:, None]], axis=1)
            if do_pb:
                pu = jnp.sum(jnp.where(oneh, uvbt_ref[0:1, :], 0.0), axis=1)
                pv = jnp.sum(jnp.where(oneh, uvbt_ref[1:2, :], 0.0), axis=1)
                pbout_ref[pl.ds(ia * tile_a, tile_a), :] = jnp.concatenate(
                    [pu[:, None], pv[:, None]], axis=1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_a, n), 0) + ia * tile_a
            colkey = jnp.min(bits | rows, axis=0)[None, :]
            @pl.when(ia == 0)
            def _(): colk_ref[:] = colkey
            @pl.when(ia > 0)
            def _(): colk_ref[:] = jnp.minimum(colk_ref[:], colkey)
        @pl.when(ia == n_ia)
        def _epi():
            if not do_epi:
                bj_ref[pl.ds(0, tile_a), :] = jnp.zeros((tile_a,1), jnp.int32)
                return
            vmask = jnp.int32(~_IDX_MASK)
            def body(c, _):
                sl = pl.ds(c * tile_e, tile_e)
                rk = rows_ref[sl, :]
                k1 = rk[:, 0]; k2 = rk[:, 1]
                j = k1 & _IDX_MASK
                d1 = jax.lax.bitcast_convert_type(k1 & vmask, jnp.float32)
                d2v = jax.lax.bitcast_convert_type(k2 & vmask, jnp.float32)
                okc = jnp.maximum(d1, 0.0) < 0.5625 * jnp.maximum(d2v, 0.0)
                iota_b = jax.lax.broadcasted_iota(jnp.int32, (tile_e, n), 1)
                oneh = j[:, None] == iota_b
                coli = (colk_ref[:] & _IDX_MASK).astype(jnp.float32)
                picked_i = jnp.sum(jnp.where(oneh, coli, 0.0), axis=1)
                gi = jax.lax.broadcasted_iota(jnp.int32, (tile_e, 1), 0)[:, 0] + c * tile_e
                okc &= picked_i.astype(jnp.int32) == gi
                bj_ref[sl, :] = j[:, None]
                ok_ref[sl, :] = okc.astype(jnp.int32)[:, None]
                return 0
            jax.lax.fori_loop(0, n // tile_e, body, 0)
    na2 = jnp.sum(jnp.square(a.astype(jnp.int32)), -1, keepdims=True)
    nb2 = jnp.sum(jnp.square(b.astype(jnp.int32)), -1, keepdims=True)
    last = n_ia - 1
    f = pl.pallas_call(
        kern, grid=(n_ia + 1,),
        in_specs=[pl.BlockSpec((tile_a, d), lambda ia: (jnp.minimum(ia, last), 0)),
                  pl.BlockSpec((n, d), lambda ia: (0, 0)),
                  pl.BlockSpec((tile_a, 1), lambda ia: (jnp.minimum(ia, last), 0)),
                  pl.BlockSpec((n, 1), lambda ia: (0, 0)),
                  pl.BlockSpec((2, n), lambda ia: (0, 0))],
        out_specs=[pl.BlockSpec((n, 1), lambda ia: (0, 0)),
                   pl.BlockSpec((n, 1), lambda ia: (0, 0)),
                   pl.BlockSpec((n, 2), lambda ia: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32),
                   jax.ShapeDtypeStruct((n, 2), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, 2), jnp.int32), pltpu.VMEM((1, n), jnp.int32)],
    )
    return jax.jit(lambda: f(a, b, na2, nb2, jnp.swapaxes(uv, 0, 1)))

cases = {
  "full":      dict(tile_a=128, tile_e=64, do_main=True, do_epi=True, do_pb=True),
  "nopb":      dict(tile_a=128, tile_e=64, do_main=True, do_epi=True, do_pb=False),
  "noepi":     dict(tile_a=128, tile_e=64, do_main=True, do_epi=False, do_pb=True),
  "nomain":    dict(tile_a=128, tile_e=64, do_main=False, do_epi=True, do_pb=True),
  "epi32":     dict(tile_a=128, tile_e=32, do_main=True, do_epi=True, do_pb=True),
  "t64":       dict(tile_a=64, tile_e=64, do_main=True, do_epi=True, do_pb=True),
}
cfg = cases[variant]
print("variant", variant, cfg)
try:
    fn = make(**cfg)
    lowered = fn.lower().compile()
    print("COMPILE OK")
except Exception as e:
    msg = str(e)
    i = msg.find("Scoped allocation")
    print("COMPILE FAIL:", msg[i:i+80] if i >= 0 else msg[:300])

# vmap reproduction: append variant names like fullv2 / fullv64
