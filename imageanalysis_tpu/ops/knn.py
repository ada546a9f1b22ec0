"""Exact k-NN descriptor matching on the MXU.

Replaces OpenCV FLANN/BFMatcher ``knnMatch`` (reference matcher.py:203-216
``raw_matches``; configure at matcher.py:43-80). The reference uses
*approximate* FLANN KD-trees on the CPU; on TPU the exact computation is a
(n_a × 128) · (128 × n_b) matmul — MXU food — so we do exact k-NN, which is
strictly better match quality at far higher throughput.

Two implementations with identical semantics:

- ``knn_top2_ref`` — plain jnp (materializes the distance matrix; fine for
  small problems, CPU tests, and as the parity oracle);
- ``knn_top2`` — Pallas kernel that streams B-tiles through VMEM, keeping a
  running row top-2 (and column top-1 for mutual cross-checking) so the
  n_a × n_b distance matrix never touches HBM. Flash-attention-style.

Both return, for squared-L2 distance:
  row_d:  (n_a, 2) two smallest distances per A-descriptor
  row_i:  (n_a, 2) corresponding B indices
  col_d:  (n_b,)   smallest distance per B-descriptor (for cross-check)
  col_i:  (n_b,)   corresponding A index

Padding convention: callers pad descriptor arrays to static shapes with
``PAD_VALUE`` rows; padded rows are then never anyone's nearest neighbor and
their own results are garbage to be masked by the caller (see pad_descriptors).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B switch for the two-launch Pallas epilogue (_match_epilogue_kernel);
# OFF by default: in isolation it ties the XLA factored one-hot gather
# (16.8 vs 17.6 ms per 64-pair batch at n=6144) but inside the full match
# pipeline it measures ~27% SLOWER end-to-end (2285 vs 3138 pairs/s,
# driver bench) — the (tile_e, n_b) one-hot + K=6144/N=8 MXU dot schedule
# worse next to RANSAC than the factored XLA gather, which XLA fuses with
# the downstream match compaction. Set IMGTPU_FUSED_EPILOGUE=1 to A/B.
_FUSED_EPILOGUE = os.environ.get("IMGTPU_FUSED_EPILOGUE", "0") != "0"

PAD_VALUE = 1.0e4  # descriptor fill for padded rows; SIFT values are ≤ 512

_BIG = 3.0e10  # > any real squared distance (128 · (2·512)² ≈ 1.3e8; pads ~1e10)


def pad_descriptors(desc, n_pad):
    """Pad (n, d) descriptors to (n_pad, d) with PAD_VALUE rows."""
    n = desc.shape[0]
    out = jnp.full((n_pad, desc.shape[1]), PAD_VALUE, dtype=desc.dtype)
    return jax.lax.dynamic_update_slice(out, desc, (0, 0))


# ---------------------------------------------------------------------------
# jnp reference implementation
# ---------------------------------------------------------------------------

def knn_top2_ref(desc_a, desc_b, bf16=True, gate_uv_a=None, gate_pred_b=None,
                 gate_radius=0.0):
    """Exact 2-NN by squared L2, materializing the distance matrix.

    int8 descriptors compute in f32 (exact: values ≤ 255, d ≤ 128).
    gate_* (see knn_top2): candidates beyond gate_radius px of the
    predicted image-A position are excluded before the top-2."""
    if desc_a.dtype == jnp.int8:
        desc_a = desc_a.astype(jnp.float32)
        desc_b = desc_b.astype(jnp.float32)
        bf16 = False
    na2 = jnp.sum(desc_a.astype(jnp.float32) ** 2, axis=-1)
    nb2 = jnp.sum(desc_b.astype(jnp.float32) ** 2, axis=-1)
    if bf16:
        ab = jnp.dot(desc_a.astype(jnp.bfloat16), desc_b.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    else:
        ab = jnp.dot(desc_a.astype(jnp.float32), desc_b.astype(jnp.float32).T)
    d2 = na2[:, None] + nb2[None, :] - 2.0 * ab
    if gate_radius > 0.0 and gate_uv_a is not None:
        diff = gate_uv_a[:, None, :] - gate_pred_b[None, :, :]
        gd2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(gd2 > float(gate_radius) ** 2, _BIG, d2)
    neg_top, row_i = jax.lax.top_k(-d2, 2)
    row_d = -neg_top
    col_d = jnp.min(d2, axis=0)
    col_i = jnp.argmin(d2, axis=0).astype(jnp.int32)
    return row_d, row_i.astype(jnp.int32), col_d, col_i


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

_IDX_BITS = 13                  # supports n ≤ 8192 in the packed kernel
_IDX_MASK = (1 << _IDX_BITS) - 1
# keys are int32: d2 ≥ 0 means its f32 bit pattern is a non-negative int32
# whose ordering matches the float ordering (Mosaic has no unsigned-int
# reductions)
_KEY_MAX = 0x7FFFFFFF


def _knn_kernel_packed(a_ref, b_ref, na2_ref, nb2_ref, *rest, tile_a,
                       tile_b, radius2=None):
    """Packed-key variant: the low 13 mantissa bits of each (non-negative)
    squared distance are replaced by the candidate index, so a single
    uint32 min returns value AND argmin together (positive-float bit
    patterns order like the values). Halves the VPU reduction passes of
    the unpacked kernel; costs ≤2⁻¹⁰ relative distance precision — far
    below descriptor noise, and the ratio test compares two equally
    truncated values. Outputs stay packed; the caller decodes.

    Two compile-time variants share this body:
    - int8 descriptors: the distance matmul runs on the int8 MXU (2× the
      bf16 rate) with EXACT int32 distances — SIFT descriptors are
      natively uint8, so d2 ≤ 128·255² < 2²³ converts to f32 losslessly;
    - radius2 is not None: spatial candidate gating (the reference's
      smart projection seeding, matcher.py:358-593) — candidates whose
      image-A position sits farther than √radius2 px from the B
      keypoint's ground-projected prediction are excluded from both the
      row top-2 and the mutual-check column min, BEFORE the ratio test,
      which is what disambiguates repetitive texture."""
    if radius2 is not None:
        ua_ref, pb_ref, row_ref, col_ref, r1_ref, r2_ref = rest
    else:
        row_ref, col_ref, r1_ref, r2_ref = rest
    ia = pl.program_id(0)
    ib = pl.program_id(1)
    nb_tiles = pl.num_programs(1)

    dn = (((1,), (1,)), ((), ()))
    if a_ref.dtype == jnp.int8:
        # precision must be DEFAULT explicitly (package sets
        # jax_default_matmul_precision=float32 globally; Mosaic rejects the
        # resulting HIGHEST-precision int dot with "Bad lhs type")
        ab = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                                 preferred_element_type=jnp.int32,
                                 precision=jax.lax.Precision.DEFAULT)
        na2 = na2_ref[:][:, 0]
        nb2 = nb2_ref[:][:, 0]
        # exact int32 squared distances (a true sum of squares: never < 0)
        d2 = (na2[:, None] + nb2[None, :] - 2 * ab).astype(jnp.float32)
    else:
        # bf16 inputs: single MXU pass. f32 inputs: HIGHEST (3-pass bf16x3)
        # — DEFAULT would silently truncate f32 operands to bf16 on the MXU
        # (caught by test_knn_pallas_matches_ref on-chip: 3.3e-3 distance
        # error vs the 2^-9 packing bound the caller was promised)
        prec = (jax.lax.Precision.HIGHEST if a_ref.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        ab = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        na2 = na2_ref[:][:, 0]
        nb2 = nb2_ref[:][:, 0]
        d2 = jnp.maximum(na2[:, None] + nb2[None, :] - 2.0 * ab, 0.0)

    bits = jax.lax.bitcast_convert_type(d2, jnp.int32) \
        & jnp.int32(~_IDX_MASK)
    if radius2 is not None:
        ua = ua_ref[:]
        pb = pb_ref[:]
        dx = ua[:, 0][:, None] - pb[:, 0][None, :]
        dy = ua[:, 1][:, None] - pb[:, 1][None, :]
        gated_out = dx * dx + dy * dy > radius2
        bits = jnp.where(gated_out, jnp.int32(_KEY_MAX & ~_IDX_MASK), bits)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_a, tile_b), 1) \
        + ib * tile_b
    rowkey = bits | cols                                  # (ta, tb)

    m1 = jnp.min(rowkey, axis=1)
    masked = jnp.where(rowkey == m1[:, None], jnp.int32(_KEY_MAX), rowkey)
    m2 = jnp.min(masked, axis=1)

    @pl.when(ib == 0)
    def _():
        r1_ref[:] = jnp.full((tile_a, 1), _KEY_MAX, jnp.int32)
        r2_ref[:] = jnp.full((tile_a, 1), _KEY_MAX, jnp.int32)

    r1 = r1_ref[:][:, 0]
    r2 = r2_ref[:][:, 0]
    # merge two sorted pairs on packed keys
    n1 = jnp.minimum(r1, m1)
    n2 = jnp.minimum(jnp.maximum(r1, m1), jnp.minimum(r2, m2))
    r1_ref[:] = n1[:, None]
    r2_ref[:] = n2[:, None]

    @pl.when(ib == nb_tiles - 1)
    def _():
        row_ref[:] = jnp.concatenate([r1_ref[:], r2_ref[:]], axis=1)

    # column top-1, packed with row indices
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_a, tile_b), 0) \
        + ia * tile_a
    colkey = jnp.min(bits | rows, axis=0)[None, :]        # (1, tb)
    sl = pl.ds(ib * tile_b, tile_b)

    @pl.when(ia == 0)
    def _():
        col_ref[:, sl] = colkey

    @pl.when(ia > 0)
    def _():
        col_ref[:, sl] = jnp.minimum(colkey, col_ref[:, sl])


def _knn_packed_raw(desc_a, desc_b, na2, nb2, tile_a, tile_b,
                    gate_uv_a=None, gate_pred_b=None, radius2=None):
    """The packed-key pallas_call with RAW packed outputs: row_p (n_a, 2)
    int32 (top-2 packed keys per A row), col_p (1, n_b) int32 (packed
    column champion per B row). Descriptors arrive pre-cast; norms
    precomputed. Shared by knn_top2 (which decodes) and knn_match_fused
    (which feeds the epilogue kernel)."""
    n_a, d = desc_a.shape
    n_b = desc_b.shape[0]
    kernel = functools.partial(_knn_kernel_packed, tile_a=tile_a,
                               tile_b=tile_b, radius2=radius2)
    in_specs = [
        pl.BlockSpec((tile_a, d), lambda ia, ib: (ia, 0)),
        pl.BlockSpec((tile_b, d), lambda ia, ib: (ib, 0)),
        pl.BlockSpec((tile_a, 1), lambda ia, ib: (ia, 0)),
        pl.BlockSpec((tile_b, 1), lambda ia, ib: (ib, 0)),
    ]
    inputs = [desc_a, desc_b, na2, nb2]
    if radius2 is not None:
        in_specs += [
            pl.BlockSpec((tile_a, 2), lambda ia, ib: (ia, 0)),
            pl.BlockSpec((tile_b, 2), lambda ia, ib: (ib, 0)),
        ]
        inputs += [gate_uv_a.astype(jnp.float32),
                   gate_pred_b.astype(jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(n_a // tile_a, n_b // tile_b),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_a, 2), lambda ia, ib: (ia, 0)),
            pl.BlockSpec((1, n_b), lambda ia, ib: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_a, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, n_b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_a, 1), jnp.int32),
            pltpu.VMEM((tile_a, 1), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def _match_epilogue_kernel(rowp_ref, vals_ref, bj_ref, ok_ref,
                           pb_ref, *, tile_e, n_b, ratio2):
    """Decode packed 2-NN outputs into (best_j, ratio+mutual ok, picked uv).

    Replaces the XLA glue after the packed kernel (the decode + one-hot MXU
    dots in match_pair_dense) with one tiny Pallas pass over row tiles: the
    Lowe ratio (reference matcher.py:239-257) on the truncated packed
    values, the bidirectional cross-check (matcher.py:187-201), and the
    matched-coordinate pick. The gathers col_i[best_j] and uv_b[best_j] are
    one one-hot MXU dot — exactly one lane matches per row because packed
    row keys carry the column index in their low bits.

    Mosaic lowers this dot in DEFAULT (single-pass bf16) precision, which
    truncates operands to 8 mantissa bits — enough to silently corrupt
    picked indices ≥ 257 and uv coords (±8 px at 4k-px coords; measured
    on-chip, scripts_dev/fused_parity_tpu.py). So every gathered value is
    pre-split into bf16-EXACT components and recombined after the dot:
    the column index as two ≤8-bit integer limbs (hi = i >> 8, lo = i & 255)
    and each uv coordinate as a Dekker-style f32 = hi + mid + lo triple of
    bf16-roundable parts (built outside, see knn_match_fused). One-hot
    entries are exactly 1.0 and each output row has a single nonzero
    product, so the f32 accumulation is exact.

    vals_ref: (8, n_b) rows [c_hi, c_lo, u_hi, v_hi, u_mid, v_mid, u_lo,
    v_lo], built in XLA between the launches (_epilogue_vals) — lane-major
    so epilogue rows read without relayout, and a full 8-sublane f32 tile
    (an in-kernel concat of (1,n)+(1,n)+(6,n) sublane blocks silently
    zeroed the last 4 rows on Mosaic; measured, scripts_dev/
    fused_parity_tpu.py). A fully-fused single-kernel variant OOMed scoped
    VMEM under vmap at mission shapes (27.1 MB at B=64, n_b=6144; see
    ROUND4_NOTES.md), so the epilogue is its own launch."""
    ie = pl.program_id(0)
    vmask = jnp.int32(~_IDX_MASK)
    rk = rowp_ref[:]                                       # (tile_e, 2)
    k1 = rk[:, 0]
    k2 = rk[:, 1]
    j = k1 & _IDX_MASK
    d1 = jax.lax.bitcast_convert_type(k1 & vmask, jnp.float32)
    d2v = jax.lax.bitcast_convert_type(k2 & vmask, jnp.float32)
    okc = jnp.maximum(d1, 0.0) < ratio2 * jnp.maximum(d2v, 0.0)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (tile_e, n_b), 1)
    oneh = (j[:, None] == iota_b).astype(jnp.float32)
    picked = jax.lax.dot_general(oneh, vals_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
    gi = jax.lax.broadcasted_iota(jnp.int32, (tile_e, 1), 0)[:, 0] \
        + ie * tile_e
    pc = picked[:, 0] * 256.0 + picked[:, 1]
    okc &= pc.astype(jnp.int32) == gi
    pu = (picked[:, 2] + picked[:, 4]) + picked[:, 6]
    pv = (picked[:, 3] + picked[:, 5]) + picked[:, 7]
    bj_ref[:] = j[:, None]
    ok_ref[:] = okc.astype(jnp.int32)[:, None]
    pb_ref[:] = jnp.concatenate([pu[:, None], pv[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=("ratio", "gate_radius"))
def knn_match_fused(desc_a, desc_b, uv_b, ratio=0.75, gate_uv_a=None,
                    gate_pred_b=None, gate_radius=0.0):
    """2-NN + ratio + mutual + coordinate pick in two Pallas launches.

    Launch 1 is the packed-key streaming kernel (raw packed outputs);
    launch 2 is _match_epilogue_kernel. Returns (best_j (n_a,) int32,
    ok (n_a,) bool, pb (n_a, 2) f32) with the same semantics as
    match_pair_dense's decode+one-hot epilogue; callers still mask padded
    rows (arange < n_a, best_j < n_b). Constraint: packed-key limits
    (n ≤ 8192)."""
    n_a, d = desc_a.shape
    n_b = desc_b.shape[0]
    int8_in = desc_a.dtype == jnp.int8
    tile_a = None
    for ta in (256, 128, 64):
        if n_a % ta == 0 and ta * n_b * 12 <= 15 * 1024 * 1024:
            tile_a = ta
            break
    if tile_a is None:
        tile_a = next((t for t in (256, 128, 64) if n_a % t == 0), n_a)

    if int8_in:
        na2 = jnp.sum(jnp.square(desc_a.astype(jnp.int32)), axis=-1,
                      keepdims=True)
        nb2 = jnp.sum(jnp.square(desc_b.astype(jnp.int32)), axis=-1,
                      keepdims=True)
        in_dtype = jnp.int8
    else:
        na2 = jnp.sum(desc_a.astype(jnp.float32) ** 2, axis=-1,
                      keepdims=True)
        nb2 = jnp.sum(desc_b.astype(jnp.float32) ** 2, axis=-1,
                      keepdims=True)
        in_dtype = jnp.bfloat16

    gated = gate_radius > 0.0 and gate_uv_a is not None
    row_p, col_p = _knn_packed_raw(
        desc_a.astype(in_dtype), desc_b.astype(in_dtype), na2, nb2,
        tile_a, n_b, gate_uv_a=gate_uv_a, gate_pred_b=gate_pred_b,
        radius2=float(gate_radius) ** 2 if gated else None)

    # ~4 live (tile_e, n_b) temporaries (iota, compare, f32 one-hot) in
    # the epilogue
    tile_e = next(te for te in (256, 128, 64, 32, 8)
                  if n_a % te == 0 and te * n_b * 16 <= 15 * 1024 * 1024)
    bj, okf, pb = pl.pallas_call(
        functools.partial(_match_epilogue_kernel, tile_e=tile_e, n_b=n_b,
                          ratio2=float(ratio) ** 2),
        grid=(n_a // tile_e,),
        in_specs=[
            pl.BlockSpec((tile_e, 2), lambda ie: (ie, 0)),
            pl.BlockSpec((8, n_b), lambda ie: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_e, 1), lambda ie: (ie, 0)),
            pl.BlockSpec((tile_e, 1), lambda ie: (ie, 0)),
            pl.BlockSpec((tile_e, 2), lambda ie: (ie, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_a, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_a, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_a, 2), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(row_p, _epilogue_vals(col_p, uv_b))
    return bj[:, 0], okf[:, 0].astype(bool), pb


def _bf16_trunc(x):
    """Truncate f32 to its top 8 mantissa bits by masking — the bitcast
    form survives jit, where a plain f32→bf16→f32 round-trip is CANCELLED
    by XLA's excess-precision rule (measured: under jit the rounded hi
    silently reverts to full f32 and the residual limbs fold to zero)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _epilogue_vals(col_p, uv_b):
    """Build the (8, n_b) bf16-exact gather table for the epilogue dot:
    rows [c_hi, c_lo, u_hi, v_hi, u_mid, v_mid, u_lo, v_lo]. The column
    champion index splits into two ≤8-bit integer limbs; each f32 coord
    splits Dekker-style into hi/mid/lo slices of its 24-bit mantissa (top
    8 / next 8 / last 8 bits — every limb exactly bf16-representable),
    recombining exactly as (hi + mid) + lo. Each subtraction is exact
    because the minuend's retained bits dominate (standard Dekker
    splitting)."""
    coli = col_p & _IDX_MASK                               # (1, n_b)
    c_hi = (coli >> 8).astype(jnp.float32)
    c_lo = (coli & 255).astype(jnp.float32)
    uvt = jnp.swapaxes(uv_b.astype(jnp.float32), 0, 1)     # (2, n_b)
    hi = _bf16_trunc(uvt)
    r = uvt - hi
    mid = _bf16_trunc(r)
    lo = r - mid
    return jnp.concatenate([c_hi, c_lo, hi, mid, lo], axis=0)


def _knn_kernel(a_ref, b_ref, na2_ref, nb2_ref, row_d_ref, row_i_ref,
                col_d_ref, col_i_ref, r1_ref, r2_ref, i1_ref, i2_ref, *,
                tile_a, tile_b):
    ia = pl.program_id(0)
    ib = pl.program_id(1)
    nb_tiles = pl.num_programs(1)

    # descriptors arrive pre-cast (bf16 for MXU speed or f32); norms are
    # precomputed outside. bf16 dots must be DEFAULT explicitly (the package
    # sets jax_default_matmul_precision=float32 globally, and Mosaic rejects
    # HIGHEST-precision bf16 dots with "Bad lhs type"); f32 dots must be
    # HIGHEST or the MXU silently truncates the operands to bf16
    dn = (((1,), (1,)), ((), ()))
    prec = (jax.lax.Precision.HIGHEST if a_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ab = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                             preferred_element_type=jnp.float32,
                             precision=prec)
    na2 = na2_ref[:][:, 0]
    nb2 = nb2_ref[:][:, 0]
    d2 = na2[:, None] + nb2[None, :] - 2.0 * ab  # (tile_a, tile_b)

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_a, tile_b), 1)

    # block row top-2
    m1 = jnp.min(d2, axis=1)
    i1 = jnp.argmin(d2, axis=1).astype(jnp.int32)
    d2_m = jnp.where(cols == i1[:, None], _BIG, d2)
    m2 = jnp.min(d2_m, axis=1)
    i2 = jnp.argmin(d2_m, axis=1).astype(jnp.int32)
    gi1 = ib * tile_b + i1
    gi2 = ib * tile_b + i2

    # reset running row state at the start of each B sweep
    @pl.when(ib == 0)
    def _():
        r1_ref[:] = jnp.full((tile_a, 1), _BIG, jnp.float32)
        r2_ref[:] = jnp.full((tile_a, 1), _BIG, jnp.float32)
        i1_ref[:] = jnp.zeros((tile_a, 1), jnp.int32)
        i2_ref[:] = jnp.zeros((tile_a, 1), jnp.int32)

    r1, r2 = r1_ref[:][:, 0], r2_ref[:][:, 0]
    ri1, ri2 = i1_ref[:][:, 0], i2_ref[:][:, 0]
    # merge sorted pairs (r1<=r2, m1<=m2): new1 = min(r1,m1),
    # new2 = min(max(r1,m1), min(r2,m2))
    take_m = m1 < r1
    n1 = jnp.where(take_m, m1, r1)
    ni1 = jnp.where(take_m, gi1, ri1)
    lo = jnp.where(take_m, r1, m1)          # max(r1, m1)
    lo_i = jnp.where(take_m, ri1, gi1)
    hi = jnp.where(r2 < m2, r2, m2)         # min(r2, m2)
    hi_i = jnp.where(r2 < m2, ri2, gi2)
    take_lo = lo < hi
    n2 = jnp.where(take_lo, lo, hi)
    ni2 = jnp.where(take_lo, lo_i, hi_i)
    r1_ref[:] = n1[:, None]
    r2_ref[:] = n2[:, None]
    i1_ref[:] = ni1[:, None]
    i2_ref[:] = ni2[:, None]

    @pl.when(ib == nb_tiles - 1)
    def _():
        row_d_ref[:] = jnp.concatenate([r1_ref[:], r2_ref[:]], axis=1)
        row_i_ref[:] = jnp.concatenate([i1_ref[:], i2_ref[:]], axis=1)

    # column top-1: the full (1, n_b) output lives as ONE block (constant
    # index map) so it stays resident in VMEM across the whole grid — block
    # revisiting across a non-innermost grid axis has no stability guarantee,
    # and relying on it produced context-dependent miscompiles. Layout is
    # (1, n_b) so n_b runs along lanes (a (n_b, 1) layout is 1-lane-wide and
    # ~128× slower).
    cm = jnp.min(d2, axis=0)[None, :]
    ci = (ia * tile_a + jnp.argmin(d2, axis=0)).astype(jnp.int32)[None, :]
    sl = pl.ds(ib * tile_b, tile_b)

    @pl.when(ia == 0)
    def _():
        col_d_ref[:, sl] = cm
        col_i_ref[:, sl] = ci

    @pl.when(ia > 0)
    def _():
        old = col_d_ref[:, sl]
        better = cm < old
        col_d_ref[:, sl] = jnp.where(better, cm, old)
        col_i_ref[:, sl] = jnp.where(better, ci, col_i_ref[:, sl])


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b", "bf16",
                                             "gate_radius"))
def knn_top2(desc_a, desc_b, tile_a=None, tile_b=None, bf16=True,
             gate_uv_a=None, gate_pred_b=None, gate_radius=0.0):
    """Fused streaming 2-NN. desc_a: (n_a, d), desc_b: (n_b, d); n_a % tile_a
    and n_b % tile_b must be 0 (use pad_descriptors).

    int8 descriptors take the int8-MXU path with exact integer distances
    (SIFT is natively uint8; store descriptors as value−128).

    gate_uv_a (n_a, 2) + gate_pred_b (n_b, 2) + gate_radius > 0 enable
    spatial candidate gating: only B keypoints whose predicted image-A
    position lies within gate_radius px of an A keypoint are match
    candidates for it (packed-key path only — callers fall back to the
    reference impl beyond 8192 features).

    Default tiles (hardware-swept, r2): take the WHOLE B axis in one tile
    when it fits VMEM — running-state merges and the column-output
    read-modify-write then happen once per row tile (256×6144 measured
    ~22% faster than 256×1024; larger row tiles or >8 MB d2 blocks fail
    to compile)."""
    n_a, d = desc_a.shape
    n_b = desc_b.shape[0]
    int8_in = desc_a.dtype == jnp.int8
    if tile_a is None and tile_b is None:
        # a (tile_a × n_b) block costs ~12 B/element of scoped VMEM (d2 +
        # its masked copy + in/out buffers); stay under the 16 MB budget
        for ta in (256, 128, 64):
            if n_a % ta == 0 and ta * n_b * 12 <= 15 * 1024 * 1024:
                tile_a, tile_b = ta, n_b
                break
    if tile_a is None:
        tile_a = next((t for t in (256, 128, 64) if n_a % t == 0), n_a)
    if tile_b is None:
        tile_b = next((t for t in (1024, 512, 256, 128) if n_b % t == 0), n_b)
    assert n_a % tile_a == 0 and n_b % tile_b == 0, (n_a, n_b, tile_a, tile_b)
    grid = (n_a // tile_a, n_b // tile_b)

    if int8_in:
        na2 = jnp.sum(jnp.square(desc_a.astype(jnp.int32)), axis=-1,
                      keepdims=True)
        nb2 = jnp.sum(jnp.square(desc_b.astype(jnp.int32)), axis=-1,
                      keepdims=True)
        in_dtype = jnp.int8
    else:
        na2 = jnp.sum(desc_a.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        nb2 = jnp.sum(desc_b.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        in_dtype = jnp.bfloat16 if bf16 else jnp.float32

    gated = gate_radius > 0.0 and gate_uv_a is not None
    if max(n_a, n_b) <= (1 << _IDX_BITS):
        # packed-key path: one min per reduction instead of min+argmin
        row_p, col_p = _knn_packed_raw(
            desc_a.astype(in_dtype), desc_b.astype(in_dtype), na2, nb2,
            tile_a, tile_b, gate_uv_a=gate_uv_a, gate_pred_b=gate_pred_b,
            radius2=float(gate_radius) ** 2 if gated else None)
        mask = jnp.int32(~_IDX_MASK)
        row_d = jax.lax.bitcast_convert_type(row_p & mask, jnp.float32)
        row_i = row_p & _IDX_MASK
        col_d = jax.lax.bitcast_convert_type(col_p[0] & mask, jnp.float32)
        col_i = col_p[0] & _IDX_MASK
        return row_d, row_i, col_d, col_i

    if gated:
        raise NotImplementedError(
            "spatial gating needs the packed-key kernel (n ≤ 8192); "
            "use knn_top2_ref for larger feature sets")
    if int8_in:
        # the unpacked running-state kernel is float-only; int8 loses its
        # MXU advantage beyond 8192 features — cast and take the bf16 path
        desc_a = desc_a.astype(jnp.bfloat16)
        desc_b = desc_b.astype(jnp.bfloat16)
        na2 = na2.astype(jnp.float32)
        nb2 = nb2.astype(jnp.float32)
        in_dtype = jnp.bfloat16
    kernel = functools.partial(_knn_kernel, tile_a=tile_a, tile_b=tile_b)
    row_d, row_i, col_d, col_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, d), lambda ia, ib: (ia, 0)),
            pl.BlockSpec((tile_b, d), lambda ia, ib: (ib, 0)),
            pl.BlockSpec((tile_a, 1), lambda ia, ib: (ia, 0)),
            pl.BlockSpec((tile_b, 1), lambda ia, ib: (ib, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_a, 2), lambda ia, ib: (ia, 0)),
            pl.BlockSpec((tile_a, 2), lambda ia, ib: (ia, 0)),
            pl.BlockSpec((1, n_b), lambda ia, ib: (0, 0)),
            pl.BlockSpec((1, n_b), lambda ia, ib: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_a, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_a, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, n_b), jnp.float32),
            jax.ShapeDtypeStruct((1, n_b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_a, 1), jnp.float32),
            pltpu.VMEM((tile_a, 1), jnp.float32),
            pltpu.VMEM((tile_a, 1), jnp.int32),
            pltpu.VMEM((tile_a, 1), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(desc_a.astype(in_dtype), desc_b.astype(in_dtype), na2, nb2)
    return row_d, row_i, col_d[0, :], col_i[0, :]


# ---------------------------------------------------------------------------
# Match assembly (ratio test + mutual cross-check), dense form
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ratio", "use_pallas", "bf16",
                                             "mutual", "gate_radius"))
def match_pair_dense(desc_a, desc_b, n_a, n_b, ratio=0.75, mutual=True,
                     use_pallas=False, bf16=True, gate_uv_a=None,
                     gate_pred_b=None, gate_radius=0.0, uv_b=None):
    """Lowe-ratio + mutual-consistency matching of one descriptor pair.

    desc_a/desc_b are padded to static shapes; n_a/n_b give the real counts.
    Returns (best_j, valid): for each A row its best B index, and whether the
    match survives the ratio test (reference matcher.py:239-257: L2 distances
    d1 < ratio·d2, applied here on squared distances as d1 < ratio²·d2) and
    the bidirectional cross-check (reference matcher.py:187-201, 304-356).

    gate_uv_a/gate_pred_b/gate_radius (see knn_top2) restrict candidates to
    a spatial neighborhood of a ground-projected position prior — the
    reference's smart seeding (matcher.py:358-593) as a kernel mask.

    uv_b (n_b_pad, 2): when given, ALSO return pb = uv_b[best_j] as a third
    output — on TPU the coordinate gather rides the mutual check's one-hot
    matmul (one fused (n_a, n_b)×(n_b, 3) dot), which XLA does NOT manage
    when the two one-hot dots are built separately
    (scripts_dev/pb_gather_ab.py: separate dots cost +2.3 ms/64-batch).
    """
    gate_ok = max(desc_a.shape[0], desc_b.shape[0]) <= (1 << _IDX_BITS)
    if (use_pallas and mutual and uv_b is not None and gate_ok
            and _FUSED_EPILOGUE and desc_a.shape[0] % 8 == 0):
        # single-launch path: ratio + mutual + coordinate pick emitted by
        # the kernel itself (see _knn_kernel_fused)
        best_j, ok, pb = knn_match_fused(
            desc_a, desc_b, uv_b, ratio=ratio, gate_uv_a=gate_uv_a,
            gate_pred_b=gate_pred_b, gate_radius=gate_radius)
        arange_a = jnp.arange(desc_a.shape[0], dtype=jnp.int32)
        ok &= arange_a < n_a
        ok &= best_j < n_b
        return best_j, ok, pb
    if use_pallas and (gate_radius <= 0.0 or gate_ok):
        row_d, row_i, col_d, col_i = knn_top2(
            desc_a, desc_b, bf16=bf16, gate_uv_a=gate_uv_a,
            gate_pred_b=gate_pred_b, gate_radius=gate_radius)
    else:
        row_d, row_i, col_d, col_i = knn_top2_ref(
            desc_a, desc_b, bf16=bf16, gate_uv_a=gate_uv_a,
            gate_pred_b=gate_pred_b, gate_radius=gate_radius)

    n_a_pad = desc_a.shape[0]
    arange_a = jnp.arange(n_a_pad, dtype=jnp.int32)
    best_j = row_i[:, 0]
    d1 = jnp.maximum(row_d[:, 0], 0.0)
    d2 = jnp.maximum(row_d[:, 1], 0.0)
    ok = d1 < (ratio * ratio) * d2
    pb = None
    if jax.default_backend() == "tpu":
        # col_i[best_j] (and uv_b[best_j] when requested) as a FACTORED
        # one-hot gather: a minor-dim gather on TPU serializes (~4.0 ms
        # per 64-pair batch at 6k features — scripts_dev/glue_bisect.py),
        # and a single (n_a, n_b) one-hot dot costs ~6 ms/batch of VPU
        # traffic just materializing the one-hot. Splitting j into
        # j_hi·128 + j_lo turns it into two one-hots of width n_b/128 and
        # 128 (~11x less traffic): picked[i] = oh_hi[i] @ T[·, j_lo, ·]
        # via one small matmul + an elementwise masked reduce. Exact: the
        # package pins matmul precision to float32, one-hot entries are
        # 1.0, and exactly one product per output is nonzero.
        n_b_pad = col_i.shape[0]
        cols = []
        if mutual:
            cols.append(col_i.astype(jnp.float32)[:, None])
        if uv_b is not None:
            cols.append(uv_b.astype(jnp.float32))
        if cols:
            table = jnp.concatenate(cols, axis=1)          # (n_b_pad, K)
            k_ch = table.shape[1]
            if n_b_pad % 128 == 0:
                n_hi = n_b_pad // 128
                oh_hi = (
                    (best_j >> 7)[:, None]
                    == jnp.arange(n_hi, dtype=jnp.int32)[None, :]
                ).astype(jnp.float32)
                oh_lo = (
                    (best_j & 127)[:, None]
                    == jnp.arange(128, dtype=jnp.int32)[None, :]
                ).astype(jnp.float32)
                u = (oh_hi @ table.reshape(n_hi, 128 * k_ch)
                     ).reshape(n_a_pad, 128, k_ch)
                picked = jnp.einsum("ib,ibk->ik", oh_lo, u)
            else:
                oh = (best_j[:, None]
                      == jnp.arange(n_b_pad, dtype=jnp.int32)[None, :]
                      ).astype(jnp.float32)
                picked = oh @ table
        if mutual:
            ok &= picked[:, 0].astype(jnp.int32) == arange_a
        if uv_b is not None:
            pb = picked[:, -2:]
    else:
        if mutual:
            ok &= col_i[best_j] == arange_a
        if uv_b is not None:
            pb = jnp.take_along_axis(uv_b, best_j[:, None], axis=0)
    ok &= arange_a < n_a
    ok &= best_j < n_b
    if uv_b is not None:
        return best_j, ok, pb
    return best_j, ok
