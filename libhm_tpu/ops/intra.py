"""Batched intra prediction — TPU-native formulation.

Replaces the reference's per-block scalar predictors (reference:
source/Lib/TLibCommon/TComPrediction.cpp:245-845 xPredIntraAng /
xPredIntraPlanar / predIntraDC, TComPattern.cpp fillReferenceSamples)
with batched, gather-based kernels over many same-size blocks at once, so
a whole wavefront level executes as one fused device step:

- The 4n+1 border samples of each block live in one "vals" array in spec
  scan order (bottom-left .. corner .. top-right, Rec. H.265 8.4.4.2.2).
  vals index v: left[k] = vals[2n-k], top[k] = vals[2n+k].
- Reference substitution (8.4.4.2.2) is a running-maximum gather: each
  position takes the nearest available sample at or before it.
- The [1 2 1] smoothing and the strong bilinear filter (8.4.4.2.3) are
  elementwise/affine ops on vals with static weight vectors.
- Angular prediction (8.4.4.2.6) is two static-table gathers + a lerp:
  per-mode tables map vals -> extended ref line -> (row base, fraction).

Everything is int32, jit-compatible, static shapes; bit-exact vs
hostdec/refimpl.py (tested in tests/test_ops_intra.py).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..hostdec.refimpl import ANG_TABLE

_INV_ANGLE = {-2: 4096, -5: 1638, -9: 910, -13: 630, -17: 482,
              -21: 390, -26: 315, -32: 256}


# ---------------------------------------------------------------------------
# static tables
@functools.lru_cache(maxsize=None)
def _border_offsets(n):
    """vals-scan-order border coordinates relative to the block origin."""
    T = 4 * n + 1
    offx = np.empty(T, np.int32)
    offy = np.empty(T, np.int32)
    for i in range(2 * n):
        offx[i], offy[i] = -1, 2 * n - 1 - i
    offx[2 * n], offy[2 * n] = -1, -1
    for i in range(2 * n):
        offx[2 * n + 1 + i], offy[2 * n + 1 + i] = i, -1
    return offx, offy


@functools.lru_cache(maxsize=None)
def _ang_tables(n):
    """Per-mode static gather tables for angular prediction at size n.

    EXT_IDX[35, 3n+2]: vals index for extended-ref position p (ref index
      p - n); unused slots clamp to 2n (the corner).
    ROW[35, n], FRAC[35, n]: per-row base position into EXT and the 1/32
      interpolation fraction.
    VERT[35]: mode >= 18.
    """
    E = 3 * n + 2
    ext = np.full((35, E), 2 * n, np.int32)
    row = np.zeros((35, n), np.int32)
    frac = np.zeros((35, n), np.int32)
    vert = np.zeros(35, bool)
    for m in range(2, 35):
        ang = ANG_TABLE[m]
        vertical = m >= 18
        vert[m] = vertical

        def main_idx(i):       # main[i] -> vals index
            return 2 * n + i if vertical else 2 * n - i

        def side_idx(i):       # side[i] -> vals index
            return 2 * n - i if vertical else 2 * n + i

        if ang < 0:
            inv = _INV_ANGLE[ang]
            lo = (n * ang) >> 5
            for r in range(0, n + 1):
                ext[m, n + r] = main_idx(r)
            for r in range(-1, lo - 1, -1):
                ext[m, n + r] = side_idx(min((-r * inv + 128) >> 8, 2 * n))
        else:
            for r in range(0, 2 * n + 1):
                ext[m, n + r] = main_idx(r)
        for j in range(n):
            pos = (j + 1) * ang
            row[m, j] = n + 1 + (pos >> 5)
            frac[m, j] = pos & 31
    return ext, row, frac, vert


@functools.lru_cache(maxsize=None)
def _strong_weights(n):
    """Static weight vectors for the strong bilinear filter (n=32 only)."""
    T = 4 * n + 1
    wc = np.empty(T, np.int32)   # weight of the corner
    we = np.empty(T, np.int32)   # weight of the far edge (bl / tr)
    for p in range(T):
        if p <= 2 * n:
            wc[p], we[p] = p, 2 * n - p
        else:
            wc[p], we[p] = 4 * n - p, p - 2 * n
    return wc, we


# ---------------------------------------------------------------------------
def border_coords(x, y, n, W, H):
    """Clamped border gather coordinates for blocks at (x, y) [B]."""
    offx, offy = _border_offsets(n)
    cx = x[:, None] + jnp.asarray(offx)[None, :]
    cy = y[:, None] + jnp.asarray(offy)[None, :]
    return jnp.clip(cx, 0, W - 1), jnp.clip(cy, 0, H - 1)


def substitute(gathered, avail, bit_depth):
    """Reference-sample substitution (Rec. 8.4.4.2.2).

    gathered, avail: [B, T]; forward-fills unavailable samples from the
    nearest available one at a lower scan index; leading gap backfills
    from the first available; all-unavailable -> DC default.
    """
    B, T = gathered.shape
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]
    idx = jnp.where(avail, pos, -1)
    src = jax.lax.associative_scan(jnp.maximum, idx, axis=1)
    first = jnp.argmax(avail, axis=1).astype(jnp.int32)
    src = jnp.where(src < 0, first[:, None], src)
    vals = jnp.take_along_axis(gathered, src, axis=1)
    dc = 1 << (bit_depth - 1)
    return jnp.where(avail.any(axis=1)[:, None], vals, dc)


def filter_refs(vals, n, bit_depth, filter_flag, strong_flag):
    """[1 2 1] smoothing + strong bilinear filter (Rec. 8.4.4.2.3).

    vals: [B, 4n+1]; filter_flag: [B] use_filtered_refs decision (static);
    strong_flag: [B] strong smoothing allowed (sps flag & luma & n==32) —
    the value-dependent threshold test happens here.
    """
    sm = jnp.concatenate([
        vals[:, :1],
        (vals[:, :-2] + 2 * vals[:, 1:-1] + vals[:, 2:] + 2) >> 2,
        vals[:, -1:],
    ], axis=1)
    out = sm
    if n == 32:
        c = vals[:, 2 * n]
        bl = vals[:, 0]
        tr = vals[:, 4 * n]
        thr = 1 << (bit_depth - 5)
        f1 = jnp.abs(c + tr - 2 * vals[:, 3 * n]) < thr
        f2 = jnp.abs(c + bl - 2 * vals[:, n]) < thr
        wc, we = _strong_weights(n)
        edge = jnp.where(jnp.arange(4 * n + 1)[None, :] <= 2 * n,
                         bl[:, None], tr[:, None])
        strong = (jnp.asarray(wc)[None, :] * c[:, None] +
                  jnp.asarray(we)[None, :] * edge + n) >> 6
        out = jnp.where((strong_flag & f1 & f2)[:, None], strong, sm)
    return jnp.where(filter_flag[:, None], out, vals)


def predict(vals, mode, n, comp_is_luma, bit_depth, disable_bf):
    """Batched intra prediction (Rec. 8.4.4.2.4-6).

    vals: [B, 4n+1] (already substituted + filtered); mode: [B] int32
    (after any 4:2:2 angle mapping); disable_bf: [B] bool (implicit-RDPCM
    lossless edge-filter disable — gates mode 10/26 filters, not DC's).
    Returns [B, n, n] int32.
    """
    B = vals.shape[0]
    maxv = (1 << bit_depth) - 1
    log2n = n.bit_length() - 1
    t1n = vals[:, 2 * n + 1:3 * n + 1]                       # top[1..n]
    l1n = vals[:, n:2 * n][:, ::-1]                          # left[1..n]
    # planar (8.4.4.2.4)
    tr = vals[:, 3 * n + 1]
    bl = vals[:, n - 1]
    xx = jnp.arange(n, dtype=jnp.int32)
    hor = ((n - 1 - xx)[None, None, :] * l1n[:, :, None] +
           (xx + 1)[None, None, :] * tr[:, None, None])
    ver = ((n - 1 - xx)[None, :, None] * t1n[:, None, :] +
           (xx + 1)[None, :, None] * bl[:, None, None])
    planar = (hor + ver + n) >> (log2n + 1)
    # DC (8.4.4.2.5); boundary filter unconditional for luma n<32
    dc = (jnp.sum(t1n, axis=1) + jnp.sum(l1n, axis=1) + n) >> (log2n + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (B, n, n))
    if comp_is_luma and n < 32:
        top_row = (t1n + 3 * dc[:, None] + 2) >> 2
        left_col = (l1n + 3 * dc[:, None] + 2) >> 2
        corner = (vals[:, 2 * n - 1] + 2 * dc + vals[:, 2 * n + 1] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(top_row)
        dcp = dcp.at[:, :, 0].set(left_col)
        dcp = dcp.at[:, 0, 0].set(corner)
    # angular (8.4.4.2.6)
    ext_t, row_t, frac_t, vert_t = _ang_tables(n)
    ext_idx = jnp.asarray(ext_t)[mode]                       # [B, 3n+2]
    ext = jnp.take_along_axis(vals, ext_idx, axis=1)
    rowb = jnp.asarray(row_t)[mode]                          # [B, n]
    frac = jnp.asarray(frac_t)[mode]                         # [B, n]
    gidx = rowb[:, :, None] + xx[None, None, :]              # [B, n, n]
    E = ext.shape[1]
    a = jnp.take_along_axis(ext, gidx.reshape(B, -1), axis=1).reshape(B, n, n)
    b = jnp.take_along_axis(ext, jnp.minimum(gidx + 1, E - 1).reshape(B, -1),
                            axis=1).reshape(B, n, n)
    f = frac[:, :, None]
    ang = ((32 - f) * a + f * b + 16) >> 5
    vert = jnp.asarray(vert_t)[mode]
    ang = jnp.where(vert[:, None, None], ang,
                    jnp.swapaxes(ang, 1, 2))
    if comp_is_luma and n < 32:
        # exactly-vertical/-horizontal boundary filters
        corner = vals[:, 2 * n]
        v26 = jnp.clip(vals[:, 2 * n + 1][:, None] +
                       ((l1n - corner[:, None]) >> 1), 0, maxv)
        h10 = jnp.clip(vals[:, 2 * n - 1][:, None] +
                       ((t1n - corner[:, None]) >> 1), 0, maxv)
        use26 = ((mode == 26) & ~disable_bf)[:, None]
        use10 = ((mode == 10) & ~disable_bf)[:, None]
        ang = ang.at[:, :, 0].set(jnp.where(use26, v26, ang[:, :, 0]))
        ang = ang.at[:, 0, :].set(jnp.where(use10, h10, ang[:, 0, :]))
    m = mode[:, None, None]
    return jnp.where(m == 0, planar, jnp.where(m == 1, dcp, ang))
