"""Motion-compensated prediction — JAX gather + separable filter formulation.

Replaces the reference's per-PU filterHor/filterVer calls (reference:
source/Lib/TLibCommon/TComInterpolationFilter.cpp:94-250,
TComPrediction.cpp:514-716) with a rasterized whole-picture kernel: every
4x4 luma block (and its chroma co-block) carries an MV / ref-index from the
parse-plane maps; the kernel gathers per-block source windows from a stacked
reference-plane tensor and applies the 8/4-tap filters with exact 14-bit
intermediates, then the uni/bi/weighted epilogues.  Bit-exact vs
hostdec/motion.py's numpy oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

IF_PREC = 14
IF_OFFS = 1 << (IF_PREC - 1)

LUMA_FILTER = jnp.asarray([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], jnp.int32)

CHROMA_FILTER = jnp.asarray([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2]], jnp.int32)


def _gather_windows(refs, ref_sel, y0, x0, winh, winw, W, H):
    """refs: [R, Hp, Wp]; per block gather [N, winh, winw] with edge clamp.

    Single flat gather over per-sample linear indices: the obvious
    two-stage form (gather rows, then take_along_axis on columns)
    materializes an [N, winh, Wp] intermediate — 15 GB at 1080p — and
    OOMs the chip."""
    ys = jnp.clip(y0[:, None] + jnp.arange(winh)[None, :], 0, H - 1)
    xs = jnp.clip(x0[:, None] + jnp.arange(winw)[None, :], 0, W - 1)
    Hp, Wp = refs.shape[1], refs.shape[2]
    lin = (ref_sel[:, None, None] * (Hp * Wp) +
           ys[:, :, None] * Wp + xs[:, None, :])            # [N, winh, winw]
    return refs.reshape(-1)[lin]


def _filter_h(src, coefs, taps, outw, bd, is_first, is_last):
    """src: [N, rows, outw+taps-1]; coefs: [N, taps]."""
    headroom = max(2, IF_PREC - bd)
    if is_last:
        shift = 6 + (0 if is_first else headroom)
        offset = (1 << (shift - 1)) + (0 if is_first else (IF_OFFS << 6))
    else:
        shift = 6 - (headroom if is_first else 0)
        offset = (-IF_OFFS << shift) if is_first else 0
    acc = jnp.zeros(src.shape[:-1] + (outw,), jnp.int32)
    for i in range(taps):
        acc = acc + coefs[:, i][:, None, None] * src[..., i:i + outw]
    val = (acc + offset) >> shift
    if is_last:
        return jnp.clip(val, 0, (1 << bd) - 1)
    return val


def _filter_v(src, coefs, taps, outh, bd, is_first, is_last):
    headroom = max(2, IF_PREC - bd)
    if is_last:
        shift = 6 + (0 if is_first else headroom)
        offset = (1 << (shift - 1)) + (0 if is_first else (IF_OFFS << 6))
    else:
        shift = 6 - (headroom if is_first else 0)
        offset = (-IF_OFFS << shift) if is_first else 0
    acc = jnp.zeros((src.shape[0], outh, src.shape[2]), jnp.int32)
    for i in range(taps):
        acc = acc + coefs[:, i][:, None, None] * src[:, i:i + outh, :]
    val = (acc + offset) >> shift
    if is_last:
        return jnp.clip(val, 0, (1 << bd) - 1)
    return val


# ---------------------------------------------------------------------------
# Phase-plane MC: gather-free filtering + single-point gathers.
#
# The window-gather formulation above is latency/irregularity-bound on TPU
# (measured ~0.06 Gsamp/s at 1080p — random 11x11..23x23 window gathers).
# Reformulation: precompute EVERY fractional phase of every reference
# plane as whole-plane separable filters (regular shifted multiply-adds,
# MXU/VPU-friendly, ~73 Gsamp/s measured), then motion compensation
# becomes ONE single-point gather per output sample.  Bit-exact: each
# phase plane is built with the exact primitive chain mc_blocks uses for
# that fractional case (copy / h-only / v-only / h-then-v, 14-bit
# intermediates), and per-tap reference clamping (Rec. 8.5.3.2.2
# Clip3 per sample) is reproduced by edge-padding the raw plane; the
# filtered extension is constant beyond taps+1 samples outside the
# picture, so gathers clamp into a MC_MARGIN-sample apron.
# ---------------------------------------------------------------------------
MC_MARGIN = 8


def _plane_filter(p, coefs, taps, axis, bd, is_first):
    """Filter a whole (padded) plane along `axis` with static int taps.

    p: [..., L] along axis; returns length L - taps + 1, is_last=False
    semantics (14-bit intermediates), same arithmetic as _filter_h/_v.
    """
    headroom = max(2, IF_PREC - bd)
    shift = 6 - (headroom if is_first else 0)
    offset = (-IF_OFFS << shift) if is_first else 0
    L = p.shape[axis]
    outw = L - taps + 1

    def sl(k):
        idx = [slice(None)] * p.ndim
        idx[axis] = slice(k, k + outw)
        return p[tuple(idx)]
    acc = None
    for k in range(taps):
        c = int(coefs[k])
        if c == 0:
            continue
        term = c * sl(k)
        acc = term if acc is None else acc + term
    if acc is None:
        acc = jnp.zeros_like(sl(0))
    return (acc + offset) >> shift


def phase_planes(refs, taps, frac_bits_x, frac_bits_y, bd):
    """refs: [R, H, W] raw int32 reference planes (one component).

    Returns [R, nphy*nphx, H+2E, W+2E] int32 planes (E = MC_MARGIN):
    plane fy*nphx+fx holds the is_last=False interpolation of phase
    (fx, fy) at coordinate (y-E, x-E), per-tap-clamped at the borders.
    """
    E = MC_MARGIN
    half = taps // 2 - 1
    nphx, nphy = 1 << frac_bits_x, 1 << frac_bits_y
    tab = np.asarray(LUMA_FILTER if taps == 8 else CHROMA_FILTER)
    headroom = max(2, IF_PREC - bd)
    H, W = refs.shape[1], refs.shape[2]
    P = E + taps
    rawp = jnp.pad(refs, ((0, 0), (P, P), (P, P)), mode="edge")

    def crow(coord_off):
        # slice rows of a filtered array whose row i is coord i - coord_off
        return slice(P - coord_off - E, P - coord_off + H + E)

    def ccol(coord_off):
        return slice(P - coord_off - E, P - coord_off + W + E)

    def tap_row(f, fb):
        return tab[f << (3 - fb)] if taps == 4 else tab[f]

    outs = []
    hcache = {}
    for fy in range(nphy):
        for fx in range(nphx):
            if fx == 0 and fy == 0:
                v = ((rawp << headroom) - IF_OFFS)[:, crow(0), ccol(0)]
            elif fy == 0:
                h = _plane_filter(rawp, tap_row(fx, frac_bits_x), taps, 2,
                                  bd, True)
                v = h[:, crow(0), ccol(half)]
            elif fx == 0:
                v = _plane_filter(rawp, tap_row(fy, frac_bits_y), taps, 1,
                                  bd, True)[:, crow(half), ccol(0)]
            else:
                h = hcache.get(fx)
                if h is None:
                    h = _plane_filter(rawp, tap_row(fx, frac_bits_x), taps,
                                      2, bd, True)
                    hcache[fx] = h
                v = _plane_filter(h, tap_row(fy, frac_bits_y), taps, 1,
                                  bd, False)[:, crow(half), ccol(half)]
            outs.append(v)
    return jnp.stack(outs, axis=1)


def mc_phase_gather(planes, sel, py, px, mvx, mvy, frac_bits_x,
                    frac_bits_y, taps, H, W):
    """Single-point-gather MC from phase planes.

    planes: phase_planes() output [R, nph, H+2E, W+2E]; sel/py/px/mvx/mvy
    broadcastable integer arrays (per output sample).  Returns the
    is_last=False (14-bit) prediction samples.
    """
    E = MC_MARGIN
    fx = mvx & ((1 << frac_bits_x) - 1)
    fy = mvy & ((1 << frac_bits_y) - 1)
    ix = px + (mvx >> frac_bits_x)
    iy = py + (mvy >> frac_bits_y)
    nphx = 1 << frac_bits_x
    ph = fy * nphx + fx
    iyc = jnp.clip(iy, -E, H - 1 + E) + E
    ixc = jnp.clip(ix, -E, W - 1 + E) + E
    return planes[sel, ph, iyc, ixc]


def mc_blocks(refs, ref_sel, bx, by, mvx, mvy, blk, taps, frac_bits_x,
              frac_bits_y, bd, is_last, W, H, blkh=None):
    """Predict one list for N blocks of size (blkh or blk) x blk.

    refs: [R, Hp, Wp] int32 stacked reference planes (component)
    ref_sel: [N] int32 index into refs
    bx, by: [N] block top-left in the component plane
    mvx, mvy: [N] int32 MVs (quarter/eighth-pel per component)
    blkh: block height when non-square (4:2:2 chroma co-blocks are 2x4)
    Returns [N, blkh, blk] int32 (clipped samples if is_last, else 14-bit).
    """
    if blkh is None:
        blkh = blk
    ftab = LUMA_FILTER if taps == 8 else CHROMA_FILTER
    half = taps // 2 - 1
    fx = mvx & ((1 << frac_bits_x) - 1)
    fy = mvy & ((1 << frac_bits_y) - 1)
    if taps == 4:
        # chroma table is eighth-pel: scale phases on non-subsampled axes
        # (reference TComInterpolationFilter.cpp:346 'frac << (1 - cs)')
        fx = fx << (3 - frac_bits_x)
        fy = fy << (3 - frac_bits_y)
    ix = bx + (mvx >> frac_bits_x)
    iy = by + (mvy >> frac_bits_y)
    src = _gather_windows(refs, ref_sel, iy - half, ix - half,
                          blkh + taps - 1, blk + taps - 1, W, H)
    cfx = ftab[fx]                                         # [N, taps]
    cfy = ftab[fy]
    headroom = max(2, IF_PREC - bd)

    # full filter pipeline (computed for all; select by frac case)
    h1 = _filter_h(src, cfx, taps, blk, bd, True, False)   # [N, winh, blk]
    hv = _filter_v(h1, cfy, taps, blkh, bd, False, is_last)  # frac both
    h_only = _filter_h(src[:, half:half + blkh, :], cfx, taps, blk, bd, True, is_last)
    v_only = _filter_v(src[:, :, half:half + blk], cfy, taps, blkh, bd, True, is_last)
    copy = src[:, half:half + blkh, half:half + blk]
    if is_last:
        copy_out = copy
    else:
        copy_out = (copy << headroom) - IF_OFFS
    fx_b = (fx != 0)[:, None, None]
    fy_b = (fy != 0)[:, None, None]
    out = jnp.where(fx_b & fy_b, hv,
          jnp.where(fx_b, h_only,
          jnp.where(fy_b, v_only, copy_out)))
    return out


def bi_average(p0, p1, bd):
    shift = IF_PREC + 1 - bd
    off = (1 << (shift - 1)) + 2 * IF_OFFS
    return jnp.clip((p0 + p1 + off) >> shift, 0, (1 << bd) - 1)


def weighted_uni(p, w, o, log2d, bd):
    """p: [N, blk, blk] 14-bit; w/o: [N] (o already bit-depth scaled)."""
    shift = log2d + max(2, IF_PREC - bd)
    rnd = jnp.where(shift > 0, 1 << jnp.maximum(shift - 1, 0), 0)
    val = ((w[:, None, None] * (p + IF_OFFS) + rnd) >> shift) \
        + o[:, None, None]
    return jnp.clip(val, 0, (1 << bd) - 1)


def weighted_bi(p0, p1, w0, o0, w1, o1, log2d, bd):
    shift = (log2d + 1) + max(2, IF_PREC - bd)
    rnd = 1 << (shift - 1)
    off = (o0 + o1)[:, None, None]
    val = (w0[:, None, None] * (p0 + IF_OFFS) + w1[:, None, None] * (p1 + IF_OFFS)
           + rnd + (off << (shift - 1))) >> shift
    return jnp.clip(val, 0, (1 << bd) - 1)
