"""Whole-picture deblocking filter — JAX vectorized formulation.

Replaces the reference's per-CTU edge recursion and per-pixel filters
(reference: source/Lib/TLibCommon/TComLoopFilter.cpp:130-923) with two
whole-frame passes (V then H, the spec order).  The boundary-strength and
per-edge parameters are computed on the host into per-4x4-edge tensors;
the device pass vectorizes the strong/weak decisions and filtering over
all edge segments at once.  Bit-exact vs hostdec/loopfilter_np.

Layout: for the vertical pass, the luma plane is viewed as segments of
4 rows x 8 columns centered on each edge (columns x in {8k}); the
horizontal pass runs on the transposed plane with transposed BS inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np

BETA_TABLE = jnp.asarray(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11, 12,
     13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38, 40, 42,
     44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], jnp.int32)
TC_TABLE = jnp.asarray(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11,
     13, 14, 16, 18, 20, 22, 24], jnp.int32)


def deblock_luma_vertical(plane, bs, qp_l, beta_off, tc_off, no_p, no_q,
                          bit_depth):
    """One whole-frame vertical-edge luma pass.

    plane: [H, W] int32 (H multiple of 4, W multiple of 8)
    bs: [H/4, W/8] int32 boundary strength for the edge left of column 8*j
        (bs[:, 0] must be 0 — picture edge)
    qp_l: [H/4, W/8] int32 average QP per segment
    beta_off/tc_off: [H/4, W/8] int32
    no_p/no_q: [H/4, W/8] bool (PCM/lossless exclusions)
    Returns filtered plane.
    """
    H, W = plane.shape
    ns_y, ns_x = H // 4, W // 8
    maxv = (1 << bit_depth) - 1
    bd_shift = bit_depth - 8

    # gather segments: seg[s_y, s_x, 4, 8] with columns (8x-4 .. 8x+3)
    # column index for segment x: 8x-4+k, k=0..7; x=0 has bs=0 so values unused
    cols = (jnp.arange(ns_x)[:, None] * 8 - 4 + jnp.arange(8)[None, :])
    cols = jnp.clip(cols, 0, W - 1)                        # [ns_x, 8]
    seg = plane.reshape(ns_y, 4, W)[:, :, cols]            # [ns_y, 4, ns_x, 8]
    seg = seg.transpose(0, 2, 1, 3)                        # [ns_y, ns_x, 4, 8]

    p3, p2, p1, p0 = seg[..., 0], seg[..., 1], seg[..., 2], seg[..., 3]
    q0, q1, q2, q3 = seg[..., 4], seg[..., 5], seg[..., 6], seg[..., 7]

    idx_b = jnp.clip(qp_l + beta_off, 0, 51)
    idx_t = jnp.clip(qp_l + 2 * (bs - 1) + tc_off, 0, 53)
    beta = BETA_TABLE[idx_b] << bd_shift                   # [ns_y, ns_x]
    tc = TC_TABLE[idx_t] << bd_shift

    dp_r = jnp.abs(p2 - 2 * p1 + p0)                       # [ns_y, ns_x, 4]
    dq_r = jnp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = dp_r[..., 0], dp_r[..., 3]
    dq0, dq3 = dq_r[..., 0], dq_r[..., 3]
    d0, d3 = dp0 + dq0, dp3 + dq3
    d = d0 + d3
    filt = (bs > 0) & (d < beta)

    def strong_row(i, di):
        return (2 * di < (beta >> 2)) & \
               (jnp.abs(p3[..., i] - p0[..., i]) + jnp.abs(q0[..., i] - q3[..., i])
                < (beta >> 3)) & \
               (jnp.abs(p0[..., i] - q0[..., i]) < ((tc * 5 + 1) >> 1))
    sw = strong_row(0, d0) & strong_row(3, d3)

    tc_b = tc[..., None]
    # strong filter
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - 2 * tc_b, p0 + 2 * tc_b)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc_b, p1 + 2 * tc_b)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - 2 * tc_b, p2 + 2 * tc_b)
    sq0 = jnp.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   q0 - 2 * tc_b, q0 + 2 * tc_b)
    sq1 = jnp.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tc_b, q1 + 2 * tc_b)
    sq2 = jnp.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                   q2 - 2 * tc_b, q2 + 2 * tc_b)
    # weak filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = jnp.abs(delta) < 10 * tc_b
    dlt = jnp.clip(delta, -tc_b, tc_b)
    wp0 = jnp.clip(p0 + dlt, 0, maxv)
    wq0 = jnp.clip(q0 - dlt, 0, maxv)
    side_thr = (beta + (beta >> 1)) >> 3
    filt_p2 = ((dp0 + dp3) < side_thr)[..., None]
    filt_q2 = ((dq0 + dq3) < side_thr)[..., None]
    tc2 = tc_b >> 1
    dp1v = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tc2, tc2)
    dq1v = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tc2, tc2)
    wp1 = jnp.clip(p1 + dp1v, 0, maxv)
    wq1 = jnp.clip(q1 + dq1v, 0, maxv)

    filt_b = filt[..., None]
    sw_b = sw[..., None]
    no_p_b = no_p[..., None]
    no_q_b = no_q[..., None]
    # compose outputs per tap
    def sel_p(strong, weak, orig, weak_en):
        v = jnp.where(sw_b, strong, jnp.where(weak_en & weak_on, weak, orig))
        return jnp.where(filt_b & ~no_p_b, v, orig)
    def sel_q(strong, weak, orig, weak_en):
        v = jnp.where(sw_b, strong, jnp.where(weak_en & weak_on, weak, orig))
        return jnp.where(filt_b & ~no_q_b, v, orig)
    true_b = jnp.ones_like(filt_b)
    o_p2 = sel_p(sp2, p2, p2, jnp.zeros_like(filt_b))
    o_p1 = sel_p(sp1, wp1, p1, filt_p2)
    o_p0 = sel_p(sp0, wp0, p0, true_b)
    o_q0 = sel_q(sq0, wq0, q0, true_b)
    o_q1 = sel_q(sq1, wq1, q1, filt_q2)
    o_q2 = sel_q(sq2, q2, q2, jnp.zeros_like(filt_b))

    out_seg = jnp.stack([p3, o_p2, o_p1, o_p0, o_q0, o_q1, o_q2, q3], axis=-1)
    # scatter back: columns 8x-4 .. 8x+3; segment x=0 covers cols -4..3 where
    # cols -4..-1 were clipped reads — only write columns >= 0 from the
    # canonical segment.  Each column belongs to exactly one segment:
    # col c -> segment (c+4)//8, offset (c+4)%8.
    out = out_seg.transpose(0, 2, 1, 3)                    # [ns_y, 4, ns_x, 8]
    out = out.reshape(H, ns_x * 8)
    # out currently maps column (8x-4+k); shift by 4 to align: build result
    res = jnp.roll(out, -4, axis=1)
    # rolled: res[:, c] = out[:, c+4] = column c; except last 4 columns wrap
    # (they came from out[:, 0..3] = segment 0's clipped left reads).
    res = res.at[:, W - 4:].set(plane[:, W - 4:])
    return res


def deblock_chroma_vertical(plane, tc_c, filt, no_p, no_q, bit_depth):
    """Vertical chroma pass at 8-chroma-sample edges.

    plane: [Hc, Wc] int32 (Wc multiple of 8)
    tc_c: [Hc, Wc/8] int32 per-row(!) tc (expanded from segments by caller)
    filt: [Hc, Wc/8] bool
    """
    Hc, Wc = plane.shape
    ns = Wc // 8
    maxv = (1 << bit_depth) - 1
    cols = jnp.arange(ns)[:, None] * 8 - 2 + jnp.arange(4)[None, :]
    cols = jnp.clip(cols, 0, Wc - 1)
    seg = plane[:, cols]                                   # [Hc, ns, 4]
    p1, p0, q0, q1 = seg[..., 0], seg[..., 1], seg[..., 2], seg[..., 3]
    delta = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc_c, tc_c)
    np0 = jnp.clip(p0 + delta, 0, maxv)
    nq0 = jnp.clip(q0 - delta, 0, maxv)
    o_p0 = jnp.where(filt & ~no_p, np0, p0)
    o_q0 = jnp.where(filt & ~no_q, nq0, q0)
    out = plane
    xs_p = jnp.arange(ns) * 8 - 1
    ok_p = xs_p >= 0
    out = out.at[:, jnp.clip(xs_p, 0, Wc - 1)].set(
        jnp.where(ok_p[None, :], o_p0, out[:, jnp.clip(xs_p, 0, Wc - 1)]))
    xs_q = jnp.arange(ns) * 8
    out = out.at[:, xs_q].set(o_q0)
    return out
