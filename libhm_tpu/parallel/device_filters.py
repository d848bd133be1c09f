"""Device-resident in-loop filters: deblock V+H, SAO and PCM/lossless
restoration fused into ONE jitted, picture-vmapped device call.

The reference runs the loop filters as whole-frame host passes after each
picture decodes (reference: source/Lib/TLibDecoder/TDecGop.cpp:157-230
filterPicture; TComLoopFilter.cpp:130-923; TComSampleAdaptiveOffset.cpp
:663-810).  The round-3 TPU path mirrored that shape — and paid >=12 full
plane host<->device round trips per picture.  Here the planes NEVER leave
the device: the host uploads only compact per-4x4 syntax maps (int8) and
the whole filter chain for every picture of a reference-DAG level runs as
one vmapped XLA program:

    deblock V (luma+chroma) -> deblock H -> SAO (3 comps) -> restore

Boundary-strength derivation stays host-side numpy (it reads the 4x4
syntax SoA, is ~1/16th the pixel count, and overlaps with device work);
everything sample-sized happens on device.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..hostdec.deblock_maps import compute_bs_maps
from ..hostdec.tables import CHROMA_QP_SCALE
from ..ops import deblock as DK
from ..ops import sao as SK
from ..utils import xfer

_TC_NP = np.asarray(DK.TC_TABLE)


# ---------------------------------------------------------------------------
# host-side map preparation (per picture)
def prepare_filter_maps(pic, sps, pps, tile_map):
    """Compact numpy maps driving the fused device filter for one picture.

    All per-4x4 maps are int8/int16 — for 1080p the whole upload is ~1.5 MB
    vs ~70 MB of plane round trips in the unfused formulation.
    """
    ncomp = 3 if sps.chroma_format_idc else 1
    m = {}
    for tag, vertical in (("v", True), ("h", False)):
        bs, qp_l, boff, toff, no_p, no_q = compute_bs_maps(
            pic, sps, pps, tile_map, vertical)
        # bs (2 bits) + no_p/no_q (2 bits) packed into one byte per 4x4
        m[f"bsn_{tag}"] = (bs.astype(np.uint8) |
                           (no_p.astype(np.uint8) << 4) |
                           (no_q.astype(np.uint8) << 5))
        m[f"qp_{tag}"] = qp_l.astype(np.int8)
        # beta/tc offsets are usually all-zero (slice header defaults):
        # only ship them when some 4x4 actually carries one
        if boff.any():
            m[f"bo_{tag}"] = boff.astype(np.int8)
        if toff.any():
            m[f"to_{tag}"] = toff.astype(np.int8)
        if ncomp > 1:
            # per-chroma-component tc (already table-mapped + shifted);
            # 0 = edge not filtered, so no separate mask is needed
            bd_c = sps.bit_depth_chroma
            qscale = np.asarray(CHROMA_QP_SCALE[sps.chroma_format_idc])
            ctc_dt = np.uint8 if bd_c <= 11 else np.int16
            tcs = []
            for c in (1, 2):
                qp_off = pps.cb_qp_offset if c == 1 else pps.cr_qp_offset
                qpi = np.clip(qp_l + qp_off, 0, 57)
                idx = np.clip(qscale[qpi] + 2 + toff, 0, 53)
                tcs.append(np.where(bs == 2,
                                    _TC_NP[idx] << (bd_c - 8),
                                    0).astype(ctc_dt))
            m[f"ctc_{tag}"] = np.stack(tcs)
    if sps.sao_enabled:
        nctu = sps.pic_size_ctbs
        m["sao_t"] = np.asarray(pic.sao_type).reshape(nctu, 3).astype(np.int8)
        m["sao_b"] = np.asarray(pic.sao_band_pos).reshape(nctu, 3).astype(np.int8)
        m["sao_o"] = np.asarray(pic.sao_offsets).reshape(nctu, 3, 4).astype(np.int8)
    m["s4"] = np.asarray(pic.slice_idx).astype(np.int16)
    m["lf4"] = np.asarray(pic.loopfilter_across_slice).astype(bool)
    m["tm"] = np.asarray(tile_map).astype(np.int16).reshape(-1)
    mask4 = np.asarray(pic.tq_bypass).astype(bool)
    if sps.pcm_enabled and sps.pcm_loop_filter_disabled:
        mask4 |= np.asarray(pic.pcm).astype(bool)
    m["rmask"] = mask4.astype(np.uint8)
    return m


def picture_filter_flags(items):
    """(multi, restore, sao_on) level-wide static flags."""
    multi = any((np.asarray(it["pic"].slice_idx).max() > 0) or
                it["pps"].tiles_enabled for it in items)
    restore = any(it["pps"].transquant_bypass_enabled or
                  (it["sps"].pcm_enabled and
                   it["sps"].pcm_loop_filter_disabled) for it in items)
    sao_on = bool(items[0]["sps"].sao_enabled)
    return multi, restore, sao_on


# ---------------------------------------------------------------------------
# fused device program
@functools.lru_cache(maxsize=None)
def _filter_fn(ncomp, ssx, ssy, bd_l, bd_c, log2_ctb, wc, hc, h4, w4,
               sao_on, multi, restore, comp_W, comp_H):
    self_W = dict(enumerate(comp_W))
    self_H = dict(enumerate(comp_H))
    def one(planes, m, lf_tiles, scale_l, scale_c):
        planes = list(planes)
        pre = list(planes) if restore else None

        # ---- deblocking: V pass then H pass (spec order) ----
        for tag, vertical in (("v", True), ("h", False)):
            pl = planes[0] if vertical else planes[0].T
            Hx, Wx = pl.shape
            nsy, nsx = Hx // 4, Wx // 8

            def sb(a):
                a = a[:, ::2] if vertical else a[::2, :].T
                return a[:nsy, :nsx]
            bsn = sb(m[f"bsn_{tag}"])
            zero = jnp.zeros((nsy, nsx), jnp.int32)
            bo = sb(m[f"bo_{tag}"]).astype(jnp.int32) \
                if f"bo_{tag}" in m else zero
            to = sb(m[f"to_{tag}"]).astype(jnp.int32) \
                if f"to_{tag}" in m else zero
            out = DK.deblock_luma_vertical(
                pl, (bsn & 3).astype(jnp.int32),
                sb(m[f"qp_{tag}"]).astype(jnp.int32), bo, to,
                (bsn & 16) != 0, (bsn & 32) != 0, bd_l)
            planes[0] = out if vertical else out.T
            if ncomp > 1:
                for c in (1, 2):
                    cpl = planes[c] if vertical else planes[c].T
                    Hc_, Wc_ = cpl.shape
                    ns = Wc_ // 8
                    if vertical:
                        # chroma row r -> luma 4x4 row; edge k -> 4x4 col
                        ri = jnp.arange(Hc_) >> (2 - ssy)
                        ci = jnp.arange(ns) << (1 + ssx)

                        def g(a):
                            return a[ri[:, None], ci[None, :]]
                    else:
                        # transposed: row r is a chroma COLUMN
                        ri = jnp.arange(Hc_) >> (2 - ssx)
                        ci = jnp.arange(ns) << (1 + ssy)

                        def g(a):
                            return a[ci[None, :], ri[:, None]]
                    tcc = g(m[f"ctc_{tag}"][c - 1]).astype(jnp.int32)
                    bsnc = g(m[f"bsn_{tag}"])
                    out = DK.deblock_chroma_vertical(
                        cpl, tcc, tcc != 0,
                        (bsnc & 16) != 0, (bsnc & 32) != 0, bd_c)
                    planes[c] = out if vertical else out.T

        # ---- SAO ----
        if sao_on:
            for c in range(ncomp):
                sx = ssx if c else 0
                sy = ssy if c else 0
                bd = bd_l if c == 0 else bd_c
                Hp_, Wp_ = planes[c].shape
                t = m["sao_t"][:, c].reshape(hc, wc).astype(jnp.int32)
                b = m["sao_b"][:, c].reshape(hc, wc).astype(jnp.int32)
                o = m["sao_o"][:, c].astype(jnp.int32).reshape(hc, wc, 4)
                scale = scale_l if c == 0 else scale_c
                log2cx = log2_ctb - sx
                log2cy = log2_ctb - sy
                if multi:
                    ysi = jnp.minimum((jnp.arange(Hp_) << sy) >> 2, h4 - 1)
                    xsi = jnp.minimum((jnp.arange(Wp_) << sx) >> 2, w4 - 1)
                    sm = m["s4"][ysi[:, None], xsi[None, :]].astype(jnp.int32)
                    lf = m["lf4"][ysi[:, None], xsi[None, :]]
                    tyc = jnp.minimum((jnp.arange(Hp_) << sy) >> log2_ctb,
                                      hc - 1)
                    txc = jnp.minimum((jnp.arange(Wp_) << sx) >> log2_ctb,
                                      wc - 1)
                    tmm = m["tm"].reshape(hc, wc)[tyc[:, None],
                                                  txc[None, :]].astype(jnp.int32)
                    planes[c] = SK.sao_component(
                        planes[c], None, t, b, o, log2cx, bd, scale,
                        self_W[c], self_H[c], log2_ctb_cy=log2cy,
                        slice_map=sm, lf_map=lf, tile_map=tmm,
                        lf_across_tiles=lf_tiles)
                else:
                    vm = jnp.ones_like(planes[c], bool)
                    planes[c] = SK.sao_component(
                        planes[c], vm, t, b, o, log2cx, bd, scale,
                        self_W[c], self_H[c], log2_ctb_cy=log2cy)

        # ---- PCM / transquant-bypass restoration ----
        if restore:
            rm = m["rmask"]
            for c in range(ncomp):
                sx = ssx if c else 0
                sy = ssy if c else 0
                Hp_, Wp_ = planes[c].shape
                ysi = jnp.minimum((jnp.arange(Hp_) << sy) >> 2, h4 - 1)
                xsi = jnp.minimum((jnp.arange(Wp_) << sx) >> 2, w4 - 1)
                mask = rm[ysi[:, None], xsi[None, :]] != 0
                planes[c] = jnp.where(mask, pre[c], planes[c])
        return tuple(planes)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0)))


def filter_level(items, stacked, sps):
    """Run the fused filters over a level's stacked device planes.

    items: the level's collect items; stacked: list per comp of [B,Hp,Wp]
    device planes.  Returns the filtered stacked planes (device).
    """
    ncomp = 3 if sps.chroma_format_idc else 1
    ssx = sps.chroma_shift_x() if ncomp > 1 else 0
    ssy = sps.chroma_shift_y() if ncomp > 1 else 0
    h4 = (sps.pic_height_ctbs << sps.log2_ctb) >> 2
    w4 = (sps.pic_width_ctbs << sps.log2_ctb) >> 2
    multi, restore, sao_on = picture_filter_flags(items)
    maps = [prepare_filter_maps(it["pic"], it["sps"], it["pps"],
                                it["tile_map"]) for it in items]
    B = len(items)
    Bp = int(stacked[0].shape[0])

    def padB(a):
        if Bp == B:
            return a
        out = np.zeros((Bp,) + a.shape[1:], a.dtype)
        out[:B] = a
        return out
    skip = set()
    if not (sao_on and multi):
        skip |= {"s4", "lf4", "tm"}
    if not restore:
        skip.add("rmask")
    keys = {k for mp in maps for k in mp} - skip
    mb = {}
    for k in keys:
        proto = next(mp[k] for mp in maps if k in mp)
        mb[k] = xfer.up(padB(np.stack(
            [mp.get(k, np.zeros_like(proto)) for mp in maps])), "filter")
    lf_tiles = xfer.up(padB(np.asarray(
        [bool(it["pps"].loop_filter_across_tiles) for it in items])))
    scale_l = xfer.up(padB(np.asarray(
        [int(getattr(it["pps"], "sao_offset_scale_luma", 0))
         for it in items], np.int32)))
    scale_c = xfer.up(padB(np.asarray(
        [int(getattr(it["pps"], "sao_offset_scale_chroma", 0))
         for it in items], np.int32)))
    fn = _filter_fn(
        ncomp, ssx, ssy, sps.bit_depth_luma, sps.bit_depth_chroma,
        sps.log2_ctb, sps.pic_width_ctbs, sps.pic_height_ctbs, h4, w4,
        sao_on, multi, restore,
        tuple(sps.width >> (ssx if c else 0) for c in range(ncomp)),
        tuple(sps.height >> (ssy if c else 0) for c in range(ncomp)))
    out = fn(tuple(stacked), mb, lf_tiles, scale_l, scale_c)
    return list(out)
