"""TPU reconstruction backend — batched JAX kernels over whole pictures.

Drop-in replacement for hostdec/recon_np.PictureRecon + loopfilter_np:
 - residual synthesis: TUs bucketed by (size, path, dst, bitdepth) through
   ops/transform.py (MXU int8-split matmuls) and scattered into residual
   planes on device;
 - inter prediction: rasterized per-4x4 MC through ops/interp.py;
 - intra prediction: device wavefront kernel (parallel/intra_wavefront.py,
   lax.scan over dependency levels, vmap within a level);
 - deblocking: host BS maps + ops/deblock.py device passes (V then H);
 - SAO: ops/sao.py device pass.

Bit-exact against the numpy backend (same HM golden MD5s).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .hostdec import refimpl
from .hostdec.picture import MODE_INTRA, MODE_INTER
from .hostdec.deblock_maps import compute_bs_maps
from .ops import transform as TK
from .ops import interp as IK
from .ops import deblock as DK
from .ops import sao as SK


def _pad_pow2(n, lo=16):
    p = lo
    while p < n:
        p <<= 1
    return p


def _pad_pow4(n, lo=64):
    """Coarser bucket (4x steps) for cheap ops where a shared XLA program
    beats tight padding: 20-40s TPU compiles dominate any 4x overcompute
    on a dequant+ITX batch."""
    p = lo
    while p < n:
        p <<= 2
    return p


def _device_plane(dp, c, H, W):
    """Cached device copy of a reference picture's component plane."""
    cache = getattr(dp, "_device_planes", None)
    if cache is None:
        cache = {}
        dp._device_planes = cache
    key = (c, H, W)
    if key not in cache:
        cache[key] = jnp.asarray(np.ascontiguousarray(dp.planes[c][:H, :W]))
    return cache[key]


@functools.lru_cache(maxsize=None)
def _residual_fn(n, use_dst, path, bd, max_dyn, rotate, scaling=False):
    @jax.jit
    def fn(coeffs, qp, rdpcm, mat):
        if path == "bypass":
            res = coeffs
            if rotate:
                res = res[:, ::-1, ::-1]
            res = jnp.clip(res, -32768, 32767)
        else:
            if scaling:
                deq = TK.dequant_batch_scaling(coeffs, qp, mat, bd,
                                               n.bit_length() - 1, max_dyn)
            else:
                deq = TK.dequant_batch(coeffs, qp, bd, n.bit_length() - 1,
                                       max_dyn)
            if path == "tskip":
                res = TK.inverse_transform_skip_batch(deq, bd, n.bit_length() - 1,
                                                      max_dyn, rotate)
            else:
                res = TK.inverse_transform_batch(deq, n, use_dst, bd, max_dyn)
        return TK.inverse_rdpcm_batch(res, rdpcm)
    return fn


@functools.lru_cache(maxsize=None)
def _mc_fn(blkx, blky, taps, fbx, fby, bd, epilogue):
    @jax.jit
    def fn(refs0, refs1, sel0, sel1, bx, by, mv, dirm, wpw, wpo, denom, W, H):
        p0 = IK.mc_blocks(refs0, sel0, bx, by, mv[:, 0, 0], mv[:, 0, 1],
                          blkx, taps, fbx, fby, bd, is_last=False, W=W, H=H,
                          blkh=blky)
        p1 = IK.mc_blocks(refs1, sel1, bx, by, mv[:, 1, 0], mv[:, 1, 1],
                          blkx, taps, fbx, fby, bd, is_last=False, W=W, H=H,
                          blkh=blky)
        headroom = max(2, IK.IF_PREC - bd)
        if epilogue == "wp":
            uni0 = IK.weighted_uni(p0, wpw[:, 0], wpo[:, 0], denom, bd)
            uni1 = IK.weighted_uni(p1, wpw[:, 1], wpo[:, 1], denom, bd)
            bi = IK.weighted_bi(p0, p1, wpw[:, 0], wpo[:, 0], wpw[:, 1],
                                wpo[:, 1], denom, bd)
        else:
            # plain: convert 14-bit intermediates back to samples for uni
            off = 1 << (headroom - 1)
            uni0 = jnp.clip((p0 + IK.IF_OFFS + off) >> headroom, 0, (1 << bd) - 1)
            uni1 = jnp.clip((p1 + IK.IF_OFFS + off) >> headroom, 0, (1 << bd) - 1)
            bi = IK.bi_average(p0, p1, bd)
        d = dirm[:, None, None]
        return jnp.where(d == 3, bi, jnp.where(d == 1, uni0, uni1))
    return fn


class TpuPictureRecon:
    """Matches the recon_np.PictureRecon interface."""

    def __init__(self, sps, pic_syntax, zmap, tile_map):
        self.sps = sps
        self.pic = pic_syntax
        self.zmap = zmap
        self.tile_map = tile_map
        self.ncomp = 3 if sps.chroma_format_idc else 1
        self.Wp = sps.pic_width_ctbs << sps.log2_ctb
        self.Hp = sps.pic_height_ctbs << sps.log2_ctb
        self.planes = []
        for c in range(self.ncomp):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            self.planes.append(np.zeros((self.Hp >> sy, self.Wp >> sx), np.int32))
        self.constrained_intra = False

    def comp_dims(self, c):
        sps = self.sps
        sx = sps.chroma_shift_x() if c else 0
        sy = sps.chroma_shift_y() if c else 0
        return sps.width >> sx, sps.height >> sy

    # ------------------------------------------------------------------
    def _residual_planes(self):
        """Dequant+ITX all TUs into per-component residual planes (device)."""
        sps, pic = self.sps, self.pic
        res_planes = [np.zeros_like(p) for p in self.planes]
        scal_mats = None
        if sps.scaling_list_enabled:
            from .hostdec.tables import build_scaling_matrices
            data = getattr(pic.pps, "scaling_list_data", None)
            if data is None:
                data = sps.scaling_list_data
            scal_mats = build_scaling_matrices(data)
        pred_mode_map = np.asarray(pic.pred_mode)
        buckets = {}
        for i, tu in enumerate(pic.tu_list):
            bd = sps.bit_depth_luma if tu.comp == 0 else sps.bit_depth_chroma
            if tu.tq_bypass:
                path = "bypass"
            elif tu.transform_skip:
                path = "tskip"
            else:
                path = "itx"
            sxr = sps.chroma_shift_x() if tu.comp else 0
            syr = sps.chroma_shift_y() if tu.comp else 0
            tu_is_intra = np.asarray(pic.pred_mode)[(tu.y << syr) >> 2,
                                                    (tu.x << sxr) >> 2] == 1
            rotate = bool(sps.transform_skip_rotation) and tu.w == 4 and \
                path in ("tskip", "bypass") and bool(tu_is_intra)
            # transform-skip > 4x4 uses flat scaling (TComTrQuant)
            scal = scal_mats is not None and path != "bypass" and \
                not (tu.transform_skip and tu.w > 4)
            key = (tu.w, bool(tu.use_dst), path, bd, rotate, scal)
            buckets.setdefault(key, []).append(i)
        for (n, use_dst, path, bd, rotate, scal), idxs in buckets.items():
            max_dyn = 15 if not sps.extended_precision else max(15, bd + 6)
            N = len(idxs)
            P = _pad_pow4(N, 64)
            coeffs = np.zeros((P, n, n), np.int32)
            qp = np.zeros(P, np.int32)
            rdpcm = np.zeros(P, np.int32)
            mat = np.ones((P, n, n), np.int32) * 16 if scal else \
                np.zeros((1, 1, 1), np.int32)
            for k, i in enumerate(idxs):
                tu = pic.tu_list[i]
                coeffs[k] = tu.coeffs
                qp[k] = tu.qp
                rdpcm[k] = tu.rdpcm_mode
                if scal:
                    sxr = sps.chroma_shift_x() if tu.comp else 0
                    syr = sps.chroma_shift_y() if tu.comp else 0
                    intra = pred_mode_map[(tu.y << syr) >> 2,
                                          (tu.x << sxr) >> 2] == MODE_INTRA
                    size_id = tu.w.bit_length() - 3
                    mat[k] = scal_mats[(size_id,
                                        (0 if intra else 3) + tu.comp)]
            fn = _residual_fn(n, use_dst, path, bd, max_dyn, rotate, scal)
            out = np.asarray(fn(jnp.asarray(coeffs), jnp.asarray(qp),
                                jnp.asarray(rdpcm), jnp.asarray(mat)))
            for k, i in enumerate(idxs):
                tu = pic.tu_list[i]
                res_planes[tu.comp][tu.y:tu.y + tu.h, tu.x:tu.x + tu.w] = out[k]
        # cross-component prediction (4:4:4)
        if sps.chroma_format_idc == 3:
            for tu in pic.tu_list:
                if tu.comp and tu.cross_comp_alpha:
                    lr = res_planes[0][tu.y:tu.y + tu.h, tu.x:tu.x + tu.w].astype(np.int64)
                    r = res_planes[tu.comp][tu.y:tu.y + tu.h, tu.x:tu.x + tu.w].astype(np.int64)
                    r += (tu.cross_comp_alpha * lr) >> 3
                    res_planes[tu.comp][tu.y:tu.y + tu.h, tu.x:tu.x + tu.w] = \
                        np.clip(r, -32768, 32767)
        return res_planes

    # ------------------------------------------------------------------
    def _inter_stage(self, res_planes):
        """MC for all inter 4x4 blocks + residual add, per component."""
        sps, pic = self.sps, self.pic
        inter4 = np.asarray(pic.pred_mode) == MODE_INTER
        if not inter4.any():
            return
        ys4, xs4 = np.nonzero(inter4)
        nblk = len(ys4)
        # reference plane stack per component (by poc)
        pocs = {}
        for pu in pic.inter_list:
            for l in range(2):
                rp = pu.ref_poc[l]
                if rp is not None and rp.poc not in pocs:
                    pocs[rp.poc] = rp
        poc_list = sorted(pocs)
        poc_index = {p: i for i, p in enumerate(poc_list)}
        # per-4x4 ref selector from ref_poc maps
        dirm = np.asarray(pic.inter_dir)[ys4, xs4].astype(np.int32)
        mv = np.asarray(pic.mv)[ys4, xs4].astype(np.int32)       # [N, 2, 2]
        refpoc = np.asarray(pic.ref_poc)[ys4, xs4]               # [N, 2]
        sel = np.zeros((nblk, 2), np.int32)
        for l in range(2):
            used = (dirm & (1 << l)) != 0
            sel[used, l] = [poc_index[p] for p in refpoc[used, l]]
        # weighted prediction per block
        has_wp = any(getattr(pu, "wp", None) is not None for pu in pic.inter_list)
        wpw = np.zeros((pic.h4, pic.w4, 2, 3), np.int32)
        wpo = np.zeros((pic.h4, pic.w4, 2, 3), np.int32)
        denom_l = denom_c = 0
        if has_wp:
            for pu in pic.inter_list:
                if pu.wp is None:
                    continue
                sl = np.s_[pu.y >> 2:(pu.y + pu.h) >> 2, pu.x >> 2:(pu.x + pu.w) >> 2]
                wpw[sl] = np.asarray(pu.wp["w"])
                wpo[sl] = np.asarray(pu.wp["o"])
                denom_l = pu.wp["denom_l"]
                denom_c = pu.wp["denom_c"]

        for c in range(self.ncomp):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
            W, H = self.comp_dims(c)
            blkx, blky = 4 >> sx, 4 >> sy   # 4:2:2 chroma co-blocks are 2x4
            taps = 8 if c == 0 else 4
            fbx = 2 + (sx if c else 0)
            fby = 2 + (sy if c else 0)
            if poc_list:
                planes_dev = [_device_plane(pocs[p], c, H, W)
                              for p in poc_list]
                # pad the stack depth to pow2 (repeat the last plane) so
                # the MC kernel's shape key is shared across pictures
                # with different DPB sizes
                R = _pad_pow2(len(planes_dev), 4)
                planes_dev += [planes_dev[-1]] * (R - len(planes_dev))
                refs = jnp.stack(planes_dev)
            else:
                refs = jnp.zeros((1, H, W), jnp.int32)
            bx = (xs4 << 2) >> sx
            by = (ys4 << 2) >> sy
            scale = 1 << (bd - 8)
            if has_wp:
                w_arr = wpw[ys4, xs4][:, :, c]
                o_arr = wpo[ys4, xs4][:, :, c] * scale
                denom = denom_l if c == 0 else denom_c
                epi = "wp"
            else:
                w_arr = np.zeros((nblk, 2), np.int32)
                o_arr = np.zeros((nblk, 2), np.int32)
                denom = 0
                epi = "plain"
            N = nblk
            P = _pad_pow2(N, 64)
            def pad(a, fill=0):
                out = np.full((P,) + a.shape[1:], fill, a.dtype)
                out[:N] = a
                return out
            fn = _mc_fn(blkx, blky, taps, fbx, fby, bd, epi)
            out = np.asarray(fn(jnp.asarray(refs), jnp.asarray(refs),
                                jnp.asarray(pad(sel[:, 0])), jnp.asarray(pad(sel[:, 1])),
                                jnp.asarray(pad(bx)), jnp.asarray(pad(by)),
                                jnp.asarray(pad(mv)), jnp.asarray(pad(dirm, 1)),
                                jnp.asarray(pad(w_arr)), jnp.asarray(pad(o_arr)),
                                denom, W, H))[:N]
            # scatter + residual add + clip (vectorized fancy indexing)
            plane = self.planes[c]
            res = res_planes[c]
            maxv = (1 << bd) - 1
            oy = np.arange(blky)
            ox = np.arange(blkx)
            iy = by[:, None, None] + oy[None, :, None]      # [N, blky, 1]
            ix = bx[:, None, None] + ox[None, None, :]      # [N, 1, blkx]
            iy = np.broadcast_to(iy, (N, blky, blkx))
            ix = np.broadcast_to(ix, (N, blky, blkx))
            blkv = out + res[iy, ix]
            plane[iy, ix] = np.clip(blkv, 0, maxv)

    # ------------------------------------------------------------------
    def reconstruct(self, ref_pics=None, mc_fn=None):
        sps, pic = self.sps, self.pic
        res_planes = self._residual_planes()
        if pic.inter_list:
            self._inter_stage(res_planes)
        for (c, x, y, w, h, samples, bits) in pic.pcm_list:
            bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
            self.planes[c][y:y + h, x:x + w] = samples << (bd - bits)
        # intra blocks: device wavefront (lax.scan over dependency levels)
        from .parallel.intra_wavefront import intra_reconstruct_tpu
        for c in range(self.ncomp):
            intra_reconstruct_tpu(sps, pic, self.zmap, self.tile_map, c,
                                  self.planes[c], res_planes,
                                  self.constrained_intra)
        return self.planes


# ---------------------------------------------------------------------------
# device loop filters, shared by the TPU decode path
@functools.lru_cache(maxsize=None)
def _deblock_v_fn(bd):
    return jax.jit(lambda *a: DK.deblock_luma_vertical(*a, bit_depth=bd))


@functools.lru_cache(maxsize=None)
def _deblock_cv_fn(bd):
    return jax.jit(lambda *a: DK.deblock_chroma_vertical(*a, bit_depth=bd))


def deblock_picture_tpu(planes, pic, sps, pps, tile_map):
    """V pass then H pass using the device kernels."""
    for vertical in (True, False):
        bs, qp_l, boff, toff, no_p, no_q = compute_bs_maps(
            pic, sps, pps, tile_map, vertical)
        _deblock_pass_tpu(planes, pic, sps, pps, bs, qp_l, boff, toff,
                          no_p, no_q, vertical)


def _seg_maps(arr, vertical):
    """[h4, w4] per-4x4-edge map -> [ns_y, ns_x] per-segment map."""
    if vertical:
        return arr[:, ::2]
    return arr[::2, :].T


def _deblock_pass_tpu(planes, pic, sps, pps, bs, qp_l, boff, toff, no_p,
                      no_q, vertical):
    bd_l = sps.bit_depth_luma
    bd_c = sps.bit_depth_chroma
    # luma
    plane = planes[0]
    if not vertical:
        plane = plane.T
    H, W = plane.shape
    segb = _seg_maps(bs, vertical).astype(np.int32)
    segq = _seg_maps(qp_l, vertical)
    segbo = _seg_maps(boff, vertical)
    segto = _seg_maps(toff, vertical)
    segnp = _seg_maps(no_p, vertical)
    segnq = _seg_maps(no_q, vertical)
    ns_y, ns_x = H // 4, W // 8
    segb = segb[:ns_y, :ns_x]
    out = np.asarray(_deblock_v_fn(bd_l)(
        jnp.asarray(plane), jnp.asarray(segb),
        jnp.asarray(segq[:ns_y, :ns_x]), jnp.asarray(segbo[:ns_y, :ns_x]),
        jnp.asarray(segto[:ns_y, :ns_x]),
        jnp.asarray(segnp[:ns_y, :ns_x]), jnp.asarray(segnq[:ns_y, :ns_x])))
    if vertical:
        planes[0][:, :] = out
    else:
        planes[0][:, :] = out.T

    if sps.chroma_format_idc == 0:
        return
    # chroma: BS==2 edges on the 8-chroma-sample grid
    ssx, ssy = sps.chroma_shift_x(), sps.chroma_shift_y()
    from .hostdec.tables import CHROMA_QP_SCALE
    from .ops.deblock import TC_TABLE
    tc_tab = np.asarray(TC_TABLE)
    for c in (1, 2):
        cpl = planes[c]
        if not vertical:
            cpl = cpl.T
        Hc, Wc = cpl.shape
        ns = Wc // 8
        # chroma edge at chroma column 8k == luma column 8k << ssx
        # segment rows: per chroma row
        tc_rows = np.zeros((Hc, ns), np.int32)
        filt = np.zeros((Hc, ns), bool)
        nop = np.zeros((Hc, ns), bool)
        noq = np.zeros((Hc, ns), bool)
        qp_off = pps.cb_qp_offset if c == 1 else pps.cr_qp_offset
        # iterate 4x4-luma edge entries that fall on the chroma grid
        if vertical:
            step_l = (8 << ssx) >> 2        # luma 4x4 cols between chroma edges
            ys4, xs4 = np.nonzero(bs == 2)
            on = (xs4 % step_l) == 0
            ys4, xs4 = ys4[on], xs4[on]
            crow0 = (ys4 << 2) >> ssy       # first chroma row of segment
            nrows = 4 >> ssy
            cseg = ((xs4 << 2) >> ssx) // 8
        else:
            step_l = (8 << ssy) >> 2
            ys4, xs4 = np.nonzero(bs == 2)
            on = (ys4 % step_l) == 0
            ys4, xs4 = ys4[on], xs4[on]
            crow0 = (xs4 << 2) >> ssx       # transposed: rows run along x
            nrows = 4 >> ssx
            cseg = ((ys4 << 2) >> ssy) // 8
        qpl = qp_l[ys4, xs4]
        qpi = np.clip(qpl + qp_off, 0, 57)
        qpc = np.asarray(CHROMA_QP_SCALE[sps.chroma_format_idc])[qpi]
        idx_tc = np.clip(qpc + 2 + toff[ys4, xs4], 0, 53)
        tcc = tc_tab[idx_tc] << (bd_c - 8)
        for k in range(len(ys4)):
            r0 = crow0[k]
            tc_rows[r0:r0 + nrows, cseg[k]] = tcc[k]
            filt[r0:r0 + nrows, cseg[k]] = tcc[k] != 0
            nop[r0:r0 + nrows, cseg[k]] = no_p[ys4[k], xs4[k]]
            noq[r0:r0 + nrows, cseg[k]] = no_q[ys4[k], xs4[k]]
        out = np.asarray(_deblock_cv_fn(bd_c)(
            jnp.asarray(cpl), jnp.asarray(tc_rows), jnp.asarray(filt),
            jnp.asarray(nop), jnp.asarray(noq)))
        if vertical:
            planes[c][:, :] = out
        else:
            planes[c][:, :] = out.T


@functools.lru_cache(maxsize=None)
def _sao_fn(log2cx, log2cy, bd, scale, W, H):
    return jax.jit(lambda pl, vm, t, b, o: SK.sao_component(
        pl, vm, t, b, o, log2cx, bd, scale, W, H, log2_ctb_cy=log2cy))


@functools.lru_cache(maxsize=None)
def _sao_fn_multi(log2cx, log2cy, bd, scale, W, H, across_tiles):
    return jax.jit(lambda pl, t, b, o, sm, lf, tm: SK.sao_component(
        pl, None, t, b, o, log2cx, bd, scale, W, H, log2_ctb_cy=log2cy,
        slice_map=sm, lf_map=lf, tile_map=tm,
        lf_across_tiles=across_tiles))


def sao_picture_tpu(planes, pic, sps, pps, tile_map):
    wc = sps.pic_width_ctbs
    hc = sps.pic_height_ctbs
    ncomp = 3 if sps.chroma_format_idc else 1
    sao_type = np.asarray(pic.sao_type).reshape(hc * wc, 3)
    sao_band = np.asarray(pic.sao_band_pos).reshape(hc * wc, 3)
    sao_off = np.asarray(pic.sao_offsets).reshape(hc * wc, 3, 4)
    # validity: single-slice + single-tile fast path; otherwise pairwise mask
    multi = (np.asarray(pic.slice_idx).max() > 0) or pps.tiles_enabled
    for c in range(ncomp):
        sx = sps.chroma_shift_x() if c else 0
        sy = sps.chroma_shift_y() if c else 0
        bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
        W, H = sps.width >> sx, sps.height >> sy
        log2cx = sps.log2_ctb - sx  # CTB size in component units per axis
        log2cy = sps.log2_ctb - sy
        scale = pps.sao_offset_scale_luma if c == 0 else pps.sao_offset_scale_chroma
        t = sao_type[:, c].reshape(hc, wc).astype(np.int32)
        b = sao_band[:, c].reshape(hc, wc).astype(np.int32)
        o = sao_off[:, :, :][:, c].reshape(hc, wc, 4).astype(np.int32)
        plane = planes[c]
        if multi:
            # exact pairwise slice/tile crossing rules, per-sample maps
            Hp, Wp = plane.shape
            ys = (np.arange(Hp) << sy) >> 2
            xs = (np.arange(Wp) << sx) >> 2
            s4 = np.asarray(pic.slice_idx)
            sm = s4[np.minimum(ys, s4.shape[0] - 1)[:, None],
                    np.minimum(xs, s4.shape[1] - 1)[None, :]].astype(np.int32)
            l4 = np.asarray(pic.loopfilter_across_slice)
            lf = l4[np.minimum(ys, l4.shape[0] - 1)[:, None],
                    np.minimum(xs, l4.shape[1] - 1)[None, :]].astype(bool)
            tmap = np.asarray(tile_map).reshape(hc, wc)
            tyc = np.minimum((np.arange(Hp) << sy) >> sps.log2_ctb, hc - 1)
            txc = np.minimum((np.arange(Wp) << sx) >> sps.log2_ctb, wc - 1)
            tm = tmap[tyc[:, None], txc[None, :]].astype(np.int32)
            fn = _sao_fn_multi(log2cx, log2cy, bd, scale, W, H,
                               bool(pps.loop_filter_across_tiles))
            out = np.asarray(fn(jnp.asarray(plane), jnp.asarray(t),
                                jnp.asarray(b), jnp.asarray(o),
                                jnp.asarray(sm), jnp.asarray(lf),
                                jnp.asarray(tm)))
        else:
            vm = np.ones_like(plane, bool)
            out = np.asarray(_sao_fn(log2cx, log2cy, bd, scale, W, H)(
                jnp.asarray(plane), jnp.asarray(vm), jnp.asarray(t),
                jnp.asarray(b), jnp.asarray(o)))
        planes[c][:, :] = out
