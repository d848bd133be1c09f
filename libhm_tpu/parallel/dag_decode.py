"""Reference-DAG batched TPU decode for general (inter) streams.

The reference decodes strictly one picture at a time (TDecTop.cpp:729).
Reconstruction, however, only depends on the *reference pictures* being
done: pictures whose refs are all reconstructed are data-independent and
can batch into one device dispatch.  Grouping decode order by longest
reference-chain depth ("DAG level") turns a hierarchical-B random-access
GOP of 16 pictures into ~5 batched dispatol groups instead of 16 serial
ones:

    level 0: all IDR/CRA + I pictures              (no refs)
    level 1: pictures referencing only level 0     (e.g. POC16)
    level 2: POC8 (refs 0,16) ...                  and so on.

Within a level the existing cross-picture batching applies: TU residual
buckets over the union of tu_lists, one MC gather/scatter dispatch per
component over every inter 4x4 block of the level, and the vmapped intra
wavefront.  Reference planes live on device between levels (DecodedPicture
._device_planes), so inter-picture data never round-trips the host.

Output order, DPB bumping, hashes and the libHMDec bumping rules are
unchanged — the host Decoder runs its normal control plane in collect
mode and this module only fills in the pixels.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..hostdec.picture import MODE_INTER
from .batch_decode import _residual_planes_batch, _intra_batch
from ..ops import interp as IK


# ---------------------------------------------------------------------------
def reference_levels(items):
    """Group decode-order collect items into reference-DAG levels.

    Dependency = the set of DecodedPicture objects this picture's PUs
    gather from (object identity, so repeated POCs after an IDR are
    distinct).  Returns a list of lists of items.
    """
    level_of = {}
    levels = []
    for it in items:
        deps = set()
        for pu in it["pic"].inter_list:
            for l in range(2):
                rp = pu.ref_poc[l]
                if rp is not None:
                    deps.add(id(rp))
        lv = 0
        for d in deps:
            lv = max(lv, level_of.get(d, -1) + 1)
        level_of[id(it["dp"])] = lv
        while len(levels) <= lv:
            levels.append([])
        levels[lv].append(it)
    return levels


# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _mc_scatter_fn(blkx, blky, taps, fbx, fby, bd, epi):
    """MC for a batch of 4x4 blocks across pictures + residual add +
    scatter into the stacked [B, H, W] planes — one dispatch."""
    @jax.jit
    def fn(stacked, refs, sel0, sel1, bidx, bx, by, mv, dirm, resblk,
           wpw, wpo, denom, W, H):
        p0 = IK.mc_blocks(refs, sel0, bx, by, mv[:, 0, 0], mv[:, 0, 1],
                          blkx, taps, fbx, fby, bd, is_last=False, W=W, H=H,
                          blkh=blky)
        p1 = IK.mc_blocks(refs, sel1, bx, by, mv[:, 1, 0], mv[:, 1, 1],
                          blkx, taps, fbx, fby, bd, is_last=False, W=W, H=H,
                          blkh=blky)
        headroom = max(2, IK.IF_PREC - bd)
        if epi == "wp":
            uni0 = IK.weighted_uni(p0, wpw[:, 0], wpo[:, 0], denom, bd)
            uni1 = IK.weighted_uni(p1, wpw[:, 1], wpo[:, 1], denom, bd)
            bi = IK.weighted_bi(p0, p1, wpw[:, 0], wpo[:, 0], wpw[:, 1],
                                wpo[:, 1], denom, bd)
        else:
            off = 1 << (headroom - 1)
            maxs = (1 << bd) - 1
            uni0 = jnp.clip((p0 + IK.IF_OFFS + off) >> headroom, 0, maxs)
            uni1 = jnp.clip((p1 + IK.IF_OFFS + off) >> headroom, 0, maxs)
            bi = IK.bi_average(p0, p1, bd)
        d = dirm[:, None, None]
        pred = jnp.where(d == 3, bi, jnp.where(d == 1, uni0, uni1))
        out = jnp.clip(pred + resblk, 0, (1 << bd) - 1)
        oy = jnp.arange(blky)
        ox = jnp.arange(blkx)
        iy = by[:, None, None] + oy[None, :, None]
        ix = bx[:, None, None] + ox[None, None, :]
        iy = jnp.broadcast_to(iy, out.shape)
        ix = jnp.broadcast_to(ix, out.shape)
        ib = jnp.broadcast_to(bidx[:, None, None], out.shape)
        return stacked.at[ib, iy, ix].set(out, mode="drop")
    return fn


def _pad_pow2(n, lo=64):
    p = lo
    while p < n:
        p <<= 1
    return p


def _inter_level(items, stacked_all, res_all):
    """Batched MC + residual add for every inter block of one DAG level.

    stacked_all: list per component of device [B, H, W] planes (updated).
    """
    from ..recon_tpu import _device_plane
    sps0 = items[0]["sps"]
    ncomp = 3 if sps0.chroma_format_idc else 1
    B = len(items)

    # combined reference stack (object identity; POCs repeat across IRAPs)
    ref_index = {}
    ref_objs = []
    per_pic = []
    for b, it in enumerate(items):
        pic = it["pic"]
        inter4 = np.asarray(pic.pred_mode) == MODE_INTER
        if not inter4.any():
            per_pic.append(None)
            continue
        pocs = {}
        for pu in pic.inter_list:
            for l in range(2):
                rp = pu.ref_poc[l]
                if rp is not None and rp.poc not in pocs:
                    pocs[rp.poc] = rp
        for rp in pocs.values():
            if id(rp) not in ref_index:
                ref_index[id(rp)] = len(ref_objs)
                ref_objs.append(rp)
        ys4, xs4 = np.nonzero(inter4)
        dirm = np.asarray(pic.inter_dir)[ys4, xs4].astype(np.int32)
        mv = np.asarray(pic.mv)[ys4, xs4].astype(np.int32)
        refpoc = np.asarray(pic.ref_poc)[ys4, xs4]
        sel = np.zeros((len(ys4), 2), np.int32)
        for l in range(2):
            used = (dirm & (1 << l)) != 0
            sel[used, l] = [ref_index[id(pocs[p])] for p in refpoc[used, l]]
        # weighted prediction maps
        has_wp = any(getattr(pu, "wp", None) is not None
                     for pu in pic.inter_list)
        wpw = wpo = None
        denom_l = denom_c = 0
        if has_wp:
            wpw = np.zeros((pic.h4, pic.w4, 2, 3), np.int32)
            wpo = np.zeros((pic.h4, pic.w4, 2, 3), np.int32)
            for pu in pic.inter_list:
                if pu.wp is None:
                    continue
                sl = np.s_[pu.y >> 2:(pu.y + pu.h) >> 2,
                           pu.x >> 2:(pu.x + pu.w) >> 2]
                wpw[sl] = np.asarray(pu.wp["w"])
                wpo[sl] = np.asarray(pu.wp["o"])
                denom_l = pu.wp["denom_l"]
                denom_c = pu.wp["denom_c"]
        per_pic.append(dict(ys4=ys4, xs4=xs4, dirm=dirm, mv=mv, sel=sel,
                            has_wp=has_wp, wpw=wpw, wpo=wpo,
                            denom_l=denom_l, denom_c=denom_c))
    if not ref_objs and all(p is None for p in per_pic):
        return

    for c in range(ncomp):
        sps = sps0
        sx = sps.chroma_shift_x() if c else 0
        sy = sps.chroma_shift_y() if c else 0
        bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
        W = sps.width >> sx
        H = sps.height >> sy
        blkx, blky = 4 >> sx, 4 >> sy
        taps = 8 if c == 0 else 4
        fbx = 2 + (sx if c else 0)
        fby = 2 + (sy if c else 0)
        if ref_objs:
            refs = jnp.stack([_device_plane(rp, c, H, W) for rp in ref_objs])
        else:
            refs = jnp.zeros((1, H, W), jnp.int32)
        # dispatch groups keyed by WP epilogue + denom (per-slice values)
        groups = {}
        for b, pp in enumerate(per_pic):
            if pp is None:
                continue
            denom = (pp["denom_l"] if c == 0 else pp["denom_c"])
            key = ("wp", denom) if pp["has_wp"] else ("plain", 0)
            groups.setdefault(key, []).append(b)
        for (epi, denom), bs in groups.items():
            cat = lambda k: np.concatenate([per_pic[b][k] for b in bs])
            ys4, xs4 = cat("ys4"), cat("xs4")
            dirm, mv, sel = cat("dirm"), cat("mv"), cat("sel")
            bidx = np.concatenate(
                [np.full(len(per_pic[b]["ys4"]), b, np.int32) for b in bs])
            N = len(ys4)
            bx = (xs4 << 2) >> sx
            by = (ys4 << 2) >> sy
            scale = 1 << (bd - 8)
            if epi == "wp":
                w_arr = np.concatenate(
                    [per_pic[b]["wpw"][per_pic[b]["ys4"],
                                       per_pic[b]["xs4"]][:, :, c]
                     for b in bs])
                o_arr = np.concatenate(
                    [per_pic[b]["wpo"][per_pic[b]["ys4"],
                                       per_pic[b]["xs4"]][:, :, c]
                     for b in bs]) * scale
            else:
                w_arr = np.zeros((N, 2), np.int32)
                o_arr = np.zeros((N, 2), np.int32)
            # residual gather (host; residual planes are host tensors)
            resblk = np.zeros((N, blky, blkx), np.int32)
            off = 0
            for b in bs:
                pp = per_pic[b]
                n_b = len(pp["ys4"])
                res = res_all[b][c]
                byy = (pp["ys4"] << 2) >> sy
                bxx = (pp["xs4"] << 2) >> sx
                iy = byy[:, None, None] + np.arange(blky)[None, :, None]
                ix = bxx[:, None, None] + np.arange(blkx)[None, None, :]
                resblk[off:off + n_b] = res[
                    np.broadcast_to(iy, (n_b, blky, blkx)),
                    np.broadcast_to(ix, (n_b, blky, blkx))]
                off += n_b
            P = _pad_pow2(N)

            def pad(a, fill=0):
                out = np.full((P,) + a.shape[1:], fill, a.dtype)
                out[:N] = a
                return out
            fn = _mc_scatter_fn(blkx, blky, taps, fbx, fby, bd, epi)
            stacked_all[c] = fn(
                stacked_all[c], refs,
                jnp.asarray(pad(sel[:, 0])), jnp.asarray(pad(sel[:, 1])),
                jnp.asarray(pad(bidx, B + 1)),  # padded blocks scatter-drop
                jnp.asarray(pad(bx)), jnp.asarray(pad(by)),
                jnp.asarray(pad(mv)), jnp.asarray(pad(dirm, 1)),
                jnp.asarray(pad(resblk)),
                jnp.asarray(pad(w_arr)), jnp.asarray(pad(o_arr)),
                denom, W, H)


# ---------------------------------------------------------------------------
def decode_batch(data, parse="native", check_sei_hash=False, mesh=None):
    """Decode any Annex-B stream with reference-DAG cross-picture batching.

    Bit-exact vs Decoder(recon="tpu") / the HM hash oracle.  All pictures
    of a DAG level reconstruct in shared device dispatches; reference
    planes stay device-resident across levels.  `mesh` shards the
    picture axis of the intra wavefront (data parallelism within a level).

    Returns the cropped pictures in output order (Decoder.outputs shape).
    """
    from ..hostdec.decoder import Decoder
    from ..recon_tpu import deblock_picture_tpu, sao_picture_tpu
    from ..hostdec.loopfilter_np import _restore_unfiltered

    dec = Decoder(parse=parse, recon="collect",
                  check_sei_hash=check_sei_hash)
    dec.decode_annexb(data)
    items = getattr(dec, "collected", [])
    if not items:
        return []
    sps0 = items[0]["sps"]
    for it in items:
        if (it["sps"].width, it["sps"].height,
                it["sps"].chroma_format_idc) != \
                (sps0.width, sps0.height, sps0.chroma_format_idc):
            raise ValueError("decode_batch: mixed picture geometry")

    ncomp = 3 if sps0.chroma_format_idc else 1
    for lv_items in reference_levels(items):
        res_all = _residual_planes_batch(lv_items)
        planes_all = [[np.zeros_like(p) for p in res] for res in res_all]
        for b, it in enumerate(lv_items):
            sps = it["sps"]
            for (c, x, y, w, h, samples, bits) in it["pic"].pcm_list:
                bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
                planes_all[b][c][y:y + h, x:x + w] = samples << (bd - bits)
        # stacked device planes per component
        stacked_all = [jnp.asarray(np.stack([planes_all[b][c]
                                             for b in range(len(lv_items))]))
                       for c in range(ncomp)]
        _inter_level(lv_items, stacked_all, res_all)
        for c in range(ncomp):
            out = _intra_batch(lv_items, c, planes_all, res_all, mesh=mesh,
                               stacked=stacked_all[c])
            stacked_all[c] = out
        # back to host once per level for the (per-picture) loop filters
        host = [np.asarray(s) for s in stacked_all]
        for b, it in enumerate(lv_items):
            sps, pps, pic = it["sps"], it["pps"], it["pic"]
            planes = planes_all[b]
            for c in range(ncomp):
                planes[c][:, :] = host[c][b]
            if pps.transquant_bypass_enabled or \
                    (sps.pcm_enabled and sps.pcm_loop_filter_disabled):
                pic.prefilter_planes = [p.copy() for p in planes]
            deblock_picture_tpu(planes, pic, sps, pps, it["tile_map"])
            if sps.sao_enabled:
                sao_picture_tpu(planes, pic, sps, pps, it["tile_map"])
            _restore_unfiltered(planes, None, pic, sps)
            dp = it["dp"]
            dp.planes = planes
            dp.cropped_planes = None
            if check_sei_hash and it["pending_hash"] is not None:
                dec._pending_hash = it["pending_hash"]
                dec._verify_hash(dp)
    # rebuild the output list now that pixels exist (bumping order was
    # already decided by the control plane during parsing)
    dec.outputs = [dp.cropped() for dp in dec.output_records]
    return dec.outputs
