"""Reference-DAG batched, fully device-resident TPU decode.

The reference decodes strictly one picture at a time (TDecTop.cpp:729).
Reconstruction, however, only depends on the *reference pictures* being
done: pictures whose refs are all reconstructed are data-independent and
can batch into one device dispatch.  Grouping decode order by longest
reference-chain depth ("DAG level") turns a hierarchical-B random-access
GOP of 16 pictures into ~5 batched dispatch groups instead of 16 serial
ones:

    level 0: all IDR/CRA + I pictures              (no refs)
    level 1: pictures referencing only level 0     (e.g. POC16)
    level 2: POC8 (refs 0,16) ...                  and so on.

Pixels live on device for the WHOLE decode (the round-4 re-architecture):

    coeff buckets ──upload──> residual planes (device scatter)
    MC gather + residual add + intra wavefront      (device, per level)
    deblock V/H + SAO + PCM/lossless restore        (one fused vmapped jit,
                                                     fed by compact int8
                                                     syntax maps)
    filtered planes ──(stay on device)──> next level's reference stack
    final planes ──async download──> output YUV (narrow dtype)

Host->device traffic is coefficients + per-4x4 syntax maps only;
device->host is the final pictures once.  Byte counts are tracked in
utils/xfer for the bench.

Output order, DPB bumping, hashes and the libHMDec bumping rules are
unchanged — the host Decoder runs its normal control plane in collect
mode and this module only fills in the pixels.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..hostdec.picture import MODE_INTER
from ..ops import interp as IK
from ..utils import xfer


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
    """MC for a batch of 4x4 blocks across pictures + device residual
    gather + scatter into the stacked [Bp, H, W] planes — one dispatch."""
    @jax.jit
    def fn(stacked, resplane, refs, sel0, sel1, bidx, bx, by, mv, dirm,
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
        oy = jnp.arange(blky)
        ox = jnp.arange(blkx)
        iy = by[:, None, None] + oy[None, :, None]
        ix = bx[:, None, None] + ox[None, None, :]
        iy = jnp.broadcast_to(iy, pred.shape)
        ix = jnp.broadcast_to(ix, pred.shape)
        ib = jnp.broadcast_to(bidx[:, None, None], pred.shape)
        res = resplane[ib, iy, ix]          # device residual gather
        out = jnp.clip(pred + res, 0, (1 << bd) - 1)
        return stacked.at[ib, iy, ix].set(out, mode="drop")
    return fn


def _pad_pow2(n, lo=64):
    p = lo
    while p < n:
        p <<= 1
    return p


_MC_CHUNK = 1 << 16


@functools.lru_cache(maxsize=None)
def _mc_grid_fn(blkx, blky, taps, fbx, fby, bd, sx, sy, h4, w4, W, H):
    """Full-grid MC: every 4x4 of every picture of a level, driven by the
    per-4x4 syntax MAPS (MV/dir/ref-sel) instead of host-gathered
    per-block arrays — the upload is ~12 bytes per 4x4 and the block
    coordinates are derived from iota on device.  A lax.scan over
    fixed-size chunks bounds the gather-window working set."""
    npp = h4 * w4

    @jax.jit
    def fn(stacked, resplane, refs, mv, dirm, sel):
        Bp = stacked.shape[0]
        n = Bp * npp
        nch = -(-n // _MC_CHUNK)
        npad = nch * _MC_CHUNK

        def chunked(a, tail):
            a = a.reshape((n,) + tail)
            if npad > n:
                a = jnp.concatenate(
                    [a, jnp.zeros((npad - n,) + tail, a.dtype)])
            return a.reshape((nch, _MC_CHUNK) + tail)
        mvf = chunked(mv.astype(jnp.int32), (2, 2))
        dirf = chunked(dirm.astype(jnp.int32), ())
        self_self = chunked(sel.astype(jnp.int32), (2,))
        pos = jnp.arange(npad, dtype=jnp.int32).reshape(nch, _MC_CHUNK)
        headroom = max(2, IK.IF_PREC - bd)
        maxs = (1 << bd) - 1

        def step(carry, inp):
            mv_c, dir_c, sel_c, pos_c = inp
            bidx = pos_c // npp
            rem = pos_c - bidx * npp
            by = ((rem // w4) << 2) >> sy
            bx = ((rem % w4) << 2) >> sx
            p0 = IK.mc_blocks(refs, sel_c[:, 0], bx, by, mv_c[:, 0, 0],
                              mv_c[:, 0, 1], blkx, taps, fbx, fby, bd,
                              is_last=False, W=W, H=H, blkh=blky)
            p1 = IK.mc_blocks(refs, sel_c[:, 1], bx, by, mv_c[:, 1, 0],
                              mv_c[:, 1, 1], blkx, taps, fbx, fby, bd,
                              is_last=False, W=W, H=H, blkh=blky)
            off = 1 << (headroom - 1)
            uni0 = jnp.clip((p0 + IK.IF_OFFS + off) >> headroom, 0, maxs)
            uni1 = jnp.clip((p1 + IK.IF_OFFS + off) >> headroom, 0, maxs)
            bi = IK.bi_average(p0, p1, bd)
            d = dir_c[:, None, None]
            pred = jnp.where(d == 3, bi, jnp.where(d == 1, uni0, uni1))
            oy = jnp.arange(blky)
            ox = jnp.arange(blkx)
            iy = by[:, None, None] + oy[None, :, None]
            ix = bx[:, None, None] + ox[None, None, :]
            iy = jnp.broadcast_to(iy, pred.shape)
            ix = jnp.broadcast_to(ix, pred.shape)
            # non-inter 4x4s (dir 0) and chunk padding scatter-drop via an
            # out-of-range picture index
            ib = jnp.broadcast_to(
                jnp.where(dir_c > 0, bidx, Bp)[:, None, None], pred.shape)
            res = resplane[ib, iy, ix]
            out = jnp.clip(pred + res, 0, maxs)
            return carry.at[ib, iy, ix].set(out, mode="drop"), None

        out, _ = jax.lax.scan(step, stacked,
                              (mvf, dirf, self_self, pos))
        return out
    return fn


@functools.lru_cache(maxsize=None)
def _mc_phase_grid_fn(sx, sy, taps, fbx, fby, bd, h4, w4, W, H):
    """Full-grid MC via phase planes + single-point gathers (ops/interp
    phase_planes): every fractional phase of every reference plane is
    precomputed as regular whole-plane filters, then each output sample
    is ONE gather — ~1000x less irregular access than the window-gather
    kernel, which measured 0.06 Gsamp/s on the v5e vs 73 Gsamp/s for
    point gathers."""
    # The plane build runs as its own jit: fusing it into the sharded
    # MC computation makes XLA's SPMD partitioner thread in-process
    # collectives through the build (observed stuck AllReduce on the
    # 8-virtual-device CPU mesh); materialized planes enter the MC jit
    # as a replicated operand instead.
    build = jax.jit(lambda refs: IK.phase_planes(refs, taps, fbx, fby, bd))

    @jax.jit
    def fn(stacked, resplane, planes, mv, dirm, sel):
        Bp, Hp, Wp = stacked.shape
        py = jnp.arange(Hp, dtype=jnp.int32)
        px = jnp.arange(Wp, dtype=jnp.int32)
        cy = jnp.minimum((py << sy) >> 2, h4 - 1)
        cx = jnp.minimum((px << sx) >> 2, w4 - 1)
        cell = (cy[:, None], cx[None, :])
        d = dirm.astype(jnp.int32)[:, cell[0], cell[1]]       # [Bp, Hp, Wp]
        # padding rows/cols beyond the component size never code inter
        valid = (py[:, None] < H) & (px[None, :] < W)
        d = jnp.where(valid[None], d, 0)
        headroom = max(2, IK.IF_PREC - bd)
        off = 1 << (headroom - 1)
        maxs = (1 << bd) - 1
        preds = []
        for l in range(2):
            mvl = mv.astype(jnp.int32)[:, cell[0], cell[1], l]  # [B,H,W,2]
            sl = sel.astype(jnp.int32)[:, cell[0], cell[1], l]
            p = IK.mc_phase_gather(planes, sl, py[None, :, None],
                                   px[None, None, :], mvl[..., 0],
                                   mvl[..., 1], fbx, fby, taps, H, W)
            preds.append(p)
        p0, p1 = preds
        uni0 = jnp.clip((p0 + IK.IF_OFFS + off) >> headroom, 0, maxs)
        uni1 = jnp.clip((p1 + IK.IF_OFFS + off) >> headroom, 0, maxs)
        bi = IK.bi_average(p0, p1, bd)
        pred = jnp.where(d == 3, bi, jnp.where(d == 1, uni0, uni1))
        out = jnp.clip(pred + resplane, 0, maxs)
        return jnp.where(d > 0, out, stacked)
    return build, fn


def _inter_level_grid(items, stacked_all, res_all, mesh=None):
    """Map-driven MC for a level with no weighted prediction.

    With a mesh, every per-picture operand is explicitly sharded over
    the pics axis and the phase planes are explicitly replicated before
    entering the jit: left to itself, the SPMD partitioner has been
    observed to pick shardings that thread in-process collectives
    through the computation and wedge the virtual-device CPU mesh.
    """
    from ..recon_tpu import _device_plane
    sps0 = items[0]["sps"]
    ncomp = 3 if sps0.chroma_format_idc else 1
    Bp = int(stacked_all[0].shape[0])
    pic0 = items[0]["pic"]
    h4, w4 = pic0.h4, pic0.w4

    ref_index = {}
    ref_objs = []
    mv_maps = np.zeros((Bp, h4, w4, 2, 2), np.int16)
    dir_maps = np.zeros((Bp, h4, w4), np.int8)
    sel_maps = np.zeros((Bp, h4, w4, 2), np.int16)
    any_inter = False
    for b, it in enumerate(items):
        pic = it["pic"]
        if not pic.inter_list:
            continue
        dirm = np.where(np.asarray(pic.pred_mode) == MODE_INTER,
                        np.asarray(pic.inter_dir), 0)
        if not dirm.any():
            continue
        any_inter = True
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
        mv_maps[b] = np.asarray(pic.mv).astype(np.int16)
        dir_maps[b] = dirm
        local = np.asarray(sorted(pocs), np.int64)
        l2g = np.asarray([ref_index[id(pocs[int(p)])] for p in local],
                         np.int16)
        rpm = np.asarray(pic.ref_poc)
        posn = np.clip(np.searchsorted(local, rpm), 0, len(local) - 1)
        sel_maps[b] = l2g[posn]
    if not any_inter:
        return

    # one upload of the per-4x4 syntax maps, shared by all components
    mv_dev = xfer.up(mv_maps, "mc")
    dir_dev = xfer.up(dir_maps, "mc")
    sel_dev = xfer.up(sel_maps, "mc")
    for c in range(ncomp):
        sps = sps0
        sx = sps.chroma_shift_x() if c else 0
        sy = sps.chroma_shift_y() if c else 0
        bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
        W = sps.width >> sx
        H = sps.height >> sy
        planes_dev = [_device_plane(rp, c, H, W) for rp in ref_objs]
        R = _pad_pow2(len(planes_dev), 4)
        planes_dev += [planes_dev[-1]] * (R - len(planes_dev))
        refs = jnp.stack(planes_dev)
        # phase-plane MC: regular whole-plane filtering + one point
        # gather per sample (~1000x less irregular access than the
        # window-gather kernel).  Single-device by construction — under
        # a mesh the level state is pinned off-mesh (see _recon_levels),
        # so no implicit resharding collectives are generated here.
        build, fn = _mc_phase_grid_fn(sx, sy, 8 if c == 0 else 4,
                                      2 + (sx if c else 0),
                                      2 + (sy if c else 0),
                                      bd, h4, w4, W, H)
        stacked_all[c] = fn(stacked_all[c], res_all[c], build(refs),
                            mv_dev, dir_dev, sel_dev)


def _inter_level(items, stacked_all, res_all, mesh=None):
    """Batched MC + residual add for every inter block of one DAG level.

    stacked_all: list per component of device [Bp, H, W] planes (updated).
    res_all: list per component of device [Bp, H, W] residual planes.

    Levels without weighted prediction take the map-driven full-grid path
    (lean uploads); WP levels fall back to gathered per-block arrays with
    the WP epilogue.
    """
    if not any(getattr(pu, "wp", None) is not None
               for it in items for pu in it["pic"].inter_list):
        return _inter_level_grid(items, stacked_all, res_all, mesh=mesh)
    return _inter_level_gathered(items, stacked_all, res_all)


def _inter_level_gathered(items, stacked_all, res_all):
    from ..recon_tpu import _device_plane
    sps0 = items[0]["sps"]
    ncomp = 3 if sps0.chroma_format_idc else 1
    Bp = int(stacked_all[0].shape[0])

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
            planes_dev = [_device_plane(rp, c, H, W) for rp in ref_objs]
            # pad the stack depth to pow2 (repeat the last plane) so the
            # MC kernel's shape key is shared across levels
            R = _pad_pow2(len(planes_dev), 4)
            planes_dev += [planes_dev[-1]] * (R - len(planes_dev))
            refs = jnp.stack(planes_dev)
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
            P = _pad_pow2(N)

            def pad(a, fill=0):
                out = np.full((P,) + a.shape[1:], fill, a.dtype)
                out[:N] = a
                return out
            fn = _mc_scatter_fn(blkx, blky, taps, fbx, fby, bd, epi)
            stacked_all[c] = fn(
                stacked_all[c], res_all[c], refs,
                xfer.up(pad(sel[:, 0]), "mc"), xfer.up(pad(sel[:, 1]), "mc"),
                xfer.up(pad(bidx, Bp), "mc"),  # padded blocks scatter-drop
                xfer.up(pad(bx), "mc"), xfer.up(pad(by), "mc"),
                xfer.up(pad(mv), "mc"), xfer.up(pad(dirm, 1), "mc"),
                xfer.up(pad(w_arr), "mc"), xfer.up(pad(o_arr), "mc"),
                denom, W, H)


# ---------------------------------------------------------------------------
def _recon_levels(items, mesh=None, download=True):
    """Device-resident reconstruction of collect items grouped into
    reference-DAG levels.  Returns [(dp, item, small_planes)] where
    small_planes are narrow-dtype device arrays with downloads in flight.

    download=False keeps every output in HBM (no narrow copies, no
    async D2H): small_planes comes back empty and callers read pixels
    through dp._device_planes — the device-compute bench mode for hosts
    whose D2H path is pathologically slow.
    """
    from .batch_decode import _residual_planes_batch_device, _intra_batch
    from .device_filters import filter_level

    sps0 = items[0]["sps"]
    ncomp = 3 if sps0.chroma_format_idc else 1
    mesh_m = int(mesh.devices.size) if mesh is not None else 1
    pending = []
    for lv_items in reference_levels(items):
        B = len(lv_items)
        # picture-axis bucket: pow2 multiples of the mesh size, so levels
        # of nearby size share compiles AND the axis shards evenly
        Bp = mesh_m * _pad_pow2(-(-B // mesh_m), lo=1)
        res_stacked = _residual_planes_batch_device(lv_items, Bp)
        stacked = [jnp.zeros(r.shape, jnp.int32) for r in res_stacked]
        # PCM samples (rare): small per-block device scatters
        for b, it in enumerate(lv_items):
            sps = it["sps"]
            for (c, x, y, w, h, samples, bits) in it["pic"].pcm_list:
                bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
                blk = np.asarray(samples, np.int32) << (bd - bits)
                stacked[c] = stacked[c].at[b, y:y + h, x:x + w].set(
                    xfer.up(blk))
        _inter_level(lv_items, stacked, res_stacked, mesh=mesh)
        for c in range(ncomp):
            stacked[c] = _intra_batch(lv_items, c, None, None, mesh=mesh,
                                      stacked=stacked[c],
                                      res_stacked=res_stacked[c])
            if mesh is not None:
                # Pin inter-level state to one device: the multi-device
                # fan-out stays self-contained inside _intra_batch's
                # sharded program.  Eager ops (slicing/stacking/astype)
                # on mesh-sharded arrays make XLA insert implicit
                # resharding collectives, and the in-process CPU
                # communicator CHECK-crashes ("Termination timeout for
                # all reduce ... of 40 seconds exceeded",
                # rendezvous.cc:127) whenever one of 8 virtual-device
                # threads is starved >40s — routine on a loaded 1-core
                # host.  The host bounce below is a memcpy on the CPU
                # mesh this path validates on.
                stacked[c] = jnp.asarray(np.asarray(stacked[c]))
        stacked = filter_level(lv_items, stacked, sps0)
        for b, it in enumerate(lv_items):
            dp = it["dp"]
            sps = it["sps"]
            cache = {}
            small = []
            for c in range(ncomp):
                sx = sps.chroma_shift_x() if c else 0
                sy = sps.chroma_shift_y() if c else 0
                Hc = sps.height >> sy
                Wc = sps.width >> sx
                cache[(c, Hc, Wc)] = stacked[c][b, :Hc, :Wc]
                if download:
                    bd = (sps.bit_depth_luma if c == 0
                          else sps.bit_depth_chroma)
                    dt = jnp.uint8 if bd == 8 else jnp.uint16
                    small.append(stacked[c][b].astype(dt))
            # filtered planes feed the next level's MC straight from HBM
            dp._device_planes = cache
            for s in small:
                try:
                    s.copy_to_host_async()
                except Exception:
                    pass
            pending.append((dp, it, small))
    return pending


def _materialize(dec, pending, check_sei_hash):
    """Download pending planes, run hash checks, rebuild dec.outputs."""
    for dp, it, small in pending:
        planes = []
        for s in small:
            a = np.asarray(s)
            xfer.count_d2h(a.nbytes)
            planes.append(a.astype(np.int32))
        dp.planes = planes
        dp.cropped_planes = None
        if check_sei_hash and it["pending_hash"] is not None:
            dec._pending_hash = it["pending_hash"]
            dec._verify_hash(dp)
    # rebuild the output list now that pixels exist (bumping order was
    # already decided by the control plane during parsing)
    dec.outputs = [dp.cropped() for dp in dec.output_records]
    return dec.outputs


def _check_geometry(items, what):
    sps0 = items[0]["sps"]
    for it in items:
        if (it["sps"].width, it["sps"].height,
                it["sps"].chroma_format_idc) != \
                (sps0.width, sps0.height, sps0.chroma_format_idc):
            raise ValueError(f"{what}: mixed picture geometry")


def decode_batch(data, parse="native", check_sei_hash=False, mesh=None):
    """Decode any Annex-B stream with reference-DAG cross-picture batching
    and a fully device-resident pixel path.

    Bit-exact vs Decoder(recon="numpy"/"native") / the HM hash oracle.
    All pictures of a DAG level reconstruct in shared device dispatches;
    reconstructed planes stay device-resident for the whole decode and
    feed the next level's MC directly.  `mesh` shards the picture axis
    (data parallelism within a level).

    Returns the cropped pictures in output order (Decoder.outputs shape).
    """
    from ..hostdec.decoder import Decoder

    dec = Decoder(parse=parse, recon="collect",
                  check_sei_hash=check_sei_hash)
    dec.decode_annexb(data)
    items = getattr(dec, "collected", [])
    if not items:
        return []
    _check_geometry(items, "decode_batch")
    pending = _recon_levels(items, mesh=mesh)
    return _materialize(dec, pending, check_sei_hash)


def decode_batch_device(data, parse="native", mesh=None):
    """Device-compute decode: host parse + fully device-resident
    reconstruction, downloading NOTHING but one uint32 checksum.

    This is the bench mode for deployments whose D2H path is
    pathologically slow (a tunneled device): it isolates what the host
    parse + H2D uploads + on-chip compute actually deliver, with the
    decoded pictures left in HBM exactly as a device-resident consumer
    (a downstream model, an on-device encoder) would use them.

    The dispatch path is byte-identical to decode_batch (whose outputs
    are golden-MD5 verified); the returned checksum — the sum of every
    conformance-cropped output sample, mod 2^32, matching
    DecodedPicture.cropped() geometry — lets the caller cross-check this
    run against a host decode of the same stream.

    Returns (parse_seconds, compute_seconds, checksum_int, n_pictures).
    """
    import time as _time

    from ..hostdec.decoder import Decoder

    dec = Decoder(parse=parse, recon="collect")
    t0 = _time.monotonic()
    dec.decode_annexb(data)
    t1 = _time.monotonic()
    items = getattr(dec, "collected", [])
    if not items:
        return t1 - t0, 0.0, 0, 0
    _check_geometry(items, "decode_batch_device")
    pending = _recon_levels(items, mesh=mesh, download=False)
    parts = []
    # sum over the bumped output list so the checksum covers exactly the
    # pictures (and geometry) that cropped_checksum(Decoder.outputs) sees
    for dp in dec.output_records:
        sps = dp.sps
        ncomp = 3 if sps.chroma_format_idc else 1
        cl, cr, ct, cb = sps.conf_win
        for c in range(ncomp):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            w = sps.width >> sx
            h = sps.height >> sy
            mulx = 1 if c else (1 << sps.chroma_shift_x())
            muly = 1 if c else (1 << sps.chroma_shift_y())
            view = dp._device_planes[(c, h, w)]
            crop = view[ct * muly:h - cb * muly, cl * mulx:w - cr * mulx]
            parts.append(jnp.sum(crop.astype(jnp.uint32)))
    total = jnp.sum(jnp.stack(parts)) if parts else jnp.uint32(0)
    csum = int(jax.device_get(total)) & 0xFFFFFFFF
    t2 = _time.monotonic()
    return t1 - t0, t2 - t1, csum, len(pending)


def cropped_checksum(outs):
    """Host-side counterpart of decode_batch_device's checksum: uint32 sum
    of every sample of a list of cropped pictures (Decoder.outputs)."""
    tot = 0
    for pic in outs:
        for p in pic:
            tot = (tot + int(np.asarray(p, np.uint64).sum())) & 0xFFFFFFFF
    return tot


def decode_streams(datas, parse="native", check_sei_hash=False, mesh=None,
                   threads=0):
    """Decode N INDEPENDENT Annex-B streams with the picture/stream axis
    batched into shared device dispatches (BASELINE.md ladder item 5).

    The control planes parse independently (optionally in host threads);
    reconstruction merges every stream's reference-DAG levels, so level i
    of all streams reconstructs in one set of device dispatches.  With a
    mesh, the merged picture axis shards over its first axis — the
    multi-chip story: independent streams ride separate devices with no
    collectives (SURVEY.md §2.5 distributed row).

    Returns a list of per-stream output lists (each = decode_batch(data)).
    """
    from ..hostdec.decoder import Decoder

    decs = [Decoder(parse=parse, recon="collect",
                    check_sei_hash=check_sei_hash) for _ in datas]
    if threads and len(datas) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(lambda p: p[0].decode_annexb(p[1]),
                        zip(decs, datas)))
    else:
        for dec, data in zip(decs, datas):
            dec.decode_annexb(data)
    items_all = []
    for dec in decs:
        items_all.extend(getattr(dec, "collected", []))
    if not items_all:
        return [[] for _ in datas]
    _check_geometry(items_all, "decode_streams")
    pending = _recon_levels(items_all, mesh=mesh)
    # split the pending downloads back to their owning stream
    own = {}
    for si, dec in enumerate(decs):
        for it in getattr(dec, "collected", []):
            own[id(it["dp"])] = si
    per_stream = [[] for _ in decs]
    for entry in pending:
        per_stream[own[id(entry[0])]].append(entry)
    return [_materialize(dec, pend, check_sei_hash)
            for dec, pend in zip(decs, per_stream)]
