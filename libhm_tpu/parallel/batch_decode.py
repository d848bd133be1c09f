"""Multi-picture batched TPU decode for all-intra streams.

The per-picture TPU path (recon_tpu.TpuPictureRecon) already batches
within a picture: TUs by size bucket, intra blocks by wavefront level.
All-intra pictures have no cross-picture data dependencies, so a whole
stream (or any picture set sharing one SPS geometry) can additionally
batch ACROSS pictures — the (streams x pictures x wavefront x TUs)
batching axis of the design (SURVEY.md section 2.5; the reference decodes
strictly one picture at a time, TDecTop.cpp:729).

Two stages are cross-picture batched here:
 - residual build: TU buckets are keyed by (size, path, ...) over the
   union of every picture's tu_list -> one device dispatch per bucket for
   the whole batch instead of per picture;
 - intra wavefront: each picture's levelized blocks (see
   intra_wavefront.prepare_component) are padded to the batch's common
   [L, K] geometry and the lax.scan runs under jax.vmap -> ONE dispatch
   reconstructs every picture's component plane.

Deblocking and SAO reuse the per-picture device kernels (their inputs are
already whole-frame tensors; the host-side segment grouping keeps them
per picture for now).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..hostdec.picture import MODE_INTRA
from .intra_wavefront import prepare_component, _pow2
from ..ops import intra as IK


# ---------------------------------------------------------------------------
def _tu_bucket_entries(items):
    """Shared TU bucketing over a picture set.

    Returns {(n, use_dst, path, bd, rotate, scal, max_dyn):
             [(b, i, scal_mats), ...]}.
    """
    from ..hostdec.tables import build_scaling_matrices
    buckets = {}
    mats_cache = {}
    for b, it in enumerate(items):
        sps, pic = it["sps"], it["pic"]
        scal_mats = None
        if sps.scaling_list_enabled:
            data = getattr(it["pps"], "scaling_list_data", None)
            if data is None:
                data = sps.scaling_list_data
            key = id(data)
            if key not in mats_cache:
                mats_cache[key] = build_scaling_matrices(data)
            scal_mats = mats_cache[key]
        pred_mode_map = np.asarray(pic.pred_mode)
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
            tu_is_intra = pred_mode_map[(tu.y << syr) >> 2,
                                        (tu.x << sxr) >> 2] == MODE_INTRA
            rotate = bool(sps.transform_skip_rotation) and tu.w == 4 and \
                path in ("tskip", "bypass") and bool(tu_is_intra)
            scal = scal_mats is not None and path != "bypass" and \
                not (tu.transform_skip and tu.w > 4)
            max_dyn = 15 if not sps.extended_precision else max(15, bd + 6)
            key = (tu.w, bool(tu.use_dst), path, bd, rotate, scal, max_dyn)
            buckets.setdefault(key, []).append((b, i, scal_mats))
    return buckets


def _bucket_inputs(items, entries, n, scal, P):
    """Host-side padded input tensors for one TU bucket."""
    from ..hostdec.picture import MODE_INTRA
    coeffs = np.zeros((P, n, n), np.int32)
    qp = np.zeros(P, np.int32)
    rdpcm = np.zeros(P, np.int32)
    mat = np.ones((P, n, n), np.int32) * 16 if scal else \
        np.zeros((1, 1, 1), np.int32)
    for k, (b, i, scal_mats) in enumerate(entries):
        pic = items[b]["pic"]
        sps = items[b]["sps"]
        tu = pic.tu_list[i]
        coeffs[k] = tu.coeffs
        qp[k] = tu.qp
        rdpcm[k] = tu.rdpcm_mode
        if scal:
            sxr = sps.chroma_shift_x() if tu.comp else 0
            syr = sps.chroma_shift_y() if tu.comp else 0
            intra = np.asarray(pic.pred_mode)[(tu.y << syr) >> 2,
                                              (tu.x << sxr) >> 2] \
                == MODE_INTRA
            size_id = tu.w.bit_length() - 3
            mat[k] = scal_mats[(size_id, (0 if intra else 3) + tu.comp)]
    return coeffs, qp, rdpcm, mat


def _residual_planes_batch(items):
    """Cross-picture TU bucketing -> per-picture residual planes (host)."""
    from ..recon_tpu import _residual_fn, _pad_pow2
    res_all = []
    for it in items:
        sps = it["sps"]
        Wp = sps.pic_width_ctbs << sps.log2_ctb
        Hp = sps.pic_height_ctbs << sps.log2_ctb
        ncomp = 3 if sps.chroma_format_idc else 1
        planes = []
        for c in range(ncomp):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            planes.append(np.zeros((Hp >> sy, Wp >> sx), np.int32))
        res_all.append(planes)
    buckets = _tu_bucket_entries(items)
    for (n, use_dst, path, bd, rotate, scal, max_dyn), entries \
            in buckets.items():
        N = len(entries)
        P = _pad_pow2(N)
        coeffs, qp, rdpcm, mat = _bucket_inputs(items, entries, n, scal, P)
        fn = _residual_fn(n, use_dst, path, bd, max_dyn, rotate, scal)
        out = np.asarray(fn(jnp.asarray(coeffs), jnp.asarray(qp),
                            jnp.asarray(rdpcm), jnp.asarray(mat)))
        for k, (b, i, _) in enumerate(entries):
            tu = items[b]["pic"].tu_list[i]
            res_all[b][tu.comp][tu.y:tu.y + tu.h, tu.x:tu.x + tu.w] = out[k]
    # cross-component prediction (4:4:4) on the assembled planes
    for b, it in enumerate(items):
        sps, pic = it["sps"], it["pic"]
        if sps.chroma_format_idc != 3:
            continue
        for tu in pic.tu_list:
            if tu.comp and tu.cross_comp_alpha:
                sl = np.s_[tu.y:tu.y + tu.h, tu.x:tu.x + tu.w]
                lr = res_all[b][0][sl].astype(np.int64)
                r = res_all[b][tu.comp][sl].astype(np.int64)
                r += (tu.cross_comp_alpha * lr) >> 3
                res_all[b][tu.comp][sl] = np.clip(r, -32768, 32767)
    return res_all


# ---------------------------------------------------------------------------
# device-resident residual planes (the dag_decode path)
@functools.lru_cache(maxsize=None)
def _scatter_tu_fn(n):
    @jax.jit
    def f(stacked, out, ksel, bsel, ysel, xsel):
        vals = out[ksel]                                   # [Pm, n, n]
        iy = ysel[:, None, None] + jnp.arange(n)[None, :, None]
        ix = xsel[:, None, None] + jnp.arange(n)[None, None, :]
        ib = jnp.broadcast_to(bsel[:, None, None], vals.shape)
        return stacked.at[ib, jnp.broadcast_to(iy, vals.shape),
                          jnp.broadcast_to(ix, vals.shape)].set(
                              vals, mode="drop")
    return f


@functools.lru_cache(maxsize=None)
def _ccp_fn(n):
    """Cross-component prediction adjust on device residual planes."""
    @jax.jit
    def f(res_c, res_l, bsel, ysel, xsel, alpha):
        iy = ysel[:, None, None] + jnp.arange(n)[None, :, None]
        ix = xsel[:, None, None] + jnp.arange(n)[None, None, :]
        shp = (bsel.shape[0], n, n)
        ib = jnp.broadcast_to(bsel[:, None, None], shp)
        iy = jnp.broadcast_to(iy, shp)
        ix = jnp.broadcast_to(ix, shp)
        lr = res_l[ib, iy, ix]
        r = res_c[ib, iy, ix]
        r = jnp.clip(r + ((alpha[:, None, None] * lr) >> 3), -32768, 32767)
        return res_c.at[ib, iy, ix].set(r, mode="drop")
    return f


def _residual_planes_batch_device(items, Bp):
    """Device-resident residual build: scatter TU outputs straight into
    stacked [Bp, Hc, Wc] device planes; CCP applied on device.

    Only the (irreducible) coefficient buckets are uploaded; residual
    pixels never exist on the host.
    """
    from ..recon_tpu import _residual_fn, _pad_pow2
    from ..utils import xfer
    sps0 = items[0]["sps"]
    Wp = sps0.pic_width_ctbs << sps0.log2_ctb
    Hp = sps0.pic_height_ctbs << sps0.log2_ctb
    ncomp = 3 if sps0.chroma_format_idc else 1
    res_stacked = []
    for c in range(ncomp):
        sx = sps0.chroma_shift_x() if c else 0
        sy = sps0.chroma_shift_y() if c else 0
        res_stacked.append(jnp.zeros((Bp, Hp >> sy, Wp >> sx), jnp.int32))
    buckets = _tu_bucket_entries(items)
    for (n, use_dst, path, bd, rotate, scal, max_dyn), entries \
            in buckets.items():
        N = len(entries)
        P = _pad_pow2(N)
        coeffs, qp, rdpcm, mat = _bucket_inputs(items, entries, n, scal, P)
        fn = _residual_fn(n, use_dst, path, bd, max_dyn, rotate, scal)
        # halve the coefficient upload when levels fit int16 (they almost
        # always do below extended precision); widen back on device
        if np.abs(coeffs).max(initial=0) < 32768:
            coeffs = coeffs.astype(np.int16)
        cdev = xfer.up(coeffs, "coeff").astype(jnp.int32)
        qdev = xfer.up(qp.astype(np.int8), "coeff").astype(jnp.int32)
        rdev = xfer.up(rdpcm.astype(np.int8), "coeff").astype(jnp.int32)
        mdev = xfer.up(mat if mat.dtype == np.int32 and not scal
                       else mat.astype(np.uint8), "coeff").astype(jnp.int32)
        out = fn(cdev, qdev, rdev, mdev)                             # [P, n, n] device
        comp_arr = np.asarray([items[b]["pic"].tu_list[i].comp
                               for b, i, _ in entries], np.int32)
        for c in range(ncomp):
            sel = np.nonzero(comp_arr == c)[0]
            if not len(sel):
                continue
            M = len(sel)
            Pm = _pad_pow2(M, 16)
            ksel = np.zeros(Pm, np.int32)
            bsel = np.full(Pm, Bp, np.int32)               # pad -> dropped
            ysel = np.zeros(Pm, np.int32)
            xsel = np.zeros(Pm, np.int32)
            ksel[:M] = sel
            for j, k in enumerate(sel):
                b, i, _ = entries[k]
                tu = items[b]["pic"].tu_list[i]
                bsel[j] = b
                ysel[j] = tu.y
                xsel[j] = tu.x
            res_stacked[c] = _scatter_tu_fn(n)(
                res_stacked[c], out, xfer.up(ksel, "idx"),
                xfer.up(bsel, "idx"), xfer.up(ysel, "idx"),
                xfer.up(xsel, "idx"))
    # cross-component prediction (4:4:4) on device
    groups = {}
    for b, it in enumerate(items):
        if it["sps"].chroma_format_idc != 3:
            continue
        for tu in it["pic"].tu_list:
            if tu.comp and tu.cross_comp_alpha:
                groups.setdefault((tu.comp, tu.w), []).append(
                    (b, tu.y, tu.x, tu.cross_comp_alpha))
    for (c, n), ents in groups.items():
        from ..recon_tpu import _pad_pow2
        M = len(ents)
        Pm = _pad_pow2(M, 16)
        bsel = np.full(Pm, Bp, np.int32)
        ysel = np.zeros(Pm, np.int32)
        xsel = np.zeros(Pm, np.int32)
        alpha = np.zeros(Pm, np.int32)
        for j, (b, y, x, a) in enumerate(ents):
            bsel[j], ysel[j], xsel[j], alpha[j] = b, y, x, a
        res_stacked[c] = _ccp_fn(n)(
            res_stacked[c], res_stacked[0], xfer.up(bsel), xfer.up(ysel),
            xfer.up(xsel), xfer.up(alpha))
    return res_stacked


# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _scan_fn_batched(sizes, comp_is_luma, bd, W, H, res_gather=False):
    """The intra_wavefront scan vmapped over a leading picture axis.

    res_gather: residual blocks are gathered on device from a per-picture
    residual plane (device-resident path) instead of shipped per level
    slot from the host.
    """
    maxv = (1 << bd) - 1

    from .intra_wavefront import unpack_block_meta

    def step_factory(res_plane):
        def step(plane, data):
            for n in sizes:
                d = data[n]
                xs, ys, mode, filt, strong, dbf, av = \
                    unpack_block_meta(d, n)
                cx, cy = IK.border_coords(xs, ys, n, W, H)
                g = plane[cy, cx]
                vals = IK.substitute(g, av, bd)
                vals = IK.filter_refs(vals, n, bd, filt, strong)
                pred = IK.predict(vals, mode, n, comp_is_luma, bd, dbf)
                oy = jnp.arange(n)
                iy = ys[:, None, None] + oy[None, :, None]
                ix = xs[:, None, None] + oy[None, None, :]
                shp = pred.shape
                iy = jnp.broadcast_to(iy, shp)
                ix = jnp.broadcast_to(ix, shp)
                if res_gather:
                    res = res_plane[iy, ix]
                else:
                    res = d["res"]
                out = jnp.clip(pred + res, 0, maxv)
                plane = plane.at[iy, ix].set(out, mode="drop")
            return plane, None
        return step

    if res_gather:
        def run_one(plane, res_plane, data):
            plane, _ = jax.lax.scan(step_factory(res_plane), plane, data)
            return plane
    else:
        def run_one(plane, data):
            plane, _ = jax.lax.scan(step_factory(None), plane, data)
            return plane

    return jax.jit(jax.vmap(run_one))


def _intra_batch(items, comp, planes_all, res_all, mesh=None, stacked=None,
                 res_stacked=None):
    """Batched wavefront over all pictures for one component.

    With a mesh, the picture axis is sharded over its first axis (pure
    data parallelism -- XLA partitions the vmapped scan with no
    collectives; pictures pad up to a multiple of the mesh size with
    scatter-dropped dummies).

    stacked: optional device [B, Hp, Wp] planes (e.g. holding MC output).
    When given, the scan starts from it and the updated DEVICE array is
    returned without a host round trip; planes_all is not written.

    res_stacked: optional device [B', Hc, Wc] residual planes (B' >= B).
    When given, residual blocks are GATHERED on device (the fully
    device-resident path) and res_all is ignored."""
    from ..utils import xfer
    sps = items[0]["sps"]
    ssx = sps.chroma_shift_x() if comp else 0
    ssy = sps.chroma_shift_y() if comp else 0
    W = sps.width >> ssx
    H = sps.height >> ssy
    bd = sps.bit_depth_luma if comp == 0 else sps.bit_depth_chroma
    res_gather = res_stacked is not None
    preps = []
    for b, it in enumerate(items):
        constrained = bool(it["pps"].constrained_intra_pred)
        levels, L = prepare_component(
            it["sps"], it["pic"], it["zmap"], it["tile_map"], comp,
            None if res_gather else res_all[b], constrained)
        preps.append((levels, L))
    if all(lv is None for lv, _ in preps):
        return stacked
    sizes = tuple(sorted({n for lv, _ in preps if lv for n in lv}))
    Lmax = _pow2(max(max(L, 1) for _, L in preps))
    B = len(items)
    Bp = B if stacked is None else int(stacked.shape[0])
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        m = int(mesh.devices.size)
        Bp = max(Bp, -(-B // m) * m)
        axis = mesh.axis_names[0]

        def shard(a):
            spec = PartitionSpec(*((axis,) + (None,) * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))
    batched = {}
    for n in sizes:
        Kmax = _pow2(max((lv[n]["xs"].shape[1] for lv, _ in preps
                          if lv and n in lv), default=1), lo=1)
        T = 4 * n + 1

        def alloc(shape_tail, fill, dtype):
            return np.full((Bp, Lmax) + shape_tail, fill, dtype)

        d = dict(xs=alloc((Kmax,), W + 1024, np.int16),
                 ys=alloc((Kmax,), H + 1024, np.int16),
                 mode=alloc((Kmax,), 1, np.int8),
                 flags=alloc((Kmax,), 0, np.uint8),
                 av=alloc((Kmax, (T + 7) >> 3), 0, np.uint8))
        if not res_gather:
            d["res"] = alloc((Kmax, n, n), 0, np.int32)
        for b, (lv, _) in enumerate(preps):
            if not lv or n not in lv:
                continue
            src = lv[n]
            L0, K0 = src["xs"].shape[:2]
            for k, v in src.items():
                if k in d:
                    d[k][b, :L0, :K0] = v
        batched[n] = {k: shard(xfer.up(v, "intra_" + k)) if shard
                      else xfer.up(v, "intra_" + k)
                      for k, v in d.items()}
    run = _scan_fn_batched(sizes, comp == 0, bd, W, H, res_gather)
    if stacked is None:
        pl = [planes_all[b][comp] for b in range(B)]
        pl += [np.zeros_like(pl[0])] * (Bp - B)
        base = jnp.asarray(np.stack(pl))
        if shard:
            base = shard(base)
        if res_gather:
            out = np.asarray(run(base, res_stacked[:Bp], batched))
        else:
            out = np.asarray(run(base, batched))
        for b in range(B):
            planes_all[b][comp][:, :] = out[b]
        return None
    base = stacked
    if Bp > int(base.shape[0]):
        base = jnp.concatenate(
            [base, jnp.zeros((Bp - int(base.shape[0]),) + base.shape[1:],
                             base.dtype)])
    if shard:
        base = shard(base)
    if res_gather:
        rs = res_stacked
        if int(rs.shape[0]) < Bp:
            rs = jnp.concatenate(
                [rs, jnp.zeros((Bp - int(rs.shape[0]),) + rs.shape[1:],
                               rs.dtype)])
        if shard:
            rs = shard(rs)
        out = run(base, rs[:Bp], batched)
    else:
        out = run(base, batched)
    return out[:Bp]


# ---------------------------------------------------------------------------
def decode_intra_batch(data, parse="native", check_sei_hash=False,
                       mesh=None):
    """Decode an all-intra Annex-B stream with cross-picture batching.

    Returns the list of DecodedPicture in output order (same results as
    Decoder(recon="tpu"), which reconstructs one picture at a time).
    mesh: optional jax.sharding.Mesh -- shards the picture axis of the
    wavefront over the mesh's first axis (decode data parallelism over
    pictures; the multi-chip equivalent of the reference's one-process
    serial decode, SURVEY.md section 2.5).
    """
    from ..hostdec.decoder import Decoder, DecodedPicture
    from ..recon_tpu import deblock_picture_tpu, sao_picture_tpu
    from ..hostdec.loopfilter_np import _restore_unfiltered
    dec = Decoder(parse=parse, recon="collect")
    dec.decode_annexb(data)
    items = getattr(dec, "collected", [])
    if not items:
        return []
    for it in items:
        if it["pic"].inter_list:
            raise ValueError("decode_intra_batch: stream has inter "
                             "pictures; batching needs an all-intra stream")
    sps0 = items[0]["sps"]
    for it in items:
        if (it["sps"].width, it["sps"].height,
                it["sps"].chroma_format_idc) != \
                (sps0.width, sps0.height, sps0.chroma_format_idc):
            raise ValueError("decode_intra_batch: mixed picture geometry")

    res_all = _residual_planes_batch(items)
    planes_all = [[np.zeros_like(p) for p in res] for res in res_all]
    for b, it in enumerate(items):
        sps = it["sps"]
        for (c, x, y, w, h, samples, bits) in it["pic"].pcm_list:
            bd = sps.bit_depth_luma if c == 0 else sps.bit_depth_chroma
            planes_all[b][c][y:y + h, x:x + w] = samples << (bd - bits)
    ncomp = 3 if sps0.chroma_format_idc else 1
    for c in range(ncomp):
        _intra_batch(items, c, planes_all, res_all, mesh=mesh)

    outs = []
    for b, it in enumerate(items):
        sps, pps, pic = it["sps"], it["pps"], it["pic"]
        planes = planes_all[b]
        if pps.transquant_bypass_enabled or \
                (sps.pcm_enabled and sps.pcm_loop_filter_disabled):
            pic.prefilter_planes = [p.copy() for p in planes]
        deblock_picture_tpu(planes, pic, sps, pps, it["tile_map"])
        if sps.sao_enabled:
            sao_picture_tpu(planes, pic, sps, pps, it["tile_map"])
        _restore_unfiltered(planes, None, pic, sps)
        dp = DecodedPicture(it["poc"], planes, sps, it["temporal_id"],
                            it["output_flag"])
        dp.pic_syntax = pic
        dp.hash_status = None
        if check_sei_hash and it["pending_hash"] is not None:
            dec._pending_hash = it["pending_hash"]
            dec._verify_hash(dp)
        outs.append(dp)
    return outs
