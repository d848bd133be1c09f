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
def _residual_planes_batch(items):
    """Cross-picture TU bucketing -> per-picture residual planes."""
    from ..recon_tpu import _residual_fn, _pad_pow2
    from ..hostdec.tables import build_scaling_matrices
    res_all = []
    buckets = {}
    mats_cache = {}
    for b, it in enumerate(items):
        sps, pic = it["sps"], it["pic"]
        Wp = sps.pic_width_ctbs << sps.log2_ctb
        Hp = sps.pic_height_ctbs << sps.log2_ctb
        ncomp = 3 if sps.chroma_format_idc else 1
        planes = []
        for c in range(ncomp):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            planes.append(np.zeros((Hp >> sy, Wp >> sx), np.int32))
        res_all.append(planes)
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
    for (n, use_dst, path, bd, rotate, scal, max_dyn), entries \
            in buckets.items():
        N = len(entries)
        P = _pad_pow2(N)
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
@functools.lru_cache(maxsize=None)
def _scan_fn_batched(sizes, comp_is_luma, bd, W, H):
    """The intra_wavefront scan vmapped over a leading picture axis."""
    maxv = (1 << bd) - 1

    def step(plane, data):
        for n in sizes:
            d = data[n]
            xs, ys = d["xs"], d["ys"]
            cx, cy = IK.border_coords(xs, ys, n, W, H)
            g = plane[cy, cx]
            vals = IK.substitute(g, d["av"], bd)
            vals = IK.filter_refs(vals, n, bd, d["filt"], d["strong"])
            pred = IK.predict(vals, d["mode"], n, comp_is_luma, bd, d["dbf"])
            out = jnp.clip(pred + d["res"], 0, maxv)
            oy = jnp.arange(n)
            iy = ys[:, None, None] + oy[None, :, None]
            ix = xs[:, None, None] + oy[None, None, :]
            iy = jnp.broadcast_to(iy, out.shape)
            ix = jnp.broadcast_to(ix, out.shape)
            plane = plane.at[iy, ix].set(out, mode="drop")
        return plane, None

    def run_one(plane, data):
        plane, _ = jax.lax.scan(step, plane, data)
        return plane

    return jax.jit(jax.vmap(run_one))


def _intra_batch(items, comp, planes_all, res_all, mesh=None, stacked=None):
    """Batched wavefront over all pictures for one component.

    With a mesh, the picture axis is sharded over its first axis (pure
    data parallelism -- XLA partitions the vmapped scan with no
    collectives; pictures pad up to a multiple of the mesh size with
    scatter-dropped dummies).

    stacked: optional device [B, Hp, Wp] planes (e.g. holding MC output).
    When given, the scan starts from it and the updated DEVICE array is
    returned without a host round trip; planes_all is not written."""
    sps = items[0]["sps"]
    ssx = sps.chroma_shift_x() if comp else 0
    ssy = sps.chroma_shift_y() if comp else 0
    W = sps.width >> ssx
    H = sps.height >> ssy
    bd = sps.bit_depth_luma if comp == 0 else sps.bit_depth_chroma
    preps = []
    for b, it in enumerate(items):
        constrained = bool(it["pps"].constrained_intra_pred)
        levels, L = prepare_component(it["sps"], it["pic"], it["zmap"],
                                      it["tile_map"], comp, res_all[b],
                                      constrained)
        preps.append((levels, L))
    if all(lv is None for lv, _ in preps):
        return stacked
    sizes = tuple(sorted({n for lv, _ in preps if lv for n in lv}))
    Lmax = _pow2(max(max(L, 1) for _, L in preps))
    B = len(items)
    Bp = B
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        m = int(mesh.devices.size)
        Bp = -(-B // m) * m
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

        d = dict(xs=alloc((Kmax,), W + 1024, np.int32),
                 ys=alloc((Kmax,), H + 1024, np.int32),
                 mode=alloc((Kmax,), 1, np.int32),
                 filt=alloc((Kmax,), False, bool),
                 strong=alloc((Kmax,), False, bool),
                 dbf=alloc((Kmax,), False, bool),
                 res=alloc((Kmax, n, n), 0, np.int32),
                 av=alloc((Kmax, T), False, bool))
        for b, (lv, _) in enumerate(preps):
            if not lv or n not in lv:
                continue
            src = lv[n]
            L0, K0 = src["xs"].shape[:2]
            for k, v in src.items():
                d[k][b, :L0, :K0] = v
        batched[n] = {k: shard(jnp.asarray(v)) if shard else jnp.asarray(v)
                      for k, v in d.items()}
    run = _scan_fn_batched(sizes, comp == 0, bd, W, H)
    if stacked is None:
        pl = [planes_all[b][comp] for b in range(B)]
        pl += [np.zeros_like(pl[0])] * (Bp - B)
        base = jnp.asarray(np.stack(pl))
        if shard:
            base = shard(base)
        out = np.asarray(run(base, batched))
        for b in range(B):
            planes_all[b][comp][:, :] = out[b]
        return None
    base = stacked
    if Bp > B:
        base = jnp.concatenate(
            [base, jnp.zeros((Bp - B,) + base.shape[1:], base.dtype)])
    if shard:
        base = shard(base)
    out = run(base, batched)
    return out[:B]


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
