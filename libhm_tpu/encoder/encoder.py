"""HEVC encoder — all-intra baseline (v1 of the encoder subsystem).

Rebuild of the reference encoder's skeleton (TEncTop/TEncSlice/TEncCu —
source/Lib/TLibEncoder) with a deliberately simple tool profile this round:
fixed-QP all-intra, SAD mode decision over all 35 modes, fixed CU size with
boundary splitting, DM chroma, no RDOQ/SAO/deblock.  The output is a
conformant Main/Main10 bitstream carrying a decoded-picture-hash SEI; both
this framework's decoder and the HM reference binary verify it bit-exact.

The heavy parts (mode search SAD, forward transforms) are numpy here and
move onto the TPU ops as the encoder widens (see libhm_tpu/ops/transform).
"""
import numpy as np

from ..hostdec import refimpl
from ..hostdec import params as hls
from ..hostdec.picture import PicSyntax, MODE_INTRA
from ..hostdec.slicedec import SliceDecoder
from ..hostdec.tables import make_context_bank, CHROMA_QP_SCALE
from .cabac_enc import BitWriter, CabacEncoder
from .hls_writer import (write_vps, write_sps, write_pps, write_slice_header,
                         hash_sei_md5, nal_unit)
from .residual_enc import encode_residual
from .transforms import forward_transform, quantize


class EncoderConfig:
    def __init__(self, width, height, qp=32, bit_depth=8, cu_size=32):
        self.width = width
        self.height = height
        self.qp = qp
        self.bit_depth = bit_depth
        self.chroma_format_idc = 1
        self.log2_ctb = 6
        self.log2_min_cb = 3
        self.log2_min_tb = 2
        self.log2_max_tb = 5
        self.max_tr_hierarchy_inter = 0
        self.max_tr_hierarchy_intra = 0
        self.log2_max_poc_lsb = 8
        self.max_dec_pic_buffering = 2
        self.num_reorder_pics = 0
        self.sao = 0
        self.deblock = False
        self.tmvp = 0
        self.strong_intra_smoothing = 0
        self.num_ref_l0 = 1
        self.num_ref_l1 = 1
        self.max_merge_cand = 5
        self.st_rps = []
        self.cu_size = cu_size


def _mk_sps_pps(cfg):
    sps = hls.SPS()
    sps.width, sps.height = cfg.width, cfg.height
    sps.bit_depth_luma = sps.bit_depth_chroma = cfg.bit_depth
    sps.chroma_format_idc = cfg.chroma_format_idc
    sps.log2_ctb = cfg.log2_ctb
    sps.log2_min_cb = cfg.log2_min_cb
    sps.log2_min_tb = cfg.log2_min_tb
    sps.log2_max_tb = cfg.log2_max_tb
    sps.max_tr_hierarchy_intra = cfg.max_tr_hierarchy_intra
    sps.max_tr_hierarchy_inter = cfg.max_tr_hierarchy_inter
    sps.strong_intra_smoothing = cfg.strong_intra_smoothing
    sps.sao_enabled = cfg.sao
    pps = hls.PPS()
    pps.init_qp = cfg.qp
    pps.deblocking_disabled = 0 if cfg.deblock else 1
    return sps, pps


class IntraEncoder:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.sps, self.pps = _mk_sps_pps(cfg)

    # ------------------------------------------------------------------
    def encode_stream(self, frames):
        """frames: list of (Y, U, V) uint arrays. Returns Annex-B bytes."""
        cfg = self.cfg
        out = bytearray()
        out += nal_unit(32, write_vps(cfg))
        out += nal_unit(33, write_sps(cfg))
        out += nal_unit(34, write_pps(cfg))
        for frame in frames:
            slice_rbsp, recon = self.encode_picture(frame)
            out += nal_unit(19, slice_rbsp)          # IDR_W_RADL
            out += nal_unit(40, hash_sei_md5(recon, cfg.bit_depth))
        return bytes(out)

    # ------------------------------------------------------------------
    def encode_picture(self, frame):
        cfg, sps, pps = self.cfg, self.sps, self.pps
        Wp = sps.pic_width_ctbs << sps.log2_ctb
        Hp = sps.pic_height_ctbs << sps.log2_ctb
        self.pic = PicSyntax(sps, pps)
        self.sd = SliceDecoder(sps, pps, self.pic)
        self.pic.slice_idx[:, :] = 0
        self.recon = []
        self.orig = []
        for c in range(3):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            pl = np.zeros((Hp >> sy, Wp >> sx), np.int32)
            src = frame[c].astype(np.int32)
            h, w = src.shape
            pl[:h, :w] = src
            # edge padding of the source so boundary CUs predict sensibly
            pl[h:, :w] = src[-1:, :]
            pl[:h, w:] = src[:, -1:]
            pl[h:, w:] = src[-1, -1]
            self.orig.append(pl)
            self.recon.append(np.zeros_like(pl))

        w = write_slice_header(cfg, 19, 0, 2, cfg.qp)
        self.enc = CabacEncoder(w)
        self.bank = make_context_bank(2, cfg.qp, 0)

        nctu_x = sps.pic_width_ctbs
        nctu_y = sps.pic_height_ctbs
        last = nctu_x * nctu_y - 1
        for addr in range(nctu_x * nctu_y):
            cx = (addr % nctu_x) << sps.log2_ctb
            cy = (addr // nctu_x) << sps.log2_ctb
            self.encode_cqt(cx, cy, sps.log2_ctb, 0)
            self.enc.encode_terminate(1 if addr == last else 0)
        # the CABAC flush's final bit doubles as the rbsp stop bit; pad zeros
        w.align_zero()
        W, H = sps.width, sps.height
        crop = []
        for c in range(3):
            sx = sps.chroma_shift_x() if c else 0
            sy = sps.chroma_shift_y() if c else 0
            crop.append(self.recon[c][:H >> sy, :W >> sx])
        return w.data(), crop

    # ------------------------------------------------------------------
    def encode_cqt(self, x, y, log2size, depth):
        sps, pic, enc, bank = self.sps, self.pic, self.enc, self.bank
        size = 1 << log2size
        inside = (x + size <= sps.width) and (y + size <= sps.height)
        target_log2 = max(sps.log2_min_cb,
                          min(log2size,
                              (self.cfg.cu_size).bit_length() - 1))
        want_split = log2size > target_log2
        if inside and log2size > sps.log2_min_cb:
            ctx = 0
            if self.sd.available(x - 1, y, x, y, False) and \
                    pic.depth[y >> 2, (x - 1) >> 2] > depth:
                ctx += 1
            if self.sd.available(x, y - 1, x, y, False) and \
                    pic.depth[(y - 1) >> 2, x >> 2] > depth:
                ctx += 1
            enc.encode_bin(bank["split_cu"], ctx, 1 if want_split else 0)
            split = want_split
        else:
            split = log2size > sps.log2_min_cb  # forced at boundary
        if split:
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                nx, ny = x + dx, y + dy
                if nx < sps.width and ny < sps.height:
                    self.encode_cqt(nx, ny, log2size - 1, depth + 1)
            return
        self.encode_cu(x, y, log2size, depth)

    # ------------------------------------------------------------------
    def _intra_pred(self, comp, x, y, n, mode):
        sps = self.sps
        bd = sps.bit_depth_luma if comp == 0 else sps.bit_depth_chroma
        plane = self.recon[comp]
        sd, pic = self.sd, self.pic
        ssx = sps.chroma_shift_x() if comp else 0
        ssy = sps.chroma_shift_y() if comp else 0
        W = sps.width >> ssx
        H = sps.height >> ssy
        lx_anchor, ly_anchor = x << ssx, y << ssy
        z_cur = sd._zmap[ly_anchor >> 2, lx_anchor >> 2]

        def avail(cx, cy):
            if cx < 0 or cy < 0 or cx >= W or cy >= H:
                return False
            lx, ly = cx << ssx, cy << ssy
            return sd._zmap[ly >> 2, lx >> 2] < z_cur
        top, left = refimpl.fill_reference_samples(plane, avail, x, y, n, bd)
        if refimpl.use_filtered_refs(comp, n, mode, sps):
            strong = bool(sps.strong_intra_smoothing) and comp == 0
            top, left = refimpl.filter_reference_samples(top, left, n, mode,
                                                         bd, strong)
        return refimpl.predict_intra(top, left, n, mode, comp, bd, sps)

    def encode_cu(self, x, y, log2size, depth):
        sps, cfg, pic, enc, bank = self.sps, self.cfg, self.pic, self.enc, self.bank
        size = 1 << log2size
        pic.set_rect(pic.depth, x, y, size, size, depth)
        pic.set_rect(pic.pred_mode, x, y, size, size, MODE_INTRA)

        # --- luma mode decision (SAD over all 35 modes) ---
        orig = self.orig[0][y:y + size, x:x + size]
        best_mode, best_cost = 1, 1 << 60
        for mode in range(35):
            pred = self._intra_pred(0, x, y, size, mode)
            cost = int(np.abs(pred - orig).sum())
            if cost < best_cost:
                best_cost, best_mode = cost, mode
        mode = best_mode
        pic.set_rect(pic.intra_y, x, y, size, size, mode)

        if log2size == sps.log2_min_cb:
            enc.encode_bin(bank["part_size"], 0, 1)  # 2Nx2N
        # intra luma mode: MPM flag + bins
        preds = self.sd._intra_mpm(x, y)
        if mode in preds:
            idx = preds.index(mode)
            enc.encode_bin(bank["intra_luma_mpm"], 0, 1)
            if idx == 0:
                enc.encode_bypass(0)
            else:
                enc.encode_bypass(1)
                enc.encode_bypass(idx - 1)
        else:
            enc.encode_bin(bank["intra_luma_mpm"], 0, 0)
            rem = mode
            for p in sorted(preds, reverse=True):
                if rem > p:
                    rem -= 1
            enc.encode_bypass_bins(rem, 5)
        # chroma: DM
        enc.encode_bin(bank["intra_chroma_mode"], 0, 0)
        pic.set_rect(pic.intra_c, x, y, size, size, mode)

        # --- transform + recon per component ---
        # TU log2: luma TU == CU (within maxTB); chroma scaled
        resids = []
        cbfs = []
        for comp in range(3):
            ssx = sps.chroma_shift_x() if comp else 0
            ssy = sps.chroma_shift_y() if comp else 0
            n = size >> ssx
            cx, cy = x >> ssx, y >> ssy
            cmode = mode
            bd = cfg.bit_depth
            pred = self._intra_pred(comp, cx, cy, n, cmode)
            orig_c = self.orig[comp][cy:cy + n, cx:cx + n]
            resi = (orig_c - pred).astype(np.int32)
            use_dst = comp == 0 and n == 4
            coef = forward_transform(resi, use_dst, bd)
            qp = self._qp_for_comp(comp)
            lev = quantize(coef, qp, n.bit_length() - 1, bd, True)
            cbf = 1 if lev.any() else 0
            if cbf:
                deq = refimpl.dequant(lev, qp, n.bit_length() - 1, bd)
                rec_resi = refimpl.inverse_transform(deq, use_dst, bd)
            else:
                rec_resi = np.zeros_like(resi)
            self.recon[comp][cy:cy + n, cx:cx + n] = np.clip(
                pred + rec_resi, 0, (1 << bd) - 1)
            resids.append(lev)
            cbfs.append(cbf)

        # --- TT syntax: no subdiv flag at this profile; cbfs then residuals
        enc.encode_bin(bank["qt_cbf"], 5 + 0, cbfs[1])
        enc.encode_bin(bank["qt_cbf"], 5 + 0, cbfs[2])
        enc.encode_bin(bank["qt_cbf"], 1, cbfs[0])
        from ..hostdec.tables import SCAN_DIAG, SCAN_HOR, SCAN_VER
        for comp in range(3):
            if not cbfs[comp]:
                continue
            n = resids[comp].shape[0]
            max_wh = 8 >> (sps.chroma_shift_x() if comp else 0)
            scan = SCAN_DIAG
            if n <= max_wh:
                if abs(mode - 26) <= 4:
                    scan = SCAN_HOR
                elif abs(mode - 10) <= 4:
                    scan = SCAN_VER
            encode_residual(enc, bank, resids[comp], comp, scan)
        self.pic.set_rect(pic.qp, x, y, size, size, cfg.qp)

    def _qp_for_comp(self, comp):
        cfg, sps = self.cfg, self.sps
        if comp == 0:
            return cfg.qp + 6 * (cfg.bit_depth - 8)
        off_bd = 6 * (cfg.bit_depth - 8)
        qpi = max(-off_bd, min(57, cfg.qp))
        if qpi >= 0:
            qpi = CHROMA_QP_SCALE[sps.chroma_format_idc][qpi]
        return qpi + off_bd
