"""Encoder tool matrix: lossless (transquant bypass force), transform
skip, cabac_init_flag, HRD/VUI + timing SEIs, per-LCU rate control —
each round-tripped through our decoder's hash check and the HM oracle.
(reference: TEncSbac/TEncCavlc tool paths, TEncRateCtrl.cpp:761-868)
"""
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HM_DEC = os.path.join(ROOT, ".refbuild", "TAppDecoder")


def _edges(n=2, w=64, h=64):
    out = []
    for t in range(n):
        y = np.zeros((h, w), np.uint8)
        y[::7] = 255
        y[:, ::5] = 128
        y[t::9] = 64
        out.append((y, np.full((h // 2, w // 2), 128, np.uint8),
                    np.full((h // 2, w // 2), 96, np.uint8)))
    return out


def _noise(n=2, w=64, h=64):
    rng = np.random.RandomState(5)
    return [(rng.randint(0, 256, (h, w)).astype(np.uint8),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def _encode(frames, gop="intra", **mods):
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    cfg = EncoderConfig(64, 64, qp=30, gop=gop)
    for k, v in mods.items():
        setattr(cfg, k, v)
    return IntraEncoder(cfg).encode_stream(frames)


def _verify(stream, tmp_path, nframes=2):
    from libhm_tpu.hostdec.decoder import Decoder
    d = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    outs = d.decode_annexb(stream)
    assert all(r.hash_status == "OK" for r in d.output_records)
    if os.path.exists(HM_DEC):
        p = tmp_path / "s.bin"
        p.write_bytes(stream)
        r = subprocess.run([HM_DEC, "-b", str(p), "-o", "/dev/null"],
                           capture_output=True, text=True)
        assert r.stdout.count("(OK)") == nframes, r.stdout[-400:]
    return outs, d


def test_lossless_exact(tmp_path):
    frames = _noise()
    stream = _encode(frames, gop="lowdelayP", lossless=True)
    outs, _ = _verify(stream, tmp_path)
    for i in range(2):
        for c in range(3):
            assert (outs[i][c] == frames[i][c]).all(), \
                "lossless decode must equal the source exactly"


@pytest.mark.parametrize("gop", ["intra", "lowdelayP"])
def test_transform_skip(gop, tmp_path):
    stream = _encode(_edges(), gop=gop, transform_skip=True)
    _verify(stream, tmp_path)


def test_cabac_init(tmp_path):
    stream = _encode(_edges(3), gop="lowdelayB", cabac_init=True)
    _verify(stream, tmp_path, nframes=3)


def test_hrd_vui_seis(tmp_path):
    from libhm_tpu.hostdec import sei as S
    stream = _encode(_edges(), vui_enabled=True, hrd_enabled=True)
    _, d = _verify(stream, tmp_path)
    sps = list(d.sps_map.values())[0]
    assert sps.vui is not None and sps.vui.hrd is not None
    types = [t for _, t, _ in d.sei_log]
    assert S.SEI_BUFFERING_PERIOD in types
    assert S.SEI_PIC_TIMING in types
    assert S.SEI_ACTIVE_PARAMETER_SETS in types


def test_per_lcu_rate_control(tmp_path):
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    frames = _noise(3, 192, 128)
    cfg = EncoderConfig(192, 128, qp=32, gop="lowdelayP", rate_kbps=400,
                        fps=30.0)
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path, nframes=3)


def test_b_slice_weighted_pred(tmp_path):
    """Explicit WP on a fading low-delay B sequence (both lists; bi and
    uni PUs; reference WeightPredAnalysis + addWeightBi)."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    ys, xs = np.mgrid[0:64, 0:64]
    frames = []
    for t in range(4):
        g = 40 * t
        frames.append((
            np.clip(((xs * 2 + ys) % 200) + g, 0, 255).astype(np.uint8),
            np.clip(((xs[::2, ::2]) % 200) + g // 2, 0, 255).astype(np.uint8),
            np.clip(((ys[::2, ::2]) % 200) + g // 2, 0, 255).astype(np.uint8)))
    cfg = EncoderConfig(64, 64, qp=30, gop="lowdelayB", weighted_pred=True)
    cfg.weighted_bipred = True
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path, nframes=4)


def test_scaling_list_encode(tmp_path):
    """SPS default scaling lists driving the quantiser (ScalingList: 1)."""
    stream = _encode(_edges(), gop="lowdelayP", scaling_list=True)
    _verify(stream, tmp_path)


def test_pcm_encode(tmp_path):
    """IPCM: noise at very low QP makes raw samples cheaper than coded
    residual; the emitted PCM blocks must round-trip bit-exact (CABAC
    engine restart after the raw payload; reference IPCMSearch)."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    from libhm_tpu.hostdec.decoder import Decoder
    rng = np.random.RandomState(5)
    frames = [(rng.randint(0, 256, (64, 64)).astype(np.uint8),
               rng.randint(0, 256, (32, 32)).astype(np.uint8),
               rng.randint(0, 256, (32, 32)).astype(np.uint8))
              for _ in range(2)]
    cfg = EncoderConfig(64, 64, qp=4, gop="intra")
    cfg.pcm_enabled = True
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path)
    d = Decoder(parse="python", recon="numpy")
    d.decode_annexb(stream)
    assert len(d.output_records[0].pic_syntax.pcm_list) > 0, \
        "expected PCM blocks to be chosen at this QP"


def test_intra_rqt_split(tmp_path):
    """QuadtreeTUMaxDepthIntra > 1: the RD tree may code 2Nx2N intra CUs
    with a one-level TU split (split_transform_flag = 1); round-trips on
    all decoders and actually exercises the split."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    from libhm_tpu.hostdec.decoder import Decoder
    rng = np.random.RandomState(9)
    ys, xs = np.mgrid[0:128, 0:192]
    frames = []
    for t in range(2):
        y = ((xs * 2 + ys + 7 * t) % 256).astype(np.int32)
        y[32:64, 32:96] = rng.randint(0, 256, (32, 64))
        frames.append((y.astype(np.uint8),
                       ((xs[::2, ::2] + t) % 256).astype(np.uint8),
                       ((ys[::2, ::2]) % 256).astype(np.uint8)))
    cfg = EncoderConfig(192, 128, qp=30, gop="intra")
    cfg.max_tr_hierarchy_intra = 1
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path)
    d = Decoder(parse="python", recon="numpy")
    d.decode_annexb(stream)
    pic = d.output_records[0].pic_syntax
    depth = np.asarray(pic.depth)
    part = np.asarray(pic.part_size)
    split_found = False
    for b in pic.intra_list:
        if b.comp:
            continue
        cu = 64 >> int(depth[b.y >> 2, b.x >> 2])
        if b.w < cu and part[b.y >> 2, b.x >> 2] == 0:   # 2Nx2N
            split_found = True
            break
    assert split_found, "expected at least one RQT-split intra CU"


def test_inter_rqt_split(tmp_path):
    """QuadtreeTUMaxDepthInter > 1: inter CUs RD-try a one-level TU split;
    non-2Nx2N parts signal the now-coded subdiv flags."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.RandomState(11)
    ys, xs = np.mgrid[0:128, 0:192]
    frames = []
    for t in range(3):
        y = ((xs * 2 + ys + 6 * t) % 256).astype(np.int32)
        y[40:72, 48:112] = rng.randint(0, 256, (32, 64))
        frames.append((y.astype(np.uint8),
                       ((xs[::2, ::2] + t) % 256).astype(np.uint8),
                       ((ys[::2, ::2]) % 256).astype(np.uint8)))
    cfg = EncoderConfig(192, 128, qp=30, gop="lowdelayP")
    cfg.max_tr_hierarchy_inter = 1
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path, nframes=3)


def test_cu64_forced_tu_split(tmp_path):
    """64x64 CTU coding: CUs above the maximum TB size carry forced
    (inferred-subdiv) one-level TU splits in both intra and inter paths —
    HM's default MaxCUWidth geometry."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.RandomState(13)
    ys, xs = np.mgrid[0:128, 0:192]
    frames = []
    for t in range(3):
        y = ((xs + ys * 2 + 5 * t) % 256).astype(np.int32)
        y[24:56, 64:128] = rng.randint(0, 256, (32, 64))
        frames.append((y.astype(np.uint8),
                       ((xs[::2, ::2] + t) % 256).astype(np.uint8),
                       ((ys[::2, ::2]) % 256).astype(np.uint8)))
    cfg = EncoderConfig(192, 128, qp=30, gop="randomaccess", cu_size=64)
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path, nframes=3)


def test_field_coding(tmp_path):
    """FieldCoding: 1 — frames split into top/bottom field pictures, VUI
    field_seq_flag set, pic_struct 1/2 in the timing SEIs (reference
    TEncGOP isField paths)."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    from libhm_tpu.hostdec.decoder import Decoder
    from libhm_tpu.hostdec import sei as S
    ys, xs = np.mgrid[0:128, 0:192]
    frames = [(((xs * 2 + ys + 7 * t) % 256).astype(np.uint8),
               ((xs[::2, ::2] + t) % 256).astype(np.uint8),
               ((ys[::2, ::2]) % 256).astype(np.uint8)) for t in range(2)]
    cfg = EncoderConfig(192, 128, qp=30, gop="lowdelayP")
    cfg.field_coding = True
    cfg.hrd_enabled = True
    stream = IntraEncoder(cfg).encode_stream(frames)
    _verify(stream, tmp_path, nframes=4)
    d = Decoder(parse="python", recon="numpy")
    outs = d.decode_annexb(stream)
    assert len(outs) == 4 and outs[0][0].shape[0] == 64
    sps = list(d.sps_map.values())[0]
    assert sps.vui.field_seq == 1
    structs = [o.pic_struct for _, t, o in d.sei_log
               if t == S.SEI_PIC_TIMING]
    assert structs == [1, 2, 1, 2]


@pytest.mark.parametrize("gop", ["intra", "lowdelayP", "lowdelayB"])
def test_monochrome_encode(gop, tmp_path):
    """4:0:0 encode (reference TAppEncCfg ChromaFormatIDC=400): no chroma
    syntax anywhere — intra_chroma_pred_mode, chroma cbfs and the slice
    SAO chroma flag are all absent — and HM round-trips every hash."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.RandomState(11)
    ys, xs = np.mgrid[0:64, 0:64]
    frames = [(((xs * 2 + ys + 9 * t) % 256 +
                rng.randint(0, 24, (64, 64))).clip(0, 255)
               .astype(np.uint8),) for t in range(3)]
    cfg = EncoderConfig(64, 64, qp=30, gop=gop, chroma_format_idc=0)
    stream = IntraEncoder(cfg).encode_stream(frames)
    from libhm_tpu.hostdec.decoder import Decoder
    d = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    outs = d.decode_annexb(stream)
    assert len(outs) == 3 and all(len(pic) == 1 for pic in outs)
    assert all(r.hash_status == "OK" for r in d.output_records)
    if os.path.exists(HM_DEC):
        p = tmp_path / "mono.bin"
        p.write_bytes(stream)
        r = subprocess.run([HM_DEC, "-b", str(p), "-o", "/dev/null"],
                           capture_output=True, text=True)
        assert r.stdout.count("(OK)") == 3, r.stdout[-400:]


def test_custom_scaling_list_file(tmp_path):
    """ScalingList=2 + ScalingListFile (reference TAppEncCfg /
    TComScalingList::xParseScalingList): the file's matrices are signaled
    in the SPS, quant/dequant use them, HM round-trips the hashes, and a
    stream from HM's own encoder with the same file decodes bit-exact."""
    from libhm_tpu.hostdec.tables import default_scaling_list
    from libhm_tpu.encoder.options import read_scaling_list_file
    sizes = ["4X4", "8X8", "16X16", "32X32"]
    lines = []
    for size_id in range(4):
        n = 16 if size_id == 0 else 64
        step = 3 if size_id == 3 else 1
        for matrix_id in range(0, 6, step):
            kind = "INTRA" if matrix_id < 3 else "INTER"
            comp = ["LUMA", "CHROMAU", "CHROMAV"][matrix_id % 3]
            name = f"{kind}{sizes[size_id]}_{comp}"
            lst, dc = default_scaling_list(size_id, matrix_id)
            lst = [min(255, v + 2 + (i % 3)) for i, v in enumerate(lst[:n])]
            lines += [f"{name} =", ", ".join(map(str, lst))]
            if size_id > 1:
                lines += [f"{name}_DC =", str(min(255, dc + 3))]
    slf = tmp_path / "sl.txt"
    slf.write_text("\n".join(lines) + "\n")

    from libhm_tpu.apps.enc_app import main as enc_main
    rng = np.random.RandomState(9)
    ys, xs = np.mgrid[0:64, 0:64]
    buf = b""
    for t in range(2):
        buf += (((xs + ys * 2 + 9 * t) % 256).astype(np.uint8)
                + rng.randint(0, 10, (64, 64)).astype(np.uint8)).tobytes()
        buf += rng.randint(0, 256, (2, 32, 32)).astype(np.uint8).tobytes()
    src = tmp_path / "in.yuv"
    src.write_bytes(buf)
    out = tmp_path / "out.bin"
    rc = enc_main(["-c", "/root/reference/cfg/encoder_lowdelay_main.cfg",
                   "-i", str(src), "-b", str(out), "-wdt", "64", "-hgt",
                   "64", "-f", "2", "-q", "32", "ScalingList=2",
                   f"ScalingListFile={slf}", "SEIDecodedPictureHash=1"])
    assert rc == 0
    data = out.read_bytes()
    from libhm_tpu.hostdec import nal as N
    from libhm_tpu.hostdec.params import parse_sps
    sps = next(parse_sps(N.parse_nal(e).rbsp) for e in N.split_annexb(data)
               if N.parse_nal(e).nal_type == 33)
    fdata = read_scaling_list_file(str(slf))
    assert sps.scaling_list_data is not None
    for k in fdata:
        assert tuple(sps.scaling_list_data[k][0]) == tuple(fdata[k][0])
        assert sps.scaling_list_data[k][1] == fdata[k][1]
    from libhm_tpu.hostdec.decoder import Decoder
    d = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    d.decode_annexb(data)
    assert all(r.hash_status == "OK" for r in d.output_records)
    if os.path.exists(HM_DEC):
        r = subprocess.run([HM_DEC, "-b", str(out), "-o", "/dev/null"],
                           capture_output=True, text=True)
        assert r.stdout.count("(OK)") == 2, r.stdout[-400:]


def test_rate_control_target_accuracy(tmp_path):
    """Full R-lambda rate control hits target bitrates (reference
    TEncRateCtrl: GOP window allocation + picture/LCU lambda estimation +
    LMS model adaptation).  Encodes the same clip at two targets and
    asserts the achieved VCL rate lands within 8% of each, that the two
    streams actually differ in size proportionally, and that the per-LCU
    controller produced non-degenerate QP maps."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    from libhm_tpu.hostdec import nal as N

    rng = np.random.RandomState(3)
    ys, xs = np.mgrid[0:96, 0:160]
    frames = []
    for t in range(20):
        y = (xs * 3 + ys * 2 + t * 7) % 220 + rng.randint(0, 12, (96, 160))
        u = ((xs[::2, ::2] + t * 3) % 200) + 10
        v = ((ys[::2, ::2] * 2 + t * 5) % 200) + 20
        frames.append((np.clip(y, 0, 255).astype(np.uint8),
                       u.astype(np.uint8), v.astype(np.uint8)))

    achieved = {}
    for target in (300, 800):
        cfg = EncoderConfig(160, 96, qp=32, gop="lowdelayP",
                            rate_kbps=target, fps=30.0)
        enc = IntraEncoder(cfg)
        stream = enc.encode_stream(frames)
        _verify(stream, tmp_path, nframes=len(frames))
        vcl_bits = sum(len(e) * 8 for e in N.split_annexb(stream)
                       if (e[0] >> 1) & 0x3F < 32)
        kbps = vcl_bits * 30.0 / len(frames) / 1000.0
        achieved[target] = kbps
        assert abs(kbps - target) / target < 0.08, \
            f"target {target} kbps, achieved {kbps:.1f}"
        # non-degenerate per-LCU QP maps: some inter picture varies QP
        # across its LCUs (TEncRCPic::getLCUEstQP clips, not pins)
        qp_sets = [sorted({l["qp"] for l in p.lcus if l["qp"] > 0})
                   for p in enc._rc.pic_list if p.frame_level > 0]
        assert any(len(s) > 1 for s in qp_sets), qp_sets
    assert achieved[300] < 0.6 * achieved[800]


def test_rate_control_cfg_four_targets(tmp_path):
    """R-lambda RC through the reference LD-P cfg (GOP-4 per-level models
    + adaptive lambda-ratio allocation, TEncRCGOP:311-421) hits four
    targets within 3%, including a near-saturating high rate that drives
    lastLambda below the reference formula's defined domain
    (TEncRateCtrl.cpp:319 pow(negative, 1/beta))."""
    from libhm_tpu.encoder.options import parse_cfg_files, HmConfig
    from libhm_tpu.encoder.encoder import IntraEncoder
    from libhm_tpu.hostdec import nal as N

    rng = np.random.RandomState(3)
    ys, xs = np.mgrid[0:96, 0:160]
    frames = []
    for t in range(20):
        y = (xs * 3 + ys * 2 + t * 7) % 220 + rng.randint(0, 12, (96, 160))
        u = ((xs[::2, ::2] + t * 3) % 200) + 10
        v = ((ys[::2, ::2] * 2 + t * 5) % 200) + 20
        frames.append((np.clip(y, 0, 255).astype(np.uint8),
                       u.astype(np.uint8), v.astype(np.uint8)))
    for target in (150, 300, 800, 1500):
        opts = parse_cfg_files(
            ["/root/reference/cfg/encoder_lowdelay_P_main.cfg"],
            ["SourceWidth=160", "SourceHeight=96", "FramesToBeEncoded=20",
             "FrameRate=30", "RateControl=1",
             f"TargetBitrate={target * 1000}", "LCULevelRateControl=1"])
        cfg = HmConfig(opts).to_encoder_config()
        stream = IntraEncoder(cfg).encode_stream(frames)
        vcl = sum(len(e) * 8 for e in N.split_annexb(stream)
                  if (e[0] >> 1) & 0x3F < 32)
        kbps = vcl * 30.0 / 20 / 1000.0
        assert abs(kbps - target) / target < 0.03, \
            f"target {target} kbps, achieved {kbps:.1f}"
