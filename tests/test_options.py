"""HM cfg-file system: parse the full reference cfg ladder and drive an
encode from a profile cfg, verified by our own decoder's hash check.
(reference: TAppCommon/program_options_lite + TAppEncCfg.cpp)
"""
import glob
import os
import subprocess

import numpy as np
import pytest

from libhm_tpu.encoder.options import (parse_cfg_files, parse_gop_entry,
                                       HmConfig)

REF_CFG = "/root/reference/cfg"
ALL_CFGS = sorted(glob.glob(os.path.join(REF_CFG, "encoder_*.cfg")))


@pytest.mark.skipif(not ALL_CFGS, reason="reference cfgs not mounted")
@pytest.mark.parametrize("path", ALL_CFGS, ids=[os.path.basename(p)
                                                for p in ALL_CFGS])
def test_reference_cfg_parses(path):
    opts = parse_cfg_files([path])
    hm = HmConfig(opts)
    cfg = hm.to_encoder_config()
    gop_size = hm.get("gop_size", 1)
    assert len(cfg.gop_entries) == (0 if gop_size == 1 else gop_size)
    if "randomaccess" in path:
        assert cfg.intra_period > 0 and cfg.refresh_type == 1
        assert cfg.gop_entries[0].poc == 8
        assert cfg.gop_entries[0].ref_pics[0] == -8
    if "lowdelay" in path:
        assert cfg.intra_period == -1
        assert all(e.poc == i + 1 for i, e in enumerate(cfg.gop_entries))


def test_gop_entry_dsl():
    e = parse_gop_entry(
        "B    4   2   0.3536  0  0  0  2  3  -4 -6 4   1  4  5  1 1 0 0 1")
    assert e.slice_type == "B" and e.poc == 4 and e.qp_offset == 2
    assert e.num_ref_pics_active == 2 and e.num_ref_pics == 3
    assert e.ref_pics == [-4, -6, 4]
    assert e.inter_rps_pred == 1 and e.delta_rps == 4


def test_cfg_override_order(tmp_path):
    a = tmp_path / "a.cfg"
    a.write_text("QP : 30\nSourceWidth: 416  # comment\n")
    b = tmp_path / "b.cfg"
    b.write_text("QP : 35\n")
    opts = parse_cfg_files([str(a), str(b)], ["QP=37"])
    assert opts["QP"] == "37"
    assert opts["SourceWidth"] == "416"


def _tiny_yuv(tmp_path, w=64, h=64, n=5):
    ys, xs = np.mgrid[0:h, 0:w]
    buf = b""
    for t in range(n):
        buf += ((xs + ys + 5 * t) % 256).astype(np.uint8).tobytes()
        buf += ((xs[::2, ::2] + t) % 256).astype(np.uint8).tobytes()
        buf += ((ys[::2, ::2] + t) % 256).astype(np.uint8).tobytes()
    p = tmp_path / "in.yuv"
    p.write_bytes(buf)
    return str(p)


def test_cfg_driven_encode_decodes(tmp_path):
    """encoder_lowdelay_main.cfg drives a 5-frame encode; our decoder
    verifies every picture's hash SEI."""
    from libhm_tpu.apps.enc_app import main as enc_main
    from libhm_tpu.hostdec.decoder import Decoder
    yuv = _tiny_yuv(tmp_path)
    out = str(tmp_path / "out.bin")
    rc = enc_main(["-c", os.path.join(REF_CFG, "encoder_lowdelay_main.cfg"),
                   "-i", yuv, "-b", out, "-wdt", "64", "-hgt", "64",
                   "-f", "5", "-q", "32", "SEIDecodedPictureHash=1"])
    assert rc == 0
    dec = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    outs = dec.decode_annexb(open(out, "rb").read())
    assert len(outs) == 5
    assert all(r.hash_status == "OK" for r in dec.output_records)


def test_refresh_type2_idr_poc_reset(tmp_path):
    """DecodingRefreshType=2: mid-stream IDR_N_LP pictures reset the POC
    domain (reference TEncGOP::compressGOP m_iLastIDR handling); the GOP
    crossing the boundary closes (no leading pictures) and every hash SEI
    still verifies."""
    from libhm_tpu.apps.enc_app import main as enc_main
    from libhm_tpu.hostdec.decoder import Decoder
    from libhm_tpu.hostdec import nal as N
    yuv = _tiny_yuv(tmp_path, n=17)
    out = str(tmp_path / "out.bin")
    rc = enc_main(["-c", os.path.join(REF_CFG,
                                      "encoder_randomaccess_main.cfg"),
                   "-i", yuv, "-b", out, "-wdt", "64", "-hgt", "64",
                   "-f", "17", "-q", "32",
                   "IntraPeriod=8", "DecodingRefreshType=2",
                   "MaxCUWidth=32", "MaxPartitionDepth=3",
                   "SEIDecodedPictureHash=1"])
    assert rc == 0
    data = open(out, "rb").read()
    types = [N.parse_nal(e).nal_type for e in N.split_annexb(data)]
    assert types.count(20) == 2          # two mid-stream IDR_N_LP
    assert 21 not in types               # no CRA when refresh type is 2
    dec = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    outs = dec.decode_annexb(data)
    assert len(outs) == 17
    assert all(r.hash_status == "OK" for r in dec.output_records)


def test_cra_open_gop_hm_verifies(tmp_path):
    """Mid-stream CRA with RASL leading pictures (DecodingRefreshType 1):
    the CRA's retention RPS uses used_by_curr=0 (NumPocTotalCurr==0,
    Rec. 7.4.7.2), leading pictures are RASL_R (they reference each
    other), and neither the retention nor the RASL references reach
    across the previous IRAP (TComSlice::checkCRA)."""
    from libhm_tpu.apps.enc_app import main as enc_main
    yuv = _tiny_yuv(tmp_path, n=17)
    out = str(tmp_path / "out.bin")
    rc = enc_main(["-c", os.path.join(REF_CFG,
                                      "encoder_randomaccess_main.cfg"),
                   "-i", yuv, "-b", out, "-wdt", "64", "-hgt", "64",
                   "-f", "17", "-q", "32",
                   "IntraPeriod=8", "MaxCUWidth=32",
                   "MaxPartitionDepth=3", "SEIDecodedPictureHash=1"])
    assert rc == 0
    data = open(out, "rb").read()
    from libhm_tpu.hostdec import nal as N
    types = [N.parse_nal(e).nal_type for e in N.split_annexb(data)]
    assert types.count(21) == 2          # two mid-stream CRAs
    assert 9 in types and 8 not in types  # RASL_R, never RASL_N
    dec_exe = os.path.join(os.path.dirname(REF_CFG), "..", "repo")
    hm = os.path.join("/root/repo/.refbuild", "TAppDecoder")
    if os.path.exists(hm):
        r = subprocess.run([hm, "-b", out, "-o", "/dev/null"],
                           capture_output=True, text=True)
        assert r.stdout.count("(OK)") == 17, r.stdout[-400:]


ALL_REF_CFGS = sorted(glob.glob(os.path.join(REF_CFG, "**", "*.cfg"),
                                recursive=True))


@pytest.mark.skipif(not ALL_REF_CFGS, reason="reference cfgs not mounted")
def test_every_reference_cfg_key_classified():
    """Every option in the FULL reference cfg corpus (cfg/**, incl. misc/
    field-coding and temporal-ID cfgs and per-sequence files) is
    classified: honoured, accepted-inert with a documented reason, or
    explicitly rejected — never an unknown key (strict parse raises on
    those)."""
    from libhm_tpu.encoder.options import UnsupportedToolError
    n_inert = 0
    for path in ALL_REF_CFGS:
        opts = parse_cfg_files([path])
        hm = HmConfig(opts, strict=True)   # KeyError on unknown keys
        assert not hm.ignored
        n_inert += len(hm.inert)
        # per-sequence cfgs have no GOP/size completeness; only profile
        # cfgs must build a full encoder config
        if os.path.dirname(path) == REF_CFG and "encoder_" in path:
            try:
                hm.to_encoder_config()
            except UnsupportedToolError:
                pytest.fail(f"profile cfg rejected: {path}")
    assert n_inert > 0   # the classification actually exercised


def test_level_tier_signalled(tmp_path):
    """Level/Tier cfg options drive general_level_idc / tier flag in the
    written PTL (reference TAppEncCfg Level/Tier -> ProfileTierLevel)."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    from libhm_tpu.hostdec.decoder import Decoder
    frames = [(np.full((64, 64), 100, np.uint8),
               np.full((32, 32), 110, np.uint8),
               np.full((32, 32), 120, np.uint8))]
    cfg = EncoderConfig(64, 64, qp=32)
    cfg.level = "5.1"
    cfg.tier = "high"
    stream = IntraEncoder(cfg).encode_stream(frames)
    d = Decoder()
    d.decode_annexb(stream)
    sps = next(iter(d.sps_map.values()))
    assert sps.ptl.general_level_idc == 153
    assert sps.ptl.general_tier_flag == 1
