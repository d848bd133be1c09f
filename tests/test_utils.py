"""Utility-app tests: bitrate targeting, byte counting, bit-depth convert."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_extract_bitrates_and_guess():
    from libhm_tpu.apps.bitrate_targeting import (
        extract_bitrates, guess_lambda_modifiers, parse_meta_log)
    log = """\
POC    0 TId: 0 ( I-SLICE, nQP 32 QP 32 ) 100000 bits
POC    1 TId: 0 ( P-SLICE, nQP 33 QP 33 ) 4000 bits
POC    2 TId: 0 ( P-SLICE, nQP 34 QP 34 ) 2000 bits
POC    3 TId: 0 ( P-SLICE, nQP 33 QP 33 ) 6000 bits
"""
    rates = extract_bitrates(log)
    assert rates == [5000.0, 2000.0]  # I-slice excluded, averaged per layer
    meta = parse_meta_log("-LM0 1.0 -LM1 1.0;5000 2000\n")
    lms = guess_lambda_modifiers(0.5, [4000.0, 1800.0], meta)
    assert len(lms) == 2 and all(v > 0 for v in lms)
    # lowering the target raises lambda... (lower bitrate => larger lambda
    # modifier direction depends on extrapolation; just check dampening keeps
    # the guess within a sane band around the previous value)
    assert all(0.25 < v < 4.0 for v in lms)


def test_annexb_bytecount_app(capsys):
    from libhm_tpu.apps import annexb_bytecount
    path = os.path.join(ROOT, "testdata", "intra_64x64.bin")
    assert annexb_bytecount.main([path]) == 0
    out = capsys.readouterr().out
    assert "SPS" in out and "PPS" in out


def test_convert_bitdepth_roundtrip(tmp_path):
    from libhm_tpu.apps import convert_bitdepth
    src = tmp_path / "in.yuv"
    dst = tmp_path / "out.yuv"
    back = tmp_path / "back.yuv"
    data = np.arange(256, dtype=np.uint8)
    data.tofile(src)
    assert convert_bitdepth.main(["-i", str(src), "-o", str(dst),
                                  "--in-depth", "8", "--out-depth", "10"]) == 0
    up = np.fromfile(dst, np.uint16)
    assert (up == data.astype(np.uint16) << 2).all()
    assert convert_bitdepth.main(["-i", str(dst), "-o", str(back),
                                  "--in-depth", "10", "--out-depth", "8"]) == 0
    assert (np.fromfile(back, np.uint8) == data).all()


def test_sei_typed_decode():
    from libhm_tpu.hostdec import nal as N, sei
    data = open(os.path.join(ROOT, "testdata", "intra_64x64.bin"), "rb").read()
    seen = []
    for ebsp in N.split_annexb(data):
        if (ebsp[0] >> 1) & 0x3F in (39, 40):
            rbsp = N.parse_nal(bytes(ebsp)).rbsp
            seen += sei.decode_sei_payloads(rbsp)
    assert any(isinstance(o, sei.DecodedPictureHash) for _, o in seen)


def test_coding_statistics():
    from libhm_tpu.hostdec.stats import collect
    data = open(os.path.join(ROOT, "testdata", "intra_64x64.bin"), "rb").read()
    table = collect(data)
    assert table["__total__"]["bins"] > 1000
    assert "sig" in table and table["sig"]["bins"] > 0


def test_enc_app_summary_and_recon(tmp_path):
    """enc_app prints the TEncAnalyze-style summary and writes a recon YUV
    that matches the decoder output bit-exactly."""
    import numpy as np
    import tools.gen_golden as gg
    src = str(tmp_path / "in.yuv")
    gg.synth_yuv(src, 96, 80, 2)
    from libhm_tpu.apps import enc_app
    bit = str(tmp_path / "out.bin")
    rec = str(tmp_path / "rec.yuv")
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = enc_app.main(["-i", src, "-b", bit, "-o", rec,
                           "-wdt", "96", "-hgt", "80", "-f", "2", "-q", "32"])
    assert rc == 0
    out = buf.getvalue()
    assert "SUMMARY" in out and "Y-PSNR" in out
    from libhm_tpu.hostdec.decoder import Decoder
    outs = Decoder().decode_annexb(open(bit, "rb").read())
    dec = b"".join(p.astype(np.uint8).tobytes() for pic in outs for p in pic)
    assert open(rec, "rb").read() == dec


def test_dec_app_skip_and_csc(tmp_path):
    """TAppDec -s skip-frames + OutputColourSpaceConvert plane
    permutation (reference TAppDecCfg.cpp:80, TComChromaFormat.cpp:42)."""
    import numpy as np
    import subprocess, sys, os
    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(ROOT, "testdata")
    import json
    gold = json.load(open(os.path.join(src, "golden.json")))
    name = next(n for n in gold if "444" in n)
    bs = os.path.join(src, gold[name]["bitstream"])
    outa = tmp_path / "a.yuv"
    outb = tmp_path / "b.yuv"
    for out, extra in ((outa, []), (outb, ["--colour-space-convert",
                                           "YCrCbtoYCbCr"])):
        r = subprocess.run([sys.executable, "-m", "libhm_tpu.apps.dec_app",
                            "-b", bs, "-o", str(out)] + extra,
                           capture_output=True, text=True, cwd=ROOT)
        assert r.returncode == 0, r.stderr[-300:]
    from libhm_tpu.hostdec.decoder import Decoder
    outs = Decoder(parse="native", recon="native").decode_annexb(
        open(bs, "rb").read())
    dt = outs[0][0].dtype
    a = np.fromfile(outa, dt)
    b = np.fromfile(outb, dt)
    assert len(a) == len(b) and not (a == b).all()
    # 4:4:4: each picture = 3 equal-size planes; conversion swaps 1 and 2
    psz = outs[0][0].size
    a = a.reshape(-1, 3, psz)
    b = b.reshape(-1, 3, psz)
    assert (b[:, 0] == a[:, 0]).all()
    assert (b[:, 1] == a[:, 2]).all() and (b[:, 2] == a[:, 1]).all()
    # skip-frames drops the first picture
    outc = tmp_path / "c.yuv"
    r = subprocess.run([sys.executable, "-m", "libhm_tpu.apps.dec_app",
                        "-b", bs, "-o", str(outc), "-s", "1"],
                       capture_output=True, text=True, cwd=ROOT)
    assert r.returncode == 0
    c = np.fromfile(outc, dt)
    assert len(c) == len(a.ravel()) - 3 * psz
    assert (c == a.reshape(-1)[3 * psz:]).all()


def test_envvar_force_modes(tmp_path, monkeypatch):
    """HEVC_FORCE_LUMA_MODE / HEVC_FORCE_CHROMA_MODE (reference Debug.h
    DebugOptionList::ForceLumaMode/ForceChromaMode): every intra PU is
    coded with the forced mode, and the stream still round-trips."""
    import numpy as np
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    from libhm_tpu.hostdec.decoder import Decoder
    rng = np.random.RandomState(2)
    frames = [(rng.randint(0, 256, (64, 64)).astype(np.uint8),
               rng.randint(0, 256, (32, 32)).astype(np.uint8),
               rng.randint(0, 256, (32, 32)).astype(np.uint8))]
    monkeypatch.setenv("HEVC_FORCE_LUMA_MODE", "26")
    monkeypatch.setenv("HEVC_FORCE_CHROMA_MODE", "10")
    stream = IntraEncoder(EncoderConfig(64, 64, qp=30)).encode_stream(frames)
    d = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    d.decode_annexb(stream)
    assert all(r.hash_status == "OK" for r in d.output_records)
    ps = d.output_records[0].pic_syntax
    iy = np.asarray(ps.intra_y)[:16, :16]
    ic = np.asarray(ps.intra_c)[:16, :16]
    pcm = np.asarray(ps.pcm)[:16, :16]
    assert (iy[pcm == 0] == 26).all()
    assert (ic[pcm == 0] == 10).all()
    from libhm_tpu.utils.envvar import print_env_vars
    print_env_vars()


@pytest.mark.parametrize("name", ["tids4_ra_160x96", "wpp_416x240",
                                  "tiles_832x480"])
def test_bit_statistics_exact(name):
    """Analyser-grade bit accounting (reference TComCodingStatistics.h:47+):
    per-syntax-element EXACT bit counts whose grand total — including NAL
    headers, start codes, emulation prevention, non-VCL payloads, slice
    headers and the per-engine CABAC init/rounding residue — equals the
    byte size of the stream, with the residue at the 9-bit-preload scale
    (proving the per-element attribution is real, not estimated)."""
    from libhm_tpu.hostdec.stats import collect_bits
    gold = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))
    if name not in gold:
        pytest.skip(name)
    data = open(os.path.join(ROOT, "testdata",
                             gold[name]["bitstream"]), "rb").read()
    t = collect_bits(data, per_component=True, per_tu_size=True)
    n_eng = t.pop("__n_engines__")
    total = t.pop("__total__")
    assert sum(t.values()) == total == len(data) * 8
    fudge = t["cabac_init_and_rounding"]
    assert 0 < fudge <= 32 * n_eng, (fudge, n_eng)
    # per-component AND per-TU-size residual rows materialized
    assert any(k.startswith("sig:") and ":c" in k for k in t)
    assert any(":n4" in k or ":n8" in k for k in t)


def test_debug_envvars(tmp_path, capsys, monkeypatch):
    """DebugOptionList breadth (reference Debug.h:97-110): DebugRQT /
    DebugPred console dumps and the DEBUG_STRING-style per-block
    pred/resi/reco dump, all EnvVar-driven; two identical runs produce
    identical dumps (the divergence-hunting contract)."""
    from libhm_tpu.hostdec.decoder import Decoder
    gold = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))
    data = open(os.path.join(ROOT, "testdata",
                             gold["tids4_ra_160x96"]["bitstream"]),
                "rb").read()
    dump1 = tmp_path / "d1.txt"
    monkeypatch.setenv("HEVC_DEBUG_RQT", "1")
    monkeypatch.setenv("HEVC_DEBUG_PRED", "1")
    monkeypatch.setenv("HEVC_DUMP_BLOCKS", str(dump1))
    Decoder(parse="python", recon="numpy").decode_annexb(data)
    out = capsys.readouterr().out
    assert "RQT poc=" in out and "PRED poc=" in out
    t1 = dump1.read_text()
    assert t1.count("BLK poc=") > 10 and " reco: " in t1
    dump2 = tmp_path / "d2.txt"
    monkeypatch.setenv("HEVC_DUMP_BLOCKS", str(dump2))
    monkeypatch.delenv("HEVC_DEBUG_RQT")
    monkeypatch.delenv("HEVC_DEBUG_PRED")
    Decoder(parse="python", recon="numpy").decode_annexb(data)
    assert dump2.read_text() == t1
