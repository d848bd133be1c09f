"""Compression-quality regression guard vs the HM reference encoder.

Encodes one small random-access clip with the same HM cfg on both
encoders and asserts our bits stay within a fixed ratio of HM's at equal
QP (and that PSNR does not collapse).  This is a cheap tripwire for
RD-decision regressions — the full 4-QP PCHIP BD-rate ladder lives in
tools/bdrate.py (reference quality anchor: TEncAnalyze summary outputs,
/root/reference/source/Lib/TLibEncoder/TEncAnalyze.h:285).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HM_ENC = os.path.join(ROOT, ".refbuild", "TAppEncoder")
CFG = "/root/reference/cfg/encoder_randomaccess_main.cfg"


def _psnr_y(bitstream, src, w, h, n):
    from libhm_tpu.hostdec.decoder import Decoder
    outs = Decoder(parse="native", recon="native").decode_annexb(
        open(bitstream, "rb").read())
    assert len(outs) == n
    fsz = w * h * 3 // 2
    raw = np.fromfile(src, np.uint8)[:n * fsz].reshape(n, fsz)
    sse = npx = 0
    for t, pic in enumerate(outs):
        y = pic[0].astype(np.int64)
        ref = raw[t][:w * h].reshape(h, w).astype(np.int64)
        sse += float(((y - ref) ** 2).sum())
        npx += y.size
    return 10 * np.log10(255 * 255 / (sse / npx))


@pytest.mark.skipif(not os.path.exists(HM_ENC),
                    reason="reference encoder binary not built")
def test_randomaccess_bits_within_ratio_of_hm(tmp_path):
    w, h, n, qp = 160, 96, 9, 32
    src = str(tmp_path / "src.yuv")
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from gen_golden import synth_yuv
    synth_yuv(src, w, h, n, 8, "420")
    outs = {}
    for side, cmd in (
            ("hm", [HM_ENC]),
            ("ours", [sys.executable, "-m", "libhm_tpu.apps.enc_app"])):
        out = str(tmp_path / f"{side}.bin")
        r = subprocess.run(
            cmd + ["-c", CFG, "-i", src, "-b", out, "-o", "/dev/null",
                   "-wdt", str(w), "-hgt", str(h), "-f", str(n),
                   "-q", str(qp), "-fr", "30"],
            cwd=ROOT, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[side] = (os.path.getsize(out) * 8, _psnr_y(out, src, w, h, n))
    bits_ratio = outs["ours"][0] / outs["hm"][0]
    dpsnr = outs["ours"][1] - outs["hm"][1]
    # Guard thresholds: equal-QP bits within +12% of HM and Y-PSNR within
    # 0.35 dB (state when added: +4.2% bits, -0.13 dB).  A regression in
    # the CU-mode / merge / ME RD arbitration blows straight past these.
    assert bits_ratio < 1.12, (outs, bits_ratio)
    assert dpsnr > -0.35, (outs, dpsnr)
