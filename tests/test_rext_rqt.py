"""Multi-level intra RQT for RExt chroma formats (4:0:0/4:2:2/4:4:4).

The RD-searched transform tree (QuadtreeTUMaxDepthIntra > 1, reference
TEncSearch::xRecurIntraCodingQT) was 4:2:0-scoped through round 3; the
generalized tree computes 4:2:2 square sub-TU pairs (DM angle remapped)
and 4:4:4 same-size chroma TBs at every leaf, with the decode-mirror
chroma-CBF coding of Rec. 7.3.8.8 (combined bin above the lowest level,
two sub-TU bins at it).  Every stream is verified by the real HM decoder
byte-for-byte against our own reconstruction.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HM_DEC = os.path.join(ROOT, ".refbuild", "TAppDecoder")
CFG = "/root/reference/cfg/encoder_intra_main_rext.cfg"


def _roundtrip(idc, cfg, nframes, tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from gen_golden import synth_yuv
    src = str(tmp_path / "src.yuv")
    synth_yuv(src, 96, 80, nframes, 8, "420" if idc == "400" else idc)
    out = str(tmp_path / "out.bin")
    r = subprocess.run(
        [sys.executable, "-m", "libhm_tpu.apps.enc_app", "-c", cfg,
         "-i", src, "-b", out, "-o", "/dev/null", "-wdt", "96",
         "-hgt", "80", "-f", str(nframes), "-q", "30", "-fr", "30",
         f"--ChromaFormatIDC={idc}", "--InputBitDepth=8"],
        cwd=ROOT, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = str(tmp_path / "dec.yuv")
    d = subprocess.run([HM_DEC, "-b", out, "-o", rec],
                       capture_output=True, text=True)
    assert d.returncode == 0, d.stderr[-2000:]
    from libhm_tpu.hostdec.decoder import Decoder
    outs = Decoder(parse="native", recon="native").decode_annexb(
        open(out, "rb").read())
    hm = np.fromfile(rec, dtype="<u2")
    ours = np.concatenate([np.ascontiguousarray(p).astype(np.uint16).ravel()
                           for pic in outs for p in pic])
    assert np.array_equal(hm, ours)


@pytest.mark.skipif(not os.path.exists(HM_DEC),
                    reason="reference decoder binary not built")
@pytest.mark.parametrize("idc", ["400", "422", "444"])
def test_rext_intra_rqt_hm_verifies(idc, tmp_path):
    _roundtrip(idc, CFG, 2, tmp_path)


@pytest.mark.skipif(not os.path.exists(HM_DEC),
                    reason="reference decoder binary not built")
@pytest.mark.parametrize("idc", ["400", "422", "444"])
def test_rext_inter_rqt_hm_verifies(idc, tmp_path):
    """Multi-level INTER RQT (xEstimateInterResidualQT) for RExt formats."""
    _roundtrip(idc, "/root/reference/cfg/encoder_lowdelay_main_rext.cfg",
               5, tmp_path)
