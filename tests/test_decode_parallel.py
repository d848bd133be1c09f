"""Bit-exactness for parallel-tool streams: multi-slice, WPP, tiles.

These streams exercise the substream / context-management paths of the
parser (reference: TDecSlice::decompressSlice substream switching,
TDecSbac::updateContextTables tile resets, WPP context save/restore) and
the multi-slice overlap re-parse behaviour (HM's SliceMode encoder
entropy-codes each slice's substream to the picture end; the decoder
re-parses and overwrites the overlap — TDecCu.cpp:157).
"""
import hashlib
import json
import os
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

STREAMS = ["slices_416x240", "wpp_416x240", "tiles_832x480"]


def decode_and_hash(name, parse):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    outs = Decoder(parse=parse).decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    return hashlib.md5(buf).hexdigest()


@pytest.mark.parametrize("name", STREAMS)
def test_parallel_bit_exact_python(name):
    assert decode_and_hash(name, "python") == GOLD[name]["decoded_yuv_md5"]


@pytest.mark.parametrize("name", STREAMS)
def test_parallel_bit_exact_native(name):
    assert decode_and_hash(name, "native") == GOLD[name]["decoded_yuv_md5"]


def test_wpp_threaded_parse_bit_exact(monkeypatch):
    """WPP row-parallel native parse (one CABAC engine per substream,
    reference TDecGop.cpp:105-155): forced to 4 threads, every WPP golden
    decodes bit-exact and list order matches the sequential parse."""
    import json, hashlib, os
    monkeypatch.setenv("HEVC_WPP_THREADS", "4")
    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))
    from libhm_tpu.hostdec.decoder import Decoder
    for name in [n for n in GOLD if "wpp" in n.lower()]:
        data = open(os.path.join(ROOT, "testdata",
                                 GOLD[name]["bitstream"]), "rb").read()
        outs = Decoder(parse="native", recon="native").decode_annexb(data)
        buf = b"".join(p.tobytes() for pic in outs for p in pic)
        assert hashlib.md5(buf).hexdigest() == \
            GOLD[name]["decoded_yuv_md5"], name
