"""Bit-exactness of the native (C++) reconstruction backend.

recon='native' runs residuals + intra + MC + deblock + SAO inside
libhevcdec.so (native/recon.cpp); these tests pin it to the same HM
decoded-picture-hash oracle as the numpy and TPU backends.
"""
import hashlib
import json
import os
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

STREAMS = ["intra_416x240", "randomaccess_416x240", "lowdelayB_416x240",
           "randomaccess_main10_416x240", "intra_rext444_416x240",
           "slices_416x240", "wpp_416x240", "tiles_832x480"]


@pytest.mark.parametrize("name", STREAMS)
def test_native_recon_bit_exact(name):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    outs = Decoder(parse="native", recon="native").decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    assert hashlib.md5(buf).hexdigest() == GOLD[name]["decoded_yuv_md5"]
