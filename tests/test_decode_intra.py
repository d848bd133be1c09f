"""End-to-end bit-exactness vs HM golden decodes (intra streams)."""
import hashlib
import json
import os
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))


def decode_and_hash(name):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    outs = Decoder().decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    return hashlib.md5(buf).hexdigest()


@pytest.mark.parametrize("name", ["intra_64x64", "intra_nofilt_416x240",
                                  "intra_qp22_416x240"])
def test_intra_bit_exact(name):
    assert decode_and_hash(name) == GOLD[name]["decoded_yuv_md5"]


def test_intra_416x240_bit_exact():
    assert decode_and_hash("intra_416x240") == GOLD["intra_416x240"]["decoded_yuv_md5"]


@pytest.mark.parametrize("name", ["intra_main10_416x240", "intra_rext444_416x240",
                                  "intra_rext444_nofilt"])
def test_intra_extended_bit_exact(name):
    assert decode_and_hash(name) == GOLD[name]["decoded_yuv_md5"]
