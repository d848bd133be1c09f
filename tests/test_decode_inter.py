"""End-to-end bit-exactness vs HM golden decodes (inter streams)."""
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


@pytest.mark.parametrize("name", ["lowdelayP_416x240", "lowdelayB_416x240",
                                  "randomaccess_416x240"])
def test_inter_bit_exact(name):
    assert decode_and_hash(name) == GOLD[name]["decoded_yuv_md5"]
