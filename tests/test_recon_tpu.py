"""Bit-exactness of the TPU (JAX) reconstruction backend.

Runs on the CPU backend in CI (conftest forces JAX_PLATFORMS=cpu); the
same code path is verified on real TPU hardware by the driver bench.
Pictures using features not yet lowered to the TPU kernels (scaling
lists, 4:2:2, weighted prediction) fall back to the numpy backend and
must still be bit-exact.
"""
import hashlib
import json
import os
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

STREAMS = ["intra_64x64", "intra_416x240", "lowdelayP_416x240",
           "scaling_intra_416x240", "rext422_intra_416x240"]


@pytest.mark.parametrize("name", STREAMS)
def test_tpu_recon_bit_exact(name):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    outs = Decoder(parse="native", recon="tpu").decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    assert hashlib.md5(buf).hexdigest() == GOLD[name]["decoded_yuv_md5"]
