"""Multi-picture batched TPU decode (parallel/batch_decode): all pictures
of an all-intra stream reconstruct in one vmapped wavefront dispatch and
cross-picture TU buckets, bit-exact vs the HM golden hashes."""
import hashlib
import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

CASES = ["intra_416x240", "intra_main10_416x240", "pcm_intra_416x240",
         "lossless_intra_416x240", "scaling_intra_416x240",
         "intra_rext444_416x240", "dqp_intra_416x240"]


@pytest.mark.parametrize("name", CASES)
def test_batched_ai_decode_bit_exact(name):
    from libhm_tpu.parallel.batch_decode import decode_intra_batch
    e = GOLDEN[name]
    data = open(os.path.join(ROOT, "testdata", e["bitstream"]), "rb").read()
    outs = decode_intra_batch(data, parse="native", check_sei_hash=True)
    assert len(outs) == e["frames"]
    outs.sort(key=lambda d: d.poc)
    buf = b"".join(p.tobytes() for dp in outs for p in dp.cropped())
    assert hashlib.md5(buf).hexdigest() == e["decoded_yuv_md5"]
    assert all(dp.hash_status in (None, "OK") for dp in outs)


def test_batched_ai_decode_rejects_inter():
    from libhm_tpu.parallel.batch_decode import decode_intra_batch
    e = GOLDEN["lowdelayP_416x240"]
    data = open(os.path.join(ROOT, "testdata", e["bitstream"]), "rb").read()
    with pytest.raises(ValueError):
        decode_intra_batch(data, parse="native")


def test_batched_ai_decode_sharded_mesh():
    """Picture-axis data parallelism: the batched wavefront shards over an
    8-device mesh and stays bit-exact."""
    import jax
    from jax.sharding import Mesh
    from libhm_tpu.parallel.batch_decode import decode_intra_batch
    devs = np.array(jax.devices())
    if devs.size < 2:
        pytest.skip("needs a multi-device backend")
    mesh = Mesh(devs, ("pic",))
    e = GOLDEN["intra_416x240"]
    data = open(os.path.join(ROOT, "testdata", e["bitstream"]), "rb").read()
    outs = decode_intra_batch(data, parse="native", mesh=mesh)
    outs.sort(key=lambda d: d.poc)
    buf = b"".join(p.tobytes() for dp in outs for p in dp.cropped())
    assert hashlib.md5(buf).hexdigest() == e["decoded_yuv_md5"]
