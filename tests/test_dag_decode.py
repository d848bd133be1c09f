"""Reference-DAG batched decode (parallel/dag_decode) bit-exactness.

Generalizes the all-intra batch path: pictures group by reference-chain
depth and every level reconstructs in shared device dispatches (batched
residual buckets, one MC gather/scatter per component, vmapped intra
wavefront), with reference planes device-resident between levels.
Oracle: HM decoded-picture-hash MD5s in testdata/golden.json.
"""
import hashlib
import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

# random access (hierarchical B), weighted prediction, 4 temporal layers
STREAMS = ["randomaccess_416x240", "wp_lowdelayP_416x240", "tids4_ra_160x96"]


def _decode(name, mesh=None):
    from libhm_tpu.parallel.dag_decode import decode_batch
    data = open(os.path.join(ROOT, "testdata",
                             GOLD[name]["bitstream"]), "rb").read()
    outs = decode_batch(data, mesh=mesh)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    return hashlib.md5(buf).hexdigest()


@pytest.mark.parametrize("name", STREAMS)
def test_dag_decode_bit_exact(name):
    assert _decode(name) == GOLD[name]["decoded_yuv_md5"]


def test_dag_decode_mesh_sharded():
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("pics",))
    name = "randomaccess_416x240"
    assert _decode(name, mesh=mesh) == GOLD[name]["decoded_yuv_md5"]


def test_reference_levels_shape():
    """An RA GOP collapses into a handful of levels, not one per picture."""
    from libhm_tpu.hostdec.decoder import Decoder
    from libhm_tpu.parallel.dag_decode import reference_levels
    data = open(os.path.join(ROOT, "testdata",
                             GOLD["randomaccess_416x240"]["bitstream"]),
                "rb").read()
    dec = Decoder(parse="native", recon="collect")
    dec.decode_annexb(data)
    levels = reference_levels(dec.collected)
    n_pics = sum(len(lv) for lv in levels)
    assert n_pics == 17
    assert len(levels) < n_pics  # batching happened
    # level 0 is exactly the intra pictures
    assert all(not it["pic"].inter_list for it in levels[0])
