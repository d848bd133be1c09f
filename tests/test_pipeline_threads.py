"""Parse/recon picture-pipeline (HEVC_THREADS) bit-exactness.

The native decoder reconstructs pictures on a worker pool as soon as
their reference pictures are done (api.cpp queueRecon/workerLoop) —
the "frame pipeline" parallel axis of SURVEY §2.5 that the reference
leaves single-threaded (TDecTop decodes strictly serially).  On a
1-core host this only exercises correctness; on multicore hosts it
overlaps CABAC parse with reconstruction.

Runs in a subprocess because HEVC_THREADS is latched per decoder
library load.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STREAMS = [
    "randomaccess_416x240",        # hierarchical-B ref DAG
    "cra_start_416x240",           # mid-stream CRA start (skipped RASL)
    "wpp_416x240",                 # WPP row-parallel parse + pipeline
    "tiles_832x480",
    "bigts_lowdelay_160x96",
]


def test_threaded_pipeline_bit_exact():
    gold = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))
    streams = [s for s in STREAMS if s in gold]
    assert len(streams) >= 3
    code = f"""
import sys, json, hashlib
import numpy as np
sys.path.insert(0, {ROOT!r})
from libhm_tpu.hostdec.decoder import Decoder
gold = json.load(open({ROOT!r} + "/testdata/golden.json"))
for name in {streams!r}:
    data = open({ROOT!r} + f"/testdata/{{name}}.bin", "rb").read()
    outs = Decoder(parse="native", recon="native").decode_annexb(data)
    md5 = hashlib.md5(b"".join(np.ascontiguousarray(p).tobytes()
                               for pic in outs for p in pic)).hexdigest()
    assert md5 == gold[name]["decoded_yuv_md5"], name
print("OK")
"""
    env = dict(os.environ, HEVC_THREADS="3")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
