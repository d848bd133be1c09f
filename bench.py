#!/usr/bin/env python3
"""Benchmark: HEVC decode throughput vs single-threaded HM.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: 1080p Main10 random-access decode fps, full pipeline (host CABAC
parse + native reconstruction: residuals, intra, MC, deblock, SAO),
bit-exact vs the HM decoded-picture-hash oracle.  vs_baseline = our fps /
HM single-threaded TAppDecoder fps measured locally on the same stream
(the reference publishes no numbers; BASELINE.md anchors the ratio to a
local run).  Both sides take the best of three runs to suppress
shared-host noise.
"""
import hashlib
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

STREAM = os.path.join(ROOT, "testdata", "randomaccess_main10_1080p.bin")
GOLDEN = os.path.join(ROOT, "testdata", "golden.json")
NAME = "randomaccess_main10_1080p"
NFRAMES = 17
RUNS = 5


def bench_ours():
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(STREAM, "rb").read()
    gold = json.load(open(GOLDEN))[NAME]["decoded_yuv_md5"]
    best = 0.0
    for _ in range(RUNS):
        t0 = time.monotonic()
        outs = Decoder(parse="native", recon="native").decode_annexb(data)
        dt = time.monotonic() - t0
        assert len(outs) == NFRAMES
        best = max(best, NFRAMES / dt)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    assert hashlib.md5(buf).hexdigest() == gold, "decode is not bit-exact"
    return best


def bench_hm():
    exe = os.path.join(ROOT, ".refbuild", "TAppDecoder")
    if not os.path.exists(exe):
        return None
    best = 0.0
    for _ in range(RUNS):
        t0 = time.monotonic()
        subprocess.run([exe, "-b", STREAM, "-o", "/dev/null"],
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       check=True)
        dt = time.monotonic() - t0
        best = max(best, NFRAMES / dt)
    return best


def main():
    ours = bench_ours()
    hm = bench_hm()
    vs = (ours / hm) if hm else 0.0
    print(json.dumps({
        "metric": "1080p Main10 RA decode fps (bit-exact)",
        "value": round(ours, 3),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
