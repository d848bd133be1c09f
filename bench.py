#!/usr/bin/env python3
"""Benchmark: HEVC decode throughput vs single-threaded HM.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: 416x240 random-access Main decode fps (full pipeline: host CABAC
parse + reconstruction).  vs_baseline = our fps / HM single-threaded fps
measured locally on the same stream (the reference publishes no numbers;
BASELINE.md anchors the ratio to a local TAppDecoder run).
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

STREAM = os.path.join(ROOT, "testdata", "randomaccess_416x240.bin")
NFRAMES = 17


def bench_ours():
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(STREAM, "rb").read()
    t0 = time.monotonic()
    outs = Decoder().decode_annexb(data)
    dt = time.monotonic() - t0
    assert len(outs) == NFRAMES
    return NFRAMES / dt


def bench_hm():
    exe = os.path.join(ROOT, ".refbuild", "TAppDecoder")
    if not os.path.exists(exe):
        return None
    t0 = time.monotonic()
    subprocess.run([exe, "-b", STREAM, "-o", "/dev/null"],
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   check=True)
    dt = time.monotonic() - t0
    return NFRAMES / dt


def main():
    ours = bench_ours()
    hm = bench_hm()
    vs = (ours / hm) if hm else 0.0
    print(json.dumps({
        "metric": "randomaccess_416x240 decode fps",
        "value": round(ours, 3),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
