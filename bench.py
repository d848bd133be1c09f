#!/usr/bin/env python3
"""Benchmark: HEVC decode throughput vs single-threaded HM.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: 1080p Main10 random-access decode fps, full pipeline (native C++
host CABAC parse + native reconstruction: residuals, intra, MC, deblock,
SAO), bit-exact vs the HM decoded-picture-hash oracle.  vs_baseline = our
fps / HM single-threaded TAppDecoder fps measured locally on the same
stream (the reference publishes no numbers; BASELINE.md anchors the ratio
to a local run).  Both sides take the best of five runs to suppress
shared-host noise.

Supplementary lines go to stderr: the host parse/recon time breakdown and
(with BENCH_TPU=1) the recon="tpu" pipeline measured through the real
chip.  The TPU path is bit-exact on all 31 goldens (tests/test_recon_tpu)
but on this deployment the chip sits behind a slow tunnel (~12 MB/s H2D,
~3 ms/dispatch), so the wall-clock headline stays with the CPU-native
reconstruction.
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


def bench_ours(recon="native", runs=RUNS):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(STREAM, "rb").read()
    gold = json.load(open(GOLDEN))[NAME]["decoded_yuv_md5"]
    best = 0.0
    for _ in range(runs):
        t0 = time.monotonic()
        outs = Decoder(parse="native", recon=recon).decode_annexb(data)
        dt = time.monotonic() - t0
        assert len(outs) == NFRAMES
        best = max(best, NFRAMES / dt)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    assert hashlib.md5(buf).hexdigest() == gold, "decode is not bit-exact"
    return best


def bench_parse_only(runs=RUNS):
    """Host CABAC parse throughput (C++ only, no tensor materialization)."""
    import ctypes as C
    from libhm_tpu.hostdec.native_bridge import _load
    lib = _load()
    data = open(STREAM, "rb").read()
    best = 0.0
    for _ in range(runs):
        t0 = time.monotonic()
        h = lib.hevcdec_create()
        n = lib.hevcdec_decode(h, data, len(data))
        lib.hevcdec_destroy(C.c_void_p(h))
        dt = time.monotonic() - t0
        assert n == NFRAMES
        best = max(best, NFRAMES / dt)
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
    parse_fps = bench_parse_only(runs=3)
    print(f"breakdown: parse-only {parse_fps:.2f} fps; "
          f"full native {ours:.2f} fps; HM {hm or 0:.2f} fps",
          file=sys.stderr)
    if os.environ.get("BENCH_TPU"):
        tpu = bench_ours(recon="tpu", runs=2)
        print(f"recon=tpu pipeline: {tpu:.2f} fps (bit-exact; "
              f"tunnel-bound on this host)", file=sys.stderr)
    vs = (ours / hm) if hm else 0.0
    print(json.dumps({
        "metric": "1080p Main10 RA decode fps (bit-exact)",
        "value": round(ours, 3),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
