#!/usr/bin/env python3
"""Benchmark: HEVC decode throughput vs single-threaded HM.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: 1080p Main10 random-access decode fps, full pipeline, bit-exact vs
the HM decoded-picture-hash oracle.  The stream is the 17-frame golden
repeated 3x (51 frames) to reduce shared-host timing noise.
vs_baseline = our fps / HM single-threaded TAppDecoder fps measured locally
on the same stream, as the MEDIAN of per-pair ratios over interleaved
ours/HM runs (the shared host's absolute speed swings >1.5x between
minutes; pairing cancels the drift out of the ratio).

Two pipelines are measured and reported:
 - native:  C++ host CABAC parse + AVX2 reconstruction (the wall-clock
   headline on hosts where the TPU sits behind a slow tunnel)
 - tpu:     C++ host CABAC parse + device reconstruction (bit-exact on all
   47 goldens; see tests/test_recon_tpu.py) — skipped with BENCH_SKIP_TPU=1
   or when no device is reachable

The headline JSON line carries the fastest bit-exact pipeline; the stderr
breakdown always carries both plus the parse-only rate.
"""
import hashlib
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

STREAM = os.path.join(ROOT, "testdata", "randomaccess_main10_1080p.bin")
GOLDEN = os.path.join(ROOT, "testdata", "golden.json")
NAME = "randomaccess_main10_1080p"
NFRAMES = 17
REPEAT = 3
RUNS = 7


def _data():
    return open(STREAM, "rb").read() * REPEAT


def _run_ours_once(recon="native"):
    from libhm_tpu.hostdec.decoder import Decoder
    data = _data()
    n = NFRAMES * REPEAT
    t0 = time.monotonic()
    outs = Decoder(parse="native", recon=recon).decode_annexb(data)
    dt = time.monotonic() - t0
    assert len(outs) == n
    return dt, outs


def _check_exact(outs):
    gold = json.load(open(GOLDEN))[NAME]["decoded_yuv_md5"]
    # bit-exactness: every 17-frame repetition must match the golden MD5
    for r in range(REPEAT):
        buf = b"".join(p.tobytes()
                       for pic in outs[r * NFRAMES:(r + 1) * NFRAMES]
                       for p in pic)
        assert hashlib.md5(buf).hexdigest() == gold, "decode is not bit-exact"


def bench_ours(recon="native", runs=RUNS):
    times = []
    outs = None
    for _ in range(runs):
        dt, outs = _run_ours_once(recon)
        times.append(dt)
    _check_exact(outs)
    n = NFRAMES * REPEAT
    return n / statistics.median(times), n / min(times)


def _run_hm_once(exe, tmp):
    t0 = time.monotonic()
    subprocess.run([exe, "-b", tmp, "-o", "/dev/null"],
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   check=True)
    return time.monotonic() - t0


def bench_paired(runs=RUNS):
    """Interleave ours/HM runs and take the median of per-pair ratios.

    The shared host's absolute throughput swings well over 1.5x between
    minutes; pairing each of our runs with an adjacent HM run of the same
    stream cancels the drift out of the headline vs_baseline ratio.
    Returns (ours_median_fps, hm_median_fps, median_pair_ratio) or None
    when the HM binary is unavailable.
    """
    exe = _hm_exe()
    if exe is None:
        return None
    tmp = "/tmp/bench_hm_stream.bin"
    with open(tmp, "wb") as f:
        f.write(_data())
    n = NFRAMES * REPEAT
    ours_t, hm_t, ratios = [], [], []
    outs = None
    # untimed warmup pair: first-run import/page-cache effects hit whichever
    # side goes first
    _run_ours_once()
    _run_hm_once(exe, tmp)
    for i in range(runs):
        # alternate order within the pair so neither side systematically
        # lands on the colder phase of the machine
        if i % 2 == 0:
            dt, outs = _run_ours_once()
            ht = _run_hm_once(exe, tmp)
        else:
            ht = _run_hm_once(exe, tmp)
            dt, outs = _run_ours_once()
        ours_t.append(dt)
        hm_t.append(ht)
        ratios.append(ht / dt)
    _check_exact(outs)
    os.unlink(tmp)
    print("paired ratios: " + " ".join(f"{r:.2f}" for r in ratios),
          file=sys.stderr)
    return (n / statistics.median(ours_t), n / statistics.median(hm_t),
            statistics.median(ratios))


def bench_parse_only(runs=3):
    """Host CABAC parse throughput (C++ only, no tensor materialization)."""
    import ctypes as C
    from libhm_tpu.hostdec.native_bridge import _load
    lib = _load()
    data = _data()
    n = NFRAMES * REPEAT
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        h = lib.hevcdec_create()
        got = lib.hevcdec_decode(h, data, len(data))
        lib.hevcdec_destroy(C.c_void_p(h))
        times.append(time.monotonic() - t0)
        assert got == n
    return n / statistics.median(times)


def _hm_exe():
    exe = os.path.join(ROOT, ".refbuild", "TAppDecoder")
    if not os.path.exists(exe):
        # fresh host: untracked binaries are gone but the build script is
        # committed — rebuild the reference decoder so vs_baseline is real
        script = os.path.join(ROOT, ".refbuild", "build_ref.sh")
        if os.path.exists(script):
            print("building HM reference apps (fresh host)...",
                  file=sys.stderr)
            try:
                subprocess.run(["bash", script], timeout=3000,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL)
            except Exception as e:
                print(f"HM rebuild failed: {e}", file=sys.stderr)
    return exe if os.path.exists(exe) else None


def _device_reachable(timeout_s=90):
    """Probe jax device init in a subprocess with a hard timeout: a dead
    TPU tunnel HANGS client init (it does not raise), which would
    otherwise hang the whole bench."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s, cwd=ROOT)
        ok = r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("device probe failed/hung; skipping the TPU pipeline",
              file=sys.stderr)
    return ok


def main():
    paired = bench_paired()
    if paired is not None:
        ours, hm, ratio = paired
    else:
        ours, _ = bench_ours()
        hm, ratio = None, 0.0
    parse_fps = bench_parse_only()
    print(f"breakdown: parse-only {parse_fps:.2f} fps; "
          f"full native median {ours:.2f} fps; "
          f"HM median {hm or 0:.2f} fps; "
          f"median paired ratio {ratio:.3f}", file=sys.stderr)
    tpu = None
    if not os.environ.get("BENCH_SKIP_TPU") and _device_reachable():
        try:
            # one probe run first: a tunnel-bound device pipeline can be
            # 100x slower than the CPU path, so only spend more runs on a
            # stable median when the probe is actually competitive
            tpu, _ = bench_ours(recon="tpu", runs=1)
            if tpu > 0.5 * ours:
                tpu, _ = bench_ours(recon="tpu", runs=3)
            print(f"recon=tpu pipeline: median {tpu:.2f} fps (bit-exact; "
                  f"tunnel-bound on this host)", file=sys.stderr)
        except Exception as e:  # no device / tunnel down
            print(f"recon=tpu pipeline unavailable: {e}", file=sys.stderr)
    best = ours
    pipeline = "native-cpu"
    vs = ratio
    if tpu is not None and tpu > ours:
        best, pipeline = tpu, "host-parse+tpu-recon"
        vs = (best / hm) if hm else 0.0
    print(json.dumps({
        "metric": "1080p Main10 RA decode fps (bit-exact)",
        "value": round(best, 3),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
        "pipeline": pipeline,
    }))


if __name__ == "__main__":
    main()
