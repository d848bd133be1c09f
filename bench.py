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
 - tpu:     C++ host CABAC parse + DEVICE-RESIDENT reference-DAG batched
   reconstruction (parallel/dag_decode: residual scatter, MC, intra
   wavefront, fused deblock+SAO all on device; only coeffs+syntax maps go
   up and final YUV comes down) — skipped with BENCH_SKIP_TPU=1 or when no
   device is reachable.  H2D/D2H bytes per frame are reported alongside.
   BENCH_TPU_STREAMS (e.g. "1,2,4") additionally measures aggregate
   multi-stream decode throughput per chip (BASELINE.md ladder item 5).

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


def _run_dag_once():
    """Device-resident reference-DAG batched decode (the TPU pipeline)."""
    from libhm_tpu.parallel.dag_decode import decode_batch
    from libhm_tpu.utils import xfer
    data = _data()
    n = NFRAMES * REPEAT
    xfer.reset()
    t0 = time.monotonic()
    outs = decode_batch(data, parse="native")
    dt = time.monotonic() - t0
    assert len(outs) == n
    return dt, outs, xfer.H2D / n, xfer.D2H / n


def bench_dag(runs=3):
    times = []
    outs = h2d = d2h = None
    for _ in range(runs):
        dt, outs, h2d, d2h = _run_dag_once()
        times.append(dt)
    _check_exact(outs)
    n = NFRAMES * REPEAT
    return n / statistics.median(times), h2d, d2h


def bench_multistream(counts=(1, 2, 4)):
    """Aggregate fps decoding N independent 1080p streams in one merged
    device schedule (the stream axis of SURVEY §2.5)."""
    from libhm_tpu.parallel.dag_decode import decode_streams
    data = _data()
    n = NFRAMES * REPEAT
    out = {}
    for N in counts:
        t0 = time.monotonic()
        res = decode_streams([data] * N, parse="native", threads=min(N, 4))
        dt = time.monotonic() - t0
        for o in res:
            assert len(o) == n
            _check_exact(o)
        out[N] = N * n / dt
    return out


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
    tpu = h2d = d2h = None
    multi = {}
    if not os.environ.get("BENCH_SKIP_TPU") and _device_reachable():
        try:
            # one probe run first (includes XLA compiles): only spend more
            # runs on a stable median when the probe is competitive
            tpu, h2d, d2h = bench_dag(runs=1)
            if tpu > 0.25 * ours:
                tpu, h2d, d2h = bench_dag(runs=3)
            print(f"device-resident tpu pipeline: median {tpu:.2f} fps "
                  f"(bit-exact; H2D {h2d/1e6:.2f} MB/frame, "
                  f"D2H {d2h/1e6:.2f} MB/frame)", file=sys.stderr)
            streams = os.environ.get("BENCH_TPU_STREAMS")
            if streams is None:
                # always record at least one multi-stream aggregate
                # (BASELINE.md ladder item 5); spend the larger sweep only
                # when the device pipeline is competitive on this host
                streams = "2,4" if tpu > 0.25 * ours else "2"
            if streams:
                multi = bench_multistream(
                    tuple(int(x) for x in streams.split(",")))
                for N, fps in multi.items():
                    print(f"multi-stream x{N}: aggregate {fps:.2f} fps/chip",
                          file=sys.stderr)
        except Exception as e:  # no device / tunnel down
            print(f"tpu pipeline unavailable: {e}", file=sys.stderr)
    best = ours
    pipeline = "native-cpu"
    vs = ratio
    agg = max(multi.values()) if multi else None
    if agg is not None and agg > max(ours, tpu or 0):
        best, pipeline = agg, "tpu-multistream"
        vs = (best / hm) if hm else 0.0
    elif tpu is not None and tpu > ours:
        best, pipeline = tpu, "host-parse+tpu-recon"
        vs = (best / hm) if hm else 0.0
    extras = {}
    if tpu is not None:
        extras["tpu_fps"] = round(tpu, 3)
        extras["h2d_mb_per_frame"] = round(h2d / 1e6, 3)
        extras["d2h_mb_per_frame"] = round(d2h / 1e6, 3)
    if multi:
        extras["multistream_fps"] = {str(k): round(v, 2)
                                     for k, v in multi.items()}
    print(json.dumps({
        "metric": "1080p Main10 RA decode fps (bit-exact)",
        "value": round(best, 3),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
        "pipeline": pipeline,
        **extras,
    }))


if __name__ == "__main__":
    main()
