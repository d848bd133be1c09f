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

HARD WALL-CLOCK BOUND.  The whole bench runs under an internal budget
(BENCH_BUDGET_S, default 420 s) and ALWAYS emits the headline JSON and
exits 0 — a SIGALRM backstop emits whatever has been measured so far.
Device work runs in a bounded subprocess that prints each measurement as
its own JSON line the moment it completes, so a hung tunnel or a slow
transfer can never take the headline down with it.

Pipelines measured:
 - native:  C++ host CABAC parse + AVX2 reconstruction (the wall-clock
   headline on hosts where the TPU sits behind a slow tunnel).
 - device-compute:  C++ host parse + DEVICE-RESIDENT reference-DAG
   reconstruction with pixels kept in HBM; only a uint32 checksum comes
   down, cross-checked against the host decode
   (parallel/dag_decode.decode_batch_device).  This isolates what the
   chip actually delivers when D2H is pathological (measured 0.05 MB/s
   through this deployment's tunnel — 2 minutes per 1080p frame).
 - tpu (full): same pipeline + full YUV download, only attempted when a
   D2H bandwidth probe projects the downloads fitting the budget.
   BENCH_TPU_STREAMS (e.g. "1,2,4") adds aggregate multi-stream decode.
"""
import hashlib
import json
import os
import signal
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
BUDGET = float(os.environ.get("BENCH_BUDGET_S", "420"))
T0 = time.monotonic()

# ~bytes of one decoded 1080p Main10 picture (uint16 planes, padded to CTU)
FRAME_MB = (1920 * 1088 * 2 + 2 * (960 * 544 * 2)) / 1e6


def _remaining():
    return BUDGET - (time.monotonic() - T0)


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
    return n / statistics.median(times), outs


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
    Returns (ours_median_fps, hm_median_fps, median_pair_ratio, outs) or
    None when the HM binary is unavailable.  Stops adding pairs once 45%
    of the budget is spent — partial medians beat a blown budget.
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
        if ratios and _remaining() < 0.55 * BUDGET:
            break
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
            statistics.median(ratios), outs)


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
        limit = max(60, _remaining() - 120)
        if os.path.exists(script):
            print("building HM reference apps (fresh host)...",
                  file=sys.stderr)
            try:
                subprocess.run(["bash", script], timeout=limit,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL)
            except Exception as e:
                print(f"HM rebuild failed: {e}", file=sys.stderr)
    return exe if os.path.exists(exe) else None


# ---------------------------------------------------------------------------
# Device section: runs in a SUBPROCESS so a hung tunnel cannot kill the
# headline.  Each completed measurement prints as its own JSON line; the
# parent merges every line it managed to read before its deadline.
# ---------------------------------------------------------------------------
def _emit_line(obj):
    print(json.dumps(obj), flush=True)


def device_child(budget_s, ours_fps, expect_csum):
    deadline = time.monotonic() + budget_s

    def left():
        return deadline - time.monotonic()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_libhm")
    import numpy as np
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    dev = jax.devices()[0]
    _emit_line({"device": str(dev)})

    # --- H2D probe only (device-compute needs no downloads; the D2H
    # probe runs AFTER it — through this deployment's tunnel a 32 KB
    # download alone can take a minute) ---
    up = np.zeros(4 << 20, np.uint8)
    t0 = time.monotonic()
    d = jax.device_put(up)
    d.block_until_ready()
    h2d = 4.0 / max(1e-9, time.monotonic() - t0)
    _emit_line({"h2d_mbps": round(h2d, 2)})

    data = _data()
    n = NFRAMES * REPEAT

    # --- device-compute decode (pixels stay in HBM; checksum only) ---
    # One 17-frame pass: measured ~55 s warm on this deployment (the
    # pipeline is dispatch-latency-bound through the tunnel; ~15 min
    # cold while every kernel compiles).  A SIGALRM bound aborts the
    # run between dispatches if compiles blow the remaining budget.
    n1 = NFRAMES
    data1 = open(STREAM, "rb").read()

    class _Abort(Exception):
        pass

    def _on_alarm(_s, _f):
        raise _Abort()

    signal.signal(signal.SIGALRM, _on_alarm)
    if left() > 120:
        from libhm_tpu.parallel.dag_decode import decode_batch_device
        best = None
        try:
            for _ in range(2):
                budget_i = max(30, int(left()) - 40)
                signal.alarm(budget_i)
                ps, cs, csum, npics = decode_batch_device(data1,
                                                          parse="native")
                signal.alarm(0)
                assert npics == n1
                ok = (csum == expect_csum) if expect_csum is not None \
                    else None
                fps = n1 / cs
                best = max(best or 0.0, fps)
                _emit_line({"device_compute_fps": round(best, 3),
                            "device_parse_s": round(ps, 3),
                            "device_checksum_ok": ok,
                            "device_compute_frames": n1})
                if left() < 1.5 * cs + 30:
                    break
        except _Abort:
            _emit_line({"skipped_device_compute":
                        "aborted by watchdog (cold-compile run exceeded "
                        "the remaining budget)"})
        finally:
            signal.alarm(0)
    else:
        _emit_line({"skipped_device_compute":
                    f"only {left():.0f}s left"})

    # --- D2H probe, then full pipeline incl. YUV download if it fits ---
    small = jnp.zeros(32 << 10, jnp.uint8)
    small.block_until_ready()
    t0 = time.monotonic()
    np.asarray(small)
    d2h = (32.0 / 1024) / max(1e-9, time.monotonic() - t0)
    _emit_line({"d2h_mbps": round(d2h, 4)})
    dl_s = n * FRAME_MB / max(d2h, 1e-3)
    if left() > dl_s * 1.3 + 60:
        from libhm_tpu.parallel.dag_decode import decode_batch, \
            decode_streams
        from libhm_tpu.utils import xfer
        gold = json.load(open(GOLDEN))[NAME]["decoded_yuv_md5"]
        xfer.reset()
        t0 = time.monotonic()
        outs = decode_batch(data, parse="native")
        dt = time.monotonic() - t0
        for r in range(REPEAT):
            buf = b"".join(p.tobytes()
                           for pic in outs[r * NFRAMES:(r + 1) * NFRAMES]
                           for p in pic)
            assert hashlib.md5(buf).hexdigest() == gold
        tpu = n / dt
        _emit_line({"tpu_fps": round(tpu, 3),
                    "h2d_mb_per_frame": round(xfer.H2D / n / 1e6, 3),
                    "d2h_mb_per_frame": round(xfer.D2H / n / 1e6, 3)})
        streams = os.environ.get("BENCH_TPU_STREAMS")
        if streams is None and tpu > 0.25 * ours_fps:
            streams = "2,4"
        if streams:
            for N in (int(x) for x in streams.split(",")):
                if left() < (dl_s + 30) * N:
                    break
                t0 = time.monotonic()
                res = decode_streams([data] * N, parse="native",
                                     threads=min(N, 4))
                dt = time.monotonic() - t0
                for o in res:
                    assert len(o) == n
                _emit_line({"multistream_fps": {str(N): round(N * n / dt,
                                                              2)}})
    else:
        _emit_line({"skipped_tpu_full":
                    f"D2H {d2h:.3f} MB/s -> {dl_s:.0f}s of downloads"})


def _run_device_section(ours_fps, expect_csum):
    """Launch device_child bounded by the remaining budget; merge every
    JSON line it printed (even if it had to be killed mid-measurement)."""
    budget = _remaining() - 25
    if budget < 60:
        print("no budget left for the device section", file=sys.stderr)
        return {}
    cmd = [sys.executable, os.path.abspath(__file__), "--device-child",
           str(budget), str(ours_fps), str(expect_csum)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=budget, cwd=ROOT)
        out, err = r.stdout, r.stderr
    except subprocess.TimeoutExpired as e:
        out, err = e.stdout or "", e.stderr or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
        err += "\n[device child hit the deadline]"
    for ln in err.strip().splitlines()[-12:]:
        print(f"[device] {ln}", file=sys.stderr)
    merged = {}
    for ln in out.splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            obj = json.loads(ln)
        except ValueError:
            continue
        for k, v in obj.items():
            if k == "multistream_fps":
                merged.setdefault(k, {}).update(v)
            else:
                merged[k] = v
    return merged


# ---------------------------------------------------------------------------
STATE = {"metric": "1080p Main10 RA decode fps (bit-exact)",
         "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
         "pipeline": "native-cpu"}
_EMITTED = False


def _emit():
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(STATE), flush=True)


def _alarm(_sig, _frm):
    print("bench watchdog fired: emitting partial results", file=sys.stderr)
    _emit()
    os._exit(0)


def main():
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(BUDGET) + 45)
    try:
        paired = bench_paired()
        if paired is not None:
            ours, hm, ratio, outs = paired
        else:
            ours, outs = bench_ours(runs=3)
            hm, ratio = None, 0.0
        STATE.update(value=round(ours, 3), vs_baseline=round(ratio, 4))
        parse_fps = bench_parse_only()
        STATE["parse_only_fps"] = round(parse_fps, 2)
        print(f"breakdown: parse-only {parse_fps:.2f} fps; "
              f"full native median {ours:.2f} fps; "
              f"HM median {hm or 0:.2f} fps; "
              f"median paired ratio {ratio:.3f}", file=sys.stderr)
        if not os.environ.get("BENCH_SKIP_TPU"):
            from libhm_tpu.parallel.dag_decode import cropped_checksum
            # the device child decodes ONE 17-frame repetition; golden
            # equality of each repetition is asserted in _check_exact
            csum = cropped_checksum(outs[:NFRAMES]) if outs else None
            extras = _run_device_section(ours, csum)
            for k in ("device_compute_fps", "device_parse_s",
                      "device_checksum_ok", "tpu_fps", "h2d_mb_per_frame",
                      "d2h_mb_per_frame", "multistream_fps", "h2d_mbps",
                      "d2h_mbps", "skipped_device_compute",
                      "skipped_tpu_full"):
                if k in extras:
                    STATE[k] = extras[k]
            # headline = fastest pipeline that delivers pixels to the host
            tpu = extras.get("tpu_fps")
            agg = max(extras.get("multistream_fps", {}).values() or [0])
            if agg and agg > max(ours, tpu or 0):
                STATE.update(value=round(agg, 3),
                             pipeline="tpu-multistream",
                             vs_baseline=round(agg / hm, 4) if hm else 0.0)
            elif tpu is not None and tpu > ours:
                STATE.update(value=round(tpu, 3),
                             pipeline="host-parse+tpu-recon",
                             vs_baseline=round(tpu / hm, 4) if hm else 0.0)
    except Exception as e:
        print(f"bench error: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        signal.alarm(0)
        _emit()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--device-child":
        budget = float(sys.argv[2])
        ours_fps = float(sys.argv[3])
        expect = None if sys.argv[4] == "None" else int(sys.argv[4])
        device_child(budget, ours_fps, expect)
    else:
        main()
