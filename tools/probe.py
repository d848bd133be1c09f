#!/usr/bin/env python3
"""Single-point BD probe: encode one (config, QP) with our encoder, compare
bits + PSNR against the cached HM anchor (re-encoding the anchor only if
missing).  ~2 min per point on the 1-core host vs ~60 min for the full
ladder (tools/bdrate.py) — the iteration loop for encoder RD work.

Usage: python tools/probe.py randomaccess 32 [--tag NAME]
"""
import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from bdrate import LADDER, run_encoder, psnr_stream  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("qp", type=int)
    ap.add_argument("--tag", default="probe")
    args = ap.parse_args()
    from gen_golden import synth_yuv

    name, cfg, w, h, n = next(t for t in LADDER if t[0] == args.config)
    src = f"/tmp/bd_src_{w}x{h}.yuv"
    if not os.path.exists(src):
        synth_yuv(src, w, h, max(n, 9), 8, "420")

    hm_out = f"/tmp/bd_{name}_hm_{args.qp}.bin"
    if not os.path.exists(hm_out):
        run_encoder(False, cfg, src, w, h, n, args.qp, hm_out)
    hm_bits = os.path.getsize(hm_out) * 8
    hm_p = psnr_stream(hm_out, src, w, h, n)

    out = f"/tmp/bd_{name}_{args.tag}_{args.qp}.bin"
    t0 = time.time()
    bits = run_encoder(True, cfg, src, w, h, n, args.qp, out)
    dt = time.time() - t0
    p = psnr_stream(out, src, w, h, n)

    # conformance: HM's decoder must accept the stream hash-clean
    r = subprocess.run([os.path.join(ROOT, ".refbuild", "TAppDecoder"),
                        "-b", out, "-o", "/dev/null"],
                       capture_output=True, text=True)
    conf = "OK" if r.returncode == 0 and "mismatch" not in r.stdout else "FAIL"

    dy = p[0] - hm_p[0]
    db = 100.0 * (bits - hm_bits) / hm_bits
    print(f"{name} qp{args.qp} [{args.tag}] ({dt:.0f}s, HMdec {conf})")
    print(f"  HM  : {hm_bits:8d} bits  Y {hm_p[0]:.3f} U {hm_p[1]:.3f} "
          f"V {hm_p[2]:.3f}")
    print(f"  ours: {bits:8d} bits  Y {p[0]:.3f} U {p[1]:.3f} V {p[2]:.3f}")
    print(f"  delta: {db:+.2f}% bits, {dy:+.3f} dB Y")


if __name__ == "__main__":
    main()
