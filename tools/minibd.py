#!/usr/bin/env python3
"""Mini BD-rate probe: 9-frame randomaccess (or any LADDER config) at the
full QP ladder against cached HM anchors.  ~1/2 the cost of the real
ladder row; the iteration loop for RA RD work.

Usage: python tools/minibd.py [--config randomaccess] [--src grad|nat]
                              [--frames 9] [--tag NAME]
"""
import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from bdrate import LADDER, QPS, run_encoder, psnr_stream, bd_rate  # noqa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="randomaccess")
    ap.add_argument("--src", default="grad")
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--tag", default="minibd")
    args = ap.parse_args()
    from gen_golden import synth_yuv, synth_yuv_natural

    name, cfg, w, h, _n = next(t for t in LADDER if t[0] == args.config)
    n = args.frames
    src = f"/tmp/bd_{args.src}_{w}x{h}.yuv"
    if not os.path.exists(src):
        gen = synth_yuv if args.src == "grad" else synth_yuv_natural
        gen(src, w, h, max(n, 9), 8, "420")

    pts = {"hm": ([], []), "ours": ([], [])}
    for qp in QPS:
        for side, ours in (("hm", False), ("ours", True)):
            out = f"/tmp/mbd_{name}_{args.src}_{n}_{side}_{qp}.bin"
            if side == "ours" or not os.path.exists(out):
                t0 = time.time()
                run_encoder(ours, cfg, src, w, h, n, qp, out)
                dt = time.time() - t0
            else:
                dt = 0.0
            bits = os.path.getsize(out) * 8
            p = psnr_stream(out, src, w, h, n)
            pts[side][0].append(bits)
            pts[side][1].append((p[0], (6 * p[0] + p[1] + p[2]) / 8))
            print(f"{name} {args.src} qp{qp} {side:4s}: {bits:8d} bits  "
                  f"Y {p[0]:6.3f}  ({dt:.0f}s)", flush=True)
    bdy = bd_rate(pts["hm"][0], [v[0] for v in pts["hm"][1]],
                  pts["ours"][0], [v[0] for v in pts["ours"][1]])
    bdc = bd_rate(pts["hm"][0], [v[1] for v in pts["hm"][1]],
                  pts["ours"][0], [v[1] for v in pts["ours"][1]])
    # conformance: HM must accept our QP32 stream hash-clean
    r = subprocess.run(
        [os.path.join(ROOT, ".refbuild", "TAppDecoder"), "-b",
         f"/tmp/mbd_{name}_{args.src}_{n}_ours_32.bin", "-o", "/dev/null"],
        capture_output=True, text=True)
    conf = "OK" if r.returncode == 0 and "mismatch" not in r.stdout \
        else "FAIL"
    print(f"[{args.tag}] {name}/{args.src} f{n}: BD-rate Y {bdy:+.2f}%  "
          f"YUV {bdc:+.2f}%  (HMdec {conf})")


if __name__ == "__main__":
    main()
