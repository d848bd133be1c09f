#!/usr/bin/env python3
"""Per-POC bits/PSNR diff: our encoder vs HM on one (config, QP) point.

Encodes the same source both ways, parses HM's per-picture log line
(`POC n TId ... ) b bits [Y p dB ...]`) and computes ours from the
decoded streams, then prints a side-by-side table ordered by coding
order.  The iteration loop for hierarchical-GOP RD work: shows WHICH
pictures (slice type / temporal level) spend the extra bits.

Usage: python tools/pocdiff.py randomaccess 27 [--src grad|nat] [--frames 9]
"""
import argparse
import os
import re
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from bdrate import LADDER, run_encoder, CFGDIR, HM_ENC  # noqa: E402


def hm_encode_log(cfg, src, w, h, n, qp, out):
    args = [HM_ENC, "-c", os.path.join(CFGDIR, cfg), "-i", src, "-b", out,
            "-o", "/dev/null", "-wdt", str(w), "-hgt", str(h),
            "-f", str(n), "-q", str(qp), "-fr", "30"]
    r = subprocess.run(args, cwd=ROOT, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    rows = {}
    for line in r.stdout.splitlines():
        m = re.search(r"POC\s+(\d+)\s+TId:\s*(\d+)\s+\(\s*(\w)-SLICE.*?"
                      r"QP\s+(\d+)\s*\)\s+(\d+)\s+bits\s+\[Y\s+([\d.]+)\s+"
                      r"dB\s+U\s+([\d.]+)\s+dB\s+V\s+([\d.]+)", line)
        if m:
            rows[int(m.group(1))] = (m.group(3), int(m.group(4)),
                                     int(m.group(5)), float(m.group(6)),
                                     float(m.group(7)), float(m.group(8)))
    return rows


def ours_encode_rows(cfg, src, w, h, n, qp, out):
    from libhm_tpu.encoder.options import parse_cfg_files, HmConfig
    from libhm_tpu.encoder.encoder import IntraEncoder
    opts = parse_cfg_files(
        [os.path.join(CFGDIR, cfg)],
        [f"SourceWidth={w}", f"SourceHeight={h}",
         f"FramesToBeEncoded={n}", f"QP={qp}", "FrameRate=30"])
    econf = HmConfig(opts).to_encoder_config()
    fsz = (w * h * 3) // 2
    raw = np.fromfile(src, dtype=np.uint8)[:n * fsz].reshape(n, fsz)
    frames = []
    for t in range(n):
        y = raw[t][:w * h].reshape(h, w)
        u = raw[t][w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
        v = raw[t][w * h + w * h // 4:].reshape(h // 2, w // 2)
        frames.append((y, u, v))
    enc = IntraEncoder(econf)
    stream = enc.encode_stream(frames)
    open(out, "wb").write(stream)
    rows = {}
    st_name = {0: "B", 1: "P", 2: "I"}
    for st, nbits, poc, recon in enc.stats:
        yy, uu, vv = frames[poc]
        ps = []
        for comp, (r, s) in enumerate(zip(recon, (yy, uu, vv))):
            d = r.astype(np.int64) - s.astype(np.int64)
            mse = max(float((d * d).mean()), 1e-12)
            ps.append(10 * np.log10(255 * 255 / mse))
        rows[poc] = (st_name[st], None, nbits, ps[0], ps[1], ps[2])
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("qp", type=int)
    ap.add_argument("--src", default="grad")
    ap.add_argument("--frames", type=int, default=9)
    args = ap.parse_args()
    from gen_golden import synth_yuv, synth_yuv_natural

    name, cfg, w, h, _n = next(t for t in LADDER if t[0] == args.config)
    n = args.frames
    src = f"/tmp/bd_{args.src}_{w}x{h}.yuv"
    if not os.path.exists(src):
        gen = synth_yuv if args.src == "grad" else synth_yuv_natural
        gen(src, w, h, max(n, 17), 8, "420")

    hm = hm_encode_log(cfg, src, w, h, n, args.qp,
                       f"/tmp/pd_{name}_hm_{args.qp}.bin")
    ours = ours_encode_rows(cfg, src, w, h, n, args.qp,
                            f"/tmp/pd_{name}_ours_{args.qp}.bin")
    print(f"{'POC':>4} {'ty':>2} {'hmQP':>4} | {'HM bits':>8} {'our bits':>8} "
          f"{'d%':>7} | {'HM Y':>7} {'our Y':>7} {'dY':>6} | "
          f"{'HM U':>6} {'our U':>6} {'HM V':>6} {'our V':>6}")
    tot_hm = tot_ours = 0
    for poc in sorted(hm):
        h_ = hm[poc]
        o_ = ours.get(poc)
        if o_ is None:
            continue
        tot_hm += h_[2]
        tot_ours += o_[2]
        d = 100.0 * (o_[2] - h_[2]) / max(h_[2], 1)
        print(f"{poc:>4} {h_[0]:>2} {h_[1]:>4} | {h_[2]:>8} {o_[2]:>8} "
              f"{d:>+6.1f}% | {h_[3]:>7.3f} {o_[3]:>7.3f} "
              f"{o_[3]-h_[3]:>+6.3f} | {h_[4]:>6.2f} {o_[4]:>6.2f} "
              f"{h_[5]:>6.2f} {o_[5]:>6.2f}")
    print(f"total: HM {tot_hm}  ours {tot_ours}  "
          f"({100.0*(tot_ours-tot_hm)/tot_hm:+.2f}%)")


if __name__ == "__main__":
    main()
