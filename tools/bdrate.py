#!/usr/bin/env python3
"""BD-rate harness: our encoder vs the HM reference encoder (TAppEncoder).

For each (config, QP ladder) both encoders code the same synthetic source
(tools/gen_golden.synth_yuv) with the same HM cfg file; every stream is
decoded with our HM-verified native decoder and PSNR is computed against
the source, so both sides are measured identically.  BD-rate uses
piecewise cubic Hermite (PCHIP) interpolation of log-rate over the
overlapping PSNR range (the JVET-standard formulation).

Positive BD-rate = our encoder needs that many percent MORE bits than HM
at equal quality (lower is better; 0 = parity).

Usage: python tools/bdrate.py [--quick] [--out BDRATE.md]
"""
import argparse
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

CFGDIR = "/root/reference/cfg"
HM_ENC = os.path.join(ROOT, ".refbuild", "TAppEncoder")

QPS = [27, 32, 37, 42]


# ---------------------------------------------------------------------------
def psnr_stream(bitstream, src_yuv, w, h, nframes, bitdepth=8):
    """Decode with our native decoder and compute global per-comp PSNR."""
    from libhm_tpu.hostdec.decoder import Decoder
    outs = Decoder(parse="native", recon="native").decode_annexb(
        open(bitstream, "rb").read())
    assert len(outs) == nframes, (len(outs), nframes)
    dt = np.uint8 if bitdepth == 8 else np.uint16
    maxv = (1 << bitdepth) - 1
    fsz = (w * h * 3) // 2
    src = np.fromfile(src_yuv, dtype=dt)[:nframes * fsz].reshape(nframes, fsz)
    sse = np.zeros(3)
    npx = np.zeros(3)
    for t, pic in enumerate(outs):
        off = 0
        for c, plane in enumerate(pic):
            ph, pw = plane.shape
            ref = src[t][off:off + ph * pw].reshape(ph, pw)
            off += ph * pw
            d = plane.astype(np.int64) - ref.astype(np.int64)
            sse[c] += float((d * d).sum())
            npx[c] += d.size
    mse = sse / npx
    mse = np.maximum(mse, 1e-12)
    return 10 * np.log10(maxv * maxv / mse)  # [Y, U, V]


def run_encoder(ours, cfg, src, w, h, n, qp, out):
    cfgp = os.path.join(CFGDIR, cfg)
    args = ["-c", cfgp, "-i", src, "-b", out, "-o", "/dev/null",
            "-wdt", str(w), "-hgt", str(h), "-f", str(n), "-q", str(qp),
            "-fr", "30"]
    if ours:
        cmd = [sys.executable, "-m", "libhm_tpu.apps.enc_app"] + args
    else:
        cmd = [HM_ENC] + args
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"{'ours' if ours else 'HM'} encode failed "
                           f"(cfg={cfg} qp={qp}):\n{r.stderr[-2000:]}")
    return os.path.getsize(out) * 8  # bits


# ---------------------------------------------------------------------------
# PCHIP BD-rate
def _pchip_slopes(x, y):
    h = np.diff(x)
    d = np.diff(y) / h
    m = np.zeros_like(y)
    m[0] = d[0]
    m[-1] = d[-1]
    for i in range(1, len(y) - 1):
        if d[i - 1] * d[i] <= 0:
            m[i] = 0.0
        else:
            w1 = 2 * h[i] + h[i - 1]
            w2 = h[i] + 2 * h[i - 1]
            m[i] = (w1 + w2) / (w1 / d[i - 1] + w2 / d[i])
    return m


def _pchip_integrate(x, y, lo, hi):
    """Integral of the PCHIP interpolant of y(x) over [lo, hi]."""
    m = _pchip_slopes(x, y)
    total = 0.0
    for i in range(len(x) - 1):
        a, b = x[i], x[i + 1]
        s0, s1 = max(a, lo), min(b, hi)
        if s0 >= s1:
            continue
        h = b - a
        # integrate the Hermite cubic on [s0, s1] via normalized t
        t0, t1 = (s0 - a) / h, (s1 - a) / h

        def F(t):
            # antiderivatives of the Hermite basis functions
            h00 = t ** 4 / 2 - t ** 3 + t
            h10 = t ** 4 / 4 - 2 * t ** 3 / 3 + t ** 2 / 2
            h01 = -t ** 4 / 2 + t ** 3
            h11 = t ** 4 / 4 - t ** 3 / 3
            return (y[i] * h00 + h * m[i] * h10 +
                    y[i + 1] * h01 + h * m[i + 1] * h11)
        total += h * (F(t1) - F(t0))
    return total


def bd_rate(rate_anchor, psnr_anchor, rate_test, psnr_test):
    """BD-rate (%) of test vs anchor, PCHIP over the common PSNR range."""
    la = np.log10(np.asarray(rate_anchor, float))
    lt = np.log10(np.asarray(rate_test, float))
    pa = np.asarray(psnr_anchor, float)
    pt = np.asarray(psnr_test, float)
    ia, it = np.argsort(pa), np.argsort(pt)
    la, pa = la[ia], pa[ia]
    lt, pt = lt[it], pt[it]
    lo = max(pa.min(), pt.min())
    hi = min(pa.max(), pt.max())
    if hi <= lo:
        return float("nan")
    int_a = _pchip_integrate(pa, la, lo, hi)
    int_t = _pchip_integrate(pt, lt, lo, hi)
    avg = (int_t - int_a) / (hi - lo)
    return (10 ** avg - 1) * 100


# ---------------------------------------------------------------------------
# Two sequences per config (VERDICT r3 methodology hardening): the
# structured-gradient source and a content-like source (pan + edges +
# texture + noise, gen_golden.synth_yuv_natural).  Inter configs run 17
# frames; sizes chosen so the full 2x4x4-QP ladder stays tractable on the
# 1-core host (~3 h with our encoder).
SOURCES = ("grad", "nat")
LADDER = [
    # name, cfg, w, h, frames
    ("intra", "encoder_intra_main.cfg", 416, 240, 5),
    ("lowdelayP", "encoder_lowdelay_P_main.cfg", 256, 128, 17),
    ("lowdelayB", "encoder_lowdelay_main.cfg", 256, 128, 17),
    ("randomaccess", "encoder_randomaccess_main.cfg", 256, 128, 17),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2 QPs only (sanity run)")
    ap.add_argument("--out", default=os.path.join(ROOT, "BDRATE.md"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    from gen_golden import synth_yuv, synth_yuv_natural

    qps = QPS[1:3] if args.quick else QPS
    rows = []
    for name, cfg, w, h, n in LADDER:
        if args.only and name not in args.only:
            continue
        for sname in SOURCES:
            src = f"/tmp/bd_{sname}_{w}x{h}.yuv"
            if not os.path.exists(src):
                gen = synth_yuv if sname == "grad" else synth_yuv_natural
                gen(src, w, h, max(n, 9), 8, "420")
            pts = {"hm": ([], []), "ours": ([], [])}
            for qp in qps:
                for side, ours in (("hm", False), ("ours", True)):
                    out = f"/tmp/bd_{name}_{sname}_{side}_{qp}.bin"
                    t0 = time.time()
                    bits = run_encoder(ours, cfg, src, w, h, n, qp, out)
                    p = psnr_stream(out, src, w, h, n)
                    ypsnr = p[0]
                    comb = (6 * p[0] + p[1] + p[2]) / 8
                    pts[side][0].append(bits)
                    pts[side][1].append((ypsnr, comb))
                    print(f"{name:13s} {sname:4s} qp{qp} {side:4s}: "
                          f"{bits:8d} bits  Y {ypsnr:6.3f} dB  "
                          f"({time.time()-t0:.0f}s)", flush=True)
            bdy = bd_rate(pts["hm"][0], [v[0] for v in pts["hm"][1]],
                          pts["ours"][0], [v[0] for v in pts["ours"][1]])
            bdc = bd_rate(pts["hm"][0], [v[1] for v in pts["hm"][1]],
                          pts["ours"][0], [v[1] for v in pts["ours"][1]])
            rows.append((f"{name}/{sname}", cfg, f"{w}x{h}", n, qps,
                         bdy, bdc, pts))
            print(f"==> {name}/{sname}: BD-rate Y {bdy:+.2f}%  "
                  f"YUV {bdc:+.2f}%", flush=True)
        pair = [r for r in rows if r[0].startswith(name + "/")]
        if len(pair) == len(SOURCES):
            avg_y = sum(r[5] for r in pair) / len(pair)
            avg_c = sum(r[6] for r in pair) / len(pair)
            rows.append((f"{name}/avg", cfg,
                         f"{pair[0][2]}", n, qps, avg_y, avg_c, None))
            print(f"==> {name}/avg: BD-rate Y {avg_y:+.2f}%  "
                  f"YUV {avg_c:+.2f}%", flush=True)

    with open(args.out, "w") as f:
        f.write("# BD-rate vs HM 16.0 (TAppEncoder)\n\n")
        f.write("Same HM cfg files, two synthetic sources per config "
                "(structured gradients `grad` = gen_golden.synth_yuv; "
                "content-like `nat` = gen_golden.synth_yuv_natural: pan + "
                "edges + texture + noise), QPs "
                f"{qps}; both sides decoded with the HM-verified native "
                "decoder and PSNR measured identically; PCHIP BD-rate "
                "(tools/bdrate.py).  Positive = our encoder spends that "
                "much more rate than HM at equal PSNR.\n\n")
        f.write("| config | cfg file | size | frames | BD-rate Y | "
                "BD-rate YUV |\n|---|---|---|---|---|---|\n")
        for (name, cfg, sz, n, _, bdy, bdc, _) in rows:
            f.write(f"| {name} | {cfg} | {sz} | {n} | {bdy:+.2f}% | "
                    f"{bdc:+.2f}% |\n")
        f.write("\n## Raw points (bits, Y-PSNR dB)\n\n")
        for (name, cfg, sz, n, qq, bdy, bdc, pts) in rows:
            if pts is None:
                continue
            f.write(f"### {name}\n\n| QP | HM bits | HM Y | ours bits | "
                    "ours Y |\n|---|---|---|---|---|\n")
            for i, qp in enumerate(qq):
                f.write(f"| {qp} | {pts['hm'][0][i]} | "
                        f"{pts['hm'][1][i][0]:.3f} | {pts['ours'][0][i]} | "
                        f"{pts['ours'][1][i][0]:.3f} |\n")
            f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
