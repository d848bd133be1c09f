#!/usr/bin/env python3
"""Per-POC CU-decision diff between two HEVC streams (HM's vs ours).

Decodes both with the Python parser (which retains PicSyntax maps) and
prints, per POC, the 4x4-area shares of skip / merge-ish zero-mvd /
inter / intra, mean |MV| and mean coded-residual density — the encoder
RD fingerprint.  Reads which DECISIONS diverge, complementing
stats.py's per-syntax bit view.

Usage: python tools/cudiff.py A.bin B.bin
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from libhm_tpu.hostdec.decoder import Decoder  # noqa: E402


def summarize(path):
    dec = Decoder(parse="python", recon="numpy")
    dec.decode_annexb(open(path, "rb").read())
    rows = {}
    for rec in dec.output_records:
        ps = rec.pic_syntax
        if ps is None:
            continue
        w4 = ps.sps.width >> 2
        h4 = ps.sps.height >> 2
        inter = (ps.pred_mode[:h4, :w4] == 0)
        intra = ~inter
        skip = ps.skip[:h4, :w4] == 1
        area = float(w4 * h4)
        mv = ps.mv[:h4, :w4]
        amv = np.abs(mv).sum(axis=(2, 3))[inter].mean() if inter.any() else 0
        nz = sum(1 for tu in ps.tu_list for c in range(3)
                 if tu.coeffs[c] is not None)
        bi = (ps.inter_dir[:h4, :w4] == 3)
        rows[rec.poc] = dict(
            skip=skip.sum() / area, intra=intra.sum() / area,
            bi=bi.sum() / area, amv=amv, ntu=len(ps.tu_list), nzc=nz)
    return rows


def main():
    a = summarize(sys.argv[1])
    b = summarize(sys.argv[2])
    print(f"{'POC':>4} | {'skipA':>6} {'skipB':>6} | {'intrA':>6} "
          f"{'intrB':>6} | {'biA':>6} {'biB':>6} | {'amvA':>6} {'amvB':>6} "
          f"| {'ntuA':>5} {'ntuB':>5} | {'nzA':>5} {'nzB':>5}")
    for poc in sorted(a):
        ra, rb = a[poc], b.get(poc)
        if rb is None:
            continue
        print(f"{poc:>4} | {ra['skip']:>6.3f} {rb['skip']:>6.3f} | "
              f"{ra['intra']:>6.3f} {rb['intra']:>6.3f} | "
              f"{ra['bi']:>6.3f} {rb['bi']:>6.3f} | "
              f"{ra['amv']:>6.1f} {rb['amv']:>6.1f} | "
              f"{ra['ntu']:>5} {rb['ntu']:>5} | {ra['nzc']:>5} {rb['nzc']:>5}")


if __name__ == "__main__":
    main()
