"""Encoder application (TAppEncoder equivalent, v1 tool profile).

Mirrors the reference app's core CLI (reference: source/App/TAppEncoder/
TAppEncCfg.cpp): -i input YUV, -b bitstream, -wdt/-hgt, -f frames, -q QP.

    python -m libhm_tpu.apps.enc_app -i in.yuv -b out.bin -wdt 416 -hgt 240 -f 3
"""
import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="libhm_tpu HEVC encoder (all-intra / low-delay P)")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-b", "--bitstream", required=True)
    ap.add_argument("-o", "--recon", default=None)
    ap.add_argument("-wdt", type=int, required=True)
    ap.add_argument("-hgt", type=int, required=True)
    ap.add_argument("-f", "--frames", type=int, required=True)
    ap.add_argument("-q", "--qp", type=int, default=32)
    ap.add_argument("--cu-size", type=int, default=32)
    ap.add_argument("--gop", choices=["intra", "lowdelayP", "lowdelayB", "randomaccess"], default="intra",
                    help="GOP structure: all-intra or IDR + low-delay P")
    ap.add_argument("--search-range", type=int, default=8)
    ap.add_argument("--rate", type=int, default=None,
                    help="target bitrate in kbps (R-lambda rate control)")
    ap.add_argument("-fr", "--frame-rate", type=float, default=30.0)
    args = ap.parse_args(argv)

    from ..encoder.encoder import IntraEncoder, EncoderConfig
    w, h = args.wdt, args.hgt
    raw = np.fromfile(args.input, np.uint8)
    fsz = w * h * 3 // 2
    frames = []
    for f in range(args.frames):
        fr = raw[f * fsz:(f + 1) * fsz]
        frames.append((fr[:w * h].reshape(h, w),
                       fr[w * h:w * h + w * h // 4].reshape(h // 2, w // 2),
                       fr[w * h + w * h // 4:].reshape(h // 2, w // 2)))
    t0 = time.monotonic()
    enc = IntraEncoder(EncoderConfig(w, h, qp=args.qp, cu_size=args.cu_size,
                                     gop=args.gop,
                                     search_range=args.search_range,
                                     rate_kbps=args.rate,
                                     fps=args.frame_rate))
    stream = enc.encode_stream(frames)
    dt = time.monotonic() - t0
    open(args.bitstream, "wb").write(stream)
    print(f"encoded {args.frames} frames -> {len(stream)} bytes "
          f"in {dt:.2f}s ({8*len(stream)*30/args.frames/1000:.1f} kbps @30fps)")
    # per-slice-type PSNR / bitrate summary (reference TEncAnalyze)
    from ..encoder.analyze import Analyze
    an = Analyze(fps=args.frame_rate)
    for slice_type, bits, poc, recon in enc.stats:
        an.add_picture(slice_type, bits, frames[poc], recon, enc.cfg.bit_depth)
    print(an.summary())
    if args.recon:
        with open(args.recon, "wb") as f:
            order = sorted(enc.stats, key=lambda s: s[2])
            for _, _, _, recon in order:
                for plane in recon:
                    f.write(plane.astype(
                        np.uint8 if enc.cfg.bit_depth <= 8 else "<u2"
                    ).tobytes())
    return 0


if __name__ == "__main__":
    sys.exit(main())
