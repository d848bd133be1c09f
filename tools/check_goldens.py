#!/usr/bin/env python3
"""Fast regression loop: decode every golden stream with the native
parse+recon pipeline and verify the decoded-YUV MD5 against the HM oracle
(testdata/golden.json).  Much faster than the pytest matrix; used while
optimizing native/recon.cpp and native/sliceparse.cpp.

Usage: python tools/check_goldens.py [--recon native|numpy|tpu] [names...]
"""
import argparse
import hashlib
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recon", default="native")
    ap.add_argument("--parse", default="native")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    from libhm_tpu.hostdec.decoder import Decoder

    gold = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))
    names = args.names or sorted(gold.keys())
    fails = []
    t00 = time.monotonic()
    for name in names:
        g = gold[name]
        data = open(os.path.join(ROOT, "testdata", g["bitstream"]), "rb").read()
        t0 = time.monotonic()
        try:
            outs = Decoder(parse=args.parse, recon=args.recon).decode_annexb(data)
            buf = b"".join(p.tobytes() for pic in outs for p in pic)
            ok = hashlib.md5(buf).hexdigest() == g["decoded_yuv_md5"]
        except Exception as e:
            ok = False
            print(f"  EXC {name}: {e}")
        dt = time.monotonic() - t0
        print(f"{'ok  ' if ok else 'FAIL'} {name:42s} {dt:6.2f}s")
        if not ok:
            fails.append(name)
    print(f"-- {len(names) - len(fails)}/{len(names)} ok in "
          f"{time.monotonic() - t00:.1f}s")
    if fails:
        print("FAILED:", " ".join(fails))
        sys.exit(1)


if __name__ == "__main__":
    main()
