#!/usr/bin/env python3
"""Generate golden HEVC test material using the HM reference binaries.

Synthesizes deterministic YUV content, encodes it with the reference
TAppEncoder (built out-of-tree by .refbuild/build_ref.sh), and decodes it
with the reference TAppDecoder to produce the golden reconstruction.

The committed artifacts are the bitstreams (testdata/*.bin) plus MD5s of
the decoded YUV (testdata/golden.json); YUV files are regenerated on demand.

Reference behavior being mirrored: the encoder embeds a decoded-picture-hash
SEI (reference: source/Lib/TLibEncoder/SEIEncoder).  Our decoder must match
the reference decoder's output planes byte-for-byte.
"""
import argparse
import hashlib
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBUILD = os.path.join(ROOT, ".refbuild")
TESTDATA = os.path.join(ROOT, "testdata")
CFGDIR = "/root/reference/cfg"

import numpy as np


def synth_yuv(path, w, h, frames, bitdepth=8, chroma="420", seed=7):
    """Deterministic synthetic video: gradients + moving blobs + texture."""
    rng = np.random.RandomState(seed)
    sx = 2 if chroma in ("420", "422") else 1
    sy = 2 if chroma == "420" else 1
    cw, ch = w // sx, h // sy
    maxv = (1 << bitdepth) - 1
    dtype = np.uint8 if bitdepth == 8 else np.uint16
    # static texture layer so intra has detail; moving parts so inter has MVs
    tex = rng.randint(0, 40, size=(h, w)).astype(np.int32)
    ctexU = rng.randint(0, 20, size=(ch, cw)).astype(np.int32)
    ctexV = rng.randint(0, 20, size=(ch, cw)).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    cyy, cxx = np.mgrid[0:ch, 0:cw]
    with open(path, "wb") as f:
        for t in range(frames):
            # moving diagonal gradient + sinusoid + blob
            base = (xx * 2 + yy + t * 9) % 256
            blob = 120 * np.exp(-(((xx - (40 + 13 * t) % w) ** 2 +
                                   (yy - (30 + 7 * t) % h) ** 2) / 800.0))
            Y = np.clip((base + blob + tex) * (maxv / 255.0), 0, maxv)
            U = np.clip(((cxx + 2 * t) % 200 + 28 + ctexU) * (maxv / 255.0), 0, maxv)
            V = np.clip(((cyy * 2 + 3 * t) % 180 + 38 + ctexV) * (maxv / 255.0), 0, maxv)
            for plane in (Y, U, V):
                plane.astype(dtype).tofile(f)


SEQS = {
    # name: (cfg, w, h, frames, bitdepth, chroma, extra_args)
    "intra_64x64": ("encoder_intra_main.cfg", 64, 64, 2, 8, "420",
                    ["--IntraPeriod=1", "-ip", "1"]),
    "intra_416x240": ("encoder_intra_main.cfg", 416, 240, 3, 8, "420", []),
    "intra_qp22_416x240": ("encoder_intra_main.cfg", 416, 240, 2, 8, "420", ["-q", "22"]),
    "lowdelayP_416x240": ("encoder_lowdelay_P_main.cfg", 416, 240, 9, 8, "420", []),
    "randomaccess_416x240": ("encoder_randomaccess_main.cfg", 416, 240, 17, 8, "420", []),
    "intra_main10_416x240": ("encoder_intra_main10.cfg", 416, 240, 2, 10, "420", []),
    "randomaccess_main10_416x240": ("encoder_randomaccess_main10.cfg", 416, 240, 17, 10, "420", []),
    "lowdelayB_416x240": ("encoder_lowdelay_main.cfg", 416, 240, 9, 8, "420", []),
    # RExt 4:4:4
    "intra_rext444_416x240": ("encoder_intra_main_rext.cfg", 416, 240, 2, 8, "444",
                              ["--ChromaFormatIDC=444"]),
    # 1080p for benching (more frames for a stable fps number)
    "intra_main10_1080p": ("encoder_intra_main10.cfg", 1920, 1080, 5, 10, "420", []),
    "randomaccess_main10_1080p": ("encoder_randomaccess_main10.cfg", 1920, 1080, 17, 10, "420", []),
    # 4K Main10 (BASELINE.md ladder item 5: batched multi-stream decode);
    # small search range keeps the one-time HM encode tractable
    "lowdelayP_main10_4k": ("encoder_lowdelay_P_main10.cfg", 3840, 2160, 3, 10,
                            "420", ["-sr", "16"]),
}


def run(name, only=None):
    cfg, w, h, frames, bd, chroma, extra = SEQS[name]
    os.makedirs(TESTDATA, exist_ok=True)
    yuv = os.path.join(TESTDATA, f"{name}_in.yuv")
    bit = os.path.join(TESTDATA, f"{name}.bin")
    rec = os.path.join(TESTDATA, f"{name}_rec.yuv")
    dec = os.path.join(TESTDATA, f"{name}_dec.yuv")
    synth_yuv(yuv, w, h, frames, bd, chroma)
    if not os.path.exists(bit):
        args = [os.path.join(REFBUILD, "TAppEncoder"), "-c", os.path.join(CFGDIR, cfg),
                "-i", yuv, "-b", bit, "-o", rec,
                "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-fr", "30",
                "--InputBitDepth=%d" % bd, "--SEIDecodedPictureHash=1",
                "--ConformanceWindowMode=1"] + extra
        print(" ".join(args))
        subprocess.check_call(args, stdout=subprocess.DEVNULL)
    # golden decode
    subprocess.check_call([os.path.join(REFBUILD, "TAppDecoder"), "-b", bit, "-o", dec],
                          stdout=subprocess.DEVNULL)
    md5 = hashlib.md5(open(dec, "rb").read()).hexdigest()
    return {"bitstream": os.path.basename(bit), "w": w, "h": h, "frames": frames,
            "bitdepth": bd, "chroma": chroma, "decoded_yuv_md5": md5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or list(SEQS)
    goldens = {}
    gpath = os.path.join(TESTDATA, "golden.json")
    if os.path.exists(gpath):
        goldens = json.load(open(gpath))
    for n in names:
        goldens[n] = run(n)
        print(n, goldens[n]["decoded_yuv_md5"])
    json.dump(goldens, open(gpath, "w"), indent=1)


if __name__ == "__main__":
    main()


def synth_yuv_natural(path, w, h, frames, bitdepth=8, chroma="420", seed=11):
    """Content-like synthetic video for the BD-rate ladder: smooth sky
    gradient, strong structural edges (buildings), textured ground, a
    global pan plus an independently moving object, and mild sensor
    noise.  Statistically closer to camera content than synth_yuv's
    modular gradients (less synthetic periodicity; motion is sub-pel)."""
    rng = np.random.RandomState(seed)
    sx = 2 if chroma in ("420", "422") else 1
    sy = 2 if chroma == "420" else 1
    cw, ch = w // sx, h // sy
    maxv = (1 << bitdepth) - 1
    dtype = np.uint8 if bitdepth == 8 else np.uint16
    yy, xx = np.mgrid[0:h, 0:w]
    # static world, larger than the frame so panning reveals new area
    WW, WH = w * 2, h * 2
    wy, wx = np.mgrid[0:WH, 0:WW]
    world = 60 + 90 * (wy / WH)                         # sky->ground ramp
    # "buildings": rectangles with distinct flat luma + hard edges
    for _ in range(14):
        bx = rng.randint(0, WW - 24)
        by = rng.randint(WH // 4, WH - 24)
        bw = rng.randint(16, WW // 4)
        bh = rng.randint(16, WH // 3)
        world[by:by + bh, bx:bx + bw] = rng.randint(40, 215)
    # textured ground band
    tex = rng.randint(-18, 19, size=(WH, WW))
    mask = (wy > WH * 0.7)
    world = world + tex * mask
    # low-amplitude global texture (film-grain-ish, static in world space)
    world = world + rng.randint(-4, 5, size=(WH, WW))
    world = np.clip(world, 0, 255)
    cworld_u = np.clip(118 + (world - 128) * 0.15 +
                       rng.randint(-3, 4, (WH, WW)), 0, 255)
    cworld_v = np.clip(134 - (world - 128) * 0.10 +
                       rng.randint(-3, 4, (WH, WW)), 0, 255)
    obj_r = max(6, h // 10)
    with open(path, "wb") as f:
        for t in range(frames):
            # global pan: 2.75 px/frame horizontal, 0.5 px/frame vertical
            px = int(round(2.75 * t * 4)) / 4.0
            py = int(round(0.5 * t * 4)) / 4.0
            x0i, y0i = int(px), int(py)
            fx, fy = px - x0i, py - y0i
            # bilinear fetch = sub-pel global motion
            a = world[y0i:y0i + h + 1, x0i:x0i + w + 1].astype(np.float64)
            Y = ((1 - fy) * (1 - fx) * a[:h, :w] + (1 - fy) * fx * a[:h, 1:w + 1] +
                 fy * (1 - fx) * a[1:h + 1, :w] + fy * fx * a[1:h + 1, 1:w + 1])
            # moving object (opaque disc, its own velocity)
            ox = (w // 5 + 4.5 * t) % (w - 2 * obj_r) + obj_r
            oy = h // 3 + (h // 4) * np.sin(t * 0.35)
            d2 = (xx - ox) ** 2 + (yy - oy) ** 2
            Y = np.where(d2 < obj_r * obj_r, 200 - d2 / (obj_r * obj_r) * 120, Y)
            # per-frame sensor noise (uncompressible floor)
            Y = Y + rng.randint(-2, 3, (h, w))
            U = cworld_u[y0i:y0i + h:sy, x0i:x0i + w:sx][:ch, :cw]
            V = cworld_v[y0i:y0i + h:sy, x0i:x0i + w:sx][:ch, :cw]
            U = np.where(d2[::sy, ::sx][:ch, :cw] < obj_r * obj_r, 90, U)
            V = np.where(d2[::sy, ::sx][:ch, :cw] < obj_r * obj_r, 160, V)
            for plane in (Y, U, V):
                np.clip(plane * (maxv / 255.0), 0,
                        maxv).astype(dtype).tofile(f)
