#!/usr/bin/env python3
"""Decision-divergence diagnostic: decode an HM stream and one of ours
(same source/cfg/QP) with the python parser and compare per-picture
pic_syntax decision maps (pred_mode/skip/depth/part_size/inter_dir/cbf).

Usage: python tools/diverge.py HM.bin OURS.bin
"""
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
from libhm_tpu.hostdec.decoder import Decoder


def all_pics(path):
    all_seen = []

    class Collector(Decoder):
        def __setattr__(self, k, v):
            if k == "dpb" and isinstance(v, list):
                v = Hooked(v)
            super().__setattr__(k, v)

    class Hooked(list):
        def append(self, p):
            all_seen.append(p)
            super().append(p)

    dec = Collector(parse="python", recon="numpy")
    dec.decode_annexb(open(path, "rb").read())
    return sorted(all_seen, key=lambda p: p.poc)


def main():
    hm = all_pics(sys.argv[1])
    ours = all_pics(sys.argv[2])
    for ph, po in zip(hm, ours):
        sh, so = ph.pic_syntax, po.pic_syntax
        inter_h = sh.pred_mode == 0   # MODE_INTER = 0
        inter_o = so.pred_mode == 0
        print(f"POC {ph.poc:2d}: intra44 hm={np.count_nonzero(~inter_h):4d} "
              f"ours={np.count_nonzero(~inter_o):4d} | "
              f"skip hm={np.count_nonzero(sh.skip):4d} "
              f"ours={np.count_nonzero(so.skip):4d} | "
              f"cbfY hm={np.count_nonzero(sh.cbf_y):4d} "
              f"ours={np.count_nonzero(so.cbf_y):4d}")
        dh = list(np.bincount(sh.depth.ravel(), minlength=4)[:4])
        do = list(np.bincount(so.depth.ravel(), minlength=4)[:4])
        # part_size histogram over inter area
        psh = list(np.bincount(sh.part_size[inter_h].ravel(), minlength=8))
        pso = list(np.bincount(so.part_size[inter_o].ravel(), minlength=8))
        idh = list(np.bincount(sh.inter_dir[inter_h].ravel(), minlength=4))
        ido = list(np.bincount(so.inter_dir[inter_o].ravel(), minlength=4))
        print(f"         depth hm={dh} ours={do}")
        print(f"         part  hm={psh} ours={pso}")
        print(f"         idir  hm={idh} ours={ido}")
        both = inter_h & inter_o
        if both.any():
            hh, ww = both.shape
            l0 = (sh.inter_dir[both] != 2) & (so.inter_dir[both] != 2)
            if l0.any():
                mvh = sh.mv[:hh, :ww, 0][both][l0].astype(np.int32)
                mvo = so.mv[:hh, :ww, 0][both][l0].astype(np.int32)
                d = np.abs(mvh - mvo)
                print(f"         mvL0 mean|d|={d.mean():.2f} max={d.max()}")


if __name__ == "__main__":
    main()
