"""Merge/AMVP/TMVP motion-vector derivation + motion compensation.

Rebuild of reference TComDataCU::getInterMergeCandidates / fillMvpCand
(source/Lib/TLibCommon/TComDataCU.cpp) and TComPrediction::motionCompensation
(TComPrediction.cpp:514-716).  Filled in by the inter-P milestone.
"""


class MotionDeriver:
    def __init__(self, slicedec, sh, ref_lists):
        self.sd = slicedec
        self.sh = sh
        self.ref_lists = ref_lists

    def apply_merge(self, sd, x, y, w, h, merge_idx, cx, cy, cu_size, pu_idx):
        raise NotImplementedError("inter decoding lands with the P milestone")

    def apply_amvp(self, sd, x, y, w, h, inter_dir, ref_idx, mvd, mvp_idx,
                   cx, cy, cu_size, pu_idx, part_size):
        raise NotImplementedError("inter decoding lands with the P milestone")


def motion_compensate_np(recon, ref_pics, residuals):
    raise NotImplementedError("inter decoding lands with the P milestone")
