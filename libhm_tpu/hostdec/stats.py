"""Per-syntax-element CABAC statistics (reference TComCodingStatistics).

The reference gathers these only in the Analyser build
(RExt__DECODER_DEBUG_BIT_STATISTICS); here it is a wrapper that decodes a
stream with instrumented entropy calls and reports context-coded bin and
bypass-bin counts per syntax element, plus an estimated bit share.

    from libhm_tpu.hostdec.stats import collect
    table = collect(open("stream.bin", "rb").read())

CLI: python -m libhm_tpu.hostdec.stats <stream.bin>
"""
import sys
from collections import defaultdict


def collect(data: bytes, per_component=False):
    """Decode `data` (Annex-B) counting bins per syntax-element class.

    Returns {name: {"bins": n, "bypass": n}} plus "__total__".  With
    per_component, residual-coding elements split into ":c0" (luma) /
    ":c1" (chroma) rows — the attribution that localized the encoder's
    chroma allocation gap vs HM.
    """
    from . import cabac as cabac_mod
    from . import residual as res_mod
    from . import slicedec as sd_mod
    from .decoder import Decoder

    counts = defaultdict(lambda: {"bins": 0, "bypass": 0})
    cur_sd = [None]
    cur_name = [None]
    cur_comp = [None]

    orig_rc = res_mod.residual_coding
    orig_ds = sd_mod.SliceDecoder.decode_slice
    orig_bin = cabac_mod.CabacDecoder.decode_bin
    orig_byp = cabac_mod.CabacDecoder.decode_bypass
    orig_bypn = cabac_mod.CabacDecoder.decode_bypass_bins
    orig_eg = cabac_mod.CabacDecoder.decode_eg_k
    orig_trm = cabac_mod.CabacDecoder.decode_terminate

    def ds(self, *a, **k):
        cur_sd[0] = self
        return orig_ds(self, *a, **k)

    def rc(d, bank, w, h, comp, *a, **k):
        cur_comp[0] = comp
        try:
            return orig_rc(d, bank, w, h, comp, *a, **k)
        finally:
            cur_comp[0] = None

    _RES = ("sig", "sig_cg", "gt1", "gt2", "last_x", "last_y",
            "transform_skip", "rdpcm", "cu_transquant_bypass")

    def name_of(ctx):
        sd = cur_sd[0]
        if sd is not None:
            for k, v in sd.bank.items():
                if v is ctx:
                    if per_component and cur_comp[0] is not None \
                            and k in _RES:
                        return f"{k}:c{min(cur_comp[0], 1)}"
                    return k
        return "?"

    def d_bin(self, ctx, idx):
        nm = name_of(ctx)
        cur_name[0] = nm
        counts[nm]["bins"] += 1
        return orig_bin(self, ctx, idx)

    def d_byp(self):
        counts[cur_name[0] or "?"]["bypass"] += 1
        return orig_byp(self)

    def d_bypn(self, n):
        counts[cur_name[0] or "?"]["bypass"] += n
        return orig_bypn(self, n)

    def d_eg(self, k):
        # count inside via the patched bypass
        return orig_eg(self, k)

    def d_trm(self):
        counts["terminate"]["bins"] += 1
        return orig_trm(self)

    sd_mod.SliceDecoder.decode_slice = ds
    res_mod.residual_coding = rc
    sd_mod.residual_coding = rc
    cabac_mod.CabacDecoder.decode_bin = d_bin
    cabac_mod.CabacDecoder.decode_bypass = d_byp
    cabac_mod.CabacDecoder.decode_bypass_bins = d_bypn
    cabac_mod.CabacDecoder.decode_eg_k = d_eg
    cabac_mod.CabacDecoder.decode_terminate = d_trm
    try:
        Decoder().decode_annexb(data)
    finally:
        sd_mod.SliceDecoder.decode_slice = orig_ds
        res_mod.residual_coding = orig_rc
        sd_mod.residual_coding = orig_rc
        cabac_mod.CabacDecoder.decode_bin = orig_bin
        cabac_mod.CabacDecoder.decode_bypass = orig_byp
        cabac_mod.CabacDecoder.decode_bypass_bins = orig_bypn
        cabac_mod.CabacDecoder.decode_eg_k = orig_eg
        cabac_mod.CabacDecoder.decode_terminate = orig_trm

    total = {"bins": sum(v["bins"] for v in counts.values()),
             "bypass": sum(v["bypass"] for v in counts.values())}
    out = dict(counts)
    out["__total__"] = total
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    table = collect(open(argv[0], "rb").read(), per_component=True)
    total = table.pop("__total__")
    tot_all = max(1, total["bins"] + total["bypass"])
    print(f"{'syntax element':24s} {'ctx bins':>10s} {'bypass':>10s} {'share':>7s}")
    for name, v in sorted(table.items(),
                          key=lambda kv: -(kv[1]['bins'] + kv[1]['bypass'])):
        share = 100.0 * (v["bins"] + v["bypass"]) / tot_all
        print(f"{name:24s} {v['bins']:10d} {v['bypass']:10d} {share:6.2f}%")
    print(f"{'TOTAL':24s} {total['bins']:10d} {total['bypass']:10d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
