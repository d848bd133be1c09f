"""Native encoder-search kernels (encsearch.cpp) vs the pure-Python
reference path: SATD, luma qpel interpolation, and the full TZ+frac
motion search must agree exactly."""
import ctypes as ct

import numpy as np
import pytest

from libhm_tpu.hostdec.native_bridge import try_load


@pytest.fixture(scope="module")
def lib():
    lib = try_load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_satd_matches_python(lib):
    rng = np.random.default_rng(7)
    # force the Python path by comparing against the hadamard math inline
    from libhm_tpu.encoder import rd_cost

    def py_satd(a, b):
        diff = a.astype(np.int64) - b.astype(np.int64)
        h, w = diff.shape
        if h % 8 == 0 and w % 8 == 0:
            t, H, rsh, add = 8, rd_cost._H8, 2, 2
        elif h % 4 == 0 and w % 4 == 0:
            t, H, rsh, add = 4, rd_cost._H4, 1, 1
        else:
            return int(np.abs(diff).sum())
        v = diff.reshape(h // t, t, w // t, t).transpose(0, 2, 1, 3) \
                .reshape(-1, t, t)
        had = np.matmul(np.matmul(H, v), H)
        s = np.abs(had).sum(axis=(1, 2))
        return int(((s + add) >> rsh).sum())

    for (h, w) in [(8, 8), (16, 16), (8, 16), (4, 4), (4, 8), (12, 16),
                   (64, 64), (6, 6)]:
        a = rng.integers(0, 1024, (h, w)).astype(np.int32)
        b = rng.integers(-1023, 2047, (h, w)).astype(np.int32)
        a16 = np.ascontiguousarray(a, np.int16)
        b16 = np.ascontiguousarray(b, np.int16)
        got = int(lib.enc_satd(a16.ctypes.data_as(ct.c_void_p),
                               b16.ctypes.data_as(ct.c_void_p), w, h))
        assert got == py_satd(a, b), (h, w)


def test_interp_luma_matches_oracle(lib):
    from libhm_tpu.hostdec.motion import _interp, LUMA_FILTER
    rng = np.random.default_rng(3)
    for bd in (8, 10):
        plane = rng.integers(0, 1 << bd, (48, 64)).astype(np.int32)
        p16 = np.ascontiguousarray(plane, np.int16)
        for case in range(40):
            x = int(rng.integers(-2, 60))
            y = int(rng.integers(-2, 44))
            w = int(rng.choice([4, 8, 16]))
            h = int(rng.choice([4, 8, 16]))
            mvx = int(rng.integers(-30, 30))
            mvy = int(rng.integers(-30, 30))
            for is_last in (True, False):
                want = _interp(plane, x, y, w, h, mvx, mvy, 2, 2, 8,
                               LUMA_FILTER, bd, is_last=is_last)
                dst = np.empty((h, w), np.int16)
                lib.enc_interp_luma(
                    p16.ctypes.data_as(ct.c_void_p), 64, 48, 64,
                    x, y, w, h, mvx, mvy, bd, 1 if is_last else 0,
                    dst.ctypes.data_as(ct.c_void_p))
                assert (dst.astype(np.int64) == want.astype(np.int64)).all(), \
                    (bd, case, is_last)


def test_me_search_matches_python(lib):
    """Full-path check during a real lowdelayB encode: every native
    _motion_search_rect result (mv AND SATD distortion) equals the
    Python fallback computed against the identical encoder state."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    import tests.test_encoder as te
    frames = te.synth_frames(96, 80, 3)
    enc = IntraEncoder(EncoderConfig(96, 80, qp=30, gop="lowdelayB"))
    orig_fn = IntraEncoder._motion_search_rect
    state = {"n": 0, "checked": 0}

    def wrapper(self, px, py, w, h, pred_mv, l=0, r=0, target=None):
        res = orig_fn(self, px, py, w, h, pred_mv, l, r, target)
        state["n"] += 1
        # compare a deterministic sample (Python path is slow)
        if state["n"] % 37 == 1 and state["checked"] < 25:
            state["checked"] += 1
            IntraEncoder._ENC_NATIVE = (None,)
            try:
                res_py = orig_fn(self, px, py, w, h, pred_mv, l, r, target)
            finally:
                IntraEncoder._ENC_NATIVE = (lib,)
            assert res == res_py, (px, py, w, h, pred_mv, l, r)
        return res

    import os
    IntraEncoder._ENC_NATIVE = (lib,)
    IntraEncoder._motion_search_rect = wrapper
    # force the Python decision path: the native CTU compressor would
    # otherwise run the whole search in C++ without ever reaching
    # _motion_search_rect (the surface under test here)
    os.environ["HEVC_ENC_NATIVE"] = "0"
    try:
        enc.encode_stream(frames)
    finally:
        os.environ.pop("HEVC_ENC_NATIVE", None)
        IntraEncoder._motion_search_rect = orig_fn
        IntraEncoder._ENC_NATIVE = ("unset",)
    assert state["checked"] >= 10


def test_rdoq_matches_python(lib):
    """Native RDOQ (rdoq.cpp) is bit-identical to the Python reference
    mirror across TU sizes, scans, components, QPs and bit depths."""
    from libhm_tpu.hostdec.tables import make_context_bank
    from libhm_tpu.encoder.rdoq import rdoq, _rdoq_py
    rng = np.random.default_rng(11)
    for trial in range(120):
        log2n = int(rng.integers(2, 6))
        n = 1 << log2n
        comp = int(rng.integers(0, 3))
        scan = int(rng.integers(0, 3)) if n <= 8 else 0
        qp = int(rng.integers(0, 52))
        bd = 8 if trial % 3 else 10
        bank = make_context_bank(int(rng.integers(0, 3)), max(qp, 1))
        for k in ("sig", "sig_cg", "gt1", "gt2", "last_x", "last_y"):
            arr = bank[k]
            arr[:] = np.clip(arr + rng.integers(-20, 20, arr.shape), 0, 127)
        mag = int(rng.choice([3, 30, 300, 3000]))
        coef = rng.integers(-mag, mag + 1, (n, n)).astype(np.int32)
        lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
        a = rdoq(coef, qp, log2n, bd, comp, scan, bank, lam)
        b = _rdoq_py(coef, qp, log2n, bd, comp, scan, bank, lam)
        assert (a == b).all(), (trial, n, comp, scan, qp, bd)


def test_residual_bits_matches_python(lib):
    """Native bits-only residual pricer (enc_residual_bits) is
    bit-identical to recording encode_residual ops and pricing them at
    the per-op pre-adaptation states the recorder carries (trial-coder
    semantics), across sizes/scans/components/SBH/TS.  The native pricer
    runs FIRST: recording adapts the shared bank in place."""
    from libhm_tpu.hostdec.tables import make_context_bank
    from libhm_tpu.encoder.rdoq import residual_bits, _EST_MPS, _EST_LPS, \
        FRAC
    from libhm_tpu.encoder.residual_enc import encode_residual
    from libhm_tpu.encoder.encoder import _RecordingCabac

    def price(ops, start):
        tot = start
        for op in ops:
            k = op[0]
            if k == "b":
                state = op[4]
                tot += _EST_MPS[state >> 1] if op[3] == (state & 1) \
                    else _EST_LPS[state >> 1]
            elif k == "p":
                tot += FRAC
            elif k == "pn":
                tot += op[2] * FRAC
            else:
                raise AssertionError(op)
        return tot

    rng = np.random.default_rng(23)
    for trial in range(200):
        log2n = int(rng.integers(2, 6))
        n = 1 << log2n
        comp = int(rng.integers(0, 3))
        scan = int(rng.integers(0, 3)) if n <= 8 else 0
        sh = bool(rng.integers(0, 2))
        ts = (int(rng.integers(0, 2)) if n == 4 and rng.integers(0, 2)
              else None)
        bank = make_context_bank(int(rng.integers(0, 3)),
                                 int(rng.integers(1, 51)))
        for k in ("sig", "sig_cg", "gt1", "gt2", "last_x", "last_y",
                  "transform_skip"):
            arr = bank[k]
            arr[:] = np.clip(arr + rng.integers(-20, 20, arr.shape), 0, 127)
        mag = int(rng.choice([1, 2, 9, 300, 30000]))
        lev = rng.integers(-mag, mag + 1, (n, n)).astype(np.int32)
        # sparsify most trials so high scan sets go empty
        if rng.integers(0, 3):
            lev *= (rng.random((n, n)) < 0.15)
        if not lev.any():
            lev[rng.integers(0, n), rng.integers(0, n)] = 1
        start = float(rng.integers(0, 1 << 20)) * 0.33
        nat = residual_bits(bank, lev, comp, scan, sh, ts, start=start)
        enc = _RecordingCabac()
        encode_residual(enc, bank, lev, comp, scan, sh, ts=ts)
        py = price(enc.ops, start)
        assert nat == py, (trial, n, comp, scan, sh, ts, nat, py)


def test_tu_fwd_matches_python(lib):
    """Native whole-TU forward kernel (enc_tu_fwd) is bit-identical to
    the Python body it mirrors (forward_transform -> RDOQ -> sign-data
    hiding), across sizes/scans/components/QPs."""
    from libhm_tpu.hostdec.tables import make_context_bank
    from libhm_tpu.encoder.rdoq import rdoq, _addr
    from libhm_tpu.encoder.transforms import forward_transform
    from libhm_tpu.encoder.residual_enc import apply_sign_hiding

    rng = np.random.default_rng(31)
    for trial in range(120):
        log2n = int(rng.integers(2, 6))
        n = 1 << log2n
        comp = int(rng.integers(0, 3))
        scan = int(rng.integers(0, 3)) if n <= 8 else 0
        qp = int(rng.integers(10, 48))
        sdh = int(rng.integers(0, 2))
        mag = int(rng.choice([40, 200, 900]))
        resi = rng.integers(-mag, mag, (n, n)).astype(np.int32)
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        coef = forward_transform(resi, False, 8)
        bank = make_context_bank(int(rng.integers(0, 3)), max(qp, 1))
        lev_py = rdoq(coef, qp, log2n, 8, comp, scan, bank, lam)
        if sdh:
            lev_py = apply_sign_hiding(lev_py.copy(), coef, qp, log2n, 8,
                                       scan)
        lev = np.empty((n, n), np.int32)
        rec = np.empty((n, n), np.int32)
        r32 = np.ascontiguousarray(resi, np.int32)
        lib.enc_tu_fwd(r32.ctypes.data, n, 0, 1 if comp else 0, qp, 8, 1,
                       scan, 1, float(lam), sdh, 0, float(lam),
                       _addr(bank["sig"]), _addr(bank["sig_cg"]),
                       _addr(bank["gt1"]), _addr(bank["gt2"]),
                       _addr(bank["last_x"]), _addr(bank["last_y"]),
                       lev.ctypes.data, rec.ctypes.data, 0)
        assert (lev == lev_py).all(), (trial, n, comp, scan, qp, sdh)
