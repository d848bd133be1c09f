"""Native CTU compressor (hostdec/native/encctu.cpp) byte-identity.

The native compress pass must reproduce the Python reference path's
bitstream EXACTLY — every RD decision, CABAC op and recon sample.  Any
divergence is a bug in the port, so these tests byte-compare whole
streams with the native path forced on and off.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from libhm_tpu.hostdec.native_bridge import try_load  # noqa: E402


def _have_native():
    lib = try_load()
    return lib is not None and hasattr(lib, "enc_ctu_create")


def _encode(tmp_path, native, gop="intra", w=64, h=48, n=2, qp=32,
            **cfg_kw):
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.default_rng(7)
    base = (np.linspace(0, 200, w, dtype=np.int32)[None, :] +
            np.linspace(0, 40, h, dtype=np.int32)[:, None])
    frames = []
    for t in range(n):
        y = np.clip(base + rng.integers(-8, 9, (h, w)) + 5 * t,
                    0, 255).astype(np.uint8)
        u = np.clip(128 + (base[: h // 2: , : w // 2][: h // 2, : w // 2]
                    if False else base[:: 2, :: 2] // 4), 0,
                    255).astype(np.uint8)
        v = np.full((h // 2, w // 2), 90, np.uint8)
        frames.append((y, u, v))
    os.environ["HEVC_ENC_NATIVE"] = "1" if native else "0"
    try:
        cfg = EncoderConfig(w, h, qp=qp, gop=gop, **cfg_kw)
        cfg.transform_skip = True
        enc = IntraEncoder(cfg)
        return enc.encode_stream(frames)
    finally:
        os.environ.pop("HEVC_ENC_NATIVE", None)


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
@pytest.mark.parametrize("qp", [27, 37])
def test_intra_byte_identical(tmp_path, qp):
    a = _encode(tmp_path, native=False, qp=qp)
    b = _encode(tmp_path, native=True, qp=qp)
    assert a == b


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_intra_decodes_bit_exact(tmp_path):
    from libhm_tpu.hostdec.decoder import Decoder
    stream = _encode(tmp_path, native=True)
    outs = Decoder(parse="native", recon="native").decode_annexb(stream)
    assert len(outs) == 2  # hash SEI verified inside when present


def _encode_inter(native, gop, qp=32, n=5, w=64, h=48, **cfg_kw):
    """Moving synthetic content so merge/skip/ME/bi all fire."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.default_rng(7)
    base = (np.linspace(0, 200, w, dtype=np.int32)[None, :] +
            np.linspace(0, 40, h, dtype=np.int32)[:, None])
    frames = []
    for t in range(n):
        y = np.clip(np.roll(base, 2 * t, axis=1) +
                    rng.integers(-8, 9, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(128 + base[::2, ::2] // 4, 0, 255).astype(np.uint8)
        v = np.full((h // 2, w // 2), 90, np.uint8)
        frames.append((y, u, v))
    os.environ["HEVC_ENC_NATIVE"] = "1" if native else "0"
    try:
        cfg = EncoderConfig(w, h, qp=qp, gop=gop, **cfg_kw)
        enc = IntraEncoder(cfg)
        return enc.encode_stream(frames)
    finally:
        os.environ.pop("HEVC_ENC_NATIVE", None)


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
@pytest.mark.parametrize("gop", ["lowdelayP", "lowdelayB", "randomaccess"])
def test_inter_byte_identical(gop):
    a = _encode_inter(native=False, gop=gop)
    b = _encode_inter(native=True, gop=gop)
    assert a == b


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_inter_amp_byte_identical():
    a = _encode_inter(native=False, gop="lowdelayP", qp=27, amp=True)
    b = _encode_inter(native=True, gop="lowdelayP", qp=27, amp=True)
    assert a == b


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_inter_decodes_bit_exact():
    from libhm_tpu.hostdec.decoder import Decoder
    stream = _encode_inter(native=True, gop="randomaccess")
    outs = Decoder(parse="native", recon="native").decode_annexb(stream)
    assert len(outs) == 5


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_adaptive_qp_byte_identical(tmp_path):
    """dqp path: TM5 adaptive QP codes cu_qp_delta per quantization group
    through the native compressor byte-identically."""
    a = _encode(tmp_path, native=False, adaptive_qp=True, rdo_cu=True,
                rdoq=True, sign_hiding=True, w=96, h=64, n=3)
    b = _encode(tmp_path, native=True, adaptive_qp=True, rdo_cu=True,
                rdoq=True, sign_hiding=True, w=96, h=64, n=3)
    assert a == b


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_adaptive_qp_inter_byte_identical():
    a = _encode_inter(native=False, gop="lowdelayB", adaptive_qp=True)
    b = _encode_inter(native=True, gop="lowdelayB", adaptive_qp=True)
    assert a == b


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_lcu_rate_control_byte_identical():
    """Per-LCU R-lambda rate control (lcu_start/lcu_end feedback from the
    native est-bits) must match the Python path exactly."""
    a = _encode_inter(native=False, gop="lowdelayP", rate_kbps=150, fps=30,
                      rdo_cu=True, rdoq=True, sign_hiding=True)
    b = _encode_inter(native=True, gop="lowdelayP", rate_kbps=150, fps=30,
                      rdo_cu=True, rdoq=True, sign_hiding=True)
    assert a == b


def _encode_wp(native, gop, wb=False, n=7, w=64, h=48):
    """Brightness-ramped content so WP analysis fires on every ref."""
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.default_rng(7)
    base = (np.linspace(0, 180, w, dtype=np.int32)[None, :] +
            np.linspace(0, 40, h, dtype=np.int32)[:, None])
    frames = []
    for t in range(n):
        y = np.clip(np.roll(base, t, axis=1) +
                    rng.integers(-6, 7, (h, w)) + 9 * t, 0,
                    255).astype(np.uint8)
        u = np.clip(110 + base[::2, ::2] // 5 + 3 * t, 0,
                    255).astype(np.uint8)
        v = np.full((h // 2, w // 2), 90, np.uint8)
        frames.append((y, u, v))
    os.environ["HEVC_ENC_NATIVE"] = "1" if native else "0"
    try:
        cfg = EncoderConfig(w, h, qp=32, gop=gop, weighted_pred=True,
                            rdo_cu=True, rdoq=True, sign_hiding=True)
        if wb:
            cfg.weighted_bipred = True
        enc = IntraEncoder(cfg)
        stream = enc.encode_stream(frames)
        assert any(x is not None for x in (enc.cur_wp or [])), \
            "WP analysis did not fire; test content needs a bigger ramp"
        return stream
    finally:
        os.environ.pop("HEVC_ENC_NATIVE", None)


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_wp_p_byte_identical():
    """Weighted prediction (P): native ME on the pre-weighted planes +
    weighted uni epilogue must reproduce the Python path exactly."""
    assert _encode_wp(False, "lowdelayP") == _encode_wp(True, "lowdelayP")


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_wp_bi_byte_identical():
    """Explicit bi WP (B slices incl. the identity-substitution rule for
    flag-0 references)."""
    assert _encode_wp(False, "lowdelayB", wb=True) == \
        _encode_wp(True, "lowdelayB", wb=True)


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_scaling_list_byte_identical(tmp_path):
    """Default scaling lists: the native pass folds the list into the
    forward quantiser and dequants with the spec matrices, byte-identical
    to the Python path (enc_tu_fwd deq_mat; encctu enc_ctu_set_scaling)."""
    a = _encode_sl(False, "intra")
    b = _encode_sl(True, "intra")
    assert a == b


@pytest.mark.skipif(not _have_native(), reason="native toolchain absent")
def test_scaling_list_inter_byte_identical():
    a = _encode_sl(False, "randomaccess")
    b = _encode_sl(True, "randomaccess")
    assert a == b


def _encode_sl(native, gop, n=3, w=96, h=64):
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    rng = np.random.default_rng(9)
    base = (np.linspace(0, 200, w, dtype=np.int32)[None, :] +
            np.linspace(0, 40, h, dtype=np.int32)[:, None])
    frames = []
    for t in range(n):
        y = np.clip(np.roll(base, t, axis=1) + rng.integers(-8, 9, (h, w)),
                    0, 255).astype(np.uint8)
        u = np.clip(120 + base[::2, ::2] // 4, 0, 255).astype(np.uint8)
        v = np.full((h // 2, w // 2), 90, np.uint8)
        frames.append((y, u, v))
    os.environ["HEVC_ENC_NATIVE"] = "1" if native else "0"
    try:
        cfg = EncoderConfig(w, h, qp=32, gop=gop, rdo_cu=True, rdoq=True,
                            sign_hiding=True)
        cfg.scaling_list = True
        return IntraEncoder(cfg).encode_stream(frames)
    finally:
        os.environ.pop("HEVC_ENC_NATIVE", None)
