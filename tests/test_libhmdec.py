"""Drive the libHMDec-compatible C ABI (libhmdec.so) through the reference
protocol: push NAL -> re-push on bNewPicture -> drain get_picture, then
check planes bit-exact vs golden.json and exercise the internals API
(reference surface: source/App/libHMDecoder/libHMDecoder.h:111-298).
"""
import ctypes as C
import hashlib
import json
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "libhm_tpu", "hostdec", "native")
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))


class BlockValue(C.Structure):
    _fields_ = [("x", C.c_ushort), ("y", C.c_ushort),
                ("w", C.c_ushort), ("h", C.c_ushort),
                ("value", C.c_int), ("value2", C.c_int)]


def _lib():
    so = os.path.join(NATIVE, "libhmdec.so")
    subprocess.check_call(["make", "-s", "-C", NATIVE, "libhmdec.so"])
    lib = C.CDLL(so)
    lib.libHMDec_get_version.restype = C.c_char_p
    lib.libHMDec_new_decoder.restype = C.c_void_p
    lib.libHMDec_free_decoder.argtypes = [C.c_void_p]
    lib.libHMDec_set_SEI_Check.argtypes = [C.c_void_p, C.c_bool]
    lib.libHMDec_set_max_temporal_layer.argtypes = [C.c_void_p, C.c_int]
    lib.libHMDec_push_nal_unit.argtypes = [
        C.c_void_p, C.c_char_p, C.c_int, C.c_bool,
        C.POINTER(C.c_bool), C.POINTER(C.c_bool)]
    lib.libHMDec_get_picture.restype = C.c_void_p
    lib.libHMDec_get_picture.argtypes = [C.c_void_p]
    lib.libHMDEC_get_POC.argtypes = [C.c_void_p]
    for fn in ("libHMDEC_get_picture_width", "libHMDEC_get_picture_height",
               "libHMDEC_get_picture_stride"):
        getattr(lib, fn).argtypes = [C.c_void_p, C.c_int]
    lib.libHMDEC_get_image_plane.restype = C.POINTER(C.c_short)
    lib.libHMDEC_get_image_plane.argtypes = [C.c_void_p, C.c_int]
    lib.libHMDEC_get_chroma_format.argtypes = [C.c_void_p]
    lib.libHMDEC_get_internal_info.restype = C.c_void_p
    lib.libHMDEC_get_internal_info.argtypes = [C.c_void_p, C.c_void_p, C.c_int]
    lib.libHMDEC_internal_info_size.argtypes = [C.c_void_p]
    lib.libHMDEC_internal_info_data.restype = C.POINTER(BlockValue)
    lib.libHMDEC_internal_info_data.argtypes = [C.c_void_p]
    lib.libHMDEC_get_hash_ok.argtypes = [C.c_void_p]
    return lib


def _drain(lib, h, pics):
    while True:
        pic = lib.libHMDec_get_picture(C.c_void_p(h))
        if not pic:
            break
        planes = []
        nc = 1 if lib.libHMDEC_get_chroma_format(C.c_void_p(pic)) == 0 else 3
        for comp in range(nc):
            w = lib.libHMDEC_get_picture_width(C.c_void_p(pic), comp)
            hh = lib.libHMDEC_get_picture_height(C.c_void_p(pic), comp)
            stride = lib.libHMDEC_get_picture_stride(C.c_void_p(pic), comp)
            ptr = lib.libHMDEC_get_image_plane(C.c_void_p(pic), comp)
            arr = np.ctypeslib.as_array(ptr, shape=(hh, stride))[:, :w]
            planes.append(arr.copy())
        pics.append((lib.libHMDEC_get_POC(C.c_void_p(pic)), planes, pic))


def _decode(name, max_tlayer=-1):
    from libhm_tpu.hostdec import nal as N
    lib = _lib()
    data = open(os.path.join(ROOT, "testdata",
                             GOLD[name]["bitstream"]), "rb").read()
    nals = list(N.split_annexb(data))
    h = lib.libHMDec_new_decoder()
    lib.libHMDec_set_SEI_Check(C.c_void_p(h), True)
    if max_tlayer >= 0:
        lib.libHMDec_set_max_temporal_layer(C.c_void_p(h), max_tlayer)
    pics = []
    new_pic = C.c_bool()
    check = C.c_bool()
    for i, ebsp in enumerate(nals):
        eof = i == len(nals) - 1
        lib.libHMDec_push_nal_unit(C.c_void_p(h), ebsp, len(ebsp), eof,
                                   C.byref(new_pic), C.byref(check))
        if check.value:
            _drain(lib, h, pics)
        if new_pic.value:
            # re-push the same NAL (reference protocol)
            lib.libHMDec_push_nal_unit(C.c_void_p(h), ebsp, len(ebsp), eof,
                                       C.byref(new_pic), C.byref(check))
            if check.value:
                _drain(lib, h, pics)
    _drain(lib, h, pics)
    hash_ok = lib.libHMDEC_get_hash_ok(C.c_void_p(h))
    return lib, h, pics, hash_ok


def _md5_of(pics, name):
    """Planes joined in output order at native bit depth, like golden.json."""
    bd = GOLD[name].get("bitdepth", 8)
    buf = b""
    for poc, planes, _ in pics:
        for p in planes:
            dt = np.uint8 if bd <= 8 else np.uint16
            buf += p.astype(dt).tobytes()
    return hashlib.md5(buf).hexdigest()


@pytest.mark.parametrize("name", ["intra_416x240", "lowdelayP_416x240",
                                  "randomaccess_416x240",
                                  "randomaccess_main10_416x240",
                                  "cra_randomaccess_416x240",
                                  "slices_416x240", "wpp_416x240",
                                  "tiles_832x480",
                                  "chromaqpadj_parmrg_160x96",
                                  "ccp444_lowdelay_160x96",
                                  "mixed_lossless_rdpcm_160x96",
                                  "tids4_ra_160x96"])
def test_push_protocol_bit_exact(name):
    lib, h, pics, hash_ok = _decode(name)
    pocs = [p[0] for p in pics]
    assert pocs == sorted(pocs), "output must be in increasing POC order"
    assert _md5_of(pics, name) == GOLD[name]["decoded_yuv_md5"]
    assert hash_ok == 1, "native MD5 SEI verification failed"
    lib.libHMDec_free_decoder(C.c_void_p(h))


def test_version_string():
    lib = _lib()
    assert lib.libHMDec_get_version() == b"16.0"


def test_internals_blocks():
    lib, h, pics, _ = _decode("randomaccess_416x240")
    # use the last picture (an inter B picture) for PU/CU info
    pic = pics[-1][2]
    W = lib.libHMDEC_get_picture_width(C.c_void_p(pic), 0)
    H = lib.libHMDEC_get_picture_height(C.c_void_p(pic), 0)

    def blocks(t):
        v = lib.libHMDEC_get_internal_info(C.c_void_p(h), C.c_void_p(pic), t)
        n = lib.libHMDEC_internal_info_size(C.c_void_p(v))
        d = lib.libHMDEC_internal_info_data(C.c_void_p(v))
        return [d[i] for i in range(n)]

    # CU prediction mode must tile the picture (every sample covered once)
    cov = np.zeros((H, W), np.int32)
    cu = blocks(1)  # LIBHMDEC_CU_PREDICTION_MODE
    assert cu, "no CU blocks returned"
    sizes = set()
    for b in cu:
        cov[b.y:b.y + b.h, b.x:b.x + b.w] += 1
        sizes.add(b.w)
    assert (cov == 1).all(), "CU blocks must tile the picture exactly"
    assert len(sizes) > 1, "expected multiple CU sizes (quadtree)"
    # PU motion vectors exist and lie within the picture
    mv = blocks(12)  # LIBHMDEC_PU_MV_0
    assert mv, "no PU MV blocks"
    assert all(b.w > 0 and b.h > 0 for b in mv)
    # slice index per CTU
    ctu = blocks(0)
    assert all(b.w == 64 for b in ctu)
    lib.libHMDec_free_decoder(C.c_void_p(h))


def test_max_temporal_layer():
    _, h, pics, _ = _decode("randomaccess_416x240", max_tlayer=0)
    full_lib, h2, full, _ = _decode("randomaccess_416x240")
    assert 0 < len(pics) < len(full)
