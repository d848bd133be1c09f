"""Child process for test_fuzz_robustness.test_fuzz_c_abi_subprocess:
pushes a corrupt-stream corpus through the libHMDec C ABI.  Must exit 0
— any native crash (signal) fails the parent assertion.  Errors must
surface as libHMDec_error return codes (the reference surfaces malformed
pushes the same way, source/App/libHMDecoder/libHMDecoder.cpp:112-141).
"""
import ctypes as C
import json
import os
import subprocess
import sys

import zlib

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
NATIVE = os.path.join(ROOT, "libhm_tpu", "hostdec", "native")
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))


def corpus(name):
    data = open(os.path.join(ROOT, "testdata",
                             GOLD[name]["bitstream"]), "rb").read()
    rng = np.random.RandomState(zlib.crc32(name.encode()) & 0xFFFF)
    cases = [data[:int(len(data) * f)]
             for f in (0.02, 0.1, 0.35, 0.7, 0.98)]
    for _ in range(24):
        pos = int(rng.randint(4, len(data)))
        b = bytearray(data)
        b[pos] ^= 1 << int(rng.randint(0, 8))
        cases.append(bytes(b))
    cases.append(b"\x00\x00\x00\x01" +
                 rng.randint(0, 256, 512).astype(np.uint8).tobytes())
    return cases


def main():
    from libhm_tpu.hostdec import nal as N
    subprocess.check_call(["make", "-s", "-C", NATIVE, "libhmdec.so"])
    lib = C.CDLL(os.path.join(NATIVE, "libhmdec.so"))
    lib.libHMDec_new_decoder.restype = C.c_void_p
    lib.libHMDec_free_decoder.argtypes = [C.c_void_p]
    lib.libHMDec_push_nal_unit.argtypes = [
        C.c_void_p, C.c_char_p, C.c_int, C.c_bool,
        C.POINTER(C.c_bool), C.POINTER(C.c_bool)]
    lib.libHMDec_get_picture.restype = C.c_void_p
    lib.libHMDec_get_picture.argtypes = [C.c_void_p]

    for name in ("tids4_ra_160x96", "randomaccess_416x240"):
        for blob in corpus(name):
            h = lib.libHMDec_new_decoder()
            new_pic = C.c_bool(False)
            check = C.c_bool(False)
            try:
                nals = list(N.split_annexb(blob))
            except Exception:
                nals = [blob] if blob else []
            for i, nal in enumerate(nals):
                eof = i == len(nals) - 1
                rc = lib.libHMDec_push_nal_unit(
                    C.c_void_p(h), nal, len(nal), eof,
                    C.byref(new_pic), C.byref(check))
                if rc == 0 and new_pic.value:
                    lib.libHMDec_push_nal_unit(
                        C.c_void_p(h), nal, len(nal), eof,
                        C.byref(new_pic), C.byref(check))
                if check.value:
                    while lib.libHMDec_get_picture(C.c_void_p(h)):
                        pass
                if rc != 0:
                    break    # graceful error code — acceptable
            lib.libHMDec_free_decoder(C.c_void_p(h))
    print("fuzz C ABI: clean")


if __name__ == "__main__":
    main()
