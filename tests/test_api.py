"""libHMDec-protocol API test."""
import hashlib
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))


def test_push_nal_protocol():
    from libhm_tpu import api
    from libhm_tpu.hostdec import nal as N
    name = "lowdelayP_416x240"
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    dec = api.new_decoder()
    pics = []
    nals = list(N.split_annexb(data))
    i = 0
    while i < len(nals):
        eof = i == len(nals) - 1
        new_pic, check = dec.push_nal_unit(nals[i], eof)
        if check:
            while True:
                p = dec.get_picture()
                if p is None:
                    break
                pics.append(p)
        if not new_pic:
            i += 1
    buf = b"".join(pl.tobytes() for p in pics for pl in p.planes)
    assert hashlib.md5(buf).hexdigest() == GOLD[name]["decoded_yuv_md5"]
    info = dec.get_internal_info(pics[1], api.PU_MV_0)
    assert info and len(info[0]) == 6


def test_sei_hash_check():
    """libHMDec_set_SEI_Check equivalent: per-picture hash verification."""
    from libhm_tpu import api
    from libhm_tpu.hostdec import nal as N
    data = open(os.path.join(ROOT, "testdata", "intra_64x64.bin"), "rb").read()
    dec = api.new_decoder()
    dec.set_sei_check(True)
    pics = []
    nals = list(N.split_annexb(data))
    i = 0
    while i < len(nals):
        new_pic, check = dec.push_nal_unit(nals[i], i == len(nals) - 1)
        if check:
            while True:
                p = dec.get_picture()
                if p is None:
                    break
                pics.append(p)
        if not new_pic:
            i += 1
    assert pics and all(p.hash_status == "OK" for p in pics)


def test_sei_hash_check_detects_corruption():
    from libhm_tpu.hostdec.decoder import Decoder
    data = bytearray(open(os.path.join(ROOT, "testdata", "intra_64x64.bin"), "rb").read())
    data[-40] ^= 0x10
    dec = Decoder(check_sei_hash=True)
    try:
        dec.decode_annexb(bytes(data))
    except Exception:
        return  # corrupt streams may also fail parse; that's acceptable
    assert "MISMATCH" in [r.hash_status for r in dec.output_records]


def test_parse_recon_backend_args():
    """parse=/recon= must be honored (round-1 bug: parse was hardcoded)."""
    from libhm_tpu import api
    from libhm_tpu.hostdec import nal as N
    name = "lowdelayP_416x240"
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    for parse, recon in (("native", "numpy"), ("python", "native"),
                         ("native", "native")):
        dec = api.new_decoder(parse=parse, recon=recon)
        pics = []
        nals = list(N.split_annexb(data))
        i = 0
        while i < len(nals):
            new_pic, check = dec.push_nal_unit(nals[i], i == len(nals) - 1)
            if check:
                while True:
                    p = dec.get_picture()
                    if p is None:
                        break
                    pics.append(p)
            if not new_pic:
                i += 1
        buf = b"".join(pl.tobytes() for p in pics for pl in p.planes)
        assert hashlib.md5(buf).hexdigest() == GOLD[name]["decoded_yuv_md5"], \
            (parse, recon)
