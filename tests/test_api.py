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
