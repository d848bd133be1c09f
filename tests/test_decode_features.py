"""Bit-exactness for coding-tool feature streams.

Covers weighted prediction, cu_qp_delta (adaptive QP), default scaling
lists, lossless (transquant bypass + implicit RDPCM + TS rotation), PCM,
dependent slice segments, and RExt 4:2:2 intra.
"""
import hashlib
import json
import os
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

STREAMS = ["wp_lowdelayP_416x240", "dqp_intra_416x240",
           "scaling_intra_416x240", "lossless_intra_416x240",
           "pcm_intra_416x240", "depslices_416x240",
           "rext422_intra_416x240", "rext422_lowdelayP_416x240",
           "rext444_randomaccess_416x240", "mono_intra_416x240",
           "main12_intra_416x240", "cra_randomaccess_416x240",
           "cra_start_416x240",
           # HM-encoder adversarial set: real cross-component prediction
           # use, 4:2:2 with RDOQ/strong-smoothing off + SAOLcuBoundary,
           # chroma QP offsets + slice deblock offsets + 3 merge cands
           "ccp444_lowdelay_160x96", "rext422_noRdoq_160x96",
           "chromaqp_ra_160x96",
           # second adversarial round: high-throughput RExt 4:4:4 intra,
           # RD-chosen transquant bypass + implicit/explicit RDPCM,
           # cu_chroma_qp_offset + parallel merge level 5 (found a real
           # desync: the adjustment parses at the first 4x4 sub-TU, gated
           # by the PROPAGATED chroma cbf), 4:0:0 inter
           "ht_rext444_intra_160x96", "mixed_lossless_rdpcm_160x96",
           "chromaqpadj_parmrg_160x96", "mono_lowdelay_160x96",
           # third round: file-specified (custom) scaling lists,
           # constrained intra prediction on an RA GOP, tiles with
           # loop_filter_across_tiles off, PCM at reduced sample depth
           "customsl_lowdelay_160x96", "cip_ra_160x96",
           "tiles_nolfcross_512x128", "pcm_reduceddepth_160x96",
           # four temporal sub-layers (misc/encoder_randomaccess_main_4tids)
           "tids4_ra_160x96",
           # fourth round: transform skip up to 32x32
           # (TransformSkipLog2MaxSize=5), HM-side WPP + dependent slice
           # segments at 10 bit, 4:2:2 WPP random access
           "bigts_lowdelay_160x96", "wppdep_lowdelay_160x96",
           "wpp422_ra_160x96"]


def decode_and_hash(name, parse, recon):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]), "rb").read()
    outs = Decoder(parse=parse, recon=recon).decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    return hashlib.md5(buf).hexdigest()


@pytest.mark.parametrize("name", STREAMS)
def test_feature_bit_exact_python(name):
    assert decode_and_hash(name, "python", "numpy") == GOLD[name]["decoded_yuv_md5"]


@pytest.mark.parametrize("name", STREAMS)
def test_feature_bit_exact_native(name):
    assert decode_and_hash(name, "native", "native") == GOLD[name]["decoded_yuv_md5"]


def test_hm_field_coding_stream():
    """HM-encoder field-coded RA stream (misc/encoder_randomaccess_
    field_coding.cfg): every field picture verifies its HM-embedded hash
    SEI on both parse planes, and fields.weave_fields pairs them into
    row-interleaved frames (the reference app's TAppDecTop field output;
    HM's own app only weaves the pairs it recognises mid-stream)."""
    from libhm_tpu.hostdec.decoder import Decoder
    from libhm_tpu.hostdec.fields import is_field_stream, weave_fields
    data = open(os.path.join(ROOT, "testdata", "field_ra_160x96.bin"),
                "rb").read()
    for parse, recon in (("python", "numpy"), ("native", "native")):
        d = Decoder(parse=parse, recon=recon, check_sei_hash=True)
        outs = d.decode_annexb(data)
        assert len(outs) == 8
        assert all(r.hash_status == "OK" for r in d.output_records)
        assert is_field_stream(d.output_records)
        frames = weave_fields(d.output_records)
        assert len(frames) == 4
        assert frames[0][0].shape == (96, 160)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    assert hashlib.md5(buf).hexdigest() == \
        GOLD["field_ra_160x96"]["decoded_yuv_md5"]
