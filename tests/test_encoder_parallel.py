"""Encoder parallel tools: WPP substreams, tiles, multi-slice, and
combinations — round-tripped through our decoder's hash check and (when
the reference build exists) the real HM TAppDecoder.
(reference: TEncSlice.cpp:738-844 WPP context propagation, :1265-1380
slice/tile boundaries, TEncGOP xAttachSliceDataToNalUnit entry points)
"""
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HM_DEC = os.path.join(ROOT, ".refbuild", "TAppDecoder")


def _frames(w, h, n=2):
    ys, xs = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        out.append((((xs * 3 + ys * 2 + t * 5) % 256).astype(np.uint8),
                    ((xs[::2, ::2] + t) % 256).astype(np.uint8),
                    ((ys[::2, ::2]) % 256).astype(np.uint8)))
    return out


def _encode(w, h, gop="intra", **mods):
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    cfg = EncoderConfig(w, h, qp=30, gop=gop)
    for k, v in mods.items():
        setattr(cfg, k, v)
    return IntraEncoder(cfg).encode_stream(_frames(w, h))


def _own_ok(stream):
    from libhm_tpu.hostdec.decoder import Decoder
    d = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    d.decode_annexb(stream)
    assert d.output_records, "no pictures decoded"
    assert all(r.hash_status == "OK" for r in d.output_records)


def _hm_ok(stream, tmp_path, nframes=2):
    if not os.path.exists(HM_DEC):
        pytest.skip("reference decoder not built")
    p = tmp_path / "s.bin"
    p.write_bytes(stream)
    r = subprocess.run([HM_DEC, "-b", str(p), "-o", "/dev/null"],
                       capture_output=True, text=True)
    assert r.stdout.count("(OK)") == nframes, r.stdout[-500:]


# tile minimum size is 256x64 luma (A.1 general tier limits; the reference
# asserts it, TComPicSym::initTiles)
CASES = [
    ("wpp", 192, 128, dict(wpp=True)),
    ("tiles", 512, 128, dict(tile_cols=2, tile_rows=2)),
    ("slices", 192, 128, dict(slice_ctus=2)),
    ("slices_wpp", 192, 128, dict(slice_ctus=3, wpp=True)),
    ("tiles_wpp", 512, 128, dict(tile_cols=2, wpp=True)),
    ("tiles_slices", 512, 128, dict(tile_cols=2, slice_ctus=9)),
]


@pytest.mark.parametrize("name,w,h,mods", CASES,
                         ids=[c[0] for c in CASES])
def test_parallel_tool_roundtrip(name, w, h, mods, tmp_path):
    stream = _encode(w, h, **mods)
    _own_ok(stream)
    _hm_ok(stream, tmp_path)


def test_wpp_interslice_roundtrip(tmp_path):
    """WPP on a low-delay P sequence (context sync across inter CTUs)."""
    stream = _encode(192, 128, gop="lowdelayP", wpp=True)
    _own_ok(stream)
    _hm_ok(stream, tmp_path)


def test_dependent_slices_roundtrip(tmp_path):
    """Chained dependent slice segments: CABAC context + QP predictor
    continuation across segments, short dependent headers (Rec. 7.3.6.1;
    reference TDecSlice CTXMem)."""
    stream = _encode(192, 128, slice_ctus=2, dependent_slices=True)
    _own_ok(stream)
    _hm_ok(stream, tmp_path)


def test_dependent_chain_slice_ids():
    """A chain of >2 dependent segments keeps one slice id (decoder
    regression: slice_count-1 only handled a single dependent segment)."""
    from libhm_tpu.hostdec.decoder import Decoder
    stream = _encode(192, 128, slice_ctus=1, dependent_slices=True)
    d = Decoder(parse="python", recon="numpy", check_sei_hash=True)
    d.decode_annexb(stream)
    assert all(r.hash_status == "OK" for r in d.output_records)
    import numpy as np
    sidx = np.asarray(d.output_records[0].pic_syntax.slice_idx)
    assert sidx.max() == 0, "all dependent segments must share slice id 0"


@pytest.mark.parametrize("slice_ctus", [3, 4, 5],
                         ids=["midrow", "rowstart", "mixed"])
def test_wpp_dependent_slices_roundtrip(slice_ctus, tmp_path):
    """WPP + dependent slice segments: the row snapshot spans segment
    boundaries and a segment starting exactly at a row start takes the
    WPP sync instead of the continued contexts (reference
    TDecSlice::decompressSlice CTXMem rules).  With 4 CTUs per row,
    slice_ctus=4 puts every boundary at a row start; 3 and 5 land
    mid-row with cross-segment snapshots."""
    stream = _encode(128, 96, cu_size=32, wpp=True, dependent_slices=True,
                     slice_ctus=slice_ctus)
    _own_ok(stream)
    _hm_ok(stream, tmp_path)
