"""First-party ENC_DEC_TRACE equivalent: encoder and decoder symbol traces
diff clean on a good stream, and a corrupted stream localizes the first
bad symbol (reference methodology: TComRom.h:178-200 TraceEnc/TraceDec).
"""
import numpy as np

from libhm_tpu.utils import trace as T


def _frames(n=1, w=64, h=64):
    ys, xs = np.mgrid[0:h, 0:w]
    return [(((xs + ys * 2 + 7 * t) % 256).astype(np.uint8),
             ((xs[::2, ::2]) % 256).astype(np.uint8),
             ((ys[::2, ::2]) % 256).astype(np.uint8)) for t in range(n)]


def _encode_traced(path, frames):
    from libhm_tpu.encoder.cabac_enc import CabacEncoder
    from libhm_tpu.encoder.encoder import IntraEncoder, EncoderConfig
    detach = T.attach_encoder_tracer(CabacEncoder, path)
    try:
        stream = IntraEncoder(EncoderConfig(64, 64, qp=32)).encode_stream(
            frames)
    finally:
        detach()
    return stream


def _decode_traced(path, stream):
    from libhm_tpu.hostdec.cabac import CabacDecoder
    from libhm_tpu.hostdec.decoder import Decoder
    detach = T.attach_decoder_tracer(CabacDecoder, path)
    try:
        Decoder(parse="python", recon="numpy").decode_annexb(stream)
    except Exception:
        pass
    finally:
        detach()


def test_enc_dec_traces_match(tmp_path):
    enc_t = str(tmp_path / "enc.txt")
    dec_t = str(tmp_path / "dec.txt")
    stream = _encode_traced(enc_t, _frames())
    _decode_traced(dec_t, stream)
    assert T.diff_traces(enc_t, dec_t) is None


def test_corruption_localized(tmp_path):
    enc_t = str(tmp_path / "enc.txt")
    dec_t = str(tmp_path / "dec.txt")
    stream = bytearray(_encode_traced(enc_t, _frames()))
    # flip a bit in the middle of the (only) slice NAL's payload
    from libhm_tpu.hostdec import nal as N
    spans = []
    raw = bytes(stream)
    for ebsp in N.split_annexb(raw):
        if N.parse_nal(ebsp).nal_type < 32:
            off = raw.find(ebsp)
            spans.append((off, len(ebsp)))
    off, ln = spans[0]
    stream[off + ln // 2] ^= 0x10
    _decode_traced(dec_t, bytes(stream))
    d = T.diff_traces(enc_t, dec_t)
    assert d is not None, "corruption must surface in the trace diff"
    n, la, lb = d
    assert n > 0
