"""CABAC arithmetic encoder + bit writer (Rec. H.265 9.3.4.4).

Rebuild of the reference's TEncBinCABAC (source/Lib/TLibEncoder/
TEncBinCoderCABAC.cpp) in the spec's low/range/outstanding-bits form.
Produces streams parseable by both our decoder and the HM reference binary.
"""
from ..hostdec.tables import LPS_TABLE, NEXT_STATE_MPS, NEXT_STATE_LPS


class BitWriter:
    """MSB-first bit writer over a bytearray."""

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def put(self, bit):
        self.cur = (self.cur << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == 8:
            self.buf.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def put_bits(self, val, n):
        for i in range(n - 1, -1, -1):
            self.put((val >> i) & 1)

    def ue(self, v):
        v += 1
        n = v.bit_length()
        self.put_bits(0, n - 1)
        self.put_bits(v, n)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_one(self):
        """rbsp/byte alignment: one 1-bit then zero pad."""
        self.put(1)
        while self.nbits:
            self.put(0)

    def align_zero(self):
        while self.nbits:
            self.put(0)

    def data(self):
        assert self.nbits == 0
        return bytes(self.buf)


class CabacEncoder:
    """Arithmetic encoder writing into a BitWriter."""

    def __init__(self, bw: BitWriter):
        self.bw = bw
        self.low = 0
        self.range = 510
        self.bits_outstanding = 0
        self.first_bit = True

    def _put(self, b):
        if self.first_bit:
            self.first_bit = False
        else:
            self.bw.put(b)
        while self.bits_outstanding:
            self.bw.put(1 - b)
            self.bits_outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low < 256:
                self._put(0)
            elif self.low >= 512:
                self._put(1)
                self.low -= 512
            else:
                self.bits_outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def encode_bin(self, ctx, idx, binval):
        state = int(ctx[idx])
        lps = int(LPS_TABLE[state >> 1, (self.range >> 6) & 3])
        self.range -= lps
        if binval != (state & 1):
            self.low += self.range
            self.range = lps
            ctx[idx] = NEXT_STATE_LPS[state]
        else:
            ctx[idx] = NEXT_STATE_MPS[state]
        self._renorm()

    def encode_bypass(self, binval):
        self.low <<= 1
        if binval:
            self.low += self.range
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.bits_outstanding += 1
            self.low -= 512

    def encode_bypass_bins(self, val, n):
        for i in range(n - 1, -1, -1):
            self.encode_bypass((val >> i) & 1)

    def encode_terminate(self, binval):
        self.range -= 2
        if binval:
            self.low += self.range
            self._flush()
        else:
            self._renorm()

    def _flush(self):
        self.range = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self.bw.put_bits(((self.low >> 7) & 3) | 1, 2)

    def pcm_payload(self, bits):
        """Raw PCM samples after a terminate(1) flush: byte-align, write
        the (value, nbits) list, then reinitialise the arithmetic engine
        (reference TEncSbac::codeIPCMInfo + xWritePCMCode + resetBac)."""
        self.bw.align_zero()
        for v, n in bits:
            self.bw.put_bits(int(v), n)
        self.low = 0
        self.range = 510
        self.bits_outstanding = 0
        self.first_bit = True

    def encode_eg_k(self, v, k):
        """Exp-Golomb order-k via bypass bins (inverse of decode_eg_k)."""
        while v >= (1 << k):
            self.encode_bypass(1)
            v -= 1 << k
            k += 1
        self.encode_bypass(0)
        while k:
            k -= 1
            self.encode_bypass((v >> k) & 1)
