"""SEI message parsing (reference SEIread.cpp / SEI.h).

Round-1 scope: the payloads the decoder acts on — decoded_picture_hash
(the conformance oracle), plus generic payload enumeration so callers can
inspect any SEI (type, raw bytes) like the reference's SEI list.
"""
import hashlib

# payload types (Rec. H.265 Annex D)
SEI_BUFFERING_PERIOD = 0
SEI_PIC_TIMING = 1
SEI_USER_DATA_UNREGISTERED = 5
SEI_RECOVERY_POINT = 6
SEI_ACTIVE_PARAMETER_SETS = 129
SEI_DECODED_PICTURE_HASH = 132
SEI_TIME_CODE = 136
SEI_MASTERING_DISPLAY = 137

HASH_MD5, HASH_CRC, HASH_CHECKSUM = 0, 1, 2


def parse_sei_rbsp(rbsp: bytes):
    """Returns [(payload_type, payload_bytes)] for one SEI NAL's RBSP."""
    out = []
    i = 0
    n = len(rbsp)
    while i < n:
        if rbsp[i] == 0x80 and i == n - 1:  # rbsp trailing
            break
        ptype = 0
        while i < n and rbsp[i] == 0xFF:
            ptype += 255
            i += 1
        if i >= n:
            break
        ptype += rbsp[i]
        i += 1
        size = 0
        while i < n and rbsp[i] == 0xFF:
            size += 255
            i += 1
        if i >= n:
            break
        size += rbsp[i]
        i += 1
        out.append((ptype, bytes(rbsp[i:i + size])))
        i += size
    return out


class DecodedPictureHash:
    def __init__(self, payload: bytes):
        self.method = payload[0]
        step = {HASH_MD5: 16, HASH_CRC: 2, HASH_CHECKSUM: 4}[self.method]
        self.digests = [payload[1 + i * step:1 + (i + 1) * step]
                        for i in range((len(payload) - 1) // step)]


def _plane_bytes(plane, bit_depth):
    if bit_depth <= 8:
        return plane.astype("uint8").tobytes()
    return plane.astype("<u2").tobytes()


def _crc(data: bytes) -> bytes:
    # reference TComPicYuvMD5 calcCRC (x^16 + x^12 + x^5 + 1, bit-serial)
    crc = 0xFFFF
    for byte in data:
        for bit in range(7, -1, -1):
            crcmsb = (crc >> 15) & 1
            crc = ((crc << 1) & 0xFFFF) + \
                ((crcmsb ^ ((byte >> bit) & 1)) * 0x1021 if
                 (crcmsb ^ ((byte >> bit) & 1)) else 0)
    for _ in range(16):
        crcmsb = (crc >> 15) & 1
        crc = ((crc << 1) & 0xFFFF) + (0x1021 if crcmsb else 0)
    return bytes([(crc >> 8) & 0xFF, crc & 0xFF])


def _checksum(plane, bit_depth) -> bytes:
    # reference calcChecksum: xor of sample bytes with position mask
    h, w = plane.shape
    s = 0
    p = plane
    for y in range(h):
        row = p[y]
        for x in range(w):
            xor_mask = (x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8)
            v = int(row[x])
            s = (s + ((v & 0xFF) ^ xor_mask)) & 0xFFFFFFFF
            if bit_depth > 8:
                s = (s + ((v >> 8) ^ xor_mask)) & 0xFFFFFFFF
    return s.to_bytes(4, "big")


def verify_picture_hash(planes, bit_depths, dph: DecodedPictureHash) -> bool:
    """planes: coded-size component arrays; returns True when all match."""
    for i, plane in enumerate(planes):
        bd = bit_depths[i]
        if dph.method == HASH_MD5:
            got = hashlib.md5(_plane_bytes(plane, bd)).digest()
        elif dph.method == HASH_CRC:
            got = _crc(_plane_bytes(plane, bd))
        else:
            got = _checksum(plane, bd)
        if i >= len(dph.digests) or got != dph.digests[i]:
            return False
    return True


# ---------------------------------------------------------------------------
# Typed payload decoders (reference SEIread.cpp xParseSEIxxx) for the
# payloads the reference decoder consumes; others stay available as raw
# (type, bytes) from parse_sei_rbsp.
class _Bits:
    def __init__(self, data):
        self.d = data
        self.p = 0

    def u(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | ((self.d[self.p >> 3] >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v

    def ue(self):
        z = 0
        while self.u(1) == 0 and self.p < len(self.d) * 8:
            z += 1
        return (1 << z) - 1 + (self.u(z) if z else 0)

    def se(self):
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)


class RecoveryPoint:
    def __init__(self, payload):
        b = _Bits(payload)
        self.recovery_poc_cnt = b.se()
        self.exact_match = b.u(1)
        self.broken_link = b.u(1)


class ActiveParameterSets:
    def __init__(self, payload):
        b = _Bits(payload)
        self.active_video_parameter_set_id = b.u(4)
        self.self_contained_cvs = b.u(1)
        self.no_parameter_set_update = b.u(1)
        self.num_sps_ids_minus1 = b.ue()
        self.active_seq_parameter_set_id = [
            b.ue() for _ in range(self.num_sps_ids_minus1 + 1)]


class UserDataUnregistered:
    def __init__(self, payload):
        self.uuid = payload[:16]
        self.data = payload[16:]


class MasteringDisplayColourVolume:
    def __init__(self, payload):
        b = _Bits(payload)
        self.primaries = [(b.u(16), b.u(16)) for _ in range(3)]
        self.white_point = (b.u(16), b.u(16))
        self.max_luminance = b.u(32)
        self.min_luminance = b.u(32)


class TimeCode:
    def __init__(self, payload):
        b = _Bits(payload)
        self.num_clock_ts = b.u(2)
        self.clock_ts = []
        for _ in range(self.num_clock_ts):
            ts = {}
            if b.u(1):  # clock_timestamp_flag
                ts["units_field_based"] = b.u(1)
                ts["counting_type"] = b.u(5)
                full = b.u(1)
                ts["discontinuity"] = b.u(1)
                ts["cnt_dropped"] = b.u(1)
                ts["n_frames"] = b.u(9)
                if full:
                    ts["seconds"] = b.u(6)
                    ts["minutes"] = b.u(6)
                    ts["hours"] = b.u(5)
            self.clock_ts.append(ts)


_PAYLOAD_CLASSES = {
    SEI_DECODED_PICTURE_HASH: DecodedPictureHash,
    SEI_RECOVERY_POINT: RecoveryPoint,
    SEI_ACTIVE_PARAMETER_SETS: ActiveParameterSets,
    SEI_USER_DATA_UNREGISTERED: UserDataUnregistered,
    SEI_MASTERING_DISPLAY: MasteringDisplayColourVolume,
    SEI_TIME_CODE: TimeCode,
}


def decode_sei_payloads(rbsp: bytes):
    """Typed SEI decode: [(payload_type, object-or-raw-bytes)]."""
    out = []
    for ptype, payload in parse_sei_rbsp(rbsp):
        cls = _PAYLOAD_CLASSES.get(ptype)
        if cls is not None and payload:
            try:
                out.append((ptype, cls(payload)))
                continue
            except (IndexError, KeyError):
                pass
        out.append((ptype, payload))
    return out
