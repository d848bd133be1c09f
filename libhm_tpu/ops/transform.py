"""Batched dequant + inverse transform — TPU-native (MXU) formulation.

Replaces the reference's scalar partialButterflyInverse{4,8,16,32} /
fastInverseDst / xDeQuant loops (reference: source/Lib/TLibCommon/
TComTrQuant.cpp:387-944, 1203-1313) with whole-picture batched kernels:

- TUs are bucketed by size; each bucket is one [N, n, n] int32 tensor.
- Dequant is an elementwise op with per-TU (scale, shift) scalars.
- The 2-D inverse transform is two matmuls.  TPUs multiply int8/bf16 on the
  MXU; for bit-exactness we split the 16-bit intermediate into (hi, lo)
  bytes and combine two int8 x int8 matmuls: C @ T == (hi @ T) * 256 + lo @ T
  with int32 accumulation.  Transform matrices fit int8 (|coef| <= 90).

All functions are jit-compatible with static shapes.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..hostdec.tables import DCT, DST4, INV_QUANT_SCALES

I16MIN, I16MAX = -32768, 32767


def _split_i8(x):
    """Split int32 values in [-32768, 32767] into (hi_int8, lo_uint8->int8).

    x == hi * 256 + lo with hi in [-128, 127], lo in [0, 255].  lo is
    returned as two int8 halves (lo - 128 trick would need bias corrections),
    so we split lo further: lo = lo7 + lo1*128 where lo7 in [0,127].
    Simpler exact scheme: x = hi*256 + mid*16 + low, all pieces in [-?]...
    We use: hi = x >> 8 (arithmetic), lo = x & 255; lo fits uint8 but the MXU
    wants int8, so lo is split as (lo & 127) + (lo >> 7) * 128.
    """
    hi = (x >> 8).astype(jnp.int8)
    lo = x & 255
    lo0 = (lo & 127).astype(jnp.int8)
    lo1 = (lo >> 7).astype(jnp.int8)
    return hi, lo0, lo1


def _imatmul_right(x, t_i8):
    """Exact int32 x @ T for x in int16 range, T int8, int32 accumulate."""
    hi, lo0, lo1 = _split_i8(x)
    t = t_i8
    m_hi = jax.lax.dot_general(hi, t, (((x.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    m_lo0 = jax.lax.dot_general(lo0, t, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    m_lo1 = jax.lax.dot_general(lo1, t, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    return (m_hi << 8) + m_lo0 + (m_lo1 << 7)


def dequant_batch(coeffs, qp, bit_depth, log2_size, max_dyn_range=15):
    """coeffs: [N, n, n] int32; qp: [N] int32 (incl. bit-depth offset)."""
    per = qp // 6
    rem = qp % 6
    scale = jnp.asarray(INV_QUANT_SCALES)[rem]          # [N]
    tshift = max_dyn_range - bit_depth - log2_size
    right = 6 - (tshift + per)                          # [N]
    tmin, tmax = -(1 << max_dyn_range), (1 << max_dyn_range) - 1
    # int32 is exact here: inputs are clipped to <= 16 bits, scale <= 72,
    # and the left shift is bounded so products stay under 2^31
    target_bits = jnp.minimum(max_dyn_range + 1, 32 + right - 7)
    lo = -(jnp.int32(1) << (target_bits - 1))
    hi = (jnp.int32(1) << (target_bits - 1)) - 1
    c = jnp.clip(coeffs, lo[:, None, None], hi[:, None, None])
    scale = scale.astype(jnp.int32)[:, None, None]
    r = right[:, None, None]
    # branch-free: compute both shift directions and select
    rp = jnp.maximum(r, 0)
    rn = jnp.maximum(-r, 0)
    add = jnp.where(r > 0, jnp.int32(1) << jnp.maximum(rp - 1, 0), 0)
    q_right = (c * scale + add) >> rp
    q_left = (c * scale) << rn
    q = jnp.where(r > 0, q_right, q_left)
    return jnp.clip(q, tmin, tmax).astype(jnp.int32)


def dequant_batch_scaling(coeffs, qp, mat, bit_depth, log2_size,
                          max_dyn_range=15):
    """Dequant with per-TU scaling matrices (Rec. 8.6.3 w/ m[x][y]).

    coeffs: [N, n, n] int32; qp: [N]; mat: [N, n, n] int32 scaling factors.
    int32-exact only for max_dyn_range == 15 (the non-extended-precision
    profiles); callers gate extended precision to the host path.
    """
    per = qp // 6
    rem = qp % 6
    scale = jnp.asarray(INV_QUANT_SCALES)[rem].astype(jnp.int32)
    tshift = max_dyn_range - bit_depth - log2_size
    right = 6 - (tshift + per) + 4   # + log2(SCALING_LIST_NEUTRAL == 16)
    tmin, tmax = -(1 << max_dyn_range), (1 << max_dyn_range) - 1
    target_bits = jnp.minimum(max_dyn_range + 1, 32 + right - 15)
    lo = -(jnp.int32(1) << (target_bits - 1))
    hi = (jnp.int32(1) << (target_bits - 1)) - 1
    c = jnp.clip(coeffs, lo[:, None, None], hi[:, None, None])
    dq = mat * scale[:, None, None]                     # <= 255*72, 15 bits
    r = right[:, None, None]
    rp = jnp.maximum(r, 0)
    rn = jnp.maximum(-r, 0)
    add = jnp.where(r > 0, jnp.int32(1) << jnp.maximum(rp - 1, 0), 0)
    q_right = (c * dq + add) >> rp
    q_left = (c * dq) << rn
    q = jnp.where(r > 0, q_right, q_left)
    return jnp.clip(q, tmin, tmax).astype(jnp.int32)


# matrices kept as host numpy (closed over as constants inside jit)
_T_CACHE = {}
for _n in (4, 8, 16, 32):
    _T_CACHE[(_n, False)] = (DCT[_n].T.astype(np.int8), DCT[_n].astype(np.int8))
_T_CACHE[(4, True)] = (DST4.T.astype(np.int8), DST4.astype(np.int8))


def _mats(n, use_dst):
    return _T_CACHE[(n, bool(use_dst))]


def inverse_transform_batch(coeffs, n, use_dst, bit_depth, max_dyn_range=15):
    """coeffs: [N, n, n] int32 dequantized -> residual [N, n, n] int32.

    Two-stage exact integer transform; both stages clip to int16 range.
    """
    t_t, t = _mats(n, use_dst)
    shift1 = 7
    shift2 = (6 + max_dyn_range - 1) - bit_depth
    # stage 1: T^T @ C per batch == (C^T @ T)^T; use right-multiplies only
    # T^T @ C = (C^T @ T)^T
    ct = jnp.swapaxes(coeffs, -1, -2)
    s1 = _imatmul_right(ct, t)                      # [N, n, n] = C^T @ T
    s1 = jnp.swapaxes(s1, -1, -2)                   # = T^T @ C
    s1 = jnp.clip((s1 + (1 << (shift1 - 1))) >> shift1, I16MIN, I16MAX)
    # stage 2: S1 @ T
    s2 = _imatmul_right(s1, t)
    s2 = jnp.clip((s2 + (1 << (shift2 - 1))) >> shift2, I16MIN, I16MAX)
    return s2.astype(jnp.int32)


def inverse_transform_skip_batch(coeffs, bit_depth, log2_size,
                                 max_dyn_range=15, rotate=False):
    tshift = max_dyn_range - bit_depth - log2_size
    c = coeffs
    if rotate:
        c = c[:, ::-1, ::-1]
    if tshift >= 0:
        off = 0 if tshift == 0 else (1 << (tshift - 1))
        r = (c + off) >> tshift
    else:
        r = c << (-tshift)
    return jnp.clip(r, I16MIN, I16MAX)


def inverse_rdpcm_batch(res, mode):
    """mode: [N] int32 (0 off, 1 hor, 2 ver)."""
    h = jnp.cumsum(res, axis=2)
    v = jnp.cumsum(res, axis=1)
    m = mode[:, None, None]
    out = jnp.where(m == 1, h, jnp.where(m == 2, v, res))
    return jnp.clip(out, I16MIN, I16MAX)
