#!/usr/bin/env python3
"""Dense-kernel throughput on the current JAX backend (TPU or CPU).

Measures the bit-exact integer kernels that carry the decode FLOPs:
batched inverse DCT (int8-split MXU matmuls), dequant, and the batched
motion-compensation interpolation. These are the device half of the
host-CABAC / device-recon split; full-decode TPU throughput this round is
bounded by the host intra stage and tunnel transfers, not these kernels
(see README).

Usage: python tools/bench_kernels.py
"""
import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=10):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.monotonic() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from libhm_tpu.ops.transform import inverse_transform_batch, dequant_batch
    print(f"backend: {jax.devices()[0]}")
    rows = []
    for n, N in ((4, 65536), (8, 32768), (16, 8192), (32, 2048)):
        coeffs = jnp.asarray(
            np.random.randint(-100, 100, (N, n, n)).astype(np.int32))
        qp = jnp.full((N,), 32, jnp.int32)
        fd = jax.jit(partial(dequant_batch, bit_depth=8,
                             log2_size=n.bit_length() - 1))
        dt = bench(fd, coeffs, qp)
        rows.append(f"dequant {n:2d}x{n:<2d} x{N}: {dt*1e3:7.3f} ms  "
                    f"{N*n*n/dt/1e9:7.2f} Gsamp/s")
        fi = jax.jit(partial(inverse_transform_batch, n=n, use_dst=False,
                             bit_depth=8))
        dt = bench(fi, coeffs)
        rows.append(f"idct    {n:2d}x{n:<2d} x{N}: {dt*1e3:7.3f} ms  "
                    f"{N*n*n/dt/1e9:7.2f} Gsamp/s")
    for r in rows:
        print(r)
    # host reference point: the optimized native C++ residual stage runs
    # ~0.2s for 17 pictures of 1080p Main10 (~0.3 Gsamp/s end-to-end)
    print("note: native C++ residual stage ~0.3 Gsamp/s on this host")


if __name__ == "__main__":
    main()
