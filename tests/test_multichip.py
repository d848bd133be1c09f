"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

conftest.py forces JAX_PLATFORM(S)=cpu with
--xla_force_host_platform_device_count=8, so jax.devices() here is 8 CPU
devices and both the inline and the subprocess self-configuring paths of
__graft_entry__.dryrun_multichip are exercised.
"""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip_inline():
    # 8 devices available in-process -> runs inline
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd_mesh():
    graft.dryrun_multichip(1)
    graft.dryrun_multichip(3)


def test_dryrun_multichip_subprocess_fallback():
    # Ask for more devices than the host has: must self-configure a virtual
    # mesh in a subprocess rather than crash (the round-1 driver failure).
    graft.dryrun_multichip(16)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out, frame = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    assert frame.shape == args[4].shape


def test_sharded_recon_matches_single_device():
    """Sharded dequant+ITX+SAO over a stream x tile mesh must be bitwise
    identical to the unsharded single-device result."""
    from libhm_tpu.ops import transform as T

    rng = np.random.RandomState(7)
    nstr, ntu = 4, 64
    coeffs = rng.randint(-2048, 2048, (nstr, ntu, 16, 16)).astype(np.int32)
    qps = rng.randint(0, 63, (nstr, ntu)).astype(np.int32)
    frames = rng.randint(0, 1024, (nstr, 64, 128)).astype(np.int32)
    lut = rng.randint(-7, 8, (32,)).astype(np.int32)

    def step(coeffs, qps, frames, lut):
        res = T.inverse_transform_batch(
            T.dequant_batch(coeffs.reshape(-1, 16, 16), qps.reshape(-1),
                            10, 4), 16, False, 10)
        band = (frames >> 5).astype(jnp.int32)
        frames = jnp.clip(frames + lut[band], 0, 1023)
        return res.reshape(coeffs.shape), frames

    # single device
    ref_res, ref_frames = jax.jit(step)(coeffs, qps, frames, lut)

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("stream", "tile"))
    sc = jax.device_put(coeffs, NamedSharding(mesh, P("stream")))
    sq = jax.device_put(qps, NamedSharding(mesh, P("stream")))
    sf = jax.device_put(frames, NamedSharding(mesh, P("stream", None, "tile")))
    got_res, got_frames = jax.jit(step)(sc, sq, sf, jnp.asarray(lut))

    np.testing.assert_array_equal(np.asarray(got_res), np.asarray(ref_res))
    np.testing.assert_array_equal(np.asarray(got_frames), np.asarray(ref_frames))
