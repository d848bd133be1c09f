"""JAX transform kernels vs the numpy oracle (and thus vs HM)."""
import numpy as np
import pytest
import jax.numpy as jnp

from libhm_tpu.hostdec import refimpl
from libhm_tpu.ops import transform as T


@pytest.mark.parametrize("n,use_dst", [(4, False), (4, True), (8, False),
                                       (16, False), (32, False)])
@pytest.mark.parametrize("bd", [8, 10])
def test_inverse_transform_matches_oracle(n, use_dst, bd):
    rng = np.random.RandomState(n * bd)
    coeffs = rng.randint(-32768, 32768, size=(13, n, n)).astype(np.int32)
    got = np.asarray(T.inverse_transform_batch(jnp.asarray(coeffs), n, use_dst, bd))
    for i in range(coeffs.shape[0]):
        want = refimpl.inverse_transform(coeffs[i], use_dst, bd)
        assert (got[i] == want).all(), (n, use_dst, bd, i)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("bd", [8, 10])
def test_dequant_matches_oracle(log2, bd):
    n = 1 << log2
    rng = np.random.RandomState(log2 * bd)
    coeffs = rng.randint(-3000, 3000, size=(11, n, n)).astype(np.int32)
    qps = rng.randint(0, 51 + 6 * (bd - 8), size=(11,)).astype(np.int32)
    got = np.asarray(T.dequant_batch(jnp.asarray(coeffs), jnp.asarray(qps), bd, log2))
    for i in range(11):
        want = refimpl.dequant(coeffs[i], int(qps[i]), log2, bd)
        assert (got[i] == want).all(), (log2, bd, i, int(qps[i]))


def test_transform_skip_and_rdpcm():
    rng = np.random.RandomState(7)
    c = rng.randint(-500, 500, size=(5, 4, 4)).astype(np.int32)
    for bd in (8, 10):
        got = np.asarray(T.inverse_transform_skip_batch(jnp.asarray(c), bd, 2))
        for i in range(5):
            want = refimpl.inverse_transform_skip(c[i], bd, 2)
            assert (got[i] == want).all()
    modes = np.array([0, 1, 2, 1, 0], np.int32)
    got = np.asarray(T.inverse_rdpcm_batch(jnp.asarray(c), jnp.asarray(modes)))
    for i in range(5):
        want = refimpl.inverse_rdpcm(c[i], int(modes[i]))
        assert (got[i] == want).all()
