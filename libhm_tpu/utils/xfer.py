"""Host<->device transfer accounting for the device-resident decode path.

The reference has no host/device split (single-process C++, SURVEY.md §2.5);
in the TPU rebuild the host->device syntax upload and device->host YUV
download ARE the communication layer, so the byte counts are a first-class
metric: bench.py reports them per frame next to fps.

Counters are process-global and cheap (plain ints); reset() before a run,
then read H2D/D2H.
"""
import jax.numpy as jnp

H2D = 0
D2H = 0
BY_TAG = {}


def reset():
    global H2D, D2H
    H2D = 0
    D2H = 0
    BY_TAG.clear()


def up(a, tag="misc"):
    """jnp.asarray(a) with upload byte accounting (host numpy -> device)."""
    global H2D
    H2D += a.nbytes
    BY_TAG[tag] = BY_TAG.get(tag, 0) + a.nbytes
    return jnp.asarray(a)


def count_d2h(n):
    global D2H
    D2H += n
