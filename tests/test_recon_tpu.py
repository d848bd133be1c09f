"""Bit-exactness of the TPU (JAX) reconstruction backend.

Runs on the CPU backend in CI (conftest forces JAX_PLATFORMS=cpu); the
same code path is verified on real TPU hardware by the driver bench.
Covers ALL golden streams: residual/MC/intra-wavefront/deblock/SAO all run
as device kernels (the only remaining host fallback is scaling lists +
extended precision, a combination no profile ladder exercises).
"""
import hashlib
import json
import os
import subprocess
import sys
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = json.load(open(os.path.join(ROOT, "testdata", "golden.json")))

# the 1080p/4K streams run in the (slower) full-suite marker below
FAST = sorted(n for n in GOLD if "1080p" not in n and "4k" not in n)
SLOW = sorted(n for n in GOLD if "1080p" in n or "4k" in n)

# XLA's CPU backend (LLVM ORC JIT) can segfault after enough programs
# accumulate in one process — a backend bug, not a kernel bug (the same
# sweep is clean on real devices).  Each group of streams therefore runs
# in a fresh interpreter; the persistent compile cache (conftest) keeps
# the repeated compilations cheap.
NGROUPS = 4
GROUPS = [FAST[i::NGROUPS] for i in range(NGROUPS)]

_CHILD = """
import hashlib, json, os, sys
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the site axon hook ignores the env var and would hang on a dead
    # tunnel; only the live config setting is respected (see conftest)
    import jax
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from libhm_tpu.hostdec.decoder import Decoder
GOLD = json.load(open(os.path.join({root!r}, "testdata", "golden.json")))
for name in {names!r}:
    data = open(os.path.join({root!r}, "testdata",
                             GOLD[name]["bitstream"]), "rb").read()
    outs = Decoder(parse="native", recon="tpu").decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    ok = hashlib.md5(buf).hexdigest() == GOLD[name]["decoded_yuv_md5"]
    print(("OK " if ok else "BAD ") + name, flush=True)
    if not ok:
        sys.exit(1)
"""


def _run_group(names):
    r = subprocess.run(
        [sys.executable, "-c", _CHILD.format(root=ROOT, names=names)],
        capture_output=True, text=True, cwd=ROOT)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    for name in names:
        assert f"OK {name}" in r.stdout


def _run(name):
    from libhm_tpu.hostdec.decoder import Decoder
    data = open(os.path.join(ROOT, "testdata", GOLD[name]["bitstream"]),
                "rb").read()
    outs = Decoder(parse="native", recon="tpu").decode_annexb(data)
    buf = b"".join(p.tobytes() for pic in outs for p in pic)
    assert hashlib.md5(buf).hexdigest() == GOLD[name]["decoded_yuv_md5"]


@pytest.mark.parametrize("gi", range(NGROUPS))
def test_tpu_recon_bit_exact(gi):
    _run_group(GROUPS[gi])


@pytest.mark.parametrize("name", SLOW)
def test_tpu_recon_bit_exact_1080p(name):
    # headline 1080p streams, TPU backend: ~2 min each on the 1-core CI
    # host once the persistent compile cache is warm
    _run_group([name])


def test_extprec_scaling_fallback_branch(monkeypatch):
    """scaling-lists + extended-precision pictures fall back to the numpy
    backend with a loud stderr note (hostdec/decoder.py).  No real stream
    can exercise this: the reference encoder refuses ExtendedPrecision
    without a RExt__HIGH_BIT_DEPTH_SUPPORT rebuild.  Force the flag on the
    custom-scaling-list golden and check the branch runs and matches the
    numpy backend decoding under the same (forced) interpretation."""
    import numpy as np
    from libhm_tpu.hostdec import params as P
    orig = P.parse_sps

    def patched(rbsp):
        sps = orig(rbsp)
        sps.extended_precision = True
        return sps

    monkeypatch.setattr(P, "parse_sps", patched)
    import libhm_tpu.hostdec.decoder as D
    monkeypatch.setattr(D, "parse_sps", patched, raising=False)
    data = open(os.path.join(ROOT, "testdata",
                             GOLD["customsl_lowdelay_160x96"]["bitstream"]),
                "rb").read()
    import io, contextlib, sys
    from libhm_tpu.hostdec.decoder import Decoder
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        outs_t = Decoder(parse="python", recon="tpu").decode_annexb(data)
    assert "falls back to the numpy backend" in err.getvalue()
    outs_n = Decoder(parse="python", recon="numpy").decode_annexb(data)
    for a, b in zip(outs_t, outs_n):
        for pa, pb in zip(a, b):
            assert (np.asarray(pa) == np.asarray(pb)).all()
