"""TPU-marked on-chip statistical kernel tests (VERDICT round-1 item 5).

The pytest suite pins CPU (tests/conftest.py), so the fused Pallas
kernels' REAL in-kernel PRNG can only be validated on hardware. These
tests run the on-chip check scripts (benchmarks/tpu_kernel_checks.py,
benchmarks/tpu_pcgs_checks.py — chi-square, one-hot exactness,
fused-vs-XLA agreement) in fresh subprocesses that get the TPU backend.

One command validates the kernels on hardware:

    LDA_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernels.py -v

Without LDA_TPU_TESTS=1 (or off-TPU) the tests skip; plain `pytest
tests/` never selects them (`-m tpu` opt-in via the marker).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(os.environ.get("LDA_TPU_TESTS") != "1",
                       reason="set LDA_TPU_TESTS=1 on a TPU host"),
]


def _run_script(rel_path, timeout=4200):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    pp = [_REPO]
    # the axon TPU plugin lives outside site-packages on this image
    axon = os.path.expanduser("~/.axon_site")
    if os.path.isdir(axon):
        pp.append(axon)
    if env.get("PYTHONPATH"):
        pp.append(env["PYTHONPATH"])
    env["PYTHONPATH"] = ":".join(pp)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, rel_path)], env=env,
        capture_output=True, text=True, timeout=timeout, cwd=_REPO)
    assert proc.returncode == 0, (
        f"{rel_path} failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}")
    return proc.stdout


def test_fused_zdraw_onchip_checks():
    """GGS fused z-draw: one-hot exactness, doc-mask semantics, chi-square
    at K=100 and the K=1000 streamed path — real on-chip PRNG."""
    out = _run_script("benchmarks/tpu_kernel_checks.py")
    assert "ALL CHECKS PASSED" in out, out[-2000:]


def test_fused_pcgs_onchip_checks():
    """Fused PCGS/ADLDA/HDP/MH sweeps: count semantics, planted-topic
    exactness, chi-square vs exact conditionals, fused-vs-XLA LL
    agreement, streamed large-K and the X,Y,X window-reuse hazard
    schedule."""
    out = _run_script("benchmarks/tpu_pcgs_checks.py")
    assert "ALL PCGS ON-CHIP CHECKS PASSED" in out, out[-2000:]


def test_fused_ggs_onchip_geweke():
    """Geweke 'getting it right' with the REAL fused kernels — round 4:
    FIVE chains (GGS z-draw bf16, PCGS sequential sweep, LightLDA MH,
    the K-tiled streamed chunk body forced on at tiny K, and the
    collapsed live-count ADLDA body as a measured-deviation family):
    the on-chip PRNG, the bf16 fast path and the cell-block layouts all
    sit inside the validated transitions (the CPU Geweke suite drives
    the XLA fallbacks plus the interpreted bodies). Measured round 4
    (ONCHIP_GEWEKE.json): every |z| <= 1.9, KS healthy on every
    statistic; the ktiled chain reproduces the untiled chain's z-scores
    exactly (bit-identical draws). ~75 min on the tunnel; the driver
    artifact regenerates via benchmarks/tpu_geweke_check.py."""
    out = _run_script("benchmarks/tpu_geweke_check.py", timeout=6600)
    assert "on-chip Geweke check passed" in out, out[-2000:]
