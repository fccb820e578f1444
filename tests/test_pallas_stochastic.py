"""Stochastic-path validation of the Pallas decode kernel (TPU tier).

The kernel's PRNG (`pltpu.prng_seed`/`prng_random_bits`) has no CPU
interpret implementation, so these tests run the sampling-statistics tool
in a subprocess on the real TPU platform and assert the kernel's empirical
sampling distributions sit at the noise floor next to the scan decoder and
the analytic ground truth (ref sampling semantics:
models/fatchord_version.py:226-237).  Run with ``pytest -m tpu``; the
device probe happens at test time via the ``tpu_env`` fixture.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.tpu
def test_kernel_sampling_statistics(tpu_env):
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "kernel_sampling_stats.py")],
        env=tpu_env, capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])

    noise = stats["raw_tv_expected_noise"]
    # kernel no farther from the analytic law than a few noise floors,
    # and as close to it as the jax.random-based scan decoder
    assert stats["raw_tv_kernel_vs_analytic"] < 4 * noise
    assert stats["raw_tv_kernel_vs_scan"] < 6 * noise
    assert stats["mol_mean_err_kernel"] < 5e-3
    assert stats["mol_std_err_kernel"] < 5e-3
    assert stats["mol_sel_tv_kernel_vs_analytic"] < 0.03
    assert stats["mol_sel_tv_kernel_vs_scan"] < 0.02
