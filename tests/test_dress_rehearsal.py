"""Offline image-pipeline dress rehearsal as a gated smoke test.

Runs the full CLI chain (prepare_data -> train_diffusion -> sample ->
compute_fid -> analyze_fids) on fake CIFAR bytes and a random-init
Inception stand-in (VERDICT r2 #5). It spawns ~5 subprocess compiles, so
it is gated behind PDM_SLOW_TESTS=1 and excluded from the default suite;
the driver-facing entry point is `python scripts/dress_rehearsal.py`,
which was validated on TPU hardware (see README / ROOFLINE notes).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("PDM_SLOW_TESTS") != "1",
    reason="~5 subprocess compiles; run with PDM_SLOW_TESTS=1",
)
def test_dress_rehearsal_chain(tmp_path):
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "dress_rehearsal.py"),
            "--workdir", str(tmp_path / "wd"),
            "--train-iters", "4",
            "--fid-samples", "16",
            "--n-train", "64",
            "--n-test", "16",
        ],
        capture_output=True, text=True, timeout=3000,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "dress rehearsal OK" in r.stdout
