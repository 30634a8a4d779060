"""Live differential smoke vs the reference chromap binary (when one is
available at /tmp/refbuild/chromap or $CHROMAP_REF_BIN): one fresh random
dataset through the 11-case flag matrix must byte-match. The frozen-golden
suites pin known datasets; this exercises a new one every run."""

import os
import subprocess
import sys

import pytest

REF_BIN = os.environ.get("CHROMAP_REF_BIN", "/tmp/refbuild/chromap")


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference chromap binary not available")
@pytest.mark.skipif(os.environ.get("CHROMAP_TPU_RUN_DIFFERENTIAL") != "1",
                    reason="opt-in (CHROMAP_TPU_RUN_DIFFERENTIAL=1): the "
                           "reference binary can take minutes per case in "
                           "this VM's slow page-fault phases")
def test_differential_one_round(tmp_path):
    env = dict(os.environ, CHROMAP_FUZZ_REF_TIMEOUT="90")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "differential_fuzz.py")
    # seed varies with the pytest tmp dir inode so reruns explore
    seed = 60_000 + (os.stat(tmp_path).st_ino % 5000)
    r = subprocess.run([sys.executable, "-u", tool, "1", str(seed)],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MISMATCH" not in r.stdout, r.stdout
