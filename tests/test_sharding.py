"""Multi-chip mesh verification and multi-host shard-merge tests."""

import subprocess
import sys

import numpy as np
import pytest


_MESH_SCRIPT = """
import numpy as np
from chromap_tpu.parallel.sharding import make_data_mesh, sharded_myers
from chromap_tpu.ops.pallas_myers import banded_distance_batch_numpy
import jax
assert len(jax.devices()) >= 8, jax.devices()
n_dev = 8
mesh = make_data_mesh(n_dev)
e, L = 4, 40
n = 16 * n_dev
rng = np.random.default_rng(0)
pats = rng.integers(0, 4, (n, L + 2 * e)).astype(np.uint8)
txts = pats[:, e:e + L].copy()
for i in range(0, n, 2):
    txts[i, rng.integers(0, L)] = (txts[i, 0] + 1) % 4
errors, ends, accepted = sharded_myers(mesh, pats.T.astype(np.int32),
                                       txts.T.astype(np.int32), e, L)
exp_err, exp_end = banded_distance_batch_numpy(pats, txts, e)
ok = exp_err <= e
assert np.array_equal(errors[ok], exp_err[ok])
assert np.array_equal(ends[ok], exp_end[ok])
assert accepted == int(ok.sum())
print("MESH-OK", accepted)
"""


def test_sharded_myers_on_virtual_mesh():
    # The axon sitecustomize imports jax at interpreter startup, so the
    # CPU-mesh override must be in the child's environment.
    import os
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    res = subprocess.run([sys.executable, "-c", _MESH_SCRIPT],
                         capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr
    assert "MESH-OK" in res.stdout


def test_two_shard_map_merge_equals_single_run(data_dir, golden_dir,
                                               test_index, tmp_path):
    """Map the bundled reads in 2 shards, merge, compare to the single-run
    golden output (chip-style dedup path)."""
    r1 = str(data_dir / "read1.fq")
    r2 = str(data_dir / "read2.fq")
    out = tmp_path / "sharded.bed"
    base = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", test_index, "-r", str(data_dir / "ref.fa"),
            "-1", r1, "-2", r2, "-l", "2000", "--remove-pcr-duplicates",
            "-o", str(out)]
    for i in range(2):
        res = subprocess.run(base + ["--num-shards", "2",
                                     "--shard-index", str(i)],
                             capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
    merge = [sys.executable, "-m", "chromap_tpu.cli",
             "--merge-shards", f"{out}.shard0.temp0,{out}.shard1.temp0",
             "--remove-pcr-duplicates", "-l", "2000", "--BED",
             "-r", str(data_dir / "ref.fa"), "-o", str(out)]
    res = subprocess.run(merge, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    assert out.read_bytes() == (golden_dir / "chip-equiv.bed").read_bytes()


def test_multichip_end_to_end_byte_parity():
    """The full map -> select -> emit path under a multi-device data mesh
    equals the single-device host run byte-for-byte (the driver's
    dryrun_multichip, on the virtual CPU mesh). Child process: the mesh
    override must precede interpreter start (axon sitecustomize)."""
    import os
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    script = ("import sys; sys.path.insert(0, %r)\n"
              "from __graft_entry__ import dryrun_multichip\n"
              "dryrun_multichip(2)\n" % repo)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr
    assert "byte-identical to the single-device host run" in res.stdout, \
        res.stdout
