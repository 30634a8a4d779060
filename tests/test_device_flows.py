"""Device-path parity for the flows beyond bulk BED: presets (low-memory
mode, adapter trimming), barcoded scATAC fragments + summary, PAF/SAM
records. Each case runs the CLI with --device on the CPU backend (the
conftest pins JAX_PLATFORMS=cpu) with a small device batch so the 5000-pair
simulated dataset spans many hybrid chunks, and must byte-match the golden
produced by the reference chromap binary -- i.e. the device run equals the
host run equals the reference.

Reference engine behavior mirrored: one fast engine serves every format x
barcoded combo (chromap_driver.cc:702-761).
"""

import subprocess
import sys

import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))

from simulate import write_simulated_dataset


@pytest.fixture(scope="module")
def sim_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("simdev")
    write_simulated_dataset(str(d))
    from simulate import write_simulated_barcodes
    write_simulated_barcodes(str(d))
    args = [sys.executable, "-m", "chromap_tpu.cli", "-i",
            "-r", f"{d}/ref.fa", "-o", f"{d}/index"]
    subprocess.run(args, check=True, capture_output=True)
    return d


DEVICE_ARGS = ["--device", "--device-batch-size", "512"]

CASES = [
    # atac preset: low-memory mode + trim-adapters + dedup + Tn5 (the
    # round-2 gap: every preset warned and mapped on the host)
    ("sim_atac.bed", ["--preset", "atac"]),
    # chip preset: low-memory mode + dedup
    ("sim_chip.bed", ["-l", "2000", "--remove-pcr-duplicates",
                      "--low-mem"]),
    # trimmed PAF: per-pair trim demotion + trimmed-length stitching
    ("sim_trim.paf", ["--trim-adapters", "--PAF"]),
    # SAM: extended finish + per-chunk CIGAR/NM/MD stream merge
    ("sim_pe.sam", ["--SAM"]),
    # Hi-C: split (drop-off) alignment on the device (the drop-off
    # kernels + 5'-gap retry run per candidate on the chip)
    ("sim_hic.pairs", ["--preset", "hic"]),
]


@pytest.mark.parametrize("golden,extra", CASES, ids=[c[0] for c in CASES])
def test_device_flow_parity(golden, extra, sim_data, golden_dir, tmp_path):
    out = tmp_path / f"dev_{golden}"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{sim_data}/index", "-r", f"{sim_data}/ref.fa",
            "-1", f"{sim_data}/r1.fq", "-2", f"{sim_data}/r2.fq",
            "-o", str(out)] + extra + DEVICE_ARGS
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert "WARNING: --device does not cover" not in result.stderr
    assert out.read_bytes() == (golden_dir / golden).read_bytes(), \
        f"{golden} differs under --device"


def test_device_barcoded_parity(sim_data, golden_dir, tmp_path):
    """scATAC fragments through the device path: barcode correction +
    whitelist + cell-level dedup + Tn5 + per-barcode summary, byte-equal
    to the reference golden (summary compared as a set: khash iteration
    order)."""
    d = sim_data
    out = tmp_path / "bc_dev.bed"
    summary = tmp_path / "bc_dev.csv"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq", "-b", f"{d}/bc.fq",
            "--barcode-whitelist", f"{d}/whitelist.txt",
            "--remove-pcr-duplicates", "--Tn5-shift", "-l", "2000",
            "--summary", str(summary), "-o", str(out)] + DEVICE_ARGS
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == (golden_dir / "sim_barcode.bed").read_bytes()
    ours = sorted(summary.read_text().splitlines())
    golden = sorted(
        (golden_dir / "sim_barcode_summary.csv").read_text().splitlines())
    assert ours == golden


def test_mesh_cli_parity(sim_data, golden_dir, tmp_path):
    """Multi-chip CLI execution: device chunks shard over the 8-virtual-
    device CPU data mesh (reads sharded, index replicated) and the output
    byte-matches both the single-device device run and the reference
    golden."""
    d = sim_data
    outs = {}
    for n in (8, 1):
        out = tmp_path / f"mesh{n}.bed"
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "-x", f"{d}/index", "-r", f"{d}/ref.fa",
                "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq",
                "-o", str(out), "--low-mem",
                "--mesh-devices", str(n)] + DEVICE_ARGS
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        if n == 8:
            assert "8-device data mesh" in result.stderr, result.stderr
        outs[n] = out.read_bytes()
    assert outs[8] == outs[1]
    assert outs[8] == (golden_dir / "sim_default.bed").read_bytes()


@pytest.fixture(scope="module")
def mc_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("simmcdev")
    from simulate import write_simulated_multichrom_dataset
    write_simulated_multichrom_dataset(str(d))
    args = [sys.executable, "-m", "chromap_tpu.cli", "-i",
            "-r", f"{d}/ref.fa", "-o", f"{d}/index"]
    subprocess.run(args, check=True, capture_output=True)
    return d


MC_CASES = [
    # --chr-order reorders the reference list; the device seeder gathers
    # in index space and the native finish reranks candidate rids after
    # paired reduction (engine.cpp cn_set_rid_rank), so the output must
    # byte-match the host run's (= the reference golden)
    ("sim_chrorder.bed", ["--chr-order", "{d}/chr_order.txt"]),
    ("sim_chrorder.pairs",
     ["--preset", "hic", "--chr-order", "{d}/chr_order.txt",
      "--pairs-natural-chr-order", "{d}/chr_order2.txt"]),
]


@pytest.mark.parametrize("golden,extra", MC_CASES,
                         ids=[c[0] for c in MC_CASES])
def test_device_chr_order_parity(golden, extra, mc_data, golden_dir,
                                 tmp_path):
    d = mc_data
    out = tmp_path / f"dev_{golden}"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq",
            "-o", str(out)] + [a.format(d=d) for a in extra] + DEVICE_ARGS
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert "WARNING: --device does not cover" not in result.stderr
    assert out.read_bytes() == (golden_dir / golden).read_bytes(), \
        f"{golden} differs under --device"


SE_CASES = [
    # single-end barcoded fragments (cell dedup) and SAM (per-chunk
    # CIGAR/NM/MD merge) through the single-end device hybrid
    ("sim_se_barcode.bed", ["--remove-pcr-duplicates"]),
    ("sim_se_bc.sam", ["--SAM"]),
]


@pytest.mark.parametrize("golden,extra", SE_CASES,
                         ids=[c[0] for c in SE_CASES])
def test_device_se_flow_parity(golden, extra, sim_data, golden_dir,
                               tmp_path):
    d = sim_data
    out = tmp_path / f"sedev_{golden}"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-b", f"{d}/bc.fq",
            "--barcode-whitelist", f"{d}/whitelist.txt",
            "-o", str(out)] + extra + DEVICE_ARGS
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == (golden_dir / golden).read_bytes(), \
        f"{golden} differs under --device"


def test_device_readformat_parity(sim_data, golden_dir, tmp_path):
    """--read-format slices rewrite the reads before seeding; the device
    chunks must seed the rewritten reads and byte-match the reference
    golden (sequence_effective_range.h semantics)."""
    d = sim_data
    out = tmp_path / "dev_readformat.bed"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq", "-b", f"{d}/bc.fq",
            "--read-format", "r1:5:84,r2:0:79,bc:0:7",
            "-o", str(out)] + DEVICE_ARGS
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert "Using TPU device seeding" in result.stderr, result.stderr
    assert out.read_bytes() == \
        (golden_dir / "sim_readformat.bed").read_bytes()


def test_device_sharded_run_parity(sim_data, golden_dir, tmp_path):
    """--num-shards + --device: each host shard maps its slice with
    device chunks, spills a sorted shard, and the k-way merge equals the
    single-run golden (the multi-host configuration with chips on every
    host)."""
    d = sim_data
    out = tmp_path / "sharded_dev.bed"
    base = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq",
            "-o", str(out)] + DEVICE_ARGS
    for i in range(2):
        res = subprocess.run(base + ["--num-shards", "2",
                                     "--shard-index", str(i)],
                             capture_output=True, text=True)
        assert res.returncode == 0, res.stderr
        assert "Using TPU device seeding" in res.stderr, res.stderr
    res = subprocess.run(
        base + ["--merge-shards",
                f"{out}.shard0.temp0,{out}.shard1.temp0"],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    assert out.read_bytes() == (golden_dir / "sim_default.bed").read_bytes()


def test_device_threads_parity(sim_data, golden_dir, tmp_path):
    """-t N with --device: the device-seeded finish stage fans record
    emission out over threads (engine.cpp select_prep/draw/emit) while
    the reservoir stream stays ordered, so output must stay
    byte-identical to -t 1 --device -- and to the host golden."""
    outs = {}
    for t in ("1", "3"):
        out = tmp_path / f"t{t}.bed"
        args = [sys.executable, "-m", "chromap_tpu.cli", "-t", t,
                "-n", "4",
                "-x", f"{sim_data}/index", "-r", f"{sim_data}/ref.fa",
                "-1", f"{sim_data}/r1.fq", "-2", f"{sim_data}/r2.fq",
                "-o", str(out)] + DEVICE_ARGS
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        outs[t] = out.read_bytes()
    assert outs["1"] == outs["3"]
    assert outs["1"], "no mappings produced"


def test_device_failure_falls_back(sim_data, tmp_path, monkeypatch):
    """A device dispatch failure mid-run (kernel compile error, relay
    drop) must degrade to host-only mapping with byte-identical output,
    not crash: the failed chunk's raw reads are still buffered and map
    on the host like any ineligible chunk."""
    from dataclasses import replace

    from chromap_tpu.config import MappingConfig
    from chromap_tpu.pipeline import MappingPipeline
    from chromap_tpu.ops import device_seed

    calls = {"n": 0}
    origs = {}  # the CPU mesh has 8 virtual devices, so MeshSeeder runs

    def make_flaky(orig):
        def flaky(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("injected device failure")
            return orig(self, *a, **kw)
        return flaky

    for cls in (device_seed.DeviceSeeder, device_seed.MeshSeeder):
        origs[cls] = cls.__dict__.get("submit_packed")
        if origs[cls] is not None:
            monkeypatch.setattr(cls, "submit_packed",
                                make_flaky(origs[cls]))

    d = sim_data
    cfg = MappingConfig(
        reference_file_path=f"{d}/ref.fa",
        index_file_path=f"{d}/index",
        read_file1_paths=[f"{d}/r1.fq"],
        read_file2_paths=[f"{d}/r2.fq"],
        mapping_output_file_path=str(tmp_path / "flaky.bed"),
        use_device=True, device_batch_size=512)
    MappingPipeline(cfg).map_paired_end()
    assert calls["n"] >= 2, "device path never engaged"

    for cls, orig in origs.items():
        if orig is not None:
            monkeypatch.setattr(cls, "submit_packed", orig)
    host_cfg = replace(cfg, use_device=False,
                       mapping_output_file_path=str(tmp_path / "host.bed"))
    MappingPipeline(host_cfg).map_paired_end()
    assert (tmp_path / "flaky.bed").read_bytes() == \
        (tmp_path / "host.bed").read_bytes()


def test_device_parity_cache_active(sim_data, tmp_path):
    """Duplicate-heavy input activates the candidate cache (slots need
    >= 10 same-sketch updates + weight voting). mmcache hits are only
    APPROXIMATELY equal to fresh candidate generation (mmcache.hpp:
    119-185 shifts cached candidates; identical minimizer chains do not
    imply identical read bases), so output on cache-active data depends
    on which reads hit the cache -- and would leak the hybrid
    scheduler's adaptive chunk assignment into the output. --device
    therefore forces the cache OFF (pipeline logs it), making the run
    deterministic and byte-equal to a host --no-cache run, which is
    what this pins on cache-active data."""
    d = sim_data
    # amplify duplicates: repeat a 200-pair subset 30x
    import itertools
    def amplify(src, dst):
        with open(src) as f:
            lines = f.read().splitlines()
        recs = [lines[i:i + 4] for i in range(0, min(len(lines), 800), 4)]
        with open(dst, "w") as f:
            n = 0
            for rep in range(30):
                for r in recs:
                    f.write(f"@dup{n}\n{r[1]}\n+\n{r[3]}\n")
                    n += 1
    amplify(f"{d}/r1.fq", tmp_path / "dup1.fq")
    amplify(f"{d}/r2.fq", tmp_path / "dup2.fq")
    outs = {}
    for tag, extra in (("host", ["--no-cache"]), ("cached", []),
                       ("dev", DEVICE_ARGS)):
        out = tmp_path / f"cache_{tag}.bed"
        # small batches so updates from earlier batches hit in later ones
        # (verified: ~4000 cache hits on this input at batch size 1000)
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "--read-batch-size", "1000",
                "-x", f"{d}/index", "-r", f"{d}/ref.fa",
                "-1", str(tmp_path / "dup1.fq"),
                "-2", str(tmp_path / "dup2.fq"),
                "-o", str(out)] + extra
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        outs[tag] = out.read_bytes()
    assert outs["dev"] == outs["host"]
    assert outs["host"], "no mappings produced"
    # the cache-ON host run must still produce the same mapped SET here
    # (cache effects on this data stay within tie-breaking), and the
    # line counts must agree -- a sanity pin that --no-cache did not
    # change the mapping substance
    assert outs["cached"].count(b"\n") == outs["host"].count(b"\n")
