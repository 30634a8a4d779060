"""Parity on a 5000-pair simulated dataset (indels, repeats, Ns) against
goldens produced by the reference chromap binary, for both engines.

Covers: mate rescue supplementation, paired candidate reduction, SIMD-group
verification order, PCR dedup, mt19937 reservoir sampling (-n 3) and
discrete_distribution multi-mapping allocation.
"""

import subprocess
import sys

import pytest
sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))

from simulate import write_simulated_dataset


@pytest.fixture(scope="module")
def sim_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim")
    write_simulated_dataset(str(d))
    args = [sys.executable, "-m", "chromap_tpu.cli", "-i",
            "-r", f"{d}/ref.fa", "-o", f"{d}/index"]
    subprocess.run(args, check=True, capture_output=True)
    return d


CASES = [
    ("sim_default.bed", [], ["batch", "per_read"]),
    ("sim_se.bed", ["--se"], ["auto", "per_read"]),
    ("sim_se_tn5.bed", ["--se", "--Tn5-shift", "--remove-pcr-duplicates",
                        "-q", "0"], ["auto"]),
    ("sim_chip.bed", ["-l", "2000", "--remove-pcr-duplicates"], ["batch"]),
    ("sim_n3.bed", ["-n", "3", "-q", "0"], ["batch"]),
    ("sim_alloc.bed", ["--allocate-multi-mappings", "-q", "0"], ["batch"]),
    ("sim_pe.sam", ["--SAM"], ["auto", "per_read"]),
    ("sim_pe.paf", ["--PAF"], ["auto"]),
    ("sim_hic.pairs", ["--preset", "hic"], ["auto", "per_read"]),
]


@pytest.mark.parametrize("golden,extra,engines", CASES,
                         ids=[c[0] for c in CASES])
def test_sim_parity(golden, extra, engines, sim_data, golden_dir, tmp_path):
    for engine in engines:
        out = tmp_path / f"{engine}_{golden}"
        single_end = "--se" in extra
        extra_args = [a for a in extra if a != "--se"]
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "--engine", engine,
                "-x", f"{sim_data}/index", "-r", f"{sim_data}/ref.fa",
                "-1", f"{sim_data}/r1.fq",
                "-o", str(out)] + extra_args
        if not single_end:
            args[args.index("-1") + 2:args.index("-1") + 2] = [
                "-2", f"{sim_data}/r2.fq"]
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        assert out.read_bytes() == (golden_dir / golden).read_bytes(), \
            f"{golden} differs under engine={engine}"


@pytest.fixture(scope="module")
def sim_bc_data(sim_data):
    from simulate import write_simulated_barcodes
    write_simulated_barcodes(str(sim_data))
    return sim_data


@pytest.mark.parametrize("engine", ["auto", "per_read"])
def test_sim_se_barcode_parity(engine, sim_bc_data, golden_dir, tmp_path):
    """Single-end scATAC flow vs the reference golden (cell-level dedup
    with barcodes; regression for the full-native gate that silently
    dropped barcodes)."""
    d = sim_bc_data
    out = tmp_path / f"sebc_{engine}.bed"
    args = [sys.executable, "-m", "chromap_tpu.cli", "--engine", engine,
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-b", f"{d}/bc.fq",
            "--barcode-whitelist", f"{d}/whitelist.txt",
            "--remove-pcr-duplicates", "-o", str(out)]
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == \
        (golden_dir / "sim_se_barcode.bed").read_bytes()


@pytest.mark.parametrize("engine", ["auto", "per_read"])
def test_sim_barcode_parity(engine, sim_bc_data, golden_dir, tmp_path):
    """scATAC flow vs the reference binary's golden: barcode correction
    (1-substitution incl. N bases), whitelisting, cell-level dedup, Tn5,
    fragment output, and the per-barcode summary CSV. The BED is
    byte-identical; the CSV is compared as a set (the reference emits
    barcodes in khash iteration order, which is implementation-defined)."""
    d = sim_bc_data
    out = tmp_path / f"bc_{engine}.bed"
    summary = tmp_path / f"bc_{engine}.csv"
    args = [sys.executable, "-m", "chromap_tpu.cli", "--engine", engine,
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq", "-b", f"{d}/bc.fq",
            "--barcode-whitelist", f"{d}/whitelist.txt",
            "--remove-pcr-duplicates", "--Tn5-shift", "-l", "2000",
            "--summary", str(summary), "-o", str(out)]
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == (golden_dir / "sim_barcode.bed").read_bytes()
    ours = sorted(summary.read_text().splitlines())
    golden = sorted(
        (golden_dir / "sim_barcode_summary.csv").read_text().splitlines())
    assert ours == golden
