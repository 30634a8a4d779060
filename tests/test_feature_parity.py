"""Round-2 feature-surface parity vs reference-binary goldens.

Covers the previously untested surface: --chr-order (BED + pairs with
--pairs-natural-chr-order), adapter-trimmed PAF/SAM (incl. the atac
preset's low-memory SAM), barcoded PAF/SAM/pairs, --barcode-translate,
--read-format slices (incl. minus-strand barcode), and gzip inputs through
the native reader. Goldens were produced by the reference chromap binary
(0.3.3-r521) on exactly these simulated files (see tests/simulate.py).
"""

import gzip
import shutil
import subprocess
import sys

import pytest
sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))

from simulate import (write_simulated_dataset, write_simulated_barcodes,
                      write_simulated_multichrom_dataset,
                      write_barcode_translate_table)


def _index(d):
    args = [sys.executable, "-m", "chromap_tpu.cli", "-i",
            "-r", f"{d}/ref.fa", "-o", f"{d}/index"]
    subprocess.run(args, check=True, capture_output=True)


@pytest.fixture(scope="module")
def mc_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("simmc")
    write_simulated_multichrom_dataset(str(d))
    _index(d)
    return d


@pytest.fixture(scope="module")
def sc_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("simsc")
    write_simulated_dataset(str(d))
    write_simulated_barcodes(str(d))
    write_barcode_translate_table(str(d))
    _index(d)
    return d


def _run_and_compare(d, golden_dir, tmp_path, golden, extra, engine):
    out = tmp_path / f"{engine}_{golden}"
    args = [sys.executable, "-m", "chromap_tpu.cli", "--engine", engine,
            "-x", f"{d}/index", "-r", f"{d}/ref.fa",
            "-1", f"{d}/r1.fq", "-2", f"{d}/r2.fq",
            "-o", str(out)] + extra
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == (golden_dir / golden).read_bytes(), \
        f"{golden} differs under engine={engine}"


MC_CASES = [
    ("sim_chrorder.bed", ["--chr-order", "{d}/chr_order.txt"],
     ["auto", "per_read"]),
    ("sim_chrorder.pairs",
     ["--preset", "hic", "--chr-order", "{d}/chr_order.txt",
      "--pairs-natural-chr-order", "{d}/chr_order2.txt"],
     ["auto", "per_read"]),
    ("sim_flip.pairs",
     ["--preset", "hic", "--pairs-natural-chr-order", "{d}/chr_order2.txt"],
     ["auto"]),
]


@pytest.mark.parametrize("golden,extra,engines", MC_CASES,
                         ids=[c[0] for c in MC_CASES])
def test_chr_order_parity(golden, extra, engines, mc_data, golden_dir,
                          tmp_path):
    for engine in engines:
        _run_and_compare(mc_data, golden_dir, tmp_path, golden,
                         [a.format(d=mc_data) for a in extra], engine)


SC_CASES = [
    ("sim_trim.paf", ["--trim-adapters", "--PAF"], ["auto", "per_read"]),
    ("sim_atac.sam", ["--preset", "atac", "--SAM"], ["auto"]),
    ("sim_atac.bed", ["--preset", "atac"], ["auto"]),
    ("sim_bc.paf", ["--PAF", "-b", "{d}/bc.fq",
                    "--barcode-whitelist", "{d}/whitelist.txt"],
     ["auto", "per_read"]),
    ("sim_bc.sam", ["--SAM", "-b", "{d}/bc.fq",
                    "--barcode-whitelist", "{d}/whitelist.txt"], ["auto"]),
    ("sim_bc.pairs", ["--preset", "hic", "-b", "{d}/bc.fq",
                      "--barcode-whitelist", "{d}/whitelist.txt"], ["auto"]),
    ("sim_bc_translate.bed",
     ["-b", "{d}/bc.fq", "--barcode-whitelist", "{d}/whitelist.txt",
      "--barcode-translate", "{d}/translate.csv",
      "--remove-pcr-duplicates"], ["auto"]),
    # bc:0:7 shortens barcodes below the whitelist length (the reference
    # aborts on that combination), so the read-format runs go unwhitelisted
    ("sim_readformat.bed",
     ["-b", "{d}/bc.fq",
      "--read-format", "r1:5:84,r2:0:79,bc:0:7"], ["auto"]),
    ("sim_readformat_minus.bed",
     ["-b", "{d}/bc.fq", "--read-format", "bc:0:15:-"], ["auto"]),
]


@pytest.mark.parametrize("golden,extra,engines", SC_CASES,
                         ids=[c[0] for c in SC_CASES])
def test_feature_parity(golden, extra, engines, sc_data, golden_dir,
                        tmp_path):
    for engine in engines:
        _run_and_compare(sc_data, golden_dir, tmp_path, golden,
                         [a.format(d=sc_data) for a in extra], engine)


def test_gzip_inputs(sc_data, golden_dir, tmp_path):
    """gzip FASTQ through the native reader matches the plain-file run
    (the reference accepts both transparently; sequence_batch.cc:10)."""
    for f in ("r1.fq", "r2.fq"):
        gz = f"{sc_data}/{f}.gz"
        import os
        if not os.path.exists(gz):
            with open(f"{sc_data}/{f}", "rb") as fin, \
                    gzip.open(gz, "wb", compresslevel=4) as fout:
                shutil.copyfileobj(fin, fout)
    out = tmp_path / "gz.bed"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
            "-1", f"{sc_data}/r1.fq.gz", "-2", f"{sc_data}/r2.fq.gz",
            "-o", str(out)]
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == (golden_dir / "sim_default.bed").read_bytes()


def test_forced_lowmem_spill(sc_data, golden_dir, tmp_path):
    """--low-mem with a tiny spill budget (forces many temp shards) is
    byte-identical to the in-memory run (temp_mapping.h:21-105 analog)."""
    import os
    out = tmp_path / "lowmem.bed"
    env = dict(os.environ, CHROMAP_TPU_LOWMEM_MAX_RECORDS="500")
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
            "-1", f"{sc_data}/r1.fq", "-2", f"{sc_data}/r2.fq",
            "--low-mem", "-o", str(out)]
    result = subprocess.run(args, capture_output=True, text=True, env=env)
    assert result.returncode == 0, result.stderr
    assert out.read_bytes() == (golden_dir / "sim_default.bed").read_bytes()


def test_forced_lowmem_spill_single_end(sc_data, tmp_path):
    """Single-end --low-mem with many forced shards (SE array spill +
    native k-way merge) equals the single-shard low-mem run. (SE low-mem
    output legitimately differs from the in-memory run under --Tn5-shift:
    the merge dedups on unshifted starts and shifts at write,
    mapping_writer.h:281-301, while the in-memory path shifts first --
    and the SE shift is strand-dependent.)"""
    import os
    outs = {}
    for mode, records in (("multi", "500"), ("single", None)):
        out = tmp_path / f"se_{mode}.bed"
        env = dict(os.environ)
        if records:
            env["CHROMAP_TPU_LOWMEM_MAX_RECORDS"] = records
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
                "-1", f"{sc_data}/r1.fq", "--Tn5-shift",
                "--remove-pcr-duplicates", "-q", "0",
                "--low-mem", "-o", str(out)]
        result = subprocess.run(args, capture_output=True, text=True,
                                env=env)
        assert result.returncode == 0, result.stderr
        outs[mode] = out.read_bytes()
    assert outs["multi"] == outs["single"]


def test_forced_lowmem_spill_barcoded(sc_data, tmp_path):
    """Barcoded --low-mem with many forced shards (native k-way merge,
    bulk-level best-duplicate selection, per-barcode summary) is
    byte-identical to the in-memory run, and the summary CSVs agree."""
    import os
    env = dict(os.environ, CHROMAP_TPU_LOWMEM_MAX_RECORDS="500")
    outs = {}
    for mode, extra, e in (("mem", [], None), ("lowmem", ["--low-mem"], env)):
        out = tmp_path / f"{mode}.bed"
        csv = tmp_path / f"{mode}.csv"
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
                "-1", f"{sc_data}/r1.fq", "-2", f"{sc_data}/r2.fq",
                "-b", f"{sc_data}/bc.fq",
                "--barcode-whitelist", f"{sc_data}/whitelist.txt",
                "--remove-pcr-duplicates", "--Tn5-shift", "-l", "2000",
                "--summary", str(csv), "-o", str(out)] + extra
        result = subprocess.run(args, capture_output=True, text=True,
                                env=e)
        assert result.returncode == 0, result.stderr
        outs[mode] = (out.read_bytes(),
                      sorted(csv.read_text().splitlines()))
    assert outs["mem"][0] == outs["lowmem"][0]
    assert outs["mem"][1] == outs["lowmem"][1]


def test_forced_lowmem_spill_pairs(sc_data, tmp_path):
    """Hi-C pairs --low-mem with many forced shards (native tag-6 k-way
    merge, append after the Python-written header) equals the
    single-shard low-mem run."""
    import os
    outs = {}
    for mode, records in (("multi", "400"), ("single", None)):
        out = tmp_path / f"pairs_{mode}.pairs"
        env = dict(os.environ)
        if records:
            env["CHROMAP_TPU_LOWMEM_MAX_RECORDS"] = records
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "--preset", "hic",
                "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
                "-1", f"{sc_data}/r1.fq", "-2", f"{sc_data}/r2.fq",
                "-o", str(out)]
        result = subprocess.run(args, capture_output=True, text=True,
                                env=env)
        assert result.returncode == 0, result.stderr
        assert "per-record merge" not in result.stderr, result.stderr
        outs[mode] = out.read_bytes()
    assert outs["multi"] == outs["single"]


def test_feature_barcode_matrix(sc_data, golden_dir, tmp_path):
    """scATAC feature-barcode matrix (--matrix-output-prefix): peaks,
    MatrixMarket counts and barcode list against frozen goldens. The
    reference ships this subsystem disabled (chromap.h:1356-1374), so the
    goldens freeze this repo's own documented format."""
    prefix = tmp_path / "mtx"
    out = tmp_path / "mtx.bed"
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
            "-1", f"{sc_data}/r1.fq", "-2", f"{sc_data}/r2.fq",
            "-b", f"{sc_data}/bc.fq",
            "--barcode-whitelist", f"{sc_data}/whitelist.txt",
            "--remove-pcr-duplicates",
            "--matrix-output-prefix", str(prefix), "-o", str(out)]
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    for suffix, golden in (("_matrix.mtx", "sim_matrix.mtx"),
                           ("_peaks.bed", "sim_matrix_peaks.bed"),
                           ("_barcode.tsv", "sim_matrix_barcode.tsv")):
        got = (tmp_path / f"mtx{suffix}").read_bytes()
        assert got == (golden_dir / golden).read_bytes(), suffix


SE_BC_CASES = [
    ("sim_se_bc.sam", ["--SAM"], ["auto", "per_read"]),
    ("sim_se_bc.paf", ["--PAF"], ["auto"]),
]


@pytest.mark.parametrize("golden,extra,engines", SE_BC_CASES,
                         ids=[c[0] for c in SE_BC_CASES])
def test_se_barcoded_records_parity(golden, extra, engines, sc_data,
                                    golden_dir, tmp_path):
    """Barcoded single-end SAM/PAF through the native engine (whitelist
    prefilter + CB-carrying records) vs reference-binary goldens."""
    for engine in engines:
        out = tmp_path / f"{engine}_{golden}"
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "--engine", engine,
                "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
                "-1", f"{sc_data}/r1.fq", "-b", f"{sc_data}/bc.fq",
                "--barcode-whitelist", f"{sc_data}/whitelist.txt",
                "-o", str(out)] + extra
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        assert out.read_bytes() == (golden_dir / golden).read_bytes(), \
            f"{golden} differs under engine={engine}"


def test_se_barcoded_summary_engine_invariance(sc_data, tmp_path):
    """Barcoded single-end run with --summary: the native engine and the
    exact per-read engine agree on the fragments byte-for-byte and on the
    per-barcode summary CSV as a set (barcode order is engine-defined)."""
    outs = {}
    for engine in ("auto", "per_read"):
        out = tmp_path / f"{engine}.bed"
        csv = tmp_path / f"{engine}.csv"
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "--engine", engine,
                "-x", f"{sc_data}/index", "-r", f"{sc_data}/ref.fa",
                "-1", f"{sc_data}/r1.fq", "-b", f"{sc_data}/bc.fq",
                "--barcode-whitelist", f"{sc_data}/whitelist.txt",
                "--remove-pcr-duplicates", "--summary", str(csv),
                "-o", str(out)]
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        outs[engine] = (out.read_bytes(),
                        sorted(csv.read_text().splitlines()))
    assert outs["auto"][0] == outs["per_read"][0]
    assert outs["auto"][1] == outs["per_read"][1]
