"""End-to-end byte parity against committed reference-chromap outputs.

Golden files were produced by the reference binary (haowenz/chromap
0.3.3-r521) on its bundled test data for each preset/format combination.
"""

import subprocess
import sys

import pytest

CASES = [
    ("se.bed", ["-1", "{r1}"]),
    ("pe.bed", ["-1", "{r1}", "-2", "{r2}"]),
    ("atac-equiv.bed", ["-l", "2000", "--trim-adapters",
                        "--remove-pcr-duplicates", "--Tn5-shift", "--BED",
                        "-1", "{r1}", "-2", "{r2}"]),
    ("chip-equiv.bed", ["-l", "2000", "--remove-pcr-duplicates", "--BED",
                        "-1", "{r1}", "-2", "{r2}"]),
    ("pe.tagalign", ["--TagAlign", "-1", "{r1}", "-2", "{r2}"]),
    ("se.paf", ["--PAF", "-1", "{r1}"]),
    ("pe.paf", ["--PAF", "-1", "{r1}", "-2", "{r2}"]),
    ("hic.pairs", ["-e", "4", "-q", "1", "--split-alignment", "--pairs",
                   "-1", "{r1}", "-2", "{r2}"]),
    ("se.sam", ["--SAM", "-1", "{r1}"]),
    ("pe.sam", ["--SAM", "-1", "{r1}", "-2", "{r2}"]),
]


@pytest.mark.parametrize("golden_name,extra_args",
                         CASES, ids=[c[0] for c in CASES])
def test_output_parity(golden_name, extra_args, data_dir, golden_dir,
                       test_index, tmp_path):
    r1 = str(data_dir / "read1.fq")
    r2 = str(data_dir / "read2.fq")
    out = tmp_path / golden_name
    args = [sys.executable, "-m", "chromap_tpu.cli",
            "-x", test_index, "-r", str(data_dir / "ref.fa"),
            "-o", str(out)]
    args += [a.format(r1=r1, r2=r2) for a in extra_args]
    result = subprocess.run(args, capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    expected = (golden_dir / golden_name).read_bytes()
    actual = out.read_bytes()
    assert actual == expected, (
        f"{golden_name}: output differs from reference golden\n"
        f"stderr:\n{result.stderr}")


def test_wide_band_native_parity(data_dir, test_index, tmp_path):
    """e=20 engages the 64-bit-band native scalar kernels (2e+1 = 41 band
    bits; the reference's SIMD-only kernels stop at e < 16). The native
    run must byte-match the exact per-read engine."""
    r1 = str(data_dir / "read1.fq")
    r2 = str(data_dir / "read2.fq")
    outs = {}
    for engine in ("auto", "per_read"):
        out = tmp_path / f"e20_{engine}.bed"
        args = [sys.executable, "-m", "chromap_tpu.cli",
                "--engine", engine, "-e", "20",
                "-x", test_index, "-r", str(data_dir / "ref.fa"),
                "-1", r1, "-2", r2, "-o", str(out)]
        result = subprocess.run(args, capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        if engine == "auto":
            assert "Using native host engine." in result.stderr
        outs[engine] = out.read_bytes()
    assert outs["auto"] == outs["per_read"]
    assert outs["auto"], "e=20 run produced no mappings"
