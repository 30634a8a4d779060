#!/usr/bin/env python
"""Randomized differential campaign vs the reference chromap binary.

Generates fresh random datasets (varying error profiles, genome sizes,
seeds) and byte-compares this framework's CLI output against the
reference binary (/tmp/refbuild/chromap by default) across a flag
matrix: plain BED, dedup, Tn5, low-mem, TagAlign, PAF, SAM, Hi-C pairs,
single-end. Stronger than the frozen-golden suite: every run exercises
new random tie/N/indel cases.

Usage: python tools/differential_fuzz.py [num_rounds] [start_seed]
Prints one line per case; exits nonzero on the first mismatch, keeping
the dataset for debugging.
"""

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

REF_BIN = os.environ.get("CHROMAP_REF_BIN", "/tmp/refbuild/chromap")

CASES = [
    ("bed", ["--BED", "-l", "2000"], False),
    ("bed_dedup_tn5",
     ["--BED", "-l", "2000", "--remove-pcr-duplicates", "--Tn5-shift"],
     False),
    ("bed_lowmem",
     ["--BED", "-l", "2000", "--remove-pcr-duplicates", "--low-mem"],
     False),
    ("tagalign", ["--TagAlign", "-l", "2000"], False),
    ("paf", ["--PAF", "-l", "2000"], False),
    ("sam", ["--SAM", "-l", "2000"], False),
    ("hic", ["--preset", "hic"], False),
    ("se_bed", ["--BED"], True),
    ("se_tn5", ["--BED", "--Tn5-shift", "--remove-pcr-duplicates",
                "-q", "0"], True),
    # barcoded (scATAC) fragments: whitelist + correction + cell dedup
    ("bc_bed", ["--BED", "-l", "2000", "-b", "{d}/bc.fq",
                "--barcode-whitelist", "{d}/whitelist.txt",
                "--remove-pcr-duplicates", "--Tn5-shift"], False),
    ("bc_lowmem", ["--BED", "-l", "2000", "-b", "{d}/bc.fq",
                   "--barcode-whitelist", "{d}/whitelist.txt",
                   "--remove-pcr-duplicates", "--low-mem"], False),
]


def run_case(d, name, flags, single_end):
    flags = [a.format(d=d) for a in flags]
    reads = ["-1", f"{d}/r1.fq"]
    if not single_end:
        reads += ["-2", f"{d}/r2.fq"]
    ref_cmd = ([REF_BIN, "-x", f"{d}/ref.index", "-r", f"{d}/ref.fa"]
               + reads + ["-o", f"{d}/ref_{name}.out"] + flags)
    our_argv = (["-x", f"{d}/our.index", "-r", f"{d}/ref.fa"]
                + reads + ["-o", f"{d}/our_{name}.out"] + flags)
    try:
        # the reference preallocates GBs; on this VM's slow page-fault
        # phases a run can take minutes -- skip rather than hang
        r = subprocess.run(ref_cmd, capture_output=True, text=True,
                           timeout=int(os.environ.get(
                               "CHROMAP_FUZZ_REF_TIMEOUT", "240")))
    except subprocess.TimeoutExpired:
        return "SKIP (reference timed out; slow box phase)"
    if r.returncode != 0:
        return f"SKIP (reference failed: {r.stderr.splitlines()[-1:]})"
    # in-process: one jax/module import for the whole campaign
    import contextlib
    import io
    from chromap_tpu.cli import parse_args_and_run
    err = io.StringIO()
    try:
        with contextlib.redirect_stderr(err):
            rc = parse_args_and_run(our_argv)
    except SystemExit as e:
        rc = e.code or 0
    except Exception as e:
        return f"OURS-FAILED: {e!r}"
    if rc not in (0, None):
        return f"OURS-FAILED: rc={rc} {err.getvalue()[-300:]}"
    a = open(f"{d}/ref_{name}.out", "rb").read()
    b = open(f"{d}/our_{name}.out", "rb").read()
    if name == "sam":
        # the @PG line differs by definition (program name/CL); compare
        # the records and the @SQ header
        a = b"\n".join(l for l in a.split(b"\n") if not l.startswith(b"@PG"))
        b = b"\n".join(l for l in b.split(b"\n") if not l.startswith(b"@PG"))
    return "MATCH" if a == b else "MISMATCH"


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    from simulate import write_simulated_dataset

    ok = True
    for rnd in range(rounds):
        seed = seed0 + rnd
        d = f"/tmp/diff_fuzz_{seed}"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        # vary the generator knobs with the seed
        write_simulated_dataset(
            d, num_pairs=600 + (seed % 5) * 300, seed=seed,
            max_mismatches=1 + seed % 4, indel_rate=(seed % 6) * 0.01,
            genome_core=200_000 + (seed % 3) * 400_000)
        from simulate import write_simulated_barcodes
        write_simulated_barcodes(d, num_pairs=600 + (seed % 5) * 300)
        subprocess.run([REF_BIN, "-i", "-r", f"{d}/ref.fa",
                        "-o", f"{d}/ref.index"], check=True,
                       capture_output=True, timeout=600)
        import contextlib
        import io
        from chromap_tpu.cli import parse_args_and_run
        with contextlib.redirect_stderr(io.StringIO()):
            parse_args_and_run(["-i", "-r", f"{d}/ref.fa",
                                "-o", f"{d}/our.index"])
        for name, flags, se in CASES:
            res = run_case(d, name, flags, se)
            print(f"seed={seed} {name}: {res}", flush=True)
            if res.startswith(("MISMATCH", "OURS-FAILED")):
                print(f"kept dataset at {d}")
                ok = False
                return 1
        shutil.rmtree(d, ignore_errors=True)
    print(f"{rounds} rounds x {len(CASES)} cases: all MATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
