"""Block FASTQ fast-parser edge semantics: the batched reader must equal
the per-line parser (kseq semantics, sequence_batch.cc:10-59) exactly --
names truncated at whitespace, cumulative read ids across files, gzip,
missing trailing newline, and graceful fallback for FASTA / CR endings /
blank lines."""

import gzip

import pytest

from chromap_tpu.io.fastx import FastxReader, MultiFileFastxStream


def _slow_all(path):
    r = FastxReader(path)
    out = []
    while True:
        rec = r._read_one_slow()
        if rec is None:
            return out
        out.append(rec)


def _fast_all(path, chunk=3):
    s = MultiFileFastxStream([path], None)
    out = []
    while True:
        b = s.read_batch(chunk)
        if not b:
            return out
        out.extend(b)


def _assert_equal(fast, slow):
    assert len(fast) == len(slow)
    for a, b in zip(fast, slow):
        assert a.name == b.name
        assert bytes(a.seq) == bytes(b.seq)
        assert (a.qual is None) == (b.qual is None)
        if a.qual is not None:
            assert bytes(a.qual) == bytes(b.qual)
        assert a.read_id == b.read_id


CASES = {
    "plain": b"@r1 c1\nACGT\n+\nIIII\n@r2\tc2\nGGCC\n+\nJJJJ\n",
    "no_trailing_newline": b"@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\nJJJJ",
    "blank_lines": b"@r1\nACGT\n+\nIIII\n\n@r2\nGGCC\n+\nJJJJ\n",
    "empty_seq_skipped": b"@r0\n\n+\n\n@r1\nACGT\n+\nIIII\n",
    "cr_endings": b"@r1\r\nACGT\r\n+\r\nIIII\r\n",
    "fasta": b">s1 desc\nACGTACGT\nGGCC\n>s2\nTTTT\n",
    "plus_with_name": b"@r1\nACGT\n+r1\nIIII\n",
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_fast_parser_matches_slow(case, tmp_path):
    p = tmp_path / f"{case}.fq"
    p.write_bytes(CASES[case])
    _assert_equal(_fast_all(str(p)), _slow_all(str(p)))


def test_multifile_ids_and_gzip(tmp_path):
    a = tmp_path / "a.fq"
    a.write_bytes(b"@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\nJJJJ\n")
    b = tmp_path / "b.fq.gz"
    with gzip.open(b, "wb") as f:
        f.write(b"@r3\nTTAA\n+\nKKKK\n")
    s = MultiFileFastxStream([str(a), str(b)], None)
    recs = s.read_batch(100)
    assert [r.name for r in recs] == [b"r1", b"r2", b"r3"]
    assert [r.read_id for r in recs] == [0, 1, 2]
    assert s.read_batch(10) == []


def test_block_boundary_records(tmp_path):
    """Records cut at the block edge carry over intact: force a tiny
    block size so every record spans blocks."""
    p = tmp_path / "many.fq"
    blob = b"".join(b"@read%d x\nACGTACGTAC\n+\nIIIIIIIIII\n" % i
                    for i in range(500))
    p.write_bytes(blob)
    old = FastxReader._BLOCK
    FastxReader._BLOCK = 97
    try:
        fast = _fast_all(str(p), chunk=7)
    finally:
        FastxReader._BLOCK = old
    slow = _slow_all(str(p))
    _assert_equal(fast, slow)
