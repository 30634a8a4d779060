"""Streaming FASTA/FASTQ(.gz) reader producing host-side read batches.

Replaces the reference's kseq-based SequenceBatch (sequence_batch.{h,cc}).
Read names are truncated at the first whitespace (kseq semantics). Records
with zero-length sequences are skipped (sequence_batch.cc:27-29).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from ..utils import encode_sequence, reverse_complement_ascii
from .seqformat import EffectiveRange


def _open_text_auto(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")
    return f


@dataclass(slots=True)
class SequenceRecord:
    """One parsed sequence with its (effective-range-rewritten) bases."""

    name: bytes
    seq: bytearray
    qual: Optional[bytearray]
    read_id: int  # cumulative id across the whole stream

    _codes: Optional[np.ndarray] = field(default=None, repr=False)
    _negative: Optional[bytes] = field(default=None, repr=False)
    _neg_codes: Optional[np.ndarray] = field(default=None, repr=False)

    @property
    def length(self) -> int:
        return len(self.seq)

    def codes(self) -> np.ndarray:
        if self._codes is None or len(self._codes) != len(self.seq):
            self._codes = encode_sequence(bytes(self.seq))
        return self._codes

    def negative_codes(self) -> np.ndarray:
        if self._neg_codes is None or len(self._neg_codes) != len(self.seq):
            self._neg_codes = encode_sequence(self.negative())
        return self._neg_codes

    def negative(self) -> bytes:
        """Reverse complement of the current sequence (lazily cached)."""
        if self._negative is None or len(self._negative) != len(self.seq):
            self._negative = reverse_complement_ascii(bytes(self.seq))
        return self._negative

    def prepare_negative(self) -> None:
        self._negative = reverse_complement_ascii(bytes(self.seq))

    def trim_to(self, length_after_trim: int) -> None:
        """In-place 3' trim keeping the first `length_after_trim` bases."""
        if length_after_trim >= len(self.seq):
            return
        drop = len(self.seq) - length_after_trim
        if self._negative is not None:
            self._negative = self._negative[drop:]
        del self.seq[length_after_trim:]
        if self.qual is not None:
            del self.qual[length_after_trim:]
        self._codes = None

    def correct_base(self, position: int, base: int) -> None:
        self.seq[position] = base
        self._codes = None
        self._negative = None
        self._neg_codes = None


class FastxReader:
    """Parses FASTA/FASTQ records one at a time, applying an effective range."""

    def __init__(self, path: str, effective_range: Optional[EffectiveRange] = None,
                 id_offset: int = 0):
        self._path = path
        self._range = effective_range or EffectiveRange.full()
        self._fh = _open_text_auto(path)
        self._buf = io.BufferedReader(self._fh) if not isinstance(
            self._fh, io.BufferedReader) else self._fh
        self._pending: Optional[bytes] = None
        self._next_id = id_offset
        # block-parser state (see read_batch): records parsed ahead, an
        # unconsumed raw remainder, and a flag that pins the slow path
        # (FASTA, CR line endings, structural surprises)
        self._ready: List[SequenceRecord] = []
        self._ready_pos = 0
        self._tail = b""
        self._tail_pos = 0
        self._fast_off = False
        self._eof = False

    def close(self) -> None:
        self._fh.close()

    def _readline(self) -> bytes:
        if self._pending is not None:
            line, self._pending = self._pending, None
            return line
        if self._tail_pos < len(self._tail):
            # drain the block remainder stashed by a fast-path bailout
            nl = self._tail.find(b"\n", self._tail_pos)
            if nl >= 0:
                line = self._tail[self._tail_pos:nl + 1]
                self._tail_pos = nl + 1
                return line
            line = self._tail[self._tail_pos:] + self._buf.readline()
            self._tail = b""
            self._tail_pos = 0
            return line
        return self._buf.readline()

    def _pushback(self, line: bytes) -> None:
        self._pending = line

    def read_one(self) -> Optional[SequenceRecord]:
        if self._ready_pos < len(self._ready):
            rec = self._ready[self._ready_pos]
            self._ready_pos += 1
            return rec
        return self._read_one_slow()

    def read_batch(self, n: int) -> List[SequenceRecord]:
        """Batch read with a block FASTQ fast path (plain 4-line records,
        LF endings); FASTA and unusual layouts fall back to the per-line
        parser with identical semantics."""
        out: List[SequenceRecord] = []
        while len(out) < n:
            avail = len(self._ready) - self._ready_pos
            if avail:
                take = min(avail, n - len(out))
                out.extend(
                    self._ready[self._ready_pos:self._ready_pos + take])
                self._ready_pos += take
                continue
            if self._fill_ready():
                continue
            rec = self._read_one_slow()
            if rec is None:
                break
            out.append(rec)
        return out

    _BLOCK = 1 << 22

    def _fill_ready(self) -> bool:
        """Parse one block of FASTQ records ahead into self._ready.
        Returns False when the fast path is unavailable (pushback pending,
        FASTA/CR/malformed layout -- the remainder is stashed for the slow
        parser) or at EOF with nothing parsed."""
        if self._fast_off or self._pending is not None or self._eof:
            return False
        tail = self._tail[self._tail_pos:]
        self._tail = b""
        self._tail_pos = 0
        block = self._buf.read(self._BLOCK)
        if not block:
            self._eof = True
            if not tail:
                return False
            data = tail
        else:
            data = tail + block if tail else block
        if b"\r" in data or data[:1] != b"@":
            # CR endings or a non-FASTQ leading byte (FASTA '>'): stash
            # the raw remainder and pin the per-line parser
            self._tail = data
            self._fast_off = True
            return False
        lines = data.split(b"\n")
        partial = lines.pop()  # '' when data ends with a newline
        ngroups = len(lines) // 4
        recs: List[SequenceRecord] = []
        rewrite = not self._range.is_full_positive()
        next_id = self._next_id
        idx = 0
        broke = False
        for _ in range(ngroups):
            nm = lines[idx]
            plus = lines[idx + 2]
            if nm[:1] != b"@" or plus[:1] != b"+":
                # structural surprise (blank/extra lines): the slow
                # parser reproduces the reference semantics exactly
                broke = True
                break
            seq = lines[idx + 1]
            qual = lines[idx + 3]
            idx += 4
            if not seq:
                continue
            nm1 = nm[1:]
            # kseq truncates at ANY whitespace (the slow path's .split());
            # \r/\n cannot appear here (line split + CR fallback)
            if (b" " in nm1 or b"\t" in nm1 or b"\x0b" in nm1
                    or b"\x0c" in nm1):
                nm1 = nm1.split()[0] if nm1.split() else b""
            sq = bytearray(seq)
            ql = bytearray(qual)
            if rewrite:
                sq = self._range.apply(sq, is_seq=True)
                ql = self._range.apply(ql, is_seq=False)
            recs.append(SequenceRecord(name=nm1, seq=sq, qual=ql,
                                       read_id=next_id))
            next_id += 1
        if idx != len(lines):
            # incomplete trailing record at the block edge (normal), or
            # the break above: carry the raw remainder forward
            self._tail = b"\n".join(lines[idx:] + [partial])
            if broke:
                self._fast_off = True
        else:
            self._tail = partial
        self._next_id = next_id
        self._ready = recs
        self._ready_pos = 0
        return bool(recs)

    def _read_one_slow(self) -> Optional[SequenceRecord]:
        while True:
            line = self._readline()
            if not line:
                return None
            line = line.rstrip(b"\r\n")
            if not line:
                continue
            if line[:1] == b">":
                name = line[1:].split()[0] if len(line) > 1 else b""
                seq_parts: List[bytes] = []
                while True:
                    nxt = self._readline()
                    if not nxt:
                        break
                    if nxt[:1] in (b">", b"@"):
                        self._pushback(nxt)
                        break
                    seq_parts.append(nxt.rstrip(b"\r\n"))
                seq = bytearray(b"".join(seq_parts))
                if len(seq) == 0:
                    continue
                rec = self._finalize(name, seq, None)
                return rec
            if line[:1] == b"@":
                name = line[1:].split()[0] if len(line) > 1 else b""
                seq = bytearray(self._readline().rstrip(b"\r\n"))
                plus = self._readline()
                if not plus.startswith(b"+"):
                    raise ValueError(f"Malformed FASTQ at {self._path!r}")
                qual = bytearray(self._readline().rstrip(b"\r\n"))
                if len(seq) == 0:
                    continue
                return self._finalize(name, seq, qual)
            raise ValueError(f"Unrecognized record start {line[:1]!r} in {self._path!r}")

    def _finalize(self, name: bytes, seq: bytearray,
                  qual: Optional[bytearray]) -> SequenceRecord:
        seq = self._range.apply(seq, is_seq=True)
        if qual is not None:
            qual = self._range.apply(qual, is_seq=False)
        rec = SequenceRecord(name=name, seq=seq, qual=qual, read_id=self._next_id)
        self._next_id += 1
        return rec

    def __iter__(self) -> Iterator[SequenceRecord]:
        while True:
            rec = self.read_one()
            if rec is None:
                return
            yield rec


class MultiFileFastxStream:
    """Chains several files, preserving cumulative read ids across them."""

    def __init__(self, paths: List[str], effective_range: Optional[EffectiveRange] = None):
        self._paths = paths
        self._range = effective_range
        self._reader: Optional[FastxReader] = None
        self._path_index = 0
        self._next_id = 0

    def read_one(self) -> Optional[SequenceRecord]:
        while True:
            if self._reader is None:
                if self._path_index >= len(self._paths):
                    return None
                self._reader = FastxReader(self._paths[self._path_index],
                                           self._range, id_offset=self._next_id)
                self._path_index += 1
            rec = self._reader.read_one()
            if rec is not None:
                self._next_id = rec.read_id + 1
                return rec
            self._reader.close()
            self._reader = None

    def read_batch(self, batch_size: int) -> List[SequenceRecord]:
        out: List[SequenceRecord] = []
        while len(out) < batch_size:
            if self._reader is None:
                if self._path_index >= len(self._paths):
                    break
                self._reader = FastxReader(self._paths[self._path_index],
                                           self._range,
                                           id_offset=self._next_id)
                self._path_index += 1
            got = self._reader.read_batch(batch_size - len(out))
            if got:
                self._next_id = got[-1].read_id + 1
                out.extend(got)
            else:
                self._reader.close()
                self._reader = None
        return out


def load_all_sequences(path: str) -> List[SequenceRecord]:
    """Load a whole FASTA/FASTQ file (used for the reference genome)."""
    reader = FastxReader(path)
    records = list(reader)
    reader.close()
    return records


def expand_input_globs(paths: List[str]) -> List[str]:
    """Expand shell-style wildcards in input file lists, keeping order.

    Mirrors chromap_driver.cc:174-212: each entry may contain * or ?; a
    pattern matching nothing is an error.
    """
    out: List[str] = []
    for p in paths:
        if any(ch in p for ch in "*?[]"):
            matches = sorted(_glob.glob(p))
            if not matches:
                raise FileNotFoundError(f"No files match pattern {p!r}")
            out.extend(matches)
        else:
            if not os.path.exists(p):
                raise FileNotFoundError(p)
            out.append(p)
    return out
