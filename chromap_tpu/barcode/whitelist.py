"""Barcode whitelist, abundance estimation, and 1-2 Hamming correction.

Mirrors chromap.cc:388-800: whitelist keys are 2-bit packed barcodes (<=32
bp), abundance is counted over the first 20M sampled barcodes, and
correction enumerates substitutions (N positions first), scoring each
candidate by 10^(-q/10) * abundance and accepting the top if its share of
the total exceeds the probability threshold.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.fastx import SequenceRecord, _open_text_auto
from ..utils import generate_seed_from_codes

_UINT8_TO_CHAR = b"ACGTNNNN"


def barcode_key_from_record(rec: SequenceRecord) -> int:
    return generate_seed_from_codes(rec.codes(), 0, rec.length)


@dataclass
class CorrectionCandidate:
    index1: int
    base1: int  # ASCII
    index2: int
    base2: int
    score: float

    def sort_key(self):
        # std::greater over tie(score, index1, base1, index2, base2)
        return (self.score, self.index1, self.base1, self.index2, self.base2)


class BarcodeWhitelist:
    def __init__(self, barcode_length: int):
        self.barcode_length = barcode_length
        self.table: Dict[int, int] = {}  # key -> abundance count
        self.num_sample_barcodes = 0

    def load(self, path: str) -> int:
        f = _open_text_auto(path)
        num = 0
        for line in f:
            bc = line.rstrip(b"\n")
            if not bc:
                continue
            if len(bc) > 32:
                raise SystemExit("ERROR: barcode length is greater than 32!")
            if len(bc) != self.barcode_length:
                if num == 0:
                    raise SystemExit("ERROR: whitelist and input barcode "
                                     "lengths are not equal!")
                raise SystemExit("ERROR: barcode lengths are not equal in "
                                 "the whitelist!")
            from ..utils import encode_sequence
            key = generate_seed_from_codes(encode_sequence(bc), 0, len(bc))
            self.table[key] = 0
            num += 1
        f.close()
        return num

    def compute_abundance(self, barcode_paths: List[str], effective_range,
                          max_num_samples: int, batch_size: int,
                          skip_barcode_check: bool) -> None:
        from ..io.fastx import FastxReader

        for path in barcode_paths:
            reader = FastxReader(path, effective_range)
            done = False
            while not done:
                batch: List[SequenceRecord] = []
                for _ in range(batch_size):
                    rec = reader.read_one()
                    if rec is None:
                        done = True
                        break
                    batch.append(rec)
                if not batch:
                    break
                for rec in batch:
                    if 4 in rec.codes():
                        continue
                    key = barcode_key_from_record(rec)
                    if key in self.table:
                        self.table[key] += 1
                        self.num_sample_barcodes += 1
                if (not skip_barcode_check
                        and self.num_sample_barcodes * 20 < len(batch)):
                    raise SystemExit(
                        "Less than 5% barcodes can be found or corrected "
                        "based on the barcode whitelist.\nPlease check "
                        "whether the barcode whitelist matches the data, "
                        "e.g. length, reverse-complement. If this is a false "
                        "warning, please run with --skip-barcode-check.")
                if self.num_sample_barcodes >= max_num_samples:
                    done = True
            reader.close()
            if self.num_sample_barcodes >= max_num_samples:
                break

    def sorted_keys(self) -> "np.ndarray":
        """Sorted whitelist keys as a uint64 array (cached) for the
        vectorized exact-hit fast path."""
        import numpy as np
        if getattr(self, "_sorted_keys", None) is None or \
                len(self._sorted_keys) != len(self.table):
            self._sorted_keys = np.sort(
                np.fromiter(self.table.keys(), dtype=np.uint64,
                            count=len(self.table)))
        return self._sorted_keys

    def correct_barcode(self, rec: SequenceRecord, error_threshold: int,
                        probability_threshold: float,
                        stats: List[int]) -> bool:
        """CorrectBarcodeAt (chromap.cc:572-799). stats = [in_whitelist,
        corrected] incremented in place. May mutate rec's sequence."""
        barcode_length = rec.length
        codes = rec.codes()
        key = generate_seed_from_codes(codes, 0, barcode_length)
        # little-endian N positions: distance from the right end, ascending
        n_pos = sorted(barcode_length - 1 - i for i in range(barcode_length)
                       if rec.seq[i] == ord("N"))
        if len(n_pos) > error_threshold:
            return False
        if len(n_pos) == 0 and key in self.table:
            stats[0] += 1
            return True
        if error_threshold <= 0:
            return False

        qual = rec.qual or bytes([33 + 30] * barcode_length)
        candidates: List[CorrectionCandidate] = []
        mask = 3
        i_start, i_end, ti_limit = 0, barcode_length, 3
        if n_pos:
            i_start, i_end, ti_limit = n_pos[0], n_pos[0] + 1, 4
        for i in range(i_start, i_end):
            key_cleared = key & ~(mask << (2 * i))
            base1 = (key >> (2 * i)) & mask
            for _ti in range(ti_limit):
                base1 = (base1 + 1) & mask
                corrected_key = key_cleared | (base1 << (2 * i))
                if corrected_key in self.table:
                    abundance = (self.table[corrected_key]
                                 / self.num_sample_barcodes
                                 if self.num_sample_barcodes else 0.0)
                    q = qual[barcode_length - 1 - i] - 33
                    q = min(q, 40)
                    q = max(q, 3)
                    score = (10.0 ** (-q / 10.0)) * abundance
                    candidates.append(CorrectionCandidate(
                        barcode_length - 1 - i, _UINT8_TO_CHAR[base1], 0, 0,
                        score))
                if error_threshold == 2:
                    j_start, j_end, ti2_limit = i + 1, barcode_length, 3
                    if len(n_pos) == 2:
                        j_start, j_end, ti2_limit = (n_pos[1], n_pos[1] + 1, 4)
                    for j in range(j_start, j_end):
                        key2_cleared = corrected_key & ~(mask << (2 * j))
                        base2 = (corrected_key >> (2 * j)) & mask
                        for _ti2 in range(ti2_limit):
                            base2 = (base2 + 1) & mask
                            corrected_key2 = key2_cleared | (base2 << (2 * j))
                            if corrected_key2 in self.table:
                                abundance = (self.table[corrected_key2]
                                             / self.num_sample_barcodes
                                             if self.num_sample_barcodes
                                             else 0.0)
                                q2 = qual[barcode_length - 1 - j] - 33
                                q2 = min(max(q2, 3), 40)
                                q1 = qual[barcode_length - 1 - i] - 33
                                q1 = min(max(q1, 3), 40)
                                score = (10.0 ** (-(q1 + q2) / 10.0)) \
                                    * abundance
                                candidates.append(CorrectionCandidate(
                                    barcode_length - 1 - i,
                                    _UINT8_TO_CHAR[base1],
                                    barcode_length - 1 - j,
                                    _UINT8_TO_CHAR[base2], score))

        if not candidates:
            return False
        if len(candidates) == 1:
            best = candidates[0]
            rec.correct_base(best.index1, best.base1)
            if best.base2 != 0:
                rec.correct_base(best.index2, best.base2)
            stats[1] += 1
            return True
        candidates.sort(key=CorrectionCandidate.sort_key, reverse=True)
        total = sum(c.score for c in candidates)
        best = candidates[0]
        if total > 0 and best.score / total > probability_threshold:
            rec.correct_base(best.index1, best.base1)
            if best.base2 != 0:
                rec.correct_base(best.index2, best.base2)
            stats[1] += 1
            return True
        return False


def sample_barcode_length(path: str, effective_range) -> int:
    """SampleInputBarcodesAndExamineLength (chromap.cc:365-386)."""
    from ..io.fastx import FastxReader

    reader = FastxReader(path, effective_range)
    lengths = set()
    first_len = None
    for _ in range(1000):
        rec = reader.read_one()
        if rec is None:
            break
        if first_len is None:
            first_len = rec.length
        elif rec.length != first_len:
            raise SystemExit(
                "ERROR: barcode lengths are not equal in the sample!")
    reader.close()
    if first_len is None:
        raise SystemExit("ERROR: no barcodes in input!")
    return first_len
