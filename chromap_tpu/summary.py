"""Per-barcode QC summary metadata (summary_metadata.h) and the K-MinHash
cache-slot cardinality sketch (chromap.h:41-79)."""

from __future__ import annotations

import heapq
import math
from typing import Dict, List, Optional

from .barcode.translate import BarcodeTranslator, seed_to_sequence

TOTAL, DUP, MAPPED, LOWMAPQ, CACHEHIT, CARDINALITY = range(6)
NUM_FIELDS = 6


class KMinHash:
    """Bounded MinHash over cache slot ids; cardinality ~= k*range/max - 1."""

    def __init__(self, k: int, value_range: int):
        self.k = k
        self.range = value_range
        self._heap: List[int] = []  # max-heap via negation? reference keeps
        # a max-heap and evicts the largest, retaining the k smallest
        self._set = set()

    def add(self, num: int) -> None:
        if num in self._set:
            return
        self._set.add(num)
        heapq.heappush(self._heap, -num)
        if len(self._heap) > self.k:
            largest = -heapq.heappop(self._heap)
            self._set.discard(largest)

    def compute_cardinality(self) -> int:
        if len(self._heap) < self.k:
            return 0
        kth_smallest = -self._heap[0]
        if kth_smallest == 0:
            return 0
        return (self.k * self.range) // kth_smallest - 1


def inverse_logit(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


class SummaryMetadata:
    def __init__(self, barcode_length: int = 16):
        self.barcode_length = barcode_length
        self.counts: Dict[int, List[int]] = {}
        self.nonwhitelist = [0] * NUM_FIELDS

    def update_count(self, barcode: int, field: int, change: int) -> None:
        row = self.counts.get(barcode)
        if row is None:
            row = [0] * NUM_FIELDS
            self.counts[barcode] = row
        row[field] += change

    def update_nonwhitelist(self, field: int, change: int) -> None:
        self.nonwhitelist[field] += change

    def adjust_paired_end_overcount(self) -> None:
        for row in self.counts.values():
            row[DUP] //= 2
            row[LOWMAPQ] //= 2
            row[MAPPED] //= 2

    def _format_row(self, name: bytes, counts: List[int],
                    coeffs: List[float], with_cache_slots: bool) -> bytes:
        num_total = counts[TOTAL]
        num_dup = counts[DUP]
        num_mapped = counts[MAPPED]
        num_unmapped = num_total - num_mapped
        num_lowmapq = counts[LOWMAPQ]
        num_cachehit = counts[CACHEHIT]
        fric = num_cachehit / num_mapped if num_mapped != 0 else 0.0
        est_frip = (inverse_logit(coeffs[0] + coeffs[1] * fric
                                  + coeffs[2] * num_dup
                                  + coeffs[3] * num_unmapped
                                  + coeffs[4] * num_lowmapq)
                    if fric != 0.0 else 0.0)
        base = (name + b"," + str(num_total).encode() + b","
                + str(num_dup).encode() + b"," + str(num_unmapped).encode()
                + b"," + str(num_lowmapq).encode() + b","
                + str(num_cachehit).encode() + b","
                + f"{fric:.5f}".encode() + b"," + f"{est_frip:.5f}".encode())
        if with_cache_slots:
            base += b"," + str(counts[CARDINALITY]).encode()
        return base + b"\n"

    def output(self, path: str, has_whitelist: bool, coeffs: List[float],
               with_cache_slots: bool,
               translator: Optional[BarcodeTranslator] = None) -> None:
        with open(path, "wb") as f:
            if with_cache_slots:
                f.write(b"barcode,total,duplicate,unmapped,lowmapq,cachehit,"
                        b"fric,estfrip,numcacheslots\n")
            else:
                f.write(b"barcode,total,duplicate,unmapped,lowmapq,cachehit,"
                        b"fric,estfrip\n")
            for barcode, counts in self.counts.items():
                name = seed_to_sequence(barcode, self.barcode_length)
                f.write(self._format_row(name, counts, coeffs,
                                         with_cache_slots))
            if has_whitelist:
                f.write(self._format_row(b"non-whitelist", self.nonwhitelist,
                                         coeffs, with_cache_slots))


def parse_frip_est_params(spec: str) -> List[float]:
    parts = [p for p in spec.split(";") if p]
    vals = [float(p) for p in parts]
    if len(vals) != 5:
        raise SystemExit(
            "\nInvalid number of parameters, expecting 5 parameters but "
            f"found {len(vals)} parameters\n")
    return vals
