"""Candidate cache keyed by minimizer sketch (mm_cache equivalent).

Mirrors mmcache.hpp:27-387: direct-mapped slots keyed by (first + last)
minimizer hash, entry match requiring the identical minimizer hash / strand
/ offset chain forward or reversed, Query candidate shifting by the read's
first-minimizer offset, heavy-hitter fingerprint gating on Update, and the
2^22-bit head-minimizer prefilter.

Entries are stored sparsely (dict) since only touched slots matter; the
fingerprint counters live with the slot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .mapping.candidates import Candidate

U32 = 0xFFFFFFFF
U64 = 0xFFFFFFFFFFFFFFFF
FINGER_PRINT_SIZE = 103
HEAD_MM_ARRAY_SIZE = 1 << 22
HEAD_MM_ARRAY_MASK = HEAD_MM_ARRAY_SIZE - 1


def _i32(x: int) -> int:
    x &= U32
    return x - (1 << 32) if x >= (1 << 31) else x


@dataclass
class _CacheSlot:
    minimizers: np.ndarray = None     # uint64 hashes
    strands: np.ndarray = None        # uint8
    offsets: np.ndarray = None        # int64 position deltas
    positive_candidates: List[Candidate] = field(default_factory=list)
    negative_candidates: List[Candidate] = field(default_factory=list)
    repetitive_seed_length: int = 0
    weight: int = 0
    finger_print_cnt: np.ndarray = None
    finger_print_cnt_sum: int = 0
    activated: int = 0

    def __post_init__(self):
        if self.finger_print_cnt is None:
            self.finger_print_cnt = np.zeros(FINGER_PRINT_SIZE, dtype=np.int64)


class MMCache:
    def __init__(self, cache_size: int):
        self.cache_size = cache_size
        self.kmer_length = 0
        self.slots: Dict[int, _CacheSlot] = {}
        self.head_mm = np.zeros(HEAD_MM_ARRAY_SIZE, dtype=np.uint64)
        self.saturate_count = 100
        self.debug = False  # --debug-cache (mmcache.hpp:300-330)
        self.disabled = False  # --device / --no-cache (see pipeline)

    def set_kmer_length(self, k: int) -> None:
        self.kmer_length = k

    def print_stats(self) -> None:
        """Per-slot stats dump (--debug-cache end-of-run, mmcache.hpp:
        371-386): weight, fingerprint sum, candidate count, activated,
        max fingerprint bin, then every bin; untouched slots are zeros."""
        empty = _CacheSlot()
        for i in range(self.cache_size):
            s = self.slots.get(i, empty)
            ncand = (len(s.positive_candidates or [])
                     + len(s.negative_candidates or []))
            bins = " ".join(str(int(x)) for x in s.finger_print_cnt)
            print(f"{s.weight} {s.finger_print_cnt_sum} {ncand} "
                  f"{s.activated} {int(s.finger_print_cnt.max())} {bins}")

    # ------------------------------------------------------------------
    def _match(self, slot: _CacheSlot, hashes: np.ndarray, hits: np.ndarray
               ) -> int:
        """0 no match, 1 same order, -1 reversed (mmcache.hpp:41-81)."""
        if slot.minimizers is None or len(slot.minimizers) != len(hashes):
            return 0
        strands = (hits & np.uint64(1)).astype(np.uint8)
        positions = (hits >> np.uint64(1)).astype(np.int64) & U32
        if (np.array_equal(slot.minimizers, hashes)
                and np.array_equal(slot.strands, strands)):
            if len(hashes) < 2 or np.array_equal(slot.offsets,
                                                 np.diff(positions)):
                return 1
        rev_h = hashes[::-1]
        rev_s = strands[::-1] ^ 1
        if (np.array_equal(slot.minimizers, rev_h)
                and np.array_equal(slot.strands, rev_s)):
            # reversed check compares offsets[i] against pos[j] - pos[j-1]
            # walking j downward: the (positive) diffs in reverse order
            if len(hashes) < 2 or np.array_equal(
                    slot.offsets, np.diff(positions)[::-1]):
                return -1
        return 0

    def query(self, hashes: np.ndarray, hits: np.ndarray, read_len: int
              ) -> Tuple[int, Optional[List[Candidate]],
                         Optional[List[Candidate]], int]:
        """Returns (slot_index or -1, pos_candidates, neg_candidates,
        repetitive_seed_length)."""
        msize = len(hashes)
        if self.disabled or msize == 0:
            return -1, None, None, 0
        h0 = int(hashes[0])
        if (int(self.head_mm[(h0 >> 6) & HEAD_MM_ARRAY_MASK])
                & (1 << (h0 & 0x3F))) == 0:
            return -1, None, None, 0
        if msize == 1:
            h = h0
        else:
            h = (h0 + int(hashes[msize - 1])) & U64
        hidx = h % self.cache_size
        slot = self.slots.get(hidx)
        if slot is None:
            return -1, None, None, 0
        direction = self._match(slot, hashes, hits)
        if direction == 0:
            return -1, None, None, 0

        positions = (hits >> np.uint64(1)).astype(np.int64) & U32
        if direction == 1:
            shift = int(positions[0])
            pos = [Candidate((c.position >> 32 << 32)
                             | ((_i32(c.position) - shift) & U32), c.count)
                   for c in slot.positive_candidates]
            neg = [Candidate((c.position + shift) & U64, c.count)
                   for c in slot.negative_candidates]
            return hidx, pos, neg, slot.repetitive_seed_length
        # reversed orientation
        shift = read_len - int(positions[msize - 1]) - 1 + self.kmer_length - 1
        pos = [Candidate((c.position >> 32 << 32)
                         | ((_i32(c.position) + shift - read_len + 1) & U32),
                         c.count)
               for c in slot.negative_candidates]
        neg = [Candidate((c.position - shift + read_len - 1) & U64, c.count)
               for c in slot.positive_candidates]
        return hidx, pos, neg, slot.repetitive_seed_length

    # ------------------------------------------------------------------
    def update(self, hashes: np.ndarray, hits: np.ndarray,
               pos_candidates: List[Candidate],
               neg_candidates: List[Candidate],
               repetitive_seed_length: int) -> None:
        msize = len(hashes)
        if self.disabled or msize == 0:
            return
        h0 = int(hashes[0])
        if msize == 1:
            h = f = h0
        else:
            hl = int(hashes[msize - 1])
            h = (h0 + hl) & U64
            f = (h0 ^ hl) & U64
        hidx = h % self.cache_size
        finger_print = f % FINGER_PRINT_SIZE

        slot = self.slots.get(hidx)
        if slot is None:
            slot = _CacheSlot()
            self.slots[hidx] = slot
        slot.finger_print_cnt[finger_print] += 1
        slot.finger_print_cnt_sum += 1
        if slot.finger_print_cnt_sum > self.saturate_count:
            return
        if (slot.finger_print_cnt_sum < 10
                or int(slot.finger_print_cnt[finger_print]) * 5
                < slot.finger_print_cnt_sum):
            return

        direction = self._match(slot, hashes, hits)
        if direction != 0:
            slot.weight += 1
        else:
            slot.weight -= 1
        slot.activated = 1

        if slot.weight >= 0:
            return
        # renew the slot
        slot.weight = 1
        positions = (hits >> np.uint64(1)).astype(np.int64) & U32
        shift = int(positions[0])
        for c in pos_candidates:
            if _i32(c.position) < self.kmer_length + shift:
                slot.offsets = None
                slot.strands = None
                slot.minimizers = None
                return
        last_pos = int(positions[msize - 1])
        for c in neg_candidates:
            if _i32(c.position) - last_pos < self.kmer_length + shift:
                slot.offsets = None
                slot.strands = None
                slot.minimizers = None
                return
        slot.minimizers = hashes.copy()
        slot.strands = (hits & np.uint64(1)).astype(np.uint8)
        slot.offsets = np.diff(positions)
        slot.positive_candidates = [
            Candidate((c.position + shift) & U64, c.count)
            for c in pos_candidates]
        slot.negative_candidates = [
            Candidate((c.position - shift) & U64, c.count)
            for c in neg_candidates]
        slot.repetitive_seed_length = repetitive_seed_length
        if self.debug:
            # candidate-stored trace (--debug-cache, mmcache.hpp:300-330)
            print(f"[DEBUG][CACHE][1] hidx = {hidx}")
            print(f"[DEBUG][CACHE][2] pos.size() = "
                  f"{len(slot.positive_candidates)} , neg.size() = "
                  f"{len(slot.negative_candidates)} , msize = {msize}")
            print("[DEBUG][CACHE][3] "
                  + " ".join(str(int(x)) for x in hashes) + " ")
            for c in slot.positive_candidates:
                print(f"[DEBUG][CACHE][+] hidx = {hidx} , cand_ref_seq = "
                      f"{c.position >> 32} , cand_ref_pos = "
                      f"{c.position & 0xFFFFFFFF} , support = {c.count}")
            for c in slot.negative_candidates:
                print(f"[DEBUG][CACHE][-] hidx = {hidx} , cand_ref_seq = "
                      f"{c.position >> 32} , cand_ref_pos = "
                      f"{c.position & 0xFFFFFFFF} , support = {c.count}")

        hl = int(hashes[msize - 1])
        self.head_mm[(h0 >> 6) & HEAD_MM_ARRAY_MASK] |= np.uint64(
            1 << (h0 & 0x3F))
        self.head_mm[(hl >> 6) & HEAD_MM_ARRAY_MASK] |= np.uint64(
            1 << (hl & 0x3F))

    # ------------------------------------------------------------------
    @staticmethod
    def get_update_threshold(num_loaded_reads: int, num_reads: int,
                             paired: bool, cache_update_param: float) -> int:
        block = 2_500_000 if paired else 5_000_000
        if num_reads <= block:
            return num_loaded_reads
        return int(num_loaded_reads
                   / (1 + cache_update_param * (num_reads // block)))
