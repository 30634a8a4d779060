"""Post-processing: per-rid sort, PCR dedup, Tn5 shift, multi-mapping
allocation. Mirrors mapping_processor.h.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .rng import MT19937, discrete_distribution

MIN_UNIQUE_MAPPING_MAPQ = 4  # chromap.h:199


def sort_mappings(mappings_on_refs: List[List[object]]) -> None:
    for lst in mappings_on_refs:
        lst.sort(key=lambda m: m.sort_key())


def apply_tn5_shift(mappings_on_refs: List[List[object]]) -> int:
    n = 0
    for lst in mappings_on_refs:
        for m in lst:
            m.tn5_shift()
            n += 1
    return n


def remove_pcr_duplicates(mappings_on_refs: List[List[object]]) -> int:
    """Sort then collapse adjacent equal records keeping the last (which has
    the highest mapq given the sort order), counting duplicates capped at
    255 (mapping_processor.h:161-202). Returns surviving count."""
    sort_mappings(mappings_on_refs)
    total = 0
    for ri, lst in enumerate(mappings_on_refs):
        if not lst:
            continue
        deduped: List[object] = []
        last = lst[0]
        last_dup_count = 1
        for m in lst[1:]:
            if m.dup_key() != last.dup_key():
                last.num_dups = min(255, last_dup_count)
                deduped.append(last)
                last_dup_count = 1
            else:
                last_dup_count += 1
            last = m
        last.num_dups = min(255, last_dup_count)
        deduped.append(last)
        mappings_on_refs[ri] = deduped
        total += len(deduped)
    return total


class _AugmentedTree:
    """Implicit interval tree over sorted mappings (cgranges layout),
    mirroring mapping_processor.h:204-316."""

    def __init__(self, mappings: Sequence[object]):
        self.mappings = mappings
        n = len(mappings)
        self.extras = [0] * n
        last = 0
        last_i = 0
        k = 0
        if n == 0:
            self.max_level = -1
            return
        for i in range(0, n, 2):
            last_i = i
            last = self.extras[i] = mappings[i].end_position()
        k = 1
        while (1 << k) <= n:
            x = 1 << (k - 1)
            i0 = (x << 1) - 1
            step = x << 2
            for i in range(i0, n, step):
                el = self.extras[i - x]
                er = self.extras[i + x] if i + x < n else last
                e = mappings[i].end_position()
                e = max(e, el, er)
                self.extras[i] = e
            last_i = last_i - x if (last_i >> k) & 1 else last_i + x
            if last_i < n and self.extras[last_i] > last:
                last = self.extras[last_i]
            k += 1
        self.max_level = k - 1

    def count_overlaps(self, start: int, end: int) -> int:
        if self.max_level < 0:
            return 0
        mappings = self.mappings
        extras = self.extras
        n = len(mappings)
        count = 0
        stack: List[Tuple[int, int, int]] = [
            (self.max_level, (1 << self.max_level) - 1, 0)]
        while stack:
            k, x, w = stack.pop()
            if k <= 3:
                i0 = (x >> k) << k
                i1 = i0 + (1 << (k + 1)) - 1
                if i1 >= n:
                    i1 = n
                i = i0
                while i < i1 and mappings[i].start_position() < end:
                    if start < mappings[i].end_position():
                        count += 1
                    i += 1
            elif w == 0:
                y = x - (1 << (k - 1))
                stack.append((k, x, 1))
                if y >= n or extras[y] > start:
                    stack.append((k - 1, y, 0))
            elif x < n and mappings[x].start_position() < end:
                if start < mappings[x].end_position():
                    count += 1
                stack.append((k - 1, x + (1 << (k - 1)), 0))
        return count


def allocate_multi_mappings(mappings_on_refs: List[List[object]],
                            allocation_distance: int, seed: int) -> None:
    """Weighted random assignment of multi-mappings to overlapping unique
    mapping regions (mapping_processor.h:318-440)."""
    multi: List[Tuple[int, object]] = []
    allocated: List[List[object]] = []
    trees: List[_AugmentedTree] = []
    for ri, lst in enumerate(mappings_on_refs):
        uni = []
        for m in lst:
            if m.mapq < MIN_UNIQUE_MAPPING_MAPQ:
                multi.append((ri, m))
            else:
                uni.append(m)
        allocated.append(uni)
        trees.append(_AugmentedTree(uni))
        mappings_on_refs[ri] = []

    if not multi:
        for ri in range(len(mappings_on_refs)):
            mappings_on_refs[ri] = allocated[ri]
        return

    multi.sort(key=lambda rm: rm[1].read_id)  # stable
    sentinel_ri, sentinel_m = multi[-1]
    import copy
    sentinel = (sentinel_ri, copy.copy(sentinel_m))
    sentinel[1].read_id = 0xFFFFFFFF
    multi.append(sentinel)

    gen = MT19937(seed)
    weights: List[int] = []
    sum_weight = 0
    previous_read_id = multi[0][1].read_id
    start_mapping_index = 0
    for mi, (ri, m) in enumerate(multi):
        current_read_id = m.read_id
        start = m.start_position()
        start = start - allocation_distance if start > allocation_distance else 0
        end = m.end_position() + allocation_distance
        num_overlaps = trees[ri].count_overlaps(start, end)
        if current_read_id == previous_read_id:
            weights.append(num_overlaps)
            sum_weight += num_overlaps
        else:
            if sum_weight != 0:
                j = discrete_distribution(gen, weights)
                tri, tm = multi[start_mapping_index + j]
                allocated[tri].append(tm)
            weights = [num_overlaps]
            sum_weight = num_overlaps
            start_mapping_index = mi
            previous_read_id = current_read_id

    for ri in range(len(mappings_on_refs)):
        mappings_on_refs[ri] = allocated[ri]
