"""Low-memory mode: sorted spill shards + streaming k-way merge output.

Mirrors mapping_writer.h:166-402 and temp_mapping.h: when in-memory
mappings exceed the budget they are sorted per-rid and spilled to a temp
shard; at the end all shards are k-way merged with streaming PCR dedup
(keeping the highest-mapq duplicate; bulk-level barcode selection for
single-cell data), mapq filtering, and Tn5 shifting.

Shards are pickled per-rid record runs (the host format is free to differ
from the reference's raw structs -- only the merge semantics matter).
The same merge generalizes to multi-host sorted-shard merging (each host
spills its shards; one merge pass unifies them).
"""

from __future__ import annotations

import heapq
import os
import pickle
from typing import Iterator, List, Optional, Tuple

from ..config import MappingConfig
from ..summary import DUP, LOWMAPQ, MAPPED


class TempMappingShard:
    def __init__(self, path: str):
        self.path = path

    @staticmethod
    def write(path: str, mappings_on_refs: List[List[object]]) -> None:
        with open(path, "wb") as f:
            pickle.dump([len(lst) for lst in mappings_on_refs], f)
            for lst in mappings_on_refs:
                if lst:
                    pickle.dump(lst, f)

    def iterate(self) -> Iterator[Tuple[int, object]]:
        with open(self.path, "rb") as f:
            counts = pickle.load(f)
            for rid, n in enumerate(counts):
                if n:
                    lst = pickle.load(f)
                    for m in lst:
                        yield rid, m


def spill_mappings(cfg: MappingConfig, mappings_on_refs: List[List[object]],
                   shard_paths: List[str], base: str = None) -> None:
    from ..mapping.postprocess import sort_mappings

    sort_mappings(mappings_on_refs)
    if base is None:
        base = cfg.mapping_output_file_path
    if base in ("/dev/stdout", "/dev/stderr"):
        base = "chromap_output"
    path = f"{base}.temp{len(shard_paths)}"
    TempMappingShard.write(path, mappings_on_refs)
    shard_paths.append(path)
    for lst in mappings_on_refs:
        lst.clear()


def _find_best_dup(whitelist, dups: List[object]) -> object:
    """FindBestMappingIndexFromDuplicates (mapping_writer.h:128-165):
    highest num_dups, ties by barcode abundance."""
    best = 0
    best_abundance = (whitelist.table.get(getattr(dups[0], "barcode", 0), 0)
                      if whitelist is not None else 0)
    for i in range(1, len(dups)):
        abundance = (whitelist.table.get(getattr(dups[i], "barcode", 0), 0)
                     if whitelist is not None else 0)
        if (dups[i].num_dups > dups[best].num_dups
                or (dups[i].num_dups == dups[best].num_dups
                    and abundance > best_abundance)):
            best = i
            best_abundance = abundance
    return dups[best]


def merge_and_output_low_memory(cfg: MappingConfig, shard_paths: List[str],
                                writer, whitelist=None,
                                summary=None) -> Tuple[int, int, int]:
    """Returns (num_uni, num_multi, num_passing_filters)."""
    if not shard_paths:
        return 0, 0, 0

    shards = [TempMappingShard(p) for p in shard_paths]

    def keyed(shard_index: int):
        for rid, m in shards[shard_index].iterate():
            yield (rid, m.sort_key(), shard_index, m)

    merged = heapq.merge(*[keyed(i) for i in range(len(shards))])

    dedup_bulk = (cfg.remove_pcr_duplicates and not cfg.is_bulk_data
                  and cfg.remove_pcr_duplicates_at_bulk_level)

    last_rid = -1
    last_mapping: Optional[object] = None
    num_last_dups = 0
    num_uni = 0
    num_multi = 0
    num_passing = 0
    bulk_dups: List[object] = []

    def flush_last():
        nonlocal last_mapping, num_uni, num_multi, num_passing
        if last_mapping is None:
            return
        m = last_mapping
        if dedup_bulk and bulk_dups:
            m = _find_best_dup(whitelist, bulk_dups)
            bulk_dups.clear()
        if m.mapq >= cfg.mapq_threshold:
            m.num_dups = min(255, num_last_dups)
            if cfg.tn5_shift:
                m.tn5_shift()
            writer.append_mapping(last_rid, m)
            num_passing += 1
            if summary is not None:
                summary.update_count(getattr(m, "barcode", 0), DUP,
                                     num_last_dups - 1)
        elif summary is not None:
            summary.update_count(getattr(m, "barcode", 0), LOWMAPQ,
                                 num_last_dups)
        if summary is not None:
            summary.update_count(getattr(m, "barcode", 0), MAPPED,
                                 num_last_dups)
        if m.is_unique == 1:
            num_uni += 1
        else:
            num_multi += 1

    import copy

    for (rid, _key, _si, m) in merged:
        dup_cell = (last_mapping is not None
                    and m.dup_key() == last_mapping.dup_key())
        dup_bulk = (last_mapping is not None and dedup_bulk
                    and m.same_position_key()
                    == last_mapping.same_position_key())
        is_dup = (last_rid == rid and (dup_cell or dup_bulk))
        if cfg.remove_pcr_duplicates and is_dup:
            num_last_dups += 1
            if dedup_bulk:
                if (bulk_dups
                        and m.dup_key() == bulk_dups[-1].dup_key()):
                    # the reference assigns the incoming record then does
                    # num_dups_ += 1, so the count is incoming+1 (not
                    # accumulated) -- reproduced as-is
                    rec = copy.copy(m)
                    rec.num_dups = m.num_dups + 1
                    bulk_dups[-1] = rec
                else:
                    rec = copy.copy(m)
                    rec.num_dups = 1
                    bulk_dups.append(rec)
            if m.mapq > last_mapping.mapq:
                last_mapping = copy.copy(m)
        else:
            flush_last()
            last_mapping = copy.copy(m)
            last_rid = rid
            num_last_dups = 1
            if dedup_bulk:
                rec = copy.copy(m)
                rec.num_dups = 1
                bulk_dups.append(rec)

    flush_last()

    for p in shard_paths:
        os.remove(p)
    shard_paths.clear()
    return num_uni, num_multi, num_passing
