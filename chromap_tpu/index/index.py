"""Minimizer index: build, save/load, and query.

Logical contract mirrors the reference (index.cc:12-89, index_utils.h), but
the layout is TPU-native: instead of an open-addressing hash table we keep a
sorted array of distinct minimizer hashes plus offset/count/occurrence
arrays, so device-side lookups are vectorized binary searches
(jnp.searchsorted) over HBM-resident arrays.

File format: .npz with arrays {hash_keys, offsets, counts, occurrences}
plus scalars k, w. Singletons are stored inline in the same occurrence
array (no special casing needed — offsets/counts are uniform).
"""

from __future__ import annotations

import os
import zipfile
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .minimizers import generate_minimizers_arrays

UMAX = 0xFFFFFFFFFFFFFFFF


@dataclass
class MinimizerIndex:
    kmer_size: int
    window_size: int
    hash_keys: np.ndarray   # (num_distinct,) uint64, sorted
    offsets: np.ndarray     # (num_distinct,) uint64 into occurrences
    counts: np.ndarray      # (num_distinct,) uint32
    occurrences: np.ndarray  # (total,) uint64 reference hits, grouped by hash

    @property
    def num_distinct(self) -> int:
        return len(self.hash_keys)

    @property
    def num_singletons(self) -> int:
        return int((self.counts == 1).sum())

    def lookup(self, minimizer_hash: int) -> Optional[np.ndarray]:
        """Return the sorted reference-hit list for a minimizer hash."""
        i = np.searchsorted(self.hash_keys, np.uint64(minimizer_hash))
        if i >= len(self.hash_keys) or self.hash_keys[i] != np.uint64(minimizer_hash):
            return None
        off = int(self.offsets[i])
        cnt = int(self.counts[i])
        return self.occurrences[off:off + cnt]

    def save(self, path: str) -> None:
        np.savez(path if path.endswith(".npz") else path,
                 k=np.int64(self.kmer_size), w=np.int64(self.window_size),
                 hash_keys=self.hash_keys, offsets=self.offsets,
                 counts=self.counts, occurrences=self.occurrences)
        # np.savez appends .npz; normalize to the exact requested path.
        if not path.endswith(".npz") and os.path.exists(path + ".npz"):
            os.replace(path + ".npz", path)

    @classmethod
    def load(cls, path: str) -> "MinimizerIndex":
        try:
            with np.load(path) as data:
                return cls(kmer_size=int(data["k"]),
                           window_size=int(data["w"]),
                           hash_keys=data["hash_keys"],
                           offsets=data["offsets"],
                           counts=data["counts"],
                           occurrences=data["occurrences"])
        except FileNotFoundError:
            raise SystemExit(f"ERROR: index file {path} not found!")
        except (ValueError, KeyError, OSError, zipfile.BadZipFile):
            raise SystemExit(
                f"ERROR: {path} is not a chromap-tpu index (indexes are "
                f"not interchangeable with reference-chromap binaries; "
                f"rebuild with `chromap-tpu -i -r ref.fa -o {path}`)")

    def statistics_string(self, num_sequences: int, num_bases: int) -> str:
        n = self.num_distinct
        n1 = self.num_singletons
        total = int(self.counts.sum(dtype=np.uint64))
        return (f"kmer size: {self.kmer_size}; skip: {self.window_size}; "
                f"#seq: {num_sequences}\n"
                f"distinct minimizers: {n} ({100.0 * n1 / max(n, 1):.2f}% are "
                f"singletons); average occurrences: {total / max(n, 1):.3f}; "
                f"average spacing: {num_bases / max(total, 1):.3f}")


def build_index(reference_codes: List[np.ndarray], k: int, w: int,
                num_threads: int = 1) -> MinimizerIndex:
    """Collect minimizers over all reference sequences and pack the index.

    Stable sort by (hash, hit) reproduces the reference's occurrence-list
    ordering (index.cc:26 stable_sort with Minimizer::operator<).
    """
    try:
        from ..native import native_build_index_arrays
        arrays = native_build_index_arrays(reference_codes, k, w,
                                           num_threads)
    except Exception:
        arrays = None
    if arrays is not None:
        hash_keys, offsets, counts, occurrences = arrays
        return MinimizerIndex(kmer_size=k, window_size=w,
                              hash_keys=hash_keys, offsets=offsets,
                              counts=counts, occurrences=occurrences)

    from ..ops.minimizer_vector import generate_minimizer_arrays_fast

    all_hashes: List[np.ndarray] = []
    all_hits: List[np.ndarray] = []
    for seq_index, codes in enumerate(reference_codes):
        h, hits = generate_minimizer_arrays_fast(codes, seq_index, k, w)
        all_hashes.append(h)
        all_hits.append(hits)

    if all_hashes:
        hashes = np.concatenate(all_hashes)
        hits = np.concatenate(all_hits)
    else:
        hashes = np.empty(0, dtype=np.uint64)
        hits = np.empty(0, dtype=np.uint64)

    if len(hashes) == 0:
        raise ValueError("Reference produced no minimizers")

    order = np.lexsort((hits, hashes))
    hashes = hashes[order]
    hits = hits[order]

    hash_keys, start_idx, counts = np.unique(hashes, return_index=True,
                                             return_counts=True)
    offsets = start_idx.astype(np.uint64)
    return MinimizerIndex(kmer_size=k, window_size=w, hash_keys=hash_keys,
                          offsets=offsets, counts=counts.astype(np.uint32),
                          occurrences=hits)
