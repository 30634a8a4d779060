"""Cell-by-peak / cell-by-bin feature-barcode matrix.

Functional re-design of the reference's dormant FeatureBarcodeMatrix
(feature_barcode_matrix.{h,cc}; its call site is disabled upstream at
chromap.h:1356-1374, so there is no golden to match -- the behavior here
follows the reference source): naive peak calling by pileup depth cutoff,
peak/bin overlap per mapping, and a sparse matrix in the reference's
triplet format with `<prefix>_matrix.mtx`, `<prefix>_peaks.bed`,
`<prefix>_barcode.tsv` outputs.

The pileup is computed vectorized (np.add.at over fragment intervals)
instead of the reference's per-base loops.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .barcode.translate import BarcodeTranslator, seed_to_sequence


class FeatureBarcodeMatrix:
    def __init__(self, cell_by_bin: bool, bin_size: int,
                 overlap_distance: int, depth_cutoff_to_call_peak: int,
                 cell_barcode_length: int,
                 translator: BarcodeTranslator = None):
        self.cell_by_bin = cell_by_bin
        self.bin_size = bin_size
        self.overlap_distance = overlap_distance
        self.depth_cutoff = depth_cutoff_to_call_peak
        self.cell_barcode_length = cell_barcode_length
        self.translator = translator

    def _call_peaks(self, ref_names: List[bytes], ref_lengths: List[int],
                    mappings_on_refs: List[List[object]], peaks_file) -> List[np.ndarray]:
        """Pileup >= cutoff -> maximal runs as peaks; returns per-rid arrays
        of (start, length, index)."""
        peaks_per_rid: List[np.ndarray] = []
        peak_count = 0
        for rid, lst in enumerate(mappings_on_refs):
            n = ref_lengths[rid]
            pileup = np.zeros(n + 1, dtype=np.int32)
            for m in lst:
                s = m.start_position()
                e = min(s + (m.end_position() - m.start_position()), n)
                pileup[s] += 1
                pileup[e] -= 1
            depth = np.cumsum(pileup[:-1])
            above = depth >= self.depth_cutoff
            flags = above.astype(np.int8)
            starts = np.flatnonzero(np.diff(np.concatenate(([0], flags)))
                                    == 1)
            ends = np.flatnonzero(np.diff(np.concatenate((flags, [0])))
                                  == -1) + 1
            # a run still open at the sequence end is never saved by the
            # reference's fall-below loop
            if len(ends) and above.size and above[-1]:
                starts, ends = starts[:-1], ends[:-1]
            rows = []
            for s, e in zip(starts, ends):
                length = int(e - s) & 0xFFFF
                rows.append((int(s), length, peak_count))
                peaks_file.write(ref_names[rid] + b"\t"
                                 + str(int(s) + 1).encode() + b"\t"
                                 + str(int(s) + length).encode() + b"\n")
                peak_count += 1
            peaks_per_rid.append(np.array(rows, dtype=np.int64).reshape(-1, 3))
        return peaks_per_rid

    def output_feature_matrix(self, ref_names: List[bytes],
                              ref_lengths: List[int],
                              mappings_on_refs: List[List[object]],
                              prefix: str) -> None:
        mtx_f = open(f"{prefix}_matrix.mtx", "wb")
        peaks_f = open(f"{prefix}_peaks.bed", "wb")
        bc_f = open(f"{prefix}_barcode.tsv", "wb")

        num_refs = len(ref_names)
        if self.cell_by_bin:
            num_peaks = 0
            bin_offsets = []
            for rid in range(num_refs):
                bin_offsets.append(num_peaks)
                length = ref_lengths[rid]
                for pos in range(0, length, self.bin_size):
                    peaks_f.write(ref_names[rid] + b"\t"
                                  + str(pos + 1).encode() + b"\t"
                                  + str(pos + self.bin_size).encode() + b"\n")
                num_peaks += (length + self.bin_size - 1) // self.bin_size
            peaks_per_rid = None
        else:
            peaks_per_rid = self._call_peaks(ref_names, ref_lengths,
                                             mappings_on_refs, peaks_f)
            num_peaks = sum(len(p) for p in peaks_per_rid)
            bin_offsets = None

        # index barcodes in first-seen order
        barcode_index: Dict[int, int] = {}
        for lst in mappings_on_refs:
            for m in lst:
                bc = getattr(m, "barcode", 0)
                if bc not in barcode_index:
                    barcode_index[bc] = len(barcode_index)
                    name = (self.translator.translate(
                        bc, self.cell_barcode_length)
                        if self.translator is not None
                        else seed_to_sequence(bc, self.cell_barcode_length))
                    bc_f.write(name + b"-1\n")

        matrix: Dict[int, int] = {}
        for rid, lst in enumerate(mappings_on_refs):
            for m in lst:
                bc_idx = barcode_index[getattr(m, "barcode", 0)]
                start = m.start_position()
                end = m.end_position()
                if self.cell_by_bin:
                    overlapped = self._overlapped_bins(
                        bin_offsets[rid], start, end - start)
                else:
                    overlapped = self._overlapped_peaks(
                        peaks_per_rid[rid], start, end)
                for peak_index in overlapped:
                    key = (bc_idx << 32) | int(peak_index)
                    matrix[key] = matrix.get(key, 0) + 1

        mtx_f.write(str(num_peaks).encode() + b"\t"
                    + str(len(barcode_index)).encode() + b"\t"
                    + str(len(matrix)).encode() + b"\n")
        for key in sorted(matrix):
            peak_index = key & 0xFFFFFFFF
            bc_idx = key >> 32
            mtx_f.write(str(peak_index).encode() + b"\t"
                        + str(bc_idx).encode() + b"\t"
                        + str(matrix[key]).encode() + b"\n")
        mtx_f.close()
        peaks_f.close()
        bc_f.close()

    def _overlapped_bins(self, rid_bin_offset: int, start: int,
                         length: int) -> List[int]:
        bin_index = rid_bin_offset + start // self.bin_size
        out = [bin_index]
        max_bins = length // self.bin_size + 2
        for i in range(max_bins):
            if start + length - 1 >= ((start // self.bin_size) + 1 + i) \
                    * self.bin_size:
                out.append(bin_index + 1 + i)
        return out

    def _overlapped_peaks(self, peaks: np.ndarray, start: int,
                          end: int) -> List[int]:
        if len(peaks) == 0:
            return []
        lo = start - self.overlap_distance if start > self.overlap_distance \
            else 0
        hi = end + self.overlap_distance
        starts = peaks[:, 0]
        i = int(np.searchsorted(starts + peaks[:, 1], lo, side="right"))
        out = []
        while i < len(peaks) and peaks[i, 0] < hi:
            if lo < peaks[i, 0] + peaks[i, 1]:
                out.append(int(peaks[i, 2]))
            i += 1
        return out
