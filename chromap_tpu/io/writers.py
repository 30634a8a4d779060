"""Output writers for BED/BEDPE, TagAlign, PAF, SAM and 4DN pairs.

Byte-compatible with mapping_writer.cc. Mapq filtering happens here
(mapping_writer.h:405-437): records below the threshold are dropped but
still counted in summary metadata.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from ..config import MappingConfig
from ..mapping.records import (PEBedRecord, PafRecord, PairedPafRecord,
                               PairsRecord, SEBedRecord, SamRecord)

BAM_CIGAR_STR = b"MIDNSHP=XB"


class MappingFileWriter:
    def __init__(self, cfg: MappingConfig, ref_names: List[bytes],
                 ref_lengths: List[int], cell_barcode_length: int = 0,
                 barcode_translator=None,
                 pairs_custom_rid_rank: Optional[List[int]] = None,
                 summary=None):
        self.cfg = cfg
        self.ref_names = ref_names
        self.ref_lengths = ref_lengths
        self.cell_barcode_length = cell_barcode_length
        self.barcode_translator = barcode_translator
        self.pairs_custom_rid_rank = pairs_custom_rid_rank
        self.summary = summary
        self._f = open(cfg.mapping_output_file_path, "wb")
        self.num_mappings_passing_filters = 0

    def close(self) -> None:
        self._f.close()

    def _w(self, s: bytes) -> None:
        self._f.write(s)

    def _translate_barcode(self, barcode: int) -> bytes:
        if self.barcode_translator is not None:
            return self.barcode_translator.translate(barcode,
                                                     self.cell_barcode_length)
        if self.cell_barcode_length == 0:
            return b"N"
        from ..barcode.translate import seed_to_sequence
        return seed_to_sequence(barcode, self.cell_barcode_length)

    # ------------------------------ header ------------------------------

    def output_header(self) -> None:
        fmt = self.cfg.output_format
        if fmt == "sam":
            for name, length in zip(self.ref_names, self.ref_lengths):
                self._w(b"@SQ\tSN:" + name + b"\tLN:"
                        + str(length).encode() + b"\n")
        elif fmt == "pairs":
            rank = self.pairs_custom_rid_rank or list(range(len(self.ref_names)))
            order = [0] * len(self.ref_names)
            for i, r in enumerate(rank):
                order[r] = i
            self._w(b"## pairs format v1.0.0\n#shape: upper triangle\n")
            for i in range(len(self.ref_names)):
                rid = order[i]
                self._w(b"#chromsize: " + self.ref_names[rid] + b" "
                        + str(self.ref_lengths[rid]).encode() + b"\n")
            self._w(b"#columns: readID chrom1 pos1 chrom2 pos2 strand1 "
                    b"strand2 pair_type mapq1 mapq2\n")

    # --------------------------- bulk output ----------------------------

    def output_mappings(self, mappings_on_refs: List[List[object]]) -> None:
        from ..summary import DUP, LOWMAPQ, MAPPED

        threshold = self.cfg.mapq_threshold
        for rid, lst in enumerate(mappings_on_refs):
            for m in lst:
                if m.mapq >= threshold:
                    self.append_mapping(rid, m)
                    self.num_mappings_passing_filters += 1
                    if self.summary is not None:
                        self.summary.update_count(getattr(m, "barcode", 0),
                                                  DUP, m.num_dups - 1)
                elif self.summary is not None:
                    self.summary.update_count(getattr(m, "barcode", 0),
                                              LOWMAPQ, m.num_dups)
                if self.summary is not None:
                    self.summary.update_count(getattr(m, "barcode", 0),
                                              MAPPED, m.num_dups)

    # -------------------------- per-record append -----------------------

    def append_mapping(self, rid: int, m: object) -> None:
        fmt = self.cfg.output_format
        if isinstance(m, SEBedRecord):
            self._append_se_bed(rid, m, fmt)
        elif isinstance(m, PEBedRecord):
            self._append_pe_bed(rid, m, fmt)
        elif isinstance(m, PafRecord):
            self._append_paf(rid, m)
        elif isinstance(m, PairedPafRecord):
            self._append_paired_paf(rid, m)
        elif isinstance(m, SamRecord):
            self._append_sam(rid, m)
        elif isinstance(m, PairsRecord):
            self._append_pairs(rid, m)
        else:
            raise TypeError(type(m))

    def _append_se_bed(self, rid: int, m: SEBedRecord, fmt: str) -> None:
        name = self.ref_names[rid]
        strand = b"+" if m.direction == 1 else b"-"
        end = m.start + m.length
        if m.has_barcode:
            bc = self._translate_barcode(m.barcode)
            self._w(name + b"\t" + str(m.start).encode() + b"\t"
                    + str(end).encode() + b"\t" + bc + b"\t"
                    + str(m.num_dups).encode() + b"\n")
        else:
            self._w(name + b"\t" + str(m.start).encode() + b"\t"
                    + str(end).encode() + b"\tN\t" + str(m.mapq).encode()
                    + b"\t" + strand + b"\t" + str(m.num_dups).encode() + b"\n")

    def _append_pe_bed(self, rid: int, m: PEBedRecord, fmt: str) -> None:
        name = self.ref_names[rid]
        if fmt == "bed":
            strand = b"+" if m.direction == 1 else b"-"
            end = m.start + m.length
            if m.has_barcode:
                bc = self._translate_barcode(m.barcode)
                self._w(name + b"\t" + str(m.start).encode() + b"\t"
                        + str(end).encode() + b"\t" + bc + b"\t"
                        + str(m.num_dups).encode() + b"\n")
            else:
                self._w(name + b"\t" + str(m.start).encode() + b"\t"
                        + str(end).encode() + b"\tN\t" + str(m.mapq).encode()
                        + b"\t" + strand + b"\t" + str(m.num_dups).encode()
                        + b"\n")
        else:  # TagAlign / BEDPE-style two-line output
            positive_read_end = m.start + m.positive_alignment_length
            negative_read_end = m.start + m.length
            negative_read_start = negative_read_end - m.negative_alignment_length
            mapq = str(m.mapq).encode()
            if m.has_barcode:
                if m.direction == 1:
                    self._w(name + b"\t" + str(m.start).encode() + b"\t"
                            + str(positive_read_end).encode() + b"\tN\t" + mapq
                            + b"\t+\n" + name + b"\t"
                            + str(negative_read_start).encode() + b"\t"
                            + str(negative_read_end).encode() + b"\tN\t" + mapq
                            + b"\t-\n")
                else:
                    self._w(name + b"\t" + str(negative_read_start).encode()
                            + b"\t" + str(negative_read_end).encode()
                            + b"\tN\t" + mapq + b"\t-\n" + name + b"\t"
                            + str(m.start).encode() + b"\t"
                            + str(positive_read_end).encode() + b"\tN\t" + mapq
                            + b"\t+\n")
            else:
                if m.direction == 1:
                    self._w(name + b"\t" + str(m.start).encode() + b"\t"
                            + str(positive_read_end).encode() + b"\tN\t" + mapq
                            + b"\t+\n" + name + b"\t"
                            + str(negative_read_start).encode() + b"\t"
                            + str(negative_read_end).encode() + b"\tN\t" + mapq
                            + b"\t-\t" + str(m.num_dups).encode() + b"\n")
                else:
                    self._w(name + b"\t" + str(negative_read_start).encode()
                            + b"\t" + str(negative_read_end).encode()
                            + b"\tN\t" + mapq + b"\t-\n" + name + b"\t"
                            + str(m.start).encode() + b"\t"
                            + str(positive_read_end).encode() + b"\tN\t" + mapq
                            + b"\t+\t" + str(m.num_dups).encode() + b"\n")

    def _append_paf(self, rid: int, m: PafRecord) -> None:
        name = self.ref_names[rid]
        ref_len = self.ref_lengths[rid]
        strand = b"+" if m.direction == 1 else b"-"
        end = m.start + m.length
        rl = str(m.read_length).encode()
        self._w(m.read_name + b"\t" + rl + b"\t0\t" + rl + b"\t" + strand
                + b"\t" + name + b"\t" + str(ref_len).encode() + b"\t"
                + str(m.start).encode() + b"\t" + str(end).encode() + b"\t"
                + rl + b"\t" + str(m.length).encode() + b"\t"
                + str(m.mapq).encode() + b"\n")

    def _append_paired_paf(self, rid: int, m: PairedPafRecord) -> None:
        name = self.ref_names[rid]
        ref_len = str(self.ref_lengths[rid]).encode()
        positive_read_end = m.start + m.positive_alignment_length
        negative_read_end = m.start + m.length
        negative_read_start = negative_read_end - m.negative_alignment_length
        rl1 = str(m.read1_length).encode()
        rl2 = str(m.read2_length).encode()
        if m.direction == 1:
            self._w(m.read1_name + b"\t" + rl1 + b"\t0\t" + rl1 + b"\t+\t"
                    + name + b"\t" + ref_len + b"\t" + str(m.start).encode()
                    + b"\t" + str(positive_read_end).encode() + b"\t" + rl1
                    + b"\t" + str(m.positive_alignment_length).encode() + b"\t"
                    + str(m.mapq1).encode() + b"\n")
            self._w(m.read2_name + b"\t" + rl2 + b"\t0\t" + rl2 + b"\t-\t"
                    + name + b"\t" + ref_len + b"\t"
                    + str(negative_read_start).encode() + b"\t"
                    + str(negative_read_end).encode() + b"\t" + rl2 + b"\t"
                    + str(m.negative_alignment_length).encode() + b"\t"
                    + str(m.mapq2).encode() + b"\n")
        else:
            self._w(m.read1_name + b"\t" + rl1 + b"\t0\t" + rl1 + b"\t-\t"
                    + name + b"\t" + ref_len + b"\t"
                    + str(negative_read_start).encode() + b"\t"
                    + str(negative_read_end).encode() + b"\t" + rl1 + b"\t"
                    + str(m.negative_alignment_length).encode() + b"\t"
                    + str(m.mapq1).encode() + b"\n")
            self._w(m.read2_name + b"\t" + rl2 + b"\t0\t" + rl2 + b"\t+\t"
                    + name + b"\t" + ref_len + b"\t" + str(m.start).encode()
                    + b"\t" + str(positive_read_end).encode() + b"\t" + rl2
                    + b"\t" + str(m.positive_alignment_length).encode() + b"\t"
                    + str(m.mapq2).encode() + b"\n")

    def _append_sam(self, rid: int, m: SamRecord) -> None:
        ref_name = b"*" if (m.flag & 0x4) else self.ref_names[rid]
        if m.mrid < 0:
            mate_name = b"*"
            mate_pos = 0
        else:
            mate_name = b"=" if m.mrid == rid else self.ref_names[m.mrid]
            mate_pos = m.mpos + 1
        if m.cigar:
            cigar_str = b"".join(
                str(c >> 4).encode() + BAM_CIGAR_STR[c & 0xF:(c & 0xF) + 1]
                for c in m.cigar)
        else:
            cigar_str = b"*"
        line = (m.read_name + b"\t" + str(m.flag).encode() + b"\t" + ref_name
                + b"\t" + str(m.pos + 1).encode() + b"\t"
                + str(m.mapq).encode() + b"\t" + cigar_str + b"\t" + mate_name
                + b"\t" + str(mate_pos).encode() + b"\t" + str(m.tlen).encode()
                + b"\t" + m.sequence + b"\t" + m.qual + b"\tNM:i:"
                + str(m.NM).encode() + b"\tMD:Z:" + m.MD)
        self._w(line)
        if self.cell_barcode_length > 0:
            self._w(b"\tCB:Z:" + self._translate_barcode(m.barcode))
        self._w(b"\n")

    def _append_pairs(self, rid: int, m: PairsRecord) -> None:
        name1 = self.ref_names[m.rid1]
        name2 = self.ref_names[m.rid2]
        s1 = b"+" if m.strand1 > 0 else b"-"
        s2 = b"+" if m.strand2 > 0 else b"-"
        self._w(m.read_name + b"\t" + name1 + b"\t" + str(m.pos1 + 1).encode()
                + b"\t" + name2 + b"\t" + str(m.pos2 + 1).encode() + b"\t" + s1
                + b"\t" + s2 + b"\tUU\t" + str(m.mapq).encode() + b"\t"
                + str(m.mapq).encode() + b"\n")
