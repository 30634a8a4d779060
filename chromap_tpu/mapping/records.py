"""Mapping record types for each output format.

Mirrors the reference's bit-packed PODs (bed_mapping.h, paf_mapping.h,
sam_mapping.h, pairs_mapping.h): sort order (operator<), duplicate equality
(operator== / IsSamePosition), and Tn5 shift semantics per type.

mapq is stored saturated to 6 bits (mapq_:6 bitfield in the reference), so
writers and comparators see the same truncated values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

U16 = 0xFFFF


def clip_mapq(mapq: int) -> int:
    return mapq & 0x3F


@dataclass
class SEBedRecord:
    """Single-end BED/TagAlign record (MappingWith(out)Barcode)."""

    read_id: int
    barcode: int  # 0 in bulk mode
    start: int
    length: int  # uint16
    mapq: int    # stored as 6-bit field
    direction: int  # 1 positive, 0 negative
    is_unique: int
    num_dups: int
    has_barcode: bool = False

    def sort_key(self):
        if self.has_barcode:
            return (self.start, self.length, self.barcode, self.mapq,
                    self.direction, self.is_unique, self.read_id)
        return (self.start, self.length, self.mapq, self.direction,
                self.is_unique, self.read_id)

    def dup_key(self):
        if self.has_barcode:
            return (self.barcode, self.start)
        return (self.start,)

    def same_position_key(self):
        return (self.start,)

    def tn5_shift(self) -> None:
        if self.direction == 1:
            self.start += 4
        else:
            self.length = (self.length - 5) & U16

    def start_position(self) -> int:
        return self.start

    def end_position(self) -> int:
        return self.start + self.length


@dataclass
class PEBedRecord:
    """Paired-end BED/BEDPE record (PairedEndMappingWith(out)Barcode)."""

    read_id: int
    barcode: int
    start: int
    length: int  # fragment length, uint16
    mapq: int
    direction: int
    is_unique: int
    num_dups: int
    positive_alignment_length: int
    negative_alignment_length: int
    has_barcode: bool = False

    def sort_key(self):
        if self.has_barcode:
            return (self.start, self.length, self.barcode, self.mapq,
                    self.direction, self.is_unique, self.read_id,
                    self.positive_alignment_length, self.negative_alignment_length)
        return (self.start, self.length, self.mapq, self.direction,
                self.is_unique, self.read_id, self.positive_alignment_length,
                self.negative_alignment_length)

    def dup_key(self):
        if self.has_barcode:
            return (self.barcode, self.start, self.length)
        return (self.start, self.length)

    def same_position_key(self):
        return (self.start, self.length)

    def tn5_shift(self) -> None:
        self.start += 4
        self.positive_alignment_length = (self.positive_alignment_length - 4) & U16
        self.length = (self.length - 9) & U16
        self.negative_alignment_length = (self.negative_alignment_length - 5) & U16

    def start_position(self) -> int:
        return self.start

    def end_position(self) -> int:
        return self.start + self.length


@dataclass
class PafRecord:
    """Single-end PAF (paf_mapping.h)."""

    read_id: int
    read_name: bytes
    read_length: int
    start: int
    length: int
    mapq: int
    direction: int
    is_unique: int
    num_dups: int

    def sort_key(self):
        return (self.start, self.length, self.mapq, self.direction,
                self.is_unique, self.read_id, self.read_length)

    def dup_key(self):
        return (self.start,)

    def same_position_key(self):
        return (self.start,)

    def tn5_shift(self) -> None:
        if self.direction == 1:
            self.start += 4
        else:
            self.length = (self.length - 5) & U16

    def start_position(self) -> int:
        return self.start

    def end_position(self) -> int:
        return self.start + self.length


@dataclass
class PairedPafRecord:
    """Paired-end PAF (paf_mapping.h PairedPAFMapping)."""

    read_id: int
    read1_name: bytes
    read2_name: bytes
    read1_length: int
    read2_length: int
    start: int
    negative_alignment_length: int
    length: int
    positive_alignment_length: int
    mapq: int       # pair mapq
    mapq1: int
    mapq2: int
    direction: int
    is_unique: int
    num_dups: int

    def sort_key(self):
        return (self.start, self.length, self.mapq1, self.mapq2,
                self.direction, self.is_unique, self.read_id,
                self.positive_alignment_length, self.negative_alignment_length)

    def dup_key(self):
        return (self.start, self.length)

    def same_position_key(self):
        return (self.start, self.length)

    def tn5_shift(self) -> None:
        self.start += 4
        self.positive_alignment_length = (self.positive_alignment_length - 4) & U16
        self.length = (self.length - 9) & U16
        self.negative_alignment_length = (self.negative_alignment_length - 5) & U16

    def start_position(self) -> int:
        return self.start

    def end_position(self) -> int:
        return self.start + self.length


@dataclass
class SamRecord:
    """SAM record (sam_mapping.h). One per read end."""

    read_id: int
    read_name: bytes
    barcode: int
    num_dups: int
    pos: int       # 0-based leftmost
    rid: int
    mpos: int
    mrid: int
    tlen: int
    flag: int
    direction: int
    is_unique: int
    mapq: int      # full 0-60 (not 6-bit clipped in SAM)
    NM: int
    cigar: List[int]
    MD: bytes
    sequence: bytes   # already oriented to mapping strand
    qual: bytes

    def is_positive(self) -> bool:
        # In the reference, is_rev_ stores GetStrand(): 1 == positive.
        return self.direction > 0

    def sort_key(self):
        # sam_mapping.h:201-206
        read1_flag = self.flag & 0x40
        return (self.rid, self.pos, self.barcode, self.mrid, self.mpos,
                read1_flag, self.mapq, self.read_id)

    def dup_key(self):
        # sam_mapping.h:207-212
        read1_flag = self.flag & 0x40
        return (self.pos, self.rid, self.barcode, read1_flag, self.mrid,
                self.mpos)

    def same_position_key(self):
        # sam_mapping.h:213-216 -- note the reference compares this record's
        # mrid_ against the *other* record's rid_ (a quirk kept for parity);
        # with symmetric use in dedup this reduces to requiring mrid == rid
        # on both sides plus the tuple below.
        return (self.pos, self.rid, self.direction, self.mrid, self.mpos)

    def tn5_shift(self) -> None:
        pass  # reference performs no Tn5 shift on SAM records

    def start_position(self) -> int:
        return self.pos

    def end_position(self) -> int:
        ref_len = 0
        for c in self.cigar:
            op = c & 0xF
            if op in (0, 2, 3, 7, 8):  # M, D, N, =, X consume reference
                ref_len += c >> 4
        return self.pos + ref_len


@dataclass
class PairsRecord:
    """4DN pairs record (pairs_mapping.h)."""

    read_id: int
    read_name: bytes
    barcode: int
    rid1: int
    rid2: int
    pos1: int
    pos2: int
    strand1: int  # 1 positive
    strand2: int
    mapq: int
    is_unique: int
    num_dups: int

    def sort_key(self):
        # pairs_mapping.h:40-43
        return (self.rid1, self.rid2, self.pos1, self.pos2, self.mapq,
                self.read_id)

    def dup_key(self):
        # pairs_mapping.h:44-49
        return (self.rid1, self.pos1, self.rid2, self.pos2)

    def same_position_key(self):
        return (self.rid1, self.pos1, self.rid2, self.pos2)

    def tn5_shift(self) -> None:
        pass

    def start_position(self) -> int:
        return self.pos1

    def end_position(self) -> int:
        return self.pos1 + 1
