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


# ---------------------------------------------------------------------------
# Binary codecs for low-memory temp shards (temp_mapping.h analog).
#
# Fixed fields pack with one struct per type; string fields (names, MD,
# sequence, qual) append u16-length-prefixed, CIGARs as u16 count + u32 ops
# (the reference freads raw PODs for fixed types and uses per-record
# WriteToFile/LoadFromFile specializations for string-bearing ones,
# temp_mapping.h:107-273).
# ---------------------------------------------------------------------------

import struct as _struct

_SE_S = _struct.Struct("<IQIHBBBBB")
_PE_S = _struct.Struct("<IQIHBBBBHHB")
_PAF_S = _struct.Struct("<IIIIBBBB")
_PPAF_S = _struct.Struct("<IIIIIIIBBBBBB")
_SAM_S = _struct.Struct("<IQBIiIiqHBBBH")
_PAIRS_S = _struct.Struct("<IQiiIIBBBBB")
_U16 = _struct.Struct("<H")
_U64 = _struct.Struct("<Q")


def _put_bytes(buf: bytearray, b: bytes) -> None:
    buf += _U16.pack(len(b))
    buf += b


def _get_bytes(mv, off: int):
    (n,) = _U16.unpack_from(mv, off)
    off += 2
    return bytes(mv[off:off + n]), off + n


def _se_to_binary(self, buf: bytearray) -> None:
    buf += _SE_S.pack(self.read_id, self.barcode, self.start, self.length,
                      self.mapq, self.direction, self.is_unique,
                      min(self.num_dups, 255), 1 if self.has_barcode else 0)


def _se_from_binary(mv, off: int):
    f = _SE_S.unpack_from(mv, off)
    return SEBedRecord(f[0], f[1], f[2], f[3], f[4], f[5], f[6], f[7],
                       bool(f[8])), off + _SE_S.size


def _pe_to_binary(self, buf: bytearray) -> None:
    buf += _PE_S.pack(self.read_id, self.barcode, self.start, self.length,
                      self.mapq, self.direction, self.is_unique,
                      min(self.num_dups, 255),
                      self.positive_alignment_length,
                      self.negative_alignment_length,
                      1 if self.has_barcode else 0)


def _pe_from_binary(mv, off: int):
    f = _PE_S.unpack_from(mv, off)
    return PEBedRecord(f[0], f[1], f[2], f[3], f[4], f[5], f[6], f[7],
                       f[8], f[9], bool(f[10])), off + _PE_S.size


def _paf_to_binary(self, buf: bytearray) -> None:
    buf += _PAF_S.pack(self.read_id, self.read_length, self.start,
                       self.length, self.mapq, self.direction,
                       self.is_unique, min(self.num_dups, 255))
    _put_bytes(buf, self.read_name)


def _paf_from_binary(mv, off: int):
    f = _PAF_S.unpack_from(mv, off)
    name, off = _get_bytes(mv, off + _PAF_S.size)
    return PafRecord(f[0], name, f[1], f[2], f[3], f[4], f[5], f[6],
                     f[7]), off


def _ppaf_to_binary(self, buf: bytearray) -> None:
    buf += _PPAF_S.pack(self.read_id, self.read1_length, self.read2_length,
                        self.start, self.negative_alignment_length,
                        self.length, self.positive_alignment_length,
                        self.mapq & 0xFF, self.mapq1, self.mapq2,
                        self.direction, self.is_unique,
                        min(self.num_dups, 255))
    _put_bytes(buf, self.read1_name)
    _put_bytes(buf, self.read2_name)


def _ppaf_from_binary(mv, off: int):
    f = _PPAF_S.unpack_from(mv, off)
    n1, off = _get_bytes(mv, off + _PPAF_S.size)
    n2, off = _get_bytes(mv, off)
    return PairedPafRecord(f[0], n1, n2, f[1], f[2], f[3], f[4], f[5],
                           f[6], f[7], f[8], f[9], f[10], f[11], f[12]), off


def _sam_to_binary(self, buf: bytearray) -> None:
    buf += _SAM_S.pack(self.read_id, self.barcode, min(self.num_dups, 255),
                       self.pos, self.rid, self.mpos, self.mrid, self.tlen,
                       self.flag, self.direction, self.is_unique, self.mapq,
                       self.NM)
    _put_bytes(buf, self.read_name)
    _put_bytes(buf, self.MD)
    _put_bytes(buf, self.sequence)
    _put_bytes(buf, self.qual)
    buf += _U16.pack(len(self.cigar))
    for c in self.cigar:
        buf += _struct.pack("<I", c)


def _sam_from_binary(mv, off: int):
    f = _SAM_S.unpack_from(mv, off)
    off += _SAM_S.size
    name, off = _get_bytes(mv, off)
    md, off = _get_bytes(mv, off)
    seq, off = _get_bytes(mv, off)
    qual, off = _get_bytes(mv, off)
    (nc,) = _U16.unpack_from(mv, off)
    off += 2
    cigar = list(_struct.unpack_from(f"<{nc}I", mv, off)) if nc else []
    off += 4 * nc
    return SamRecord(f[0], name, f[1], f[2], f[3], f[4], f[5], f[6], f[7],
                     f[8], f[9], f[10], f[11], f[12], cigar, md, seq,
                     qual), off


def _pairs_to_binary(self, buf: bytearray) -> None:
    buf += _PAIRS_S.pack(self.read_id, self.barcode, self.rid1, self.rid2,
                         self.pos1, self.pos2, self.strand1, self.strand2,
                         self.mapq, self.is_unique, min(self.num_dups, 255))
    _put_bytes(buf, self.read_name)


def _pairs_from_binary(mv, off: int):
    f = _PAIRS_S.unpack_from(mv, off)
    name, off = _get_bytes(mv, off + _PAIRS_S.size)
    return PairsRecord(f[0], name, f[1], f[2], f[3], f[4], f[5], f[6],
                       f[7], f[8], f[9], f[10]), off


SEBedRecord.to_binary = _se_to_binary
PEBedRecord.to_binary = _pe_to_binary
PafRecord.to_binary = _paf_to_binary
PairedPafRecord.to_binary = _ppaf_to_binary
SamRecord.to_binary = _sam_to_binary
PairsRecord.to_binary = _pairs_to_binary

# shard type tags (format byte in the temp-shard header)
RECORD_CODECS = {
    1: (SEBedRecord, _se_from_binary),
    2: (PEBedRecord, _pe_from_binary),
    3: (PafRecord, _paf_from_binary),
    4: (PairedPafRecord, _ppaf_from_binary),
    5: (SamRecord, _sam_from_binary),
    6: (PairsRecord, _pairs_from_binary),
}
RECORD_TAGS = {cls: tag for tag, (cls, _) in RECORD_CODECS.items()}
