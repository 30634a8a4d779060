"""CIGAR utilities: NM / MD tag generation (alignment.cc:85-139)."""

from __future__ import annotations

from typing import List, Tuple

BAM_CMATCH = 0
BAM_CINS = 1
BAM_CDEL = 2


def generate_nm_md(reference: bytes, read: bytes, mapping_start_position: int,
                   cigar: List[int]) -> Tuple[int, bytes]:
    """Walk the CIGAR accumulating NM and the MD tag.

    `reference` is the full reference sequence; alignment starts at
    `mapping_start_position`. Base comparison allows a lowercase reference
    (ref base == read base or uppercased ref base == read base).
    """
    nm = 0
    md = bytearray()
    num_matches = 0
    read_position = 0
    reference_position = mapping_start_position

    def bases_equal(ref_b: int, read_b: int) -> bool:
        if ref_b == read_b:
            return True
        return 0x61 <= ref_b <= 0x7A and (ref_b - 0x20) == read_b

    for c in cigar:
        op = c & 0xF
        oplen = c >> 4
        if op == BAM_CMATCH:
            for _ in range(oplen):
                if bases_equal(reference[reference_position],
                               read[read_position]):
                    num_matches += 1
                else:
                    nm += 1
                    md += str(num_matches).encode()
                    num_matches = 0
                    md.append(reference[reference_position])
                reference_position += 1
                read_position += 1
        elif op == BAM_CINS:
            nm += oplen
            read_position += oplen
        elif op == BAM_CDEL:
            nm += oplen
            md += str(num_matches).encode()
            num_matches = 0
            md.append(ord("^"))
            for _ in range(oplen):
                md.append(reference[reference_position])
                reference_position += 1
    md += str(num_matches).encode()
    return nm, bytes(md)


def sequence_length_from_cigar(cigar: List[int]) -> int:
    """Read-consuming length (M/I/S), mirroring SAMMapping::GetSequenceLength."""
    total = 0
    for c in cigar:
        op = c & 0xF
        if op in (0, 1, 4):
            total += c >> 4
    return total
