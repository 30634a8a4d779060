"""Custom read-format effective ranges (`--read-format`).

Parses segment specs like ``r1:0:-1,bc:0:15:-`` and rewrites sequences /
quality strings to the concatenated effective ranges, reverse-complementing
on '-' strand. Mirrors sequence_effective_range.h:15-134.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ..utils import reverse_complement_ascii


@dataclass
class EffectiveRange:
    ranges: List[Tuple[int, int]] = field(default_factory=lambda: [(0, -1)])
    strand: str = "+"

    @classmethod
    def full(cls) -> "EffectiveRange":
        return cls()

    def is_full_positive(self) -> bool:
        return self.strand == "+" and self.ranges and self.ranges[0] == (0, -1)

    def apply(self, s: bytearray, is_seq: bool) -> bytearray:
        if self.is_full_positive():
            return s
        out = bytearray()
        for start, end in self.ranges:
            e = len(s) - 1 if end == -1 else end
            out.extend(s[start:e + 1])
        if self.strand == "-":
            if is_seq:
                out = bytearray(reverse_complement_ascii(bytes(out)))
            else:
                out.reverse()
        return out


@dataclass
class ReadFormat:
    """Per-stream effective ranges parsed from a --read-format string."""

    r1: EffectiveRange = field(default_factory=EffectiveRange.full)
    r2: EffectiveRange = field(default_factory=EffectiveRange.full)
    bc: EffectiveRange = field(default_factory=EffectiveRange.full)

    @classmethod
    def parse(cls, format_string: str) -> "ReadFormat":
        fmt = cls()
        pending = {"r1": [], "r2": [], "bc": []}
        strands = {"r1": "+", "r2": "+", "bc": "+"}
        for token in format_string.split(","):
            token = token.strip()
            if not token:
                continue
            key = token[:2]
            if key not in pending:
                raise ValueError(f"Bad read-format segment {token!r}")
            fields = token[3:].split(":") if len(token) > 3 else []
            if len(fields) < 2:
                raise ValueError(f"Bad read-format segment {token!r}")
            start, end = int(fields[0]), int(fields[1])
            pending[key].append((start, end))
            if len(fields) >= 3 and fields[2]:
                strands[key] = fields[2][0]
        for key, ranges in pending.items():
            if ranges:
                er = EffectiveRange(ranges=ranges, strand=strands[key])
                setattr(fmt, key, er)
        return fmt
