"""Barcode translation for combinatorial indexing (10x Multiome /
SHARE-seq). Mirrors barcode_translator.h:23-138: a (to,from) table keyed by
2-bit packed `from` chunks; observed barcodes are split into `from`-length
chunks, translated, and joined with '-'."""

from __future__ import annotations

from typing import Dict, Optional

from ..io.fastx import _open_text_auto
from ..utils import encode_sequence, generate_seed_from_codes

_UINT8_TO_CHAR = b"ACGTNNNN"


def seed_to_sequence(seed: int, length: int) -> bytes:
    out = bytearray()
    for i in range(length):
        out.append(_UINT8_TO_CHAR[(seed >> ((length - 1 - i) * 2)) & 3])
    return bytes(out)


class BarcodeTranslator:
    def __init__(self, table_path: Optional[str] = None):
        self.table: Optional[Dict[int, bytes]] = None
        self.from_bc_length = -1
        if table_path:
            self.set_translate_table(table_path)

    def set_translate_table(self, path: str) -> None:
        self.table = {}
        f = _open_text_auto(path)
        for raw in f:
            line = raw.rstrip(b"\n")
            if not line:
                continue
            sep = len(line)
            for i, ch in enumerate(line):
                if ch in (ord(","), ord("\t")):
                    sep = i
                    break
            to = line[:sep]
            frm = line[sep + 1:]
            self.from_bc_length = len(frm)
            from_seed = generate_seed_from_codes(encode_sequence(frm), 0,
                                                 len(frm))
            self.table[from_seed] = to
        f.close()
        self.mask = (1 << (2 * self.from_bc_length)) - 1

    def translate(self, bc: int, bc_length: int) -> bytes:
        if self.table is None:
            return seed_to_sequence(bc, bc_length)
        parts = []
        chunks = bc_length // self.from_bc_length
        for i in range(chunks):
            # uint64 left shift wraps in the reference
            shifted = (bc << (2 * i * self.from_bc_length)) \
                & 0xFFFFFFFFFFFFFFFF
            seed = (shifted >> (2 * (chunks - 1) * self.from_bc_length)) \
                & self.mask
            if seed not in self.table:
                raise SystemExit(
                    "Barcode does not exist in the translation table.")
            parts.append(self.table[seed])
        return b"-".join(parts)
