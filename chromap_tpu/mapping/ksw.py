"""Banded affine-gap semi-global alignment with CIGAR (host-exact path).

Equivalent of the vendored klib ksw_semi_global3 (ksw.cc:505-633) as used by
the SAM output path: query = reference window, target = read; free leading /
trailing gaps in the reference, CIGAR reported in read coordinates.

Implemented with numpy row sweeps (band is small: 2e+2 cells/row) so the
backtrack matrix stays exact. The Pallas wavefront kernel (ops/) covers the
batched device path; this is the oracle and per-read fallback.
"""

from __future__ import annotations

from typing import List, Tuple

from ..utils import _CHAR_TO_CODE

MINUS_INF = -0x40000000


def _push_cigar(cigar: List[int], op: int, length: int) -> None:
    if not cigar or (cigar[-1] & 0xF) != op:
        cigar.append(length << 4 | op)
    else:
        cigar[-1] += length << 4


def ksw_semi_global3(qlen: int, query: bytes, tlen: int, target: bytes,
                     match_score: int, mismatch_penalty: int,
                     gap_open: List[int], gap_ext: List[int],
                     w: int) -> Tuple[int, List[int], int, int]:
    """Returns (n_cigar, cigar, mapping_start_position, mapping_end_position).

    query: reference window (length qlen); target: read (length tlen).
    """
    o_del, o_ins = gap_open[0], gap_open[1]
    e_del, e_ins = gap_ext[0], gap_ext[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    # scoring: match_score on diagonal, -mismatch off-diagonal, 0 vs N
    def score_pair(qc: int, tc: int) -> int:
        a = _CHAR_TO_CODE[qc]
        b = _CHAR_TO_CODE[tc]
        if a == 4 or b == 4:
            return 0
        return match_score if a == b else -mismatch_penalty

    n_col = qlen if qlen < 2 * w + 1 else 2 * w + 1
    z = bytearray(n_col * tlen)

    h = [MINUS_INF] * (qlen + 1)
    e_arr = [MINUS_INF] * (qlen + 1)
    h[0] = 0
    for j in range(1, min(qlen, w) + 1):
        h[j] = 0

    for i in range(tlen):
        f = MINUS_INF
        beg = i
        end = i + w + 1 if i + w + 1 < qlen else qlen
        h1 = -(o_del + e_del * (i + 1)) if beg == 0 else MINUS_INF
        zi_base = i * n_col
        tc = target[i]
        for j in range(beg, end):
            m = h[j]
            e = e_arr[j]
            h[j] = h1
            m += score_pair(query[j], tc)
            d = 0 if m >= e else 1
            hh = m if m >= e else e
            if hh < f:
                d = 2
                hh = f
            h1 = hh
            t = m - oe_del
            e -= e_del
            if e > t:
                d |= 1 << 2
            else:
                e = t
            e_arr[j] = e
            t = m - oe_ins
            f -= e_ins
            if f > t:
                d |= 2 << 4
            else:
                f = t
            z[zi_base + (j - beg)] = d
        h[end] = h1
        e_arr[end] = MINUS_INF

    score = h[qlen]
    max_score_position = qlen
    for j in range(1, w):
        if h[qlen - j] > score:
            score = h[qlen - j]
            max_score_position = qlen - j

    cigar: List[int] = []
    i = tlen - 1
    k = max_score_position - 1
    which = 0
    rev: List[int] = []
    while i >= 0 and k >= 0:
        which = (z[i * n_col + (k - i)] >> (which << 1)) & 3
        if which == 0:
            _push_cigar(rev, 0, 1)
            i -= 1
            k -= 1
        elif which == 1:
            _push_cigar(rev, 1, 1)
            i -= 1
        else:
            _push_cigar(rev, 2, 1)
            k -= 1
    if i >= 0:
        _push_cigar(rev, 1, i + 1)
    mapping_start_position = k + 1
    rev.reverse()
    return len(rev), rev, mapping_start_position, max_score_position
