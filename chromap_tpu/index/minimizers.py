"""Minimizer extraction.

Produces (hash, hit) pairs with exactly the reference's emission semantics
(minimizer_generator.cc:7-139): canonical-strand double-hashed window
minimizers with duplicate emission, ambiguous-base resets, symmetric-kmer
skipping, and the first-window / end-of-sequence special cases.

Two implementations:
  * `generate_minimizers` — exact host oracle (state machine, per sequence).
  * `kmer_hashes` — vectorized per-position hash/strand precompute shared by
    the oracle and the device path (ops/minimizer_scan.py builds on it).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..utils import hash64_np

UMAX = 0xFFFFFFFFFFFFFFFF


def kmer_hashes(codes: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-position canonical kmer hash.

    Returns (hash, strand, symmetric) arrays of length len(codes):
      hash[p]   : double-Hash64 of the canonical kmer ending at p, or UMAX if
                  fewer than k unambiguous bases end at p.
      strand[p] : 1 if the reverse-complement hash is canonical, else 0.
      symmetric[p] : True where fwd kmer equals its reverse complement (these
                  positions do not occupy a window slot).
    """
    n = len(codes)
    mask = np.uint64((1 << (2 * k)) - 1)
    if n < k:
        return (np.full(n, UMAX, dtype=np.uint64),
                np.zeros(n, dtype=np.uint8), np.zeros(n, dtype=bool))

    valid_base = codes < 4
    # unambiguous run length ending at each position
    run = np.zeros(n, dtype=np.int64)
    acc = 0
    invalid_idx = np.flatnonzero(~valid_base)
    # run[p] = p - last_invalid_at_or_before(p)
    last_invalid = np.full(n, -1, dtype=np.int64)
    if len(invalid_idx) > 0:
        fill = np.zeros(n, dtype=np.int64)
        fill[invalid_idx] = 1
        # index of most recent invalid position <= p
        cummax = np.maximum.accumulate(np.where(fill > 0, np.arange(n), -1))
        last_invalid = cummax
    run = np.arange(n) - last_invalid
    del acc

    # Rolling fwd/rc registers ignoring invalid bases (register persists on N,
    # matching the reference; only positions with run >= k are valid anyway).
    b = np.where(valid_base, codes, 0).astype(np.uint64)
    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    # windows of the last k *characters* are correct wherever run >= k,
    # because by then all register content comes from valid bases.
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(b, k)  # (n-k+1, k)
    powers_fwd = (np.uint64(2) * np.arange(k - 1, -1, -1, dtype=np.uint64))
    powers_rc = (np.uint64(2) * np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        fwd_win = (win << powers_fwd[None, :]).sum(axis=1, dtype=np.uint64) & mask
        rc_win = ((np.uint64(3) ^ win) << powers_rc[None, :]).sum(
            axis=1, dtype=np.uint64) & mask
    fwd[k - 1:] = fwd_win
    rc[k - 1:] = rc_win

    kmer_valid = run >= k
    symmetric = (fwd == rc) & kmer_valid

    hf = hash64_np(fwd, mask)
    hr = hash64_np(rc, mask)
    strand = (hr < hf).astype(np.uint8) ^ 1  # 1 when rc canonical? see below
    # reference: strand = 0 if Hash64(fwd) < Hash64(rc) else 1
    strand = np.where(hf < hr, 0, 1).astype(np.uint8)
    canonical = np.where(hf < hr, hf, hr)
    h = hash64_np(canonical, mask)
    h = np.where(kmer_valid & ~symmetric, h, np.uint64(UMAX))
    return h, strand, symmetric


def generate_minimizers(codes: np.ndarray, sequence_index: int, k: int,
                        w: int) -> List[Tuple[int, int]]:
    """Exact oracle. Returns list of (hash, hit) in emission order.

    hit = (sequence_index << 33) | (end_position << 1) | strand.
    """
    n = len(codes)
    hashes, strands, symmetric = kmer_hashes(codes, k)
    run_valid = None  # computed inside kmer_hashes

    # recompute run lengths (unambiguous_length in the reference)
    valid_base = codes < 4
    out: List[Tuple[int, int]] = []

    buffer = [(UMAX, UMAX)] * w
    min_seed = (UMAX, UMAX)
    min_position = 0
    position_in_buffer = 0
    unambiguous_length = 0
    seq_hi = sequence_index << 33

    for p in range(n):
        if valid_base[p]:
            if symmetric[p]:
                # symmetric kmer: does not occupy a window slot
                unambiguous_length += 1
                continue
            unambiguous_length += 1
            if unambiguous_length >= k:
                cur = (int(hashes[p]), seq_hi | (p << 1) | int(strands[p]))
            else:
                cur = (UMAX, UMAX)
        else:
            unambiguous_length = 0
            cur = (UMAX, UMAX)

        buffer[position_in_buffer] = cur
        if (unambiguous_length == w + k - 1 and min_seed[0] != UMAX
                and min_seed[0] < cur[0]):
            # First full window: flush duplicates of the min collected so far.
            for j in range(position_in_buffer + 1, w):
                if min_seed[0] == buffer[j][0] and buffer[j][1] != min_seed[1]:
                    out.append(buffer[j])
            for j in range(position_in_buffer):
                if min_seed[0] == buffer[j][0] and buffer[j][1] != min_seed[1]:
                    out.append(buffer[j])

        if cur[0] <= min_seed[0]:
            if unambiguous_length >= w + k and min_seed[0] != UMAX:
                out.append(min_seed)
            min_seed = cur
            min_position = position_in_buffer
        elif position_in_buffer == min_position:
            # the old min just slid out of the window
            if unambiguous_length >= w + k - 1 and min_seed[0] != UMAX:
                out.append(min_seed)
            min_seed = (UMAX, UMAX)
            for j in range(position_in_buffer + 1, w):
                if min_seed[0] >= buffer[j][0]:
                    min_seed = buffer[j]
                    min_position = j
            for j in range(position_in_buffer + 1):
                if min_seed[0] >= buffer[j][0]:
                    min_seed = buffer[j]
                    min_position = j
            if unambiguous_length >= w + k - 1 and min_seed[0] != UMAX:
                for j in range(position_in_buffer + 1, w):
                    if min_seed[0] == buffer[j][0] and min_seed[1] != buffer[j][1]:
                        out.append(buffer[j])
                for j in range(position_in_buffer + 1):
                    if min_seed[0] == buffer[j][0] and min_seed[1] != buffer[j][1]:
                        out.append(buffer[j])

        position_in_buffer += 1
        if position_in_buffer == w:
            position_in_buffer = 0

    if min_seed[0] != UMAX:
        out.append(min_seed)
    return out


def generate_minimizers_arrays(codes: np.ndarray, sequence_index: int, k: int,
                               w: int) -> Tuple[np.ndarray, np.ndarray]:
    pairs = generate_minimizers(codes, sequence_index, k, w)
    if not pairs:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
    h = np.array([p[0] for p in pairs], dtype=np.uint64)
    hits = np.array([p[1] for p in pairs], dtype=np.uint64)
    return h, hits
