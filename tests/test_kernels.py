"""Unit tests of the core kernels against brute-force oracles."""

import numpy as np
import pytest

from chromap_tpu.mapping.verify import (banded_align, banded_traceback)
from chromap_tpu.index.minimizers import generate_minimizers, kmer_hashes
from chromap_tpu.utils import hash64, hash64_np


def brute_force_banded_edit_distance(pattern: bytes, text: bytes, e: int):
    """Plain DP edit distance of text against any start offset in
    [0, 2e] of pattern, end anywhere; returns min errors."""
    n = len(text)
    best = n + 10
    for start in range(0, 2 * e + 1):
        ref = pattern[start:start + n + (2 * e - start)]
        # semi-global: text fully aligned, ref window may extend
        m = len(ref)
        prev = list(range(0, m + 1))
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cost = 0 if text[i - 1] == ref[j - 1] else 1
                cur[j] = min(prev[j - 1] + cost, prev[j] + 1, cur[j - 1] + 1)
            prev = cur
        best = min(best, min(prev))
    return best


@pytest.mark.parametrize("seed", range(5))
def test_myers_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    e = 8
    n = 60
    bases = b"ACGT"
    ref = bytes(bases[i] for i in rng.integers(0, 4, n + 2 * e))
    # mutate a copy of the central part into the read
    read = bytearray(ref[e:e + n])
    for _ in range(rng.integers(0, e)):
        p = rng.integers(0, n)
        read[p] = bases[rng.integers(0, 4)]
    read = bytes(read)
    errors, _ = banded_align(e, ref, read, n)
    expected = brute_force_banded_edit_distance(ref, read, e)
    if errors <= e:
        assert errors == expected
    else:
        assert expected > e or errors == e + 1


def test_hash64_np_matches_scalar():
    rng = np.random.default_rng(0)
    mask = (1 << 34) - 1
    keys = rng.integers(0, mask, 100, dtype=np.uint64)
    vec = hash64_np(keys, np.uint64(mask))
    for k, v in zip(keys, vec):
        assert hash64(int(k), mask) == int(v)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("k,w", [(17, 7), (19, 10), (23, 11)])
def test_minimizers_on_random_sequences(seed, k, w):
    rng = np.random.default_rng(seed)
    n = 500
    codes = rng.integers(0, 4, n).astype(np.uint8)
    # sprinkle ambiguous bases
    for p in rng.integers(0, n, 5):
        codes[p] = 4
    result = generate_minimizers(codes, 3, k, w)
    assert len(result) > 0
    # every emitted hash is the hash of the kmer at its recorded position
    hashes, strands, _ = kmer_hashes(codes, k)
    for h, hit in result:
        pos = (hit >> 1) & 0xFFFFFFFF
        strand = hit & 1
        assert hit >> 33 == 3
        assert int(hashes[pos]) == h
        assert int(strands[pos]) == strand
    # no duplicate (hash, hit) pairs
    assert len(set(result)) == len(result)


def test_minimizer_coverage_windows():
    """Each full window of w kmers must contain an emitted minimizer."""
    rng = np.random.default_rng(42)
    k, w = 17, 7
    n = 300
    codes = rng.integers(0, 4, n).astype(np.uint8)
    result = generate_minimizers(codes, 0, k, w)
    positions = sorted((hit >> 1) & 0xFFFFFFFF for _, hit in result)
    # windows of w consecutive kmers: end positions [p-w+1, p]
    for p in range(k - 1 + w - 1, n):
        assert any(p - w + 1 <= q <= p for q in positions), f"window at {p}"


def test_banded_align_very_wide_band():
    """e >= 32: the Python kernels widen past 64 bits (arbitrary-precision
    word); verify against brute-force semi-global DP."""
    import numpy as np
    from chromap_tpu.mapping.verify import banded_align

    rng = np.random.default_rng(5)
    e, L = 35, 120
    CH = b"ACGT"
    for _ in range(20):
        pat = rng.integers(0, 4, L + 2 * e)
        txt = pat[e:e + L].copy()
        for _ in range(rng.integers(0, 12)):
            txt[rng.integers(0, L)] = rng.integers(0, 4)
        p = bytes(CH[c] for c in pat)
        t = bytes(CH[c] for c in txt)
        ne, _ = banded_align(e, p, t, L)
        # brute-force semi-global edit distance (text fully consumed,
        # pattern suffix free)
        D = np.zeros((L + 1, len(p) + 1), dtype=int)
        D[:, 0] = np.arange(L + 1)
        for i in range(1, L + 1):
            for j in range(1, len(p) + 1):
                D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                              D[i - 1, j - 1] + (t[i - 1] != p[j - 1]))
        true_d = int(D[L].min())
        if true_d <= e:
            assert ne == true_d
        else:
            assert ne > e
