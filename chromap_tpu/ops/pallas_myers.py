"""Batched Myers bit-parallel banded edit distance as a Pallas TPU kernel.

This is the TPU-native widening of the reference's 4/8-lane SSE kernels
(alignment.cc:378-655): instead of 4 or 8 candidates per SIMD register,
every VPU lane carries one candidate and the batch axis spans all candidates
of a read batch. The band (2e+1 <= 31 diagonals) lives in one int32 per
lane; each step is ~25 elementwise int32 ops, so the kernel is VPU-bound
with all operands resident in VMEM.

Layout: patterns and texts are stored transposed, (L + 2e, N) / (L, N), so
step i reads one lane-contiguous row. Results match
`mapping.verify.banded_align` exactly for all candidates with distance <= e
(early termination is a final comparison rather than a mid-loop exit; the
reference's early exit can only affect candidates whose distance exceeds e,
which callers treat as failures either way -- the band-start error is
monotone non-decreasing and the final scan can lower it by at most 2e).

int32 semantics notes: XLA int32 add wraps two's-complement, identical in
bit pattern to the reference's uint32 wrap; right shifts are arithmetic in
jnp so logical shifts are emulated by masking.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 1024  # candidates per grid step (8 sublanes x 128 lanes)
_M31 = 0x7FFFFFFF


def _myers_kernel(e: int, read_length: int,
                  pattern_ref, text_ref, errors_ref, endpos_ref):
    """One grid step: LANE_TILE candidates, full read length.

    pattern_ref: (L + 2e, TILE) int32 codes (0..4)
    text_ref:    (L, TILE) int32 codes
    errors_ref:  (1, TILE) int32 out
    endpos_ref:  (1, TILE) int32 out
    """
    L = read_length
    tile = pattern_ref.shape[1]
    highest = jnp.int32(1 << (2 * e))
    zeros = jnp.zeros((1, tile), jnp.int32)

    def set_highest(peq, row):
        return [jnp.where(row == c, peq[c] | highest, peq[c])
                for c in range(5)]

    # init Peq from the first 2e pattern rows: inserting at the top bit and
    # shifting once per subsequent init step leaves the bit from row i at
    # position i, matching the reference's direct (1 << i) placement.
    peq = [zeros] * 5
    for i in range(2 * e):
        row = pattern_ref[i:i + 1, :]
        peq = set_highest(peq, row)
        peq = [p >> 1 for p in peq]  # values are non-negative here

    def step(i, carry):
        vp, vn, num_err, p0, p1, p2, p3, p4 = carry
        peq = [p0, p1, p2, p3, p4]
        prow = pattern_ref[pl.ds(i + 2 * e, 1), :]
        peq = set_highest(peq, prow)
        trow = text_ref[pl.ds(i, 1), :]
        x = jnp.where(trow == 0, peq[0],
            jnp.where(trow == 1, peq[1],
            jnp.where(trow == 2, peq[2],
            jnp.where(trow == 3, peq[3], peq[4]))))
        x = x | vn
        d0 = ((vp + (x & vp)) ^ vp) | x          # int32 wrap == uint32 wrap
        hn = vp & d0
        hp = vn | ~(vp | d0)
        x2 = (d0 >> 1) & _M31                    # logical shift
        vn_new = x2 & hp
        vp_new = hn | ~(x2 | hp)
        num_err = num_err + 1 - (d0 & 1)
        peq = [(p >> 1) & _M31 for p in peq]
        return (vp_new, vn_new, num_err) + tuple(peq)

    # int32 bounds keep the induction variable int32 under jax_enable_x64
    # (Mosaic cannot lower an int64 dynamic-slice start)
    init = (zeros, zeros, zeros) + tuple(peq)
    vp, vn, num_err, *_ = jax.lax.fori_loop(jnp.int32(0), jnp.int32(L),
                                            step, init)

    band_start = L - 1
    min_err = num_err
    end_pos = jnp.full((1, tile), band_start, jnp.int32)
    for i in range(2 * e):
        num_err = num_err + ((vp >> i) & 1) - ((vn >> i) & 1)
        better = (num_err < min_err) | ((num_err == min_err) & (i + 1 == e))
        end_pos = jnp.where(better, jnp.int32(band_start + 1 + i), end_pos)
        min_err = jnp.minimum(min_err, num_err)

    errors_ref[...] = min_err
    endpos_ref[...] = end_pos


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("e", "read_length"))
def myers_device(patterns_T: jax.Array, texts_T: jax.Array, e: int,
                 read_length: int) -> Tuple[jax.Array, jax.Array]:
    """patterns_T: (L+2e, N) int32; texts_T: (L, N) int32; N % LANE_TILE == 0."""
    n = patterns_T.shape[1]
    L = read_length
    kernel = functools.partial(_myers_kernel, e, L)
    num_tiles = n // LANE_TILE
    # index-map constants must be np.int32: under jax_enable_x64 (which the
    # seeding program sets process-wide) a Python 0 traces as i64, which
    # Mosaic cannot legalize (func.return (i64, i32))
    errors, endpos = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((L + 2 * e, LANE_TILE), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANE_TILE), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANE_TILE), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
    )(patterns_T, texts_T)
    return errors[0], endpos[0]


def banded_distance_batch(patterns: np.ndarray, texts: np.ndarray,
                          e: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: (N, L+2e) / (N, L) uint8 code arrays -> (errors, ends).

    N is padded to power-of-two multiples of LANE_TILE so the number of
    distinct compiled shapes stays bounded (recompiles are expensive,
    especially over the remote-compile relay)."""
    n, lp = patterns.shape
    L = texts.shape[1]
    assert lp == L + 2 * e
    n_pad = _pad_to(max(n, 1), LANE_TILE)
    # round up to the next power-of-two multiple of LANE_TILE
    tiles = n_pad // LANE_TILE
    n_pad = LANE_TILE * (1 << (tiles - 1).bit_length())
    pt = np.zeros((L + 2 * e, n_pad), dtype=np.int32)
    tt = np.zeros((L, n_pad), dtype=np.int32)
    pt[:, :n] = patterns.T
    tt[:, :n] = texts.T
    errors, endpos = myers_device(jnp.asarray(pt), jnp.asarray(tt), e, L)
    return (np.asarray(errors[:n]), np.asarray(endpos[:n]))


@functools.partial(jax.jit, static_argnames=("e", "read_length"))
def myers_jnp(patterns_T: jax.Array, texts_T: jax.Array, e: int,
              read_length: int) -> Tuple[jax.Array, jax.Array]:
    """Pure-jnp Myers batch (no Pallas): same math as the kernel, runs on
    any backend; used by the CPU-mesh dryrun and as a portable fallback.

    patterns_T: (L+2e, N) int32 codes; texts_T: (L, N)."""
    L = read_length
    n = patterns_T.shape[1]
    highest = jnp.int32(1 << (2 * e))
    zeros = jnp.zeros((n,), jnp.int32)

    def set_highest(peq, row):
        return [jnp.where(row == c, peq[c] | highest, peq[c])
                for c in range(5)]

    peq = [zeros] * 5
    for i in range(2 * e):
        peq = set_highest(peq, patterns_T[i])
        peq = [p >> 1 for p in peq]

    def step(carry, xs):
        vp, vn, num_err, p0, p1, p2, p3, p4 = carry
        prow, trow = xs
        peq = set_highest([p0, p1, p2, p3, p4], prow)
        x = jnp.where(trow == 0, peq[0],
            jnp.where(trow == 1, peq[1],
            jnp.where(trow == 2, peq[2],
            jnp.where(trow == 3, peq[3], peq[4]))))
        x = x | vn
        d0 = ((vp + (x & vp)) ^ vp) | x
        hn = vp & d0
        hp = vn | ~(vp | d0)
        x2 = (d0 >> 1) & _M31
        vn_new = x2 & hp
        vp_new = hn | ~(x2 | hp)
        num_err = num_err + 1 - (d0 & 1)
        peq = [(p >> 1) & _M31 for p in peq]
        return (vp_new, vn_new, num_err) + tuple(peq), None

    init = (zeros, zeros, zeros) + tuple(peq)
    (vp, vn, num_err, *_), _ = jax.lax.scan(
        step, init, (patterns_T[2 * e:2 * e + L], texts_T[:L]))

    band_start = L - 1
    min_err = num_err
    end_pos = jnp.full((n,), band_start, jnp.int32)
    for i in range(2 * e):
        num_err = num_err + ((vp >> i) & 1) - ((vn >> i) & 1)
        better = (num_err < min_err) | ((num_err == min_err) & (i + 1 == e))
        end_pos = jnp.where(better, band_start + 1 + i, end_pos)
        min_err = jnp.minimum(min_err, num_err)
    return min_err, end_pos


@functools.partial(jax.jit, static_argnames=("e", "read_length"))
def myers_dropoff_jnp(patterns_T: jax.Array, texts_T: jax.Array, e: int,
                      read_length: int
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched drop-off Myers (the split-alignment kernel,
    alignment.cc:197-283 / engine.cpp BandedAlignDropoffT): scan stops --
    per lane, by masking -- at the first step whose band-bottom error
    exceeds 2e, restoring the previous step's state. Returns
    (min_errors, end_position, read_mapping_length) with end_position
    NEGATED when the alignment failed early or maps under 30 bases
    (read_length > 60), exactly like the scalar kernel.

    The 3'-end variant is this kernel over reversed operands: Dropoff3End
    (pattern, text, L) == Dropoff(reverse(pattern), reverse(text), L),
    and both gap retries are the same kernel over operands shifted by the
    gap -- callers slice; no second code path.

    patterns_T: (L+2e, N) int32 codes; texts_T: (L, N)."""
    L = read_length
    n = patterns_T.shape[1]
    highest = jnp.int32(1 << (2 * e))
    zeros = jnp.zeros((n,), jnp.int32)

    def set_highest(peq, row):
        return [jnp.where(row == c, peq[c] | highest, peq[c])
                for c in range(5)]

    peq = [zeros] * 5
    for i in range(2 * e):
        peq = set_highest(peq, patterns_T[i])
        peq = [p >> 1 for p in peq]

    def step(carry, xs):
        (vp, vn, num_err, active, stop_i, fail,
         p0, p1, p2, p3, p4) = carry
        prow, trow, i = xs
        peq = set_highest([p0, p1, p2, p3, p4], prow)
        x = jnp.where(trow == 0, peq[0],
            jnp.where(trow == 1, peq[1],
            jnp.where(trow == 2, peq[2],
            jnp.where(trow == 3, peq[3], peq[4]))))
        x = x | vn
        d0 = ((vp + (x & vp)) ^ vp) | x
        hn = vp & d0
        hp = vn | ~(vp | d0)
        x2 = (d0 >> 1) & _M31
        vp_new = hn | ~(x2 | hp)
        vn_new = x2 & hp
        num_new = num_err + 1 - (d0 & 1)
        violate = active & (num_new > 2 * e)
        keep = active & ~violate
        # violating lanes freeze at the PREVIOUS step's state
        vp = jnp.where(keep, vp_new, vp)
        vn = jnp.where(keep, vn_new, vn)
        num_err = jnp.where(keep, num_new, num_err)
        stop_i = jnp.where(violate, i, stop_i)
        fail = fail | (violate & (i < 4 * e) & (i < L // 2))
        peq = [(p >> 1) & _M31 for p in peq]
        return ((vp, vn, num_err, keep, stop_i, fail) + tuple(peq)), None

    init = (zeros, zeros, zeros, jnp.ones((n,), bool),
            jnp.full((n,), L, jnp.int32), jnp.zeros((n,), bool)) + tuple(peq)
    (vp, vn, num_err, _, stop_i, fail, *_), _ = jax.lax.scan(
        step, init,
        (patterns_T[2 * e:2 * e + L], texts_T[:L],
         jnp.arange(L, dtype=jnp.int32)))

    band_start = stop_i - 1
    rml = stop_i
    min_err = num_err
    end_pos = band_start
    for j in range(2 * e):
        num_err = num_err + ((vp >> j) & 1) - ((vn >> j) & 1)
        better = (num_err < min_err) | ((num_err == min_err) & (j + 1 == e))
        end_pos = jnp.where(better, band_start + 1 + j, end_pos)
        min_err = jnp.minimum(min_err, num_err)
    neg = fail | ((L > 60) & (end_pos + 1 - e - min_err < 30))
    end_pos = jnp.where(neg, -end_pos, end_pos)
    return min_err, end_pos, rml


def banded_distance_batch_numpy(patterns: np.ndarray, texts: np.ndarray,
                                e: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy implementation (uint32 exact) for testing and CPU
    fallback."""
    n, lp = patterns.shape
    L = texts.shape[1]
    U32 = np.uint32(0xFFFFFFFF)
    highest = np.uint32(1 << (2 * e))
    peq = np.zeros((5, n), dtype=np.uint32)
    for i in range(2 * e):
        row = patterns[:, i]
        for c in range(5):
            peq[c] = np.where(row == c, peq[c] | highest, peq[c])
        peq >>= np.uint32(1)
    vp = np.zeros(n, dtype=np.uint32)
    vn = np.zeros(n, dtype=np.uint32)
    num_err = np.zeros(n, dtype=np.int32)
    with np.errstate(over="ignore"):
        for i in range(L):
            row = patterns[:, i + 2 * e]
            for c in range(5):
                peq[c] = np.where(row == c, peq[c] | highest, peq[c])
            t = texts[:, i]
            x = np.select([t == c for c in range(5)],
                          [peq[c] for c in range(5)])
            x = (x | vn).astype(np.uint32)
            d0 = (((vp + (x & vp)) & U32) ^ vp) | x
            hn = vp & d0
            hp = (vn | (~(vp | d0) & U32)).astype(np.uint32)
            x2 = d0 >> np.uint32(1)
            vn = x2 & hp
            vp = (hn | (~(x2 | hp) & U32)).astype(np.uint32)
            num_err += 1 - (d0 & 1).astype(np.int32)
            peq >>= np.uint32(1)
    band_start = L - 1
    min_err = num_err.copy()
    end_pos = np.full(n, band_start, dtype=np.int32)
    for i in range(2 * e):
        num_err = (num_err + ((vp >> np.uint32(i)) & 1).astype(np.int32)
                   - ((vn >> np.uint32(i)) & 1).astype(np.int32))
        better = (num_err < min_err) | ((num_err == min_err) & (i + 1 == e))
        end_pos = np.where(better, band_start + 1 + i, end_pos)
        min_err = np.minimum(min_err, num_err)
    return min_err.astype(np.int32), end_pos.astype(np.int32)
