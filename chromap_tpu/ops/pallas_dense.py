"""Fused minimizer front-end (unpack -> k-mer hash -> window emission) as a
Pallas TPU kernel.

This replaces the dense (B, L) uint64 stages of ops/device_seed (`_kmer_stage`
+ `_emission_stage`, the closed-form port of minimizer_generator.cc:30-64 and
the sliding-window emission rule) with one VMEM-resident pass. The XLA u64
formulation emulates every op on the 32-bit VPU and round-trips ~30 (B, L)
u64 intermediates through HBM (measured 44 ms per 16384x100 chunk on v5e);
here the hash is explicit two-word u32 arithmetic, the layout is
position-major (L, TILE) so window shifts are static row offsets, and every
intermediate lives in VMEM.

Layout: one read per VPU lane, TILE = 1024 lanes (8 sublanes x 128 lanes per
vreg row), positions as rows. Phase A walks positions once, maintaining the
rolling forward/reverse k-mer registers (two u32 words each) and writing
hash planes; phase B applies the closed-form window-minimizer emission rule
with static row lookups (the per-lane `run_at_r` gather of the jnp form
becomes a first-hit tracker inside the d-loop).

Outputs match ops/device_seed._kmer_stage/_emission_stage bit-exactly:
  hlo   (L, B) i32  hash bits 0..31 (-1 at invalid positions)
  hhi   (L, B) i32  hash bits 32..55 | strand << 31 (-1 at invalid)
  emit  (L, B) i32  minimizer emission mask
  mm    (1, B) i32  per-read minimizer count
  bad   (1, B) i32  per-read (window hash tie | symmetric k-mer) flag
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 1024
_MIN32 = np.int32(-0x80000000)
_I0 = np.int32(0)
_I1 = np.int32(1)
_NEG1 = np.int32(-1)


def _lsr(x, c: int):
    """Logical shift right of an int32 vector by a static amount."""
    if c == 0:
        return x
    return (x >> c) & np.int32((1 << (32 - c)) - 1)


def _ltu(a, b):
    """Unsigned a < b on int32 vectors."""
    return (a ^ _MIN32) < (b ^ _MIN32)


def _two_word_ops(nbits: int):
    """Helpers for unsigned arithmetic within `nbits` (<= 56) bits carried
    as (lo, hi) int32 word pairs; hi is always masked to nbits-32 (>= 1)
    non-negative bits by the callers' & mask steps."""
    assert 32 < nbits <= 56
    hb = nbits - 32
    mhi = np.int32((1 << hb) - 1)

    def shl(lo, hi, c: int):
        if c >= 32:
            return jnp.zeros_like(lo), (lo << (c - 32)) & mhi
        return lo << c, ((hi << c) | _lsr(lo, 32 - c)) & mhi

    def lsr2(lo, hi, c: int):
        if c >= 32:
            return _lsr(hi, c - 32), jnp.zeros_like(hi)
        # hi has < 32 meaningful bits and is non-negative
        return _lsr(lo, c) | (hi << (32 - c)), hi >> c

    def add2(alo, ahi, blo, bhi):
        lo = alo + blo
        carry = _ltu(lo, alo).astype(jnp.int32)
        return lo, (ahi + bhi + carry) & mhi

    def ltu2(alo, ahi, blo, bhi):
        return _ltu(ahi, bhi) | ((ahi == bhi) & _ltu(alo, blo))

    def hash2(lo, hi):
        """utils.h:76-85 invertible mix within nbits bits."""
        # key = (~key + (key << 21)) & mask
        slo, shi = shl(lo, hi, 21)
        lo, hi = add2(~lo, ~hi, slo, shi)
        # key ^= key >> 24
        rlo, rhi = lsr2(lo, hi, 24)
        lo, hi = lo ^ rlo, hi ^ rhi
        # key = (key + (key << 3) + (key << 8)) & mask
        alo, ahi = shl(lo, hi, 3)
        blo, bhi = shl(lo, hi, 8)
        lo, hi = add2(lo, hi, alo, ahi)
        lo, hi = add2(lo, hi, blo, bhi)
        # key ^= key >> 14
        rlo, rhi = lsr2(lo, hi, 14)
        lo, hi = lo ^ rlo, hi ^ rhi
        # key = (key + (key << 2) + (key << 4)) & mask
        alo, ahi = shl(lo, hi, 2)
        blo, bhi = shl(lo, hi, 4)
        lo, hi = add2(lo, hi, alo, ahi)
        lo, hi = add2(lo, hi, blo, bhi)
        # key ^= key >> 28
        rlo, rhi = lsr2(lo, hi, 28)
        lo, hi = lo ^ rlo, hi ^ rhi
        # key = (key + (key << 31)) & mask
        slo, shi = shl(lo, hi, 31)
        return add2(lo, hi, slo, shi)

    return shl, lsr2, add2, ltu2, hash2, mhi


def _one_word_ops(nbits: int):
    """Single-word variants for 2k <= 32 (hi word is identically zero)."""
    assert nbits <= 32
    m = np.int32((1 << nbits) - 1) if nbits < 32 else _NEG1

    def hash1(key):
        key = (~key + (key << 21)) & m
        key = key ^ _lsr(key, 24)
        key = (key + (key << 3) + (key << 8)) & m
        key = key ^ _lsr(key, 14)
        key = (key + (key << 2) + (key << 4)) & m
        key = key ^ _lsr(key, 28)
        key = (key + (key << 31)) & m
        return key

    return hash1, m


def _dense_kernel(k: int, w: int, L: int, unroll: bool,
                  codes_ref, len_ref,
                  hlo_ref, hhi_ref, emit_ref, mm_ref, bad_ref,
                  s_hlo, s_hhi, s_run):
    nbits = 2 * k
    two_word = nbits > 32
    tile = codes_ref.shape[1]
    zeros = jnp.zeros((1, tile), jnp.int32)
    neg1 = jnp.full((1, tile), _NEG1)
    if two_word:
        shl, lsr2, add2, ltu2, hash2, mhi = _two_word_ops(nbits)
    else:
        hash1, m1 = _one_word_ops(nbits)

        def ltu2(alo, ahi, blo, bhi):
            return _ltu(ahi, bhi) | ((ahi == bhi) & _ltu(alo, blo))

    # pad rows L..L+w-1: hash = UMAX (invalid), run = 0
    for q in range(L, L + w):
        s_hlo[q:q + 1, :] = neg1
        s_hhi[q:q + 1, :] = neg1
        s_run[q:q + 1, :] = zeros

    # ---- phase A: rolling k-mer registers + hash planes ------------------
    def stepA(p, carry):
        flo, fhi, rlo, rhi, run, sym_any = carry
        c = codes_ref[pl.ds(p, 1), :]
        valid = c < 4
        b = jnp.where(valid, c, _I0)
        comp = jnp.where(valid, c ^ 3, np.int32(3))
        run = jnp.where(valid, run + _I1, _I0)
        if two_word:
            # fwd = ((fwd << 2) | b) & mask
            fhi = ((fhi << 2) | _lsr(flo, 30)) & mhi
            flo = (flo << 2) | b
            # rc = (rc >> 2) | (comp << (2k - 2))
            rlo = _lsr(rlo, 2) | (rhi << 30)
            rhi = (rhi >> 2) | (comp << (nbits - 2 - 32))
            hflo, hfhi = hash2(flo, fhi)
            hrlo, hrhi = hash2(rlo, rhi)
            strand = ~ltu2(hflo, hfhi, hrlo, hrhi)  # hf >= hr
            sym = (flo == rlo) & (fhi == rhi)
            slo = jnp.where(strand, hrlo, hflo)
            shi = jnp.where(strand, hrhi, hfhi)
            hlo, hhi = hash2(slo, shi)
        else:
            flo = ((flo << 2) | b) & m1
            rlo = _lsr(rlo, 2) | (comp << (nbits - 2))
            hflo = hash1(flo)
            hrlo = hash1(rlo)
            strand = ~_ltu(hflo, hrlo)
            sym = flo == rlo
            hlo = hash1(jnp.where(strand, hrlo, hflo))
            hhi = zeros
            fhi = rhi = zeros
        ok = run >= k
        sym = ok & sym
        inval = ~ok | sym
        hlo_row = jnp.where(inval, _NEG1, hlo)
        hhi_pure = jnp.where(inval, _NEG1, hhi)
        s_hlo[pl.ds(p, 1), :] = hlo_row
        s_hhi[pl.ds(p, 1), :] = hhi_pure
        s_run[pl.ds(p, 1), :] = run
        hlo_ref[pl.ds(p, 1), :] = hlo_row
        hhi_ref[pl.ds(p, 1), :] = jnp.where(
            inval, _NEG1, hhi | jnp.where(strand, _MIN32, _I0))
        # flag carries are int32: a bool (1, TILE) fori_loop carry crashes
        # the TPU backend compiler (tpu_compile_helper exit 1, v5e,
        # 2026-08-18); i32 0/1 lowers fine
        return (flo, fhi, rlo, rhi, run, sym_any | sym.astype(jnp.int32))

    # for real lowering both position loops are unrolled statically: a
    # fori_loop whose carry rows are (1, TILE) vectors trips a Mosaic
    # relayout bug on v5e ("Invalid relayout ... (1,128) -> replicated
    # (8,128)"), and static row offsets also drop the dynamic-store
    # bookkeeping. Interpret mode (CPU tests) keeps the fori_loop: the
    # eager interpreter would execute the ~200 unrolled bodies per call.
    carry = (zeros, zeros, zeros, zeros, zeros, zeros)
    if unroll:
        for p in range(L):
            carry = stepA(p, carry)
    else:
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(L), stepA, carry)
    sym_any = carry[-1]

    # ---- phase B: closed-form window emission (static row offsets) -------
    INF = np.int32(L + w + 1)
    seg_end = len_ref[...] - 1
    wk = np.int32(w + k)

    def stepB(p, carry):
        mm, tie_any = carry
        h_lo = s_hlo[pl.ds(p, 1), :]
        h_hi = s_hhi[pl.ds(p, 1), :]
        finite_p = ~((h_hi == _NEG1) & (h_lo == _NEG1))
        r_off = jnp.full((1, tile), INF)
        run_r = jnp.zeros((1, tile), jnp.int32)
        l_off = jnp.full((1, tile), INF)
        tie = jnp.zeros((1, tile), bool)
        for d in range(1, min(w, L - 1) + 1):
            nlo = s_hlo[pl.ds(p + d, 1), :]
            nhi = s_hhi[pl.ds(p + d, 1), :]
            finite_n = ~((nhi == _NEG1) & (nlo == _NEG1))
            lt = ltu2(nlo, nhi, h_lo, h_hi)
            tie = tie | ((nhi == h_hi) & (nlo == h_lo) & finite_n)
            first = lt & (r_off == INF)
            r_off = jnp.where(first, np.int32(d), r_off)
            run_r = jnp.where(first, s_run[pl.ds(p + d, 1), :], run_r)
            # python max when p is static: jnp.maximum of two Python ints
            # makes a weak i64 scalar under x64, which Mosaic cannot cast
            qb = max(p - d, 0) if unroll else jnp.maximum(p - np.int32(d),
                                                          _I0)
            plo = s_hlo[pl.ds(qb, 1), :]
            phi = s_hhi[pl.ds(qb, 1), :]
            maskb = p >= d
            tie = tie | ((phi == h_hi) & (plo == h_lo) & finite_p & maskb)
            if d <= w - 1:
                lt_l = ltu2(plo, phi, h_lo, h_hi) & maskb
                l_off = jnp.where(lt_l & (l_off == INF), np.int32(d), l_off)
        has_r = r_off <= w
        p32 = np.int32(p) if unroll else p
        a = jnp.where(l_off >= INF, p32, p32 + np.int32(w) - l_off)
        disp = has_r & (a <= p + r_off - 1) & (run_r >= wk)
        run_exit = s_run[pl.ds(p + w, 1), :]
        can_exit = ~has_r & (p + w <= seg_end)
        exit_emit = can_exit & (run_exit >= wk - 1)
        flush = ~has_r & (p + w > seg_end) & (a <= seg_end)
        emit = (disp | exit_emit | flush) & finite_p
        emit_ref[pl.ds(p, 1), :] = emit.astype(jnp.int32)
        return (mm + emit.astype(jnp.int32), tie_any | tie.astype(jnp.int32))

    carry = (jnp.zeros((1, tile), jnp.int32),
             jnp.zeros((1, tile), jnp.int32))
    if unroll:
        for p in range(L):
            carry = stepB(p, carry)
    else:
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(L), stepB, carry)
    mm, tie_any = carry
    mm_ref[...] = mm
    bad_ref[...] = tie_any | sym_any


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "L", "interpret"))
def dense_minimizer_device(codes_T: jax.Array, lengths_row: jax.Array,
                           k: int, w: int, L: int, interpret: bool = False
                           ) -> Tuple[jax.Array, ...]:
    """codes_T: (L, B) int32 codes (4 = N); lengths_row: (1, B) int32.
    B must be a multiple of LANE_TILE. Returns (hlo, hhi, emit, mm, bad)."""
    B = codes_T.shape[1]
    assert B % LANE_TILE == 0
    kernel = functools.partial(_dense_kernel, k, w, L, not interpret)
    grid = (B // LANE_TILE,)
    plane = pl.BlockSpec((L, LANE_TILE), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, LANE_TILE), lambda i: (np.int32(0), i),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane, row],
        out_specs=[plane, plane, plane, row, row],
        out_shape=[
            jax.ShapeDtypeStruct((L, B), jnp.int32),
            jax.ShapeDtypeStruct((L, B), jnp.int32),
            jax.ShapeDtypeStruct((L, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L + w, LANE_TILE), jnp.int32),
            pltpu.VMEM((L + w, LANE_TILE), jnp.int32),
            pltpu.VMEM((L + w, LANE_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(codes_T, lengths_row)
