"""Fused minimizer front-end (unpack -> k-mer hash -> window emission) as a
Pallas TPU kernel.

This replaces the dense (B, L) uint64 stages of ops/device_seed (`_kmer_stage`
+ `_emission_stage`, the closed-form port of minimizer_generator.cc:30-64 and
the sliding-window emission rule) with one VMEM-resident pass: the hash is
explicit two-word u32 arithmetic (the XLA u64 formulation emulates every op
on the 32-bit VPU and round-trips ~30 (B, L) u64 planes through HBM), and
every intermediate lives in VMEM.

Layout: one read per VPU element. The read axis B is viewed as
(SUB, B // SUB) and blocked along the minor axis, so position-rows are full
(8, 128)-vreg tiles. The whole kernel is closed-form over the position axis
-- packed k-mer values by log-doubling, run lengths by capped doubling,
window minima/ties by d-shifted plane compares -- so the body is ~400
whole-plane vector ops with no sequential position loop and no scratch.
(Two earlier shapes measured on the v5e at 16384x100: per-position rows at
(1, TILE) 26 ms, at (8, lanes) 24 ms -- the row-stepped forms were bound by
per-row issue overhead, not ALU; this plane form runs the same math in a
few ms.)

Outputs match ops/device_seed._kmer_stage/_emission_stage bit-exactly:
  hlo   (L, B) i32  hash bits 0..31 (-1 at invalid positions)
  hhi   (L, B) i32  hash bits 32..55 | strand << 31 (-1 at invalid)
  emit  (L, B) i32  minimizer emission mask
  mm    (1, B) i32  per-read minimizer count
  bad   (1, B) i32  per-read (window hash tie | symmetric k-mer) flag

where the (L, B) planes are the (L, SUB, B // SUB) kernel planes reshaped
back (a pure view: read r lives at (r // (B // SUB), r % (B // SUB))).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8           # sublanes per position-row
LANE_TILE = 1024  # reads per grid step = SUB * 128 lanes
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
        lo, hi = add2(~lo, ~hi & mhi, slo, shi)
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


def _sdn(x, d: int, fill):
    """Plane whose row p holds x[p - d] (`fill` in the first d rows)."""
    if d == 0:
        return x
    f = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([f, x[:-d]], axis=0)


def _sup(x, d: int, fill):
    """Plane whose row p holds x[p + d] (`fill` in the last d rows)."""
    if d == 0:
        return x
    f = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[d:], f], axis=0)


def _dense_kernel(k: int, w: int, L: int,
                  codes_ref, len_ref,
                  hlo_ref, hhi_ref, emit_ref, mm_ref, bad_ref):
    nbits = 2 * k
    two_word = nbits > 32
    if two_word:
        shl, lsr2, add2, ltu2, hash2, mhi = _two_word_ops(nbits)
    else:
        hash1, m1 = _one_word_ops(nbits)

        def ltu2(alo, ahi, blo, bhi):
            return _ltu(ahi, bhi) | ((ahi == bhi) & _ltu(alo, blo))

    c = codes_ref[...]                      # (L, SUB, T) i32
    valid = c < 4
    b = jnp.where(valid, c, _I0)
    comp = jnp.where(valid, c ^ 3, np.int32(3))

    # ---- run lengths ending at p, capped at w + k (capped doubling) -----
    cap = w + k
    run = valid.astype(jnp.int32)
    d = 1
    while d < cap:
        run = jnp.where(run == d, run + _sdn(run, d, _I0), run)
        d *= 2
    run = jnp.minimum(run, np.int32(cap))

    # ---- packed k-mer values by log-doubling ----------------------------
    # fwd: earliest base of the window at the high end (the rolling
    # register fwd = ((fwd << 2) | b) of minimizer_generator.cc:38);
    # rc: most recent complement at the high end (rc = (rc >> 2) |
    # comp << (2k-2)). Doubling: `power` holds the m-base pack ending at
    # each position; combining with the pack ending m earlier extends it.
    def wvals(base, reverse):
        m = 1
        power = (base, jnp.zeros_like(base))
        acc = None
        acc_len = 0
        kk = k
        while kk:
            if kk & 1:
                if acc is None:
                    acc = power
                    acc_len = m
                else:
                    elo = _sdn(power[0], acc_len, _I0)
                    ehi = _sdn(power[1], acc_len, _I0)
                    if reverse:
                        slo, shi = _shl_pair(acc, 2 * m)
                        acc = (slo | elo, shi | ehi)
                    else:
                        slo, shi = _shl_pair((elo, ehi), 2 * acc_len)
                        acc = (slo | acc[0], shi | acc[1])
                    acc_len += m
            kk >>= 1
            if kk:
                olo = _sdn(power[0], m, _I0)
                ohi = _sdn(power[1], m, _I0)
                if reverse:
                    slo, shi = _shl_pair(power, 2 * m)
                    power = (slo | olo, shi | ohi)
                else:
                    slo, shi = _shl_pair((olo, ohi), 2 * m)
                    power = (slo | power[0], shi | power[1])
                m *= 2
        return acc

    if two_word:
        def _shl_pair(p, c):
            return shl(p[0], p[1], c)
    else:
        def _shl_pair(p, c):
            if c >= 32:
                return jnp.zeros_like(p[0]), p[1]
            return (p[0] << c) & m1, p[1]

    flo, fhi = wvals(b, reverse=False)
    rlo, rhi = wvals(comp, reverse=True)
    if two_word:
        flo, fhi = flo, fhi & mhi
        rlo, rhi = rlo, rhi & mhi
        hflo, hfhi = hash2(flo, fhi)
        hrlo, hrhi = hash2(rlo, rhi)
        strand = ~ltu2(hflo, hfhi, hrlo, hrhi)  # hf >= hr
        sym = (flo == rlo) & (fhi == rhi)
        slo = jnp.where(strand, hrlo, hflo)
        shi = jnp.where(strand, hrhi, hfhi)
        hlo, hhi = hash2(slo, shi)
    else:
        flo = flo & m1
        rlo = rlo & m1
        hflo = hash1(flo)
        hrlo = hash1(rlo)
        strand = ~_ltu(hflo, hrlo)
        sym = flo == rlo
        hlo = hash1(jnp.where(strand, hrlo, hflo))
        hhi = jnp.zeros_like(hlo)

    ok = run >= k
    sym = ok & sym
    inval = ~ok | sym
    h_lo = jnp.where(inval, _NEG1, hlo)
    h_hi = jnp.where(inval, _NEG1, hhi)
    hlo_ref[...] = h_lo
    hhi_ref[...] = jnp.where(
        inval, _NEG1, hhi | jnp.where(strand, _MIN32, _I0))

    # ---- closed-form window emission (d-shifted plane compares) ---------
    INF = np.int32(L + w + 1)
    seg_end = len_ref[...] - 1              # (1, SUB, T), broadcasts
    wk = np.int32(w + k)
    finite_p = ~inval
    r_off = jnp.full(c.shape, INF)
    run_r = jnp.zeros(c.shape, jnp.int32)
    l_off = jnp.full(c.shape, INF)
    tie = jnp.zeros(c.shape, bool)
    for d in range(1, min(w, L - 1) + 1):
        nlo = _sup(h_lo, d, _NEG1)
        nhi = _sup(h_hi, d, _NEG1)
        finite_n = ~((nhi == _NEG1) & (nlo == _NEG1))
        lt = ltu2(nlo, nhi, h_lo, h_hi)
        tie = tie | ((nhi == h_hi) & (nlo == h_lo) & finite_n)
        first = lt & (r_off == INF)
        r_off = jnp.where(first, np.int32(d), r_off)
        run_r = jnp.where(first, _sup(run, d, _I0), run_r)
        plo = _sdn(h_lo, d, _NEG1)
        phi = _sdn(h_hi, d, _NEG1)
        tie = tie | ((phi == h_hi) & (plo == h_lo) & finite_p)
        if d <= w - 1:
            lt_l = ltu2(plo, phi, h_lo, h_hi)
            l_off = jnp.where(lt_l & (l_off == INF), np.int32(d), l_off)
    has_r = r_off <= w
    p_pl = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    a = jnp.where(l_off >= INF, p_pl, p_pl + np.int32(w) - l_off)
    disp = has_r & (a <= p_pl + r_off - 1) & (run_r >= wk)
    run_exit = _sup(run, min(w, L), _I0) if w <= L else \
        jnp.zeros_like(run)
    can_exit = ~has_r & (p_pl + w <= seg_end)
    exit_emit = can_exit & (run_exit >= wk - 1)
    flush = ~has_r & (p_pl + w > seg_end) & (a <= seg_end)
    emit = (disp | exit_emit | flush) & finite_p
    emit_ref[...] = emit.astype(jnp.int32)
    mm_ref[...] = jnp.sum(emit.astype(jnp.int32), axis=0,
                          dtype=jnp.int32, keepdims=True)
    bad_ref[...] = jnp.max((tie | sym).astype(jnp.int32), axis=0,
                           keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "L", "interpret"))
def dense_minimizer_device(codes_T: jax.Array, lengths_row: jax.Array,
                           k: int, w: int, L: int, interpret: bool = False
                           ) -> Tuple[jax.Array, ...]:
    """codes_T: (L, B) int32 codes (4 = N); lengths_row: (1, B) int32.
    B must be a multiple of LANE_TILE. Returns (hlo, hhi, emit, mm, bad)."""
    B = codes_T.shape[1]
    assert B % LANE_TILE == 0
    lanes = B // SUB
    tile_lanes = LANE_TILE // SUB
    kernel = functools.partial(_dense_kernel, k, w, L)
    grid = (lanes // tile_lanes,)
    plane = pl.BlockSpec((L, SUB, tile_lanes),
                         lambda i: (np.int32(0), np.int32(0), i),
                         memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, SUB, tile_lanes),
                       lambda i: (np.int32(0), np.int32(0), i),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane, row],
        out_specs=[plane, plane, plane, row, row],
        out_shape=[
            jax.ShapeDtypeStruct((L, SUB, lanes), jnp.int32),
            jax.ShapeDtypeStruct((L, SUB, lanes), jnp.int32),
            jax.ShapeDtypeStruct((L, SUB, lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, SUB, lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, SUB, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(codes_T.reshape(L, SUB, lanes), lengths_row.reshape(1, SUB, lanes))
    hlo, hhi, emit, mm, bad = outs
    return (hlo.reshape(L, B), hhi.reshape(L, B), emit.reshape(L, B),
            mm.reshape(1, B), bad.reshape(1, B))
