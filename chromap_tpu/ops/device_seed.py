"""Device-resident seeding + verification: the TPU front half of mapping.

One jitted program takes a padded batch of 2-bit-coded reads and produces,
entirely on device, what the host selection stage needs per read:

  minimizers   closed-form window-minimizer emission (the vectorized
               equivalent of minimizer_generator.cc:7-139, same derivation
               as ops/minimizer_vector.py, here in jnp over a (B, L) tile)
  index probe  binary search over the sorted minimizer-hash array held in
               HBM (the khash lookup of index_utils.h:13-58)
  expansion    ragged occurrence-list gather into per-read hit slots with
               the uint32 candidate-start arithmetic of index.cc:491-505
  clustering   an exact lax.scan port of the sequential cluster loop
               (candidate_processor.cc:283-342) -- sequential in the slot
               axis, vectorized over all reads
  verification banded Myers edit distance over every candidate (the Pallas
               kernel of ops/pallas_myers.py, one candidate per VPU lane)

The download is compacted on device: one packed uint64 per read plus ~12
bytes per candidate, sliced to the exact total so the (slow) device-to-host
path moves no padding. Reads the vector path cannot reproduce exactly --
hash ties inside a window, symmetric k-mers (even k), per-read capacity
overflows, empty-first-round frequency escalation (candidate_processor.cc:
24-59), and mate-rescue pairs (candidate_processor.cc:75-231) -- are
flagged and re-run through the exact host path by the C++ finish stage.

Requires uint64 (jax_enable_x64); all dtypes here are explicit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import os

import jax

jax.config.update("jax_enable_x64", True)
# the seeding program is large (u64 emulation + sort-based probe) and slow
# to compile; persist compiled executables across processes
_cache_dir = os.environ.get(
    "CHROMAP_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "chromap_tpu_jax"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
from jax import lax

U64 = jnp.uint64
U32 = jnp.uint32
UMAX64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
UMAX32 = jnp.uint32(0xFFFFFFFF)

# read-meta flag bits (must match engine.cpp DevSeedView)
FLAG_FALLBACK = 1  # exact host path required for this read's pair
FLAG_AUGMENT = 2   # no candidate supported by >= half the minimizers


def _hash64(key, mask):
    """Invertible mix within `mask` bits (utils.h:76-85) on uint64 lanes."""
    key = (~key + (key << U64(21))) & mask
    key = key ^ (key >> U64(24))
    key = (key + (key << U64(3)) + (key << U64(8))) & mask
    key = key ^ (key >> U64(14))
    key = (key + (key << U64(2)) + (key << U64(4))) & mask
    key = key ^ (key >> U64(28))
    key = (key + (key << U64(31))) & mask
    return key


def _shift_right_cols(a, d, fill):
    """a[:, p-d] with `fill` in the first d columns."""
    pad = jnp.full(a.shape[:-1] + (d,), fill, a.dtype)
    return jnp.concatenate([pad, a[..., :-d]], axis=-1)


def _shift_left_cols(a, d, fill):
    """a[:, p+d] with `fill` in the last d columns."""
    pad = jnp.full(a.shape[:-1] + (d,), fill, a.dtype)
    return jnp.concatenate([a[..., d:], pad], axis=-1)


def _window_values(b, k: int, reverse: bool):
    """Packed k-mer value ending at each column.

    b: (B, L) uint64 single-base values. forward: sum b[p-i] << 2i over the
    window read left-to-right; reverse=True packs right-to-left (the
    reverse-complement register of minimizer_generator.cc:38-41 when fed
    complemented bases). Positions with fewer than k prior columns hold
    garbage; callers mask on run length.
    """
    # binary doubling: powers[m] holds the packed value of the m bases
    # ending at p, for m = 1, 2, 4, ...
    m = 1
    power = b
    acc = None
    acc_len = 0
    kk = k
    while kk:
        if kk & 1:
            if acc is None:
                acc = power
                acc_len = m
            else:
                # combine: earlier part = power (length m, at p - acc_len),
                # later part = acc (length acc_len, at p)
                earlier = _shift_right_cols(power, acc_len, U64(0))
                if reverse:
                    acc = (acc << U64(2 * m)) | earlier
                else:
                    acc = (earlier << U64(2 * acc_len)) | acc
                acc_len += m
        kk >>= 1
        if kk:
            older = _shift_right_cols(power, m, U64(0))
            if reverse:
                power = (power << U64(2 * m)) | older
            else:
                power = (older << U64(2 * m)) | power
            m *= 2
    return acc


def _kmer_stage(codes, k: int):
    """Per-position canonical hash/strand (minimizer_generator.cc:30-64).

    codes: (B, L) uint8, 4 = N/pad. Returns (hash u64 with UMAX at invalid
    positions, strand u8, symmetric bool, run i32).
    """
    B, L = codes.shape
    mask = U64((1 << (2 * k)) - 1)
    valid = codes < 4
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    last_invalid = lax.cummax(jnp.where(valid, jnp.int32(-1), idx), axis=1)
    run = idx - last_invalid

    b = jnp.where(valid, codes, 0).astype(U64)
    brc = jnp.where(valid, codes ^ 3, 3).astype(U64)
    fwd = _window_values(b, k, reverse=False) & mask
    rc = _window_values(brc, k, reverse=True) & mask

    ok = run >= k
    hf = _hash64(fwd, mask)
    hr = _hash64(rc, mask)
    strand = (hf >= hr).astype(jnp.uint8)
    symmetric = ok & (fwd == rc)
    h = _hash64(jnp.where(strand == 1, hr, hf), mask)
    h = jnp.where(ok & ~symmetric, h, UMAX64)
    return h, strand, symmetric, run


def _emission_stage(hashes, run, lengths, k: int, w: int):
    """Closed-form minimizer emission (see ops/minimizer_vector.py for the
    derivation). Returns (emit bool, tie bool), both (B, L)."""
    B, L = hashes.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    INF = jnp.int32(L + w + 1)
    finite = hashes != UMAX64
    seg_end = (lengths - 1).astype(jnp.int32)[:, None]

    r_off = jnp.full((B, L), INF, jnp.int32)
    l_off = jnp.full((B, L), INF, jnp.int32)
    tie = jnp.zeros((B, L), bool)
    for d in range(1, w + 1):
        if d > L - 1:
            break
        hs = _shift_left_cols(hashes, d, UMAX64)
        lt = hs < hashes
        eq = (hs == hashes) & _shift_left_cols(finite, d, False)
        tie = tie | eq | _shift_right_cols(eq, d, False)
        r_off = jnp.minimum(r_off, jnp.where(lt, d, INF))
        if d <= w - 1:
            hp = _shift_right_cols(hashes, d, UMAX64)
            lt_l = hp < hashes
            l_off = jnp.minimum(l_off, jnp.where(lt_l, d, INF))

    a = jnp.where(l_off >= INF, idx, idx - l_off + w)
    r_time = idx + r_off
    has_r = r_off <= w

    run_pad = jnp.concatenate(
        [run, jnp.zeros((B, w + 1), jnp.int32)], axis=1)
    run_at_r = jnp.take_along_axis(
        run_pad, jnp.minimum(r_time, L + w), axis=1)
    disp = has_r & (a <= r_time - 1) & (run_at_r >= w + k)
    exit_time = idx + w
    run_at_exit = jnp.take_along_axis(run_pad, exit_time, axis=1)
    can_exit = (~has_r) & (exit_time <= seg_end)
    exit_emit = can_exit & (run_at_exit >= w + k - 1)
    flush = (~has_r) & (exit_time > seg_end) & (a <= seg_end)
    emit = (disp | exit_emit | flush) & finite
    return emit, tie



def _barrier(*arrays):
    """Materialization fence: XLA's loop fusion serializes chained gathers
    (gather-of-gather fuses into a per-element walk that runs ~100x slower
    than the materialized form on TPU); a barrier between stages keeps each
    gather a standalone vectorized kernel."""
    out = lax.optimization_barrier(arrays)
    return out if len(arrays) > 1 else out[0]

def _compact_cols(mask, cap: int):
    """Per-row stable compaction via cumsum + scatter: returns (B, cap)
    int32 column indices of the masked columns in column order (an argsort
    on TPU costs ~10x a scatter). Unfilled slots hold 0; callers mask on
    position < count."""
    B, L = mask.shape
    dest = jnp.cumsum(mask, axis=1) - 1
    rows = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    cols = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    flat_dest = jnp.where(mask & (dest < cap), rows * cap + dest, B * cap)
    out = jnp.zeros((B * cap,), jnp.int32)
    out = out.at[flat_dest].set(cols, mode="drop")
    return out.reshape(B, cap)


def _scatter_compact_flat(mask_flat, cap: int, *fields):
    """Flat stable compaction: scatter each field's masked elements to the
    front of a cap-sized buffer, preserving order."""
    dest = jnp.cumsum(mask_flat) - 1
    flat_dest = jnp.where(mask_flat & (dest < cap), dest, cap)
    outs = []
    for f in fields:
        out = jnp.zeros((cap,), f.dtype)
        outs.append(out.at[flat_dest].set(f, mode="drop"))
    return outs


def _cluster_scan(sort_hi, sort_lo, mm_count, num_required, e: int):
    """Exact port of the sequential cluster loop (candidate_processor.cc:
    283-342; ClusterHits in engine.cpp) as a lax.scan over sorted hit slots,
    vectorized over reads.

    sort_hi/sort_lo: (B, H) uint32 sorted lexicographic hit keys, hi =
    strand<<31 | rid, lo = start; invalid slots are (UMAX32, UMAX32).
    Emission i reports the cluster closed by slot i (or the final sentinel).
    Returns (emit (B, H+1) bool, cand_hi, cand_lo (B, H+1) u32,
    count (B, H+1) u8).
    """
    B, H = sort_hi.shape
    ethr = U32(e)
    mm = mm_count.astype(jnp.int32)
    req = num_required.astype(jnp.int32)

    # sentinel column closes the last cluster (the kUmax push in C++)
    hi_ext = jnp.concatenate([sort_hi, jnp.full((B, 1), UMAX32)], axis=1)
    lo_ext = jnp.concatenate([sort_lo, jnp.full((B, 1), UMAX32)], axis=1)

    init = dict(
        min_cnt=jnp.ones((B,), jnp.int32),
        eq_cnt=jnp.ones((B,), jnp.int32),
        best_eq=jnp.ones((B,), jnp.int32),
        best_hi=sort_hi[:, 0], best_lo=sort_lo[:, 0],
        prev_hi=sort_hi[:, 0], prev_lo=sort_lo[:, 0],
    )

    def step(st, cur):
        cur_hi, cur_lo = cur
        boundary = ((cur_hi != st["prev_hi"])
                    | (cur_lo > st["prev_lo"] + ethr)
                    | ((st["min_cnt"] >= mm)
                       & (cur_lo > st["best_lo"] + ethr)))
        emit = (boundary & (st["min_cnt"] >= req)
                & (st["best_hi"] != UMAX32))
        out = (emit, st["best_hi"], st["best_lo"],
               (st["best_eq"] & 0xFF).astype(jnp.uint8))

        # non-boundary update (candidate_processor.cc:311-331)
        is_best = (cur_hi == st["best_hi"]) & (cur_lo == st["best_lo"])
        is_prev = (cur_hi == st["prev_hi"]) & (cur_lo == st["prev_lo"])
        eq_cnt = jnp.where(is_best | is_prev, st["eq_cnt"] + 1,
                           jnp.int32(1))
        promote = (~is_best) & is_prev & (eq_cnt > st["best_eq"])
        best_eq = jnp.where(is_best, st["best_eq"] + 1,
                            jnp.where(promote, eq_cnt, st["best_eq"]))
        best_hi = jnp.where(promote, st["prev_hi"], st["best_hi"])
        best_lo = jnp.where(promote, st["prev_lo"], st["best_lo"])
        min_cnt = st["min_cnt"] + 1

        one = jnp.ones_like(min_cnt)
        new = dict(
            min_cnt=jnp.where(boundary, one, min_cnt),
            eq_cnt=jnp.where(boundary, one, eq_cnt),
            best_eq=jnp.where(boundary, one, best_eq),
            best_hi=jnp.where(boundary, cur_hi, best_hi),
            best_lo=jnp.where(boundary, cur_lo, best_lo),
            prev_hi=cur_hi, prev_lo=cur_lo,
        )
        return new, out

    xs = (hi_ext[:, 1:].T, lo_ext[:, 1:].T)
    _, (emit, chi, clo, ccnt) = lax.scan(step, init, xs)
    return emit.T, chi.T, clo.T, ccnt.T


class DeviceSeeder:
    """Holds the device-resident index/reference and the jitted batch step.

    Capacities (minimizers/hits/candidates per read) bound the dense
    buffers; reads that exceed any of them are flagged for the exact host
    path, so caps trade device memory against fallback rate, never
    correctness.
    """

    def __init__(self, index, ref_seqs, error_threshold: int,
                 min_num_seeds: int, max_seed_frequencies,
                 mcap: int = 64, hcap: int = 128, ccap: int = 16,
                 use_pallas: bool | None = None):
        self.k = int(index.kmer_size)
        self.w = int(index.window_size)
        self.e = int(error_threshold)
        self.f0 = int(max_seed_frequencies[0])
        self.f1 = int(max_seed_frequencies[1])
        self.min_num_seeds = int(min_num_seeds)
        self.mcap = mcap
        self.hcap = hcap
        self.ccap = ccap
        if use_pallas is None:
            # the jnp Myers fuses into one XLA loop kernel and sustains
            # >1 T band-cells/s on v5e; it also composes with the x64
            # tracing this module needs (the Pallas kernel's fori_loop does
            # not lower under x64 yet)
            use_pallas = False
        self.use_pallas = use_pallas

        self.hash_keys = jnp.asarray(index.hash_keys, dtype=jnp.uint64)
        self.offsets = jnp.asarray(
            np.asarray(index.offsets, dtype=np.int64))
        self.counts = jnp.asarray(
            np.asarray(index.counts, dtype=np.int32))
        self.occurrences = jnp.asarray(index.occurrences,
                                       dtype=jnp.uint64)
        tbl = np.full(256, 4, np.uint8)
        for i, c in enumerate(b"ACGT"):
            tbl[c] = i
        for i, c in enumerate(b"acgt"):
            tbl[c] = i
        ref_codes = tbl[np.frombuffer(b"".join(ref_seqs), np.uint8)]
        self.ref_codes = jnp.asarray(ref_codes)
        lens = np.array([len(s) for s in ref_seqs], dtype=np.int64)
        self.ref_lens = jnp.asarray(lens)
        off = np.zeros(len(ref_seqs), dtype=np.int64)
        np.cumsum(lens[:-1], out=off[1:])
        self.ref_offsets = jnp.asarray(off)
        self.num_refs = len(ref_seqs)
        assert self.num_refs < (1 << 31)
        self._step = jax.jit(self._build_step(),
                             static_argnames=("L", "captot"))

    # ------------------------------------------------------------------
    def _build_step(self):
        k, w, e = self.k, self.w, self.e
        f0, f1 = self.f0, self.f1
        min_seeds = self.min_num_seeds
        Mcap, Hcap, Ccap = self.mcap, self.hcap, self.ccap
        hash_keys = self.hash_keys
        offsets = self.offsets
        counts = self.counts
        occurrences = self.occurrences
        ref_codes = self.ref_codes
        ref_lens = self.ref_lens
        ref_offsets = self.ref_offsets
        num_refs = self.num_refs
        use_pallas = self.use_pallas

        def step(codes, lengths, L: int, captot: int):
            B = codes.shape[0]

            # ---- minimizers --------------------------------------------
            h, strand, symmetric, run = _barrier(
                *_kmer_stage(codes, k))
            emit, tie = _barrier(*_emission_stage(h, run, lengths, k, w))
            mm_count = emit.sum(axis=1).astype(jnp.int32)
            bad_mz = ((tie | symmetric).any(axis=1) | (mm_count > Mcap)
                      | (lengths != L))

            mz_cols = _barrier(_compact_cols(emit, Mcap))  # (B, Mcap)
            mz_valid = (jnp.arange(Mcap, dtype=jnp.int32)[None, :]
                        < jnp.minimum(mm_count, Mcap)[:, None])
            mz_hash, mz_strand = _barrier(
                jnp.take_along_axis(h, mz_cols, axis=1),
                jnp.take_along_axis(strand, mz_cols, axis=1))
            mz_pos = mz_cols.astype(jnp.uint32)

            # ---- index probe -------------------------------------------
            flat = mz_hash.reshape(-1)
            loc = jnp.searchsorted(hash_keys, flat, side="left",
                                   method="sort")
            loc = _barrier(jnp.minimum(loc, hash_keys.shape[0] - 1))
            found = (hash_keys[loc] == flat).reshape(B, Mcap) & mz_valid
            off = offsets[loc].reshape(B, Mcap)
            cnt = jnp.where(found, counts[loc].reshape(B, Mcap), 0)
            found, off, cnt = _barrier(found, off, cnt)

            # round-1 frequency cap (candidate_processor.cc:24-32)
            cnt_eff = jnp.where(cnt < f0, cnt, 0)
            total = cnt_eff.sum(axis=1)
            # empty round 1 with a round-2 cap that would admit hits:
            # frequency escalation -> exact host path
            round2 = (total == 0) & ((cnt > 0) & (cnt < f1)).any(axis=1)
            overflow = total > Hcap

            # ---- repetitive-seed stats (index.cc:507-523) --------------
            rep_mask = found & (cnt >= f0)

            def rep_step(carry, x):
                prev, length = carry
                is_rep, pos = x
                pos64 = pos.astype(jnp.uint64)
                inc = jnp.where(
                    prev > pos64, jnp.uint32(k),
                    jnp.where(pos64 < prev + U64(k + w - 1),
                              (pos64 - prev).astype(jnp.uint32),
                              jnp.uint32(k)))
                length = jnp.where(is_rep, length + inc, length)
                prev = jnp.where(is_rep, pos64, prev)
                return (prev, length), None

            rep_init = (jnp.full((B,), 1 << 32, jnp.uint64),
                        jnp.zeros((B,), jnp.uint32))
            (_, rep_len), _ = lax.scan(rep_step, rep_init,
                                       (rep_mask.T, mz_pos.T))
            rep_count = rep_mask.sum(axis=1).astype(jnp.int32)
            num_required = jnp.clip(mm_count - rep_count, 1, min_seeds)

            # ---- occurrence expansion (index.cc:237-349) ---------------
            cum = jnp.cumsum(cnt_eff, axis=1)
            slots = jnp.broadcast_to(
                jnp.arange(Hcap, dtype=jnp.int32)[None, :], (B, Hcap))
            # mi[s] = #{j : cum[j] <= s} (a searchsorted-right), computed as
            # an inclusive prefix sum of the cum-value histogram
            hist = jnp.zeros((B, Hcap + 1), jnp.int32)
            hist = hist.at[
                jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                                 (B, Mcap)),
                jnp.minimum(cum, Hcap)].add(1, mode="drop")
            mi = jnp.cumsum(hist[:, :Hcap], axis=1)
            mi = _barrier(jnp.minimum(mi, Mcap - 1))
            base = jnp.where(mi > 0,
                             jnp.take_along_axis(cum, jnp.maximum(mi - 1, 0),
                                                 axis=1), 0)
            occ_idx = (jnp.take_along_axis(off, mi, axis=1)
                       + (slots - base).astype(jnp.int64))
            slot_ok = slots < jnp.minimum(total, Hcap)[:, None]
            occ_idx = _barrier(jnp.clip(occ_idx, 0,
                                        occurrences.shape[0] - 1))
            occ = _barrier(occurrences[occ_idx])
            rid = (occ >> U64(33)).astype(jnp.uint32)
            ref_pos = (occ >> U64(1)).astype(jnp.uint32)
            m_strand = jnp.take_along_axis(mz_strand, mi, axis=1)
            same = (occ & U64(1)).astype(jnp.uint8) == m_strand
            read_pos = jnp.take_along_axis(mz_pos, mi, axis=1)
            start = jnp.where(same, ref_pos - read_pos,
                              ref_pos + read_pos - U32(k - 1))
            hit_hi = jnp.where(same, rid, rid | U32(1 << 31))
            hit_hi, hit_lo = _barrier(jnp.where(slot_ok, hit_hi, UMAX32),
                                      jnp.where(slot_ok, start, UMAX32))

            # ---- per-read sort + cluster -------------------------------
            sort_hi, sort_lo = lax.sort((hit_hi, hit_lo), dimension=1,
                                        num_keys=2)
            cl_emit, cl_hi, cl_lo, cl_cnt = _cluster_scan(
                sort_hi, sort_lo, mm_count, num_required, e)

            cl_neg = (cl_hi >> 31).astype(jnp.uint8)     # strand bit
            n_pos = (cl_emit & (cl_neg == 0)).sum(axis=1).astype(jnp.int32)
            n_neg = (cl_emit & (cl_neg == 1)).sum(axis=1).astype(jnp.int32)
            cand_over = (n_pos > Ccap) | (n_neg > Ccap)

            fallback = bad_mz | round2 | overflow | cand_over
            n_pos = jnp.where(fallback, 0, n_pos)
            n_neg = jnp.where(fallback, 0, n_neg)
            n_all = n_pos + n_neg

            # compact emitted clusters (strand-major, position order) into
            # (B, 2*Ccap)
            C2 = 2 * Ccap
            csel = _barrier(_compact_cols(cl_emit & ~fallback[:, None],
                                          C2))
            cand_hi, cand_lo, cand_cnt = _barrier(
                jnp.take_along_axis(cl_hi, csel, axis=1),
                jnp.take_along_axis(cl_lo, csel, axis=1),
                jnp.take_along_axis(cl_cnt, csel, axis=1))
            cand_real = (jnp.arange(C2, dtype=jnp.int32)[None, :]
                         < n_all[:, None])

            # augment trigger (candidate_processor.cc:86-103): no candidate
            # supported by >= half the minimizers
            half = (mm_count // 2).astype(jnp.uint32)
            supported = (cand_real
                         & (cand_cnt.astype(jnp.uint32) >= half[:, None]))
            augment = ~supported.any(axis=1)

            # ---- compact candidates (row-major) before verification -----
            flags = (fallback.astype(jnp.uint64) * FLAG_FALLBACK
                     | augment.astype(jnp.uint64) * FLAG_AUGMENT)
            read_meta = (jnp.minimum(mm_count, 255).astype(jnp.uint64)
                         | (jnp.minimum(rep_len, 0xFFFF).astype(jnp.uint64)
                            << U64(8))
                         | (flags << U64(24))
                         | (n_pos.astype(jnp.uint64) << U64(32))
                         | (n_neg.astype(jnp.uint64) << U64(40)))

            flat_real = cand_real.reshape(-1)
            rows2 = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None],
                (B, C2)).reshape(-1)
            sc_hi, sc_lo, sc_cnt, sc_row = _barrier(*_scatter_compact_flat(
                flat_real, captot, cand_hi.reshape(-1), cand_lo.reshape(-1),
                cand_cnt.reshape(-1), rows2))
            total_cands = flat_real.sum()
            sel_real = jnp.arange(captot, dtype=jnp.int32) < total_cands

            # ---- verification (alignment.cc:141-192 per candidate) ------
            crid = sc_hi & U32(0x7FFFFFFF)
            cneg = (sc_hi >> 31).astype(jnp.uint8)
            position = jnp.where(cneg == 1, sc_lo - U32(L - 1), sc_lo)
            pos64 = position.astype(jnp.int64)
            rid_c = jnp.minimum(crid, num_refs - 1).astype(jnp.int32)
            rl = jnp.where(crid < num_refs, ref_lens[rid_c], 0)
            vvalid = (sel_real & (crid < num_refs)
                      & (pos64 >= e) & (pos64 < rl)
                      & (pos64 + L + e < rl))
            pstart = jnp.where(vvalid, ref_offsets[rid_c] + pos64 - e, 0)

            gidx = (pstart[:, None]
                    + jnp.arange(L + 2 * e, dtype=jnp.int64)[None, :])
            gidx = _barrier(jnp.clip(gidx, 0, ref_codes.shape[0] - 1))
            patterns = _barrier(
                ref_codes[gidx].astype(jnp.int32))  # (captot, L+2e)

            rc_codes = jnp.where(codes[:, ::-1] < 4, codes[:, ::-1] ^ 3, 4)
            text_sel = _barrier(jnp.where((cneg == 1)[:, None],
                                          rc_codes[sc_row, :],
                                          codes[sc_row, :]).astype(jnp.int32))

            from .pallas_myers import LANE_TILE, myers_jnp
            if use_pallas:
                from .pallas_myers import myers_device
                pad = (-captot) % LANE_TILE
                pt = jnp.concatenate(
                    [patterns.T, jnp.zeros((L + 2 * e, pad), jnp.int32)],
                    axis=1)
                tt = jnp.concatenate(
                    [text_sel.T, jnp.zeros((L, pad), jnp.int32)], axis=1)
                err, endp = myers_device(pt, tt, e, L)
                err, endp = err[:captot], endp[:captot]
            else:
                err, endp = myers_jnp(patterns.T, text_sel.T, e, L)
            err = jnp.clip(err, 0, 255).astype(jnp.uint32)
            endp = jnp.clip(endp, 0, 255).astype(jnp.uint32)

            out_pos = jnp.where(
                sel_real,
                (crid.astype(jnp.uint64) << U64(32))
                | sc_lo.astype(jnp.uint64), U64(0))
            out_meta = jnp.where(
                sel_real,
                sc_cnt.astype(jnp.uint32) | (err << U32(8))
                | (endp << U32(16)), U32(0))
            return read_meta, out_pos, out_meta, total_cands

        return step

    # ------------------------------------------------------------------
    def submit(self, codes: np.ndarray, lengths: np.ndarray):
        """Asynchronously dispatch one batch; returns an opaque handle.
        Device compute and the host's work on other batches overlap until
        `resolve` forces the (small, exact-length) download."""
        B, L = codes.shape
        captot = 4 * B
        out = self._step(jnp.asarray(codes),
                         jnp.asarray(lengths, dtype=jnp.int32),
                         L=L, captot=captot)
        return (out, captot)

    def resolve(self, handle
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
        """Blocks on a submitted batch. Returns (read_meta u64 (B,),
        cand_pos u64, cand_meta u32, batch_overflow); candidates are
        row-major (read, strand, position-order) and sliced to the exact
        total so the d2h transfer moves no padding."""
        (read_meta, out_pos, out_meta, total), captot = handle
        total = int(total)
        if total > captot:
            # whole batch exceeds the compaction budget: caller should use
            # the host engine for this batch
            return None, None, None, True
        meta_np = np.asarray(read_meta)
        pos_np = np.asarray(out_pos[:total])
        cmeta_np = np.asarray(out_meta[:total])
        return meta_np, pos_np, cmeta_np, False

    def seed_and_verify(self, codes: np.ndarray, lengths: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Synchronous submit + resolve."""
        return self.resolve(self.submit(codes, lengths))
