"""Device-resident seeding + verification: the TPU front half of mapping.

One jitted program takes a batch of 2-bit-packed reads and produces,
entirely on device, what the host selection stage needs per read:

  minimizers   closed-form window-minimizer emission (the vectorized
               equivalent of minimizer_generator.cc:7-139, same derivation
               as ops/minimizer_vector.py, here in jnp over a (B, L) tile)
  index probe  bucketed bounded binary search over the sorted minimizer-
               hash array held in HBM (the khash lookup of
               index_utils.h:13-58): a host-built bucket table over the
               top hash bits caps every lower_bound at a few halvings
  expansion    ragged occurrence-list gather with the uint32 candidate
               arithmetic of index.cc:491-505
  clustering   an exact lax.scan port of the sequential cluster loop
               (candidate_processor.cc:283-342) -- sequential in the slot
               axis, vectorized over all reads
  verification banded Myers edit distance over every candidate (one
               candidate per VPU lane, ops/pallas_myers.py)

The work-proportional design: everything between the (B, L) elementwise
stages and the (B, Hcap) cluster scan runs on FLAT arrays compacted across
the whole batch, so gather/scatter element counts track the *actual*
number of minimizers (~L/((w+1)/2) per read) and hits, not dense per-read
capacities. Gathers of reference windows read 2-bit-packed u32 words (16
bases per element) instead of one byte per base.

The download is one packed u32 per read plus one packed u64 per candidate,
sliced to the exact total (the d2h path here moves ~7 MB/s, so bytes are
the budget); `resolve` unpacks to the wide DevSeedView format consumed by
the C++ finish stage. Reads the vector path cannot reproduce exactly --
hash ties inside a window, symmetric k-mers (even k), per-read hit/
candidate-capacity overflows, empty-first-round frequency escalation
(candidate_processor.cc:24-59), and mate-rescue pairs (candidate_
processor.cc:75-231) -- are flagged and re-run through the exact host path
by the C++ finish stage.

Requires uint64 (jax_enable_x64); all dtypes here are explicit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import os

import jax

jax.config.update("jax_enable_x64", True)
# persist compiled executables across processes; the index/reference arrays
# are jit *arguments* (not closed-over constants), so cache keys are stable
_cache_dir = os.environ.get(
    "CHROMAP_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "chromap_tpu_jax"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
from jax import lax

# numpy scalar constants: they lower as inline host constants, where jax
# scalars would be device arrays whose materialization at trace time costs
# a device round-trip each (about a minute of first-call latency on the
# tunneled TPU)
U64 = np.uint64
U32 = np.uint32
UMAX64 = np.uint64(0xFFFFFFFFFFFFFFFF)
UMAX32 = np.uint32(0xFFFFFFFF)

# read-meta flag bits (must match engine.cpp DevSeedView)
FLAG_FALLBACK = 1  # exact host path required for this read's pair
FLAG_AUGMENT = 2   # no candidate supported by >= half the minimizers

# capacities: per-read hit/candidate caps bound the dense cluster stage
# (overflow -> exact host path per pair); the flat caps are per-batch-read
# averages (overflow -> whole batch to the host engine, never wrong).
# Expected occupancy: ~2L/(w+1) minimizers/read (~20 at L=100, w=7) and a
# similar hit count on non-pathological genomes -- the budgets leave ~1.3x
# headroom, and every flat-stage cost scales with them.
HCAP = 128          # per-read hits (both strands)
CCAP = 16           # per-read candidates per strand
MZ_PER_READ = 26    # flat minimizer budget per read
HITS_PER_READ = 30  # flat hit budget per read
CANDS_PER_READ = 2  # flat candidate budget per read (~1.2 measured)
# download budget: candidates per read included in the single async
# download stream (~1.2/read measured on realistic data; exceeding this is
# NOT a fallback -- the remainder rides a second exact-size transfer)
DL_CANDS_PER_READ = 2


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
    last_invalid = lax.cummax(jnp.where(valid, np.int32(-1), idx), axis=1)
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
    INF = np.int32(L + w + 1)
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


def _cluster_scan_W(words_ext, mm_count, num_required, e: int):
    """Exact port of the sequential cluster loop (candidate_processor.cc:
    283-342; ClusterHits in engine.cpp) as a lax.scan over sorted hit slots,
    vectorized over reads.

    words_ext: (H+1, B) uint64 sorted packed hit keys in slot-major layout
    -- columns are reads, word = row<<47 | strand<<46 | rid<<32 | start.
    Row bits are constant within a column, so comparing the full top words
    equals comparing (strand, rid). Invalid slots are UMAX64 and the extra
    last row is all-UMAX64 (the kUmax sentinel push in C++; the caller's
    scatter leaves it untouched). Emission i reports the cluster closed
    when processing slot i+1 (the last output row comes from the sentinel
    row, which closes the final cluster). Returns (emit (H, B) bool,
    cand (H, B) u64 packed count<<47 | strand<<46 | rid<<32 | start).
    """
    B = words_ext.shape[1]
    ethr = U32(e)
    mm = mm_count.astype(jnp.int32)
    req = num_required.astype(jnp.int32)

    w0 = words_ext[0]
    init = dict(
        min_cnt=jnp.ones((B,), jnp.int32),
        eq_cnt=jnp.ones((B,), jnp.int32),
        best_eq=jnp.ones((B,), jnp.int32),
        best=w0, prev=w0,
    )

    def step(st, cur):
        cur_hi = (cur >> U64(32)).astype(jnp.uint32)
        cur_lo = cur.astype(jnp.uint32)
        prev_hi = (st["prev"] >> U64(32)).astype(jnp.uint32)
        prev_lo = st["prev"].astype(jnp.uint32)
        best_lo = st["best"].astype(jnp.uint32)
        boundary = ((cur_hi != prev_hi)
                    | (cur_lo > prev_lo + ethr)
                    | ((st["min_cnt"] >= mm)
                       & (cur_lo > best_lo + ethr)))
        emit = (boundary & (st["min_cnt"] >= req)
                & (st["best"] != UMAX64))
        outw = ((st["best"] & U64((1 << 47) - 1))
                | ((st["best_eq"] & 0xFF).astype(jnp.uint64) << U64(47)))
        out = (emit, outw)

        # non-boundary update (candidate_processor.cc:311-331)
        is_best = cur == st["best"]
        is_prev = cur == st["prev"]
        eq_cnt = jnp.where(is_best | is_prev, st["eq_cnt"] + 1,
                           np.int32(1))
        promote = (~is_best) & is_prev & (eq_cnt > st["best_eq"])
        best_eq = jnp.where(is_best, st["best_eq"] + 1,
                            jnp.where(promote, eq_cnt, st["best_eq"]))
        best = jnp.where(promote, st["prev"], st["best"])
        min_cnt = st["min_cnt"] + 1

        one = jnp.ones_like(min_cnt)
        new = dict(
            min_cnt=jnp.where(boundary, one, min_cnt),
            eq_cnt=jnp.where(boundary, one, eq_cnt),
            best_eq=jnp.where(boundary, one, best_eq),
            best=jnp.where(boundary, cur, best),
            prev=cur,
        )
        return new, out

    _, (emit, cw) = lax.scan(step, init, words_ext[1:], unroll=4)
    return emit, cw


def _unpack_codes(packed, nmask, B: int, L: int):
    """(B, W) u32 2-bit words + (B, WN) u32 N-bitmaps -> (B, L) u8 codes
    with 4 at N positions. Static per-column word/shift indices compile to
    strided slices, not gathers."""
    cols = np.arange(L)
    words = jnp.repeat(packed, 16, axis=1)[:, :L]
    shifts = (2 * (cols % 16)).astype(np.uint32)[None, :]
    code2 = (words >> shifts) & U32(3)
    nwords = jnp.repeat(nmask, 32, axis=1)[:, :L]
    nshift = (cols % 32).astype(np.uint32)[None, :]
    nbit = (nwords >> nshift) & U32(1)
    return jnp.where(nbit == 1, np.uint8(4), code2.astype(jnp.uint8))


def _unpack_codes_T(packed, nmask, B: int, L: int):
    """Transposed unpack: (B, W)/(B, WN) u32 words -> (L, B) int32 codes
    with 4 at N positions (the position-major layout the Pallas dense
    kernel consumes; row shifts are per-row constants)."""
    cols = np.arange(L)
    words = jnp.repeat(packed.T, 16, axis=0)[:L]
    shifts = (2 * (cols % 16)).astype(np.uint32)[:, None]
    code2 = ((words >> shifts) & U32(3)).astype(jnp.int32)
    nwords = jnp.repeat(nmask.T, 32, axis=0)[:L]
    nshift = (cols % 32).astype(np.uint32)[:, None]
    nbit = (nwords >> nshift) & U32(1)
    return jnp.where(nbit == 1, np.int32(4), code2)


def _cumsum1d(x):
    """Inclusive cumsum of a long 1-D vector via a (rows, 2048) tile:
    row-wise scans ride the lane axis where XLA's flat long-vector scan
    crawls (measured ~10x on the v5e for millions of elements)."""
    n = x.shape[0]
    width = 2048
    if n <= width:
        return jnp.cumsum(x)
    rows = -(-n // width)
    pad = rows * width - n
    x2 = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(rows,
                                                                  width)
    within = jnp.cumsum(x2, axis=1)
    offs = jnp.concatenate([jnp.zeros((1,), x.dtype),
                            jnp.cumsum(within[:, -1])[:-1]])
    return (within + offs[:, None]).reshape(-1)[:n]


def _cummax1d(x):
    """Inclusive cummax of a long 1-D vector, tiled like _cumsum1d."""
    n = x.shape[0]
    width = 2048
    if n <= width:
        return lax.cummax(x)
    rows = -(-n // width)
    pad = rows * width - n
    x2 = jnp.concatenate(
        [x, jnp.full((pad,), jnp.iinfo(x.dtype).min, x.dtype)]).reshape(
            rows, width)
    within = lax.cummax(x2, axis=1)
    row_prev = lax.cummax(within[:, -1])
    offs = jnp.concatenate([jnp.full((1,), jnp.iinfo(x.dtype).min, x.dtype),
                            row_prev[:-1]])
    return jnp.maximum(within, offs[:, None]).reshape(-1)[:n]


def _cummin1d_rev_u64(x):
    """Suffix (right-to-left inclusive) cummin of a 1-D uint64 vector.

    u1 < u2 unsigned  <=>  s(u1 ^ TOP) < s(u2 ^ TOP) signed, and
    min_s(y) = ~max_s(~y) (bitwise ~ is an order-reversing bijection), so
    the whole map in one pass is cummax over bitcast_s64(~x ^ TOP) with
    recovery ~r ^ TOP."""
    TOP = U64(1) << U64(63)
    inv = lax.bitcast_convert_type((~x ^ TOP)[::-1], jnp.int64)
    n = inv.shape[0]
    width = 2048
    if n <= width:
        out = lax.cummax(inv)
    else:
        rows = -(-n // width)
        pad = rows * width - n
        x2 = jnp.concatenate(
            [inv, jnp.full((pad,), jnp.iinfo(jnp.int64).min)]).reshape(
                rows, width)
        within = lax.cummax(x2, axis=1)
        row_prev = lax.cummax(within[:, -1])
        offs = jnp.concatenate(
            [jnp.full((1,), jnp.iinfo(jnp.int64).min), row_prev[:-1]])
        out = jnp.maximum(within, offs[:, None]).reshape(-1)[:n]
    return ~lax.bitcast_convert_type(out[::-1], jnp.uint64) ^ TOP


def _probe_merge_sort(hash_keys, mz_h, Mtot: int, ib: int):
    """lower_bound + key-present bit for every query hash in the sorted
    key array via ONE single-operand u64 sort (vs jnp.searchsorted
    (method="sort")'s two 2-operand sorts + two scatters): pack
    hash<<(ib+1) | is_key<<ib | idx (idx for queries only; requires
    2k + 1 + ib <= 64, checked by the caller), sort the merged words,
    count keys by exclusive prefix sum, and scatter each query's
    (key-prefix count | found << 31) back to its slot. Queries carry
    flag 0 so they sort BEFORE equal keys (side='left'). `found` — the
    next key at-or-after the query has the same hash — rides a suffix
    cummin of the key hashes, so no post-probe hash_keys[loc] gather is
    needed. Invalid queries (UMAX64 plane) shift to all-ones top bits
    and sort last; their scattered loc (== num_keys) and found bit are
    both masked by mz_valid in the caller."""
    shift_p = U64(ib + 1)
    packed_q = (mz_h << shift_p) | jnp.arange(Mtot, dtype=jnp.uint64)
    packed_k = (hash_keys << shift_p) | U64(1 << ib)
    s = lax.sort(jnp.concatenate([packed_q, packed_k]))
    is_key = ((s >> U64(ib)) & U64(1)).astype(jnp.int32)
    pk = _cumsum1d(is_key) - is_key                # keys strictly before
    hash_only = s >> shift_p
    next_key_hash = _cummin1d_rev_u64(
        jnp.where(is_key == 1, hash_only, UMAX64))
    # invalid queries may scatter found=1 (their hash_only aliases the
    # all-ones plane); the caller masks found with mz_valid
    found = (next_key_hash == hash_only).astype(jnp.int32)
    qidx = jnp.where(is_key == 0,
                     (s & U64((1 << ib) - 1)).astype(jnp.int32), Mtot)
    return jnp.zeros((Mtot,), jnp.int32).at[qidx].set(
        pk | (found << 31), mode="drop")


def _flat_compact_T(mask_T, cap: int):
    """Transposed-layout flat compaction: mask_T is (S, B) slot-major
    (columns = reads). Output order:  all of read 0's set slots in ascending slot order, then
    read 1's, ... -- but the returned source indices address the
    TRANSPOSED flat space (slot * B + read), so callers gather from
    slot-major planes with no transpose materialization."""
    S, B = mask_T.shape
    m = mask_T.astype(jnp.int32)
    within = jnp.cumsum(m, axis=0)                  # per-read running rank
    col_tot = within[-1]
    col_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               _cumsum1d(col_tot)[:-1]])
    dest2d = within + col_off[None, :] - 1
    total = col_off[-1] + col_tot[-1]
    dest = dest2d.reshape(-1)
    src = jnp.arange(S * B, dtype=jnp.uint32)
    fd = jnp.where(mask_T.reshape(-1) & (dest < cap), dest, cap)
    out = jnp.zeros((cap,), jnp.uint32)
    out = out.at[fd].set(src, mode="drop")
    return out, total


def _gather_ref_windows(ref_words, ref_nwords, pstart, span: int,
                        captot: int):
    """Gather span-base reference windows from 2-bit packed words.

    ref_words: (GW,) u32 (16 bases each); ref_nwords: (GN,) u32 N-bitmaps
    (32 bases each); pstart: (captot,) int64 base offsets (clamped valid).
    Returns (captot, span) int32 codes with 4 at N positions."""
    nw = span // 16 + 2
    word0 = (pstart >> 3 >> 1).astype(jnp.int64)  # pstart // 16
    rem = (pstart & 15).astype(jnp.uint32)
    gidx = word0[:, None] + jnp.arange(nw, dtype=jnp.int64)[None, :]
    gidx = jnp.clip(gidx, 0, ref_words.shape[0] - 1)
    gw = ref_words[gidx]                              # (captot, nw)
    sh = (2 * rem)[:, None]
    lo = gw[:, :-1] >> sh
    hi_part = jnp.where((rem == 0)[:, None], U32(0),
                        gw[:, 1:] << ((U32(32) - 2 * rem) % U32(32))[:, None])
    aligned = lo | hi_part                            # (captot, nw-1)

    cols = np.arange(span)
    words = jnp.repeat(aligned, 16, axis=1)[:, :span]
    shifts = (2 * (cols % 16)).astype(np.uint32)[None, :]
    code2 = ((words >> shifts) & U32(3)).astype(jnp.int32)

    nnw = span // 32 + 2
    nword0 = (pstart >> 5).astype(jnp.int64)
    nrem = (pstart & 31).astype(jnp.uint32)
    nidx = nword0[:, None] + jnp.arange(nnw, dtype=jnp.int64)[None, :]
    nidx = jnp.clip(nidx, 0, ref_nwords.shape[0] - 1)
    gn = ref_nwords[nidx]
    nlo = gn[:, :-1] >> nrem[:, None]
    nhi = jnp.where((nrem == 0)[:, None], U32(0),
                    gn[:, 1:] << ((U32(32) - nrem) % U32(32))[:, None])
    naligned = nlo | nhi
    nw_rep = jnp.repeat(naligned, 32, axis=1)[:, :span]
    nshifts = (cols % 32).astype(np.uint32)[None, :]
    nbit = (nw_rep >> nshifts) & U32(1)
    return jnp.where(nbit == 1, np.int32(4), code2)


def _gather_read_rows(packed, nmask, rows, L: int):
    """Per-candidate read codes gathered from the 2-bit packed words.

    packed: (B, W) u32; nmask: (B, WN) u32; rows: (captot,) i32 read rows.
    Returns (captot, L) int32 codes with 4 at N positions. Gathering the
    ~11 packed words per candidate moves ~9x less HBM than gathering the
    (B, L) unpacked plane -- and with the Pallas front end it leaves the
    dense unpack with no consumers at all (XLA removes it)."""
    pw = packed[rows]                                  # (captot, W)
    nm = nmask[rows]                                   # (captot, WN)
    cols = np.arange(L)
    words = jnp.repeat(pw, 16, axis=1)[:, :L]
    shifts = (2 * (cols % 16)).astype(np.uint32)[None, :]
    code2 = ((words >> shifts) & U32(3)).astype(jnp.int32)
    nwords = jnp.repeat(nm, 32, axis=1)[:, :L]
    nshift = (cols % 32).astype(np.uint32)[None, :]
    nbit = (nwords >> nshift) & U32(1)
    return jnp.where(nbit == 1, np.int32(4), code2)


def _stage_out(*arrs):
    """Profiling checkpoint: a cheap reduction over a stage's live outputs
    (keeps XLA from dead-code-eliminating the truncated program). Sums run
    in 32-bit lanes (wrapping): a u64 reduction is ~10 emulated ops per
    element on the 32-bit VPU and would bill the checkpoint itself to the
    stage. Only tools/device_*_profile tools build steps with `stop`."""
    vals = []
    for a in arrs:
        a = jnp.asarray(a)
        if a.dtype in (jnp.uint64, jnp.int64):
            a = lax.bitcast_convert_type(a, jnp.uint32)  # trailing dim 2
        else:
            a = a.astype(jnp.uint32)
        vals.append(a.sum(dtype=jnp.uint32))
    return jnp.stack(vals).astype(jnp.uint64), jnp.zeros((1,), jnp.uint32)


def _build_step(k: int, w: int, e: int, f0: int, f1: int, min_seeds: int,
                num_refs: int, use_pallas: bool, split: bool = False,
                stop: str | None = None, dense_pallas: bool = False,
                probe: tuple | None = None):
    """Returns the jittable batch step; index/reference arrays are
    arguments so compiled executables are reusable (and cacheable on disk)
    across processes. `stop` truncates after the named stage (profiling
    only; see _stage_out). `dense_pallas` routes the minimizer front end
    through the fused VMEM kernel (ops/pallas_dense; TPU backends only)."""

    def step(rw, lengths, hash_keys, offcnt, occurrences,
             ref_words, ref_nwords, ref_lens, ref_offsets,
             probe_table=None, *,
             L: int, B: int, Mtot: int, Htot: int, captot: int):
        # ---- unpack + minimizers (dense (B, L) elementwise) -------------
        # rw: one row per read, W 2-bit-code words then WN N-bitmap words
        # (row budget: the hit sort key packs row<<47 | strand<<46 |
        # rid<<32 | start with the all-ones u64 as the invalid sentinel,
        # so rows may use bits 47..62 = 16 bits; 2^15 keeps a spare bit)
        assert B <= (1 << 15), "packed hit-sort key carries 15 row bits"
        W = (L + 15) // 16
        packed = rw[:, :W]
        nmask = rw[:, W:]
        codes = _unpack_codes(packed, nmask, B, L)
        if stop == "unpack":
            return _stage_out(codes)
        use_dense = dense_pallas and (B % 1024 == 0) and 2 * k > 32
        if use_dense:
            from .pallas_dense import dense_minimizer_device
            codes_T = _unpack_codes_T(packed, nmask, B, L)
            len_row = lengths.astype(jnp.int32).reshape(1, B)
            d_hlo, d_hhi, emit_T, mm_row, bad_row = dense_minimizer_device(
                codes_T, len_row, k, w, L)
            if stop == "kmer":
                return _stage_out(d_hlo, d_hhi)
            mm_count = mm_row[0]
            bad_mz = (bad_row[0] != 0) | (lengths != L)
        else:
            h, strand, symmetric, run = _kmer_stage(codes, k)
            if stop == "kmer":
                return _stage_out(h, strand, run)
            emit, tie = _emission_stage(h, run, lengths, k, w)
            mm_count = emit.sum(axis=1).astype(jnp.int32)
            bad_mz = (tie | symmetric).any(axis=1) | (lengths != L)
        if stop == "emission":
            return _stage_out(emit_T != 0 if use_dense else emit,
                              mm_count, bad_mz)

        # ---- per-read minimizer compaction (one-hot sums, no scatter) ---
        # (MZ, B) slot-major planes: slot d of lane b is the read's d-th
        # minimizer in ascending position order. MZ masked reductions over
        # the (L, B) planes are pure VPU ALU, replacing the former
        # full-plane scatter compaction (a (B*L)-element scatter + two
        # (B*L)-indexed gathers); reads with more than MZ minimizers route
        # to the exact host path, the same correctness escape as window
        # hash ties. The flat (Mtot,) downstream arrays are these planes
        # reshaped, so invalid slots are interspersed (hash UMAX64/cnt 0)
        # -- every flat stage already masks on validity.
        MZ = Mtot // B
        if use_dense:
            hlo_T, hhi_T = d_hlo, d_hhi          # (L, B) i32, inval = -1
            emit_Tm = emit_T != 0
        else:
            lo_b = lax.bitcast_convert_type(
                (h & U64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
            hi_b = lax.bitcast_convert_type(
                (h >> U64(32)).astype(jnp.uint32)
                | (strand.astype(jnp.uint32) << U32(31)), jnp.int32)
            hlo_T = lo_b.T                       # inval: h == UMAX64 ->
            hhi_T = hi_b.T                       # lo = hi = -1 (2k < 56)
            emit_Tm = emit.T
        rank = jnp.cumsum(emit_Tm.astype(jnp.int32), axis=0) - 1
        pos_col = jnp.arange(L, dtype=jnp.int32)[:, None]
        acc_lo, acc_hi, acc_pos = [], [], []
        for d in range(MZ):
            sel = emit_Tm & (rank == d)
            acc_lo.append(jnp.sum(jnp.where(sel, hlo_T, 0), axis=0,
                                  dtype=jnp.int32))
            acc_hi.append(jnp.sum(jnp.where(sel, hhi_T, 0), axis=0,
                                  dtype=jnp.int32))
            acc_pos.append(jnp.sum(jnp.where(sel, pos_col, 0), axis=0,
                                   dtype=jnp.int32))
        c_lo = lax.bitcast_convert_type(jnp.stack(acc_lo), jnp.uint32)
        c_hi = lax.bitcast_convert_type(jnp.stack(acc_hi), jnp.uint32)
        c_pos = jnp.stack(acc_pos).astype(jnp.uint32)        # (MZ, B)
        bad_mz = bad_mz | (mm_count > MZ)
        mz_valid2 = (jnp.arange(MZ, dtype=jnp.int32)[:, None]
                     < jnp.minimum(mm_count, MZ)[None, :])
        mz_h2 = jnp.where(
            mz_valid2,
            c_lo.astype(jnp.uint64)
            | ((c_hi & U32(0x7FFFFFFF)).astype(jnp.uint64) << U64(32)),
            UMAX64)
        # expansion metadata: row<<9 | pos<<1 | strand (row = lane)
        lane_row = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.uint32)[None, :], (MZ, B))
        meta2 = (lane_row << U32(9)) | (c_pos << U32(1)) | (c_hi >> U32(31))
        mz_h = mz_h2.reshape(-1)                              # (Mtot,)
        mz_valid = mz_valid2.reshape(-1)
        mz_packmeta = meta2.reshape(-1)
        if stop == "mzcompact":
            return _stage_out(mz_h, mz_packmeta)

        # ---- index probe ------------------------------------------------
        if probe is not None:
            # bucketed bounded binary search: Hash64 output is uniform, so
            # a bucket table over the top `tbits` hash bits caps every
            # lower_bound to `depth` halvings. Within a bucket all keys
            # share their top tbits, so the comparisons only need the low
            # `shift` (= 2k - tbits <= 32) bits: the search gathers hit a
            # u32 low-word copy of the key array (~2.4x cheaper per
            # element than u64 gathers on v5e). 2 + depth flat gathers
            # instead of the sort-method searchsorted's full concat-sort.
            p_shift, p_depth = probe
            nk = hash_keys.shape[0]
            nb = probe_table.shape[0] - 1
            keys_lo = (hash_keys & U64(0xFFFFFFFF)).astype(jnp.uint32)
            smask = U32((1 << p_shift) - 1) if p_shift < 32 \
                else U32(0xFFFFFFFF)
            ql = (mz_h.astype(jnp.uint32)) & smask
            bk = jnp.minimum((mz_h >> U64(p_shift)).astype(jnp.int64),
                             nb - 1).astype(jnp.int32)
            lo = probe_table[bk]
            hi0 = probe_table[bk + 1]
            hi = hi0
            gk = U32(0)
            for _ in range(p_depth):
                upd = lo < hi
                mid = (lo + hi) >> 1
                gk = keys_lo[jnp.minimum(mid, nk - 1)] & smask
                right = gk < ql
                lo = jnp.where(upd & right, mid + 1, lo)
                hi = jnp.where(upd & ~right, mid, hi)
            loc = lo
            # the bucket pins the top tbits (>= 2k-32), so a low-bits
            # match at the converged lower_bound is an exact key match;
            # one more u32 gather replaces the former u64 hash_keys[loc]
            loc = jnp.minimum(loc, nk - 1)
            found = ((lo < hi0)
                     & ((keys_lo[loc] & smask) == ql) & mz_valid)
        else:
            ib = max(1, (Mtot - 1).bit_length())
            nk = hash_keys.shape[0]
            if (2 * k + 1 + ib <= 64
                    and os.environ.get("CHROMAP_TPU_PROBE") != "sortss"):
                lf = _probe_merge_sort(hash_keys, mz_h, Mtot, ib)
                loc = jnp.minimum(lf & np.int32(0x7FFFFFFF), nk - 1)
                found = ((lf & np.int32(-0x80000000)) != 0) & mz_valid
            else:
                # hash too wide to pack with the query index (k > 22):
                # jnp's generic sort-method searchsorted
                loc = jnp.searchsorted(hash_keys, mz_h, side="left",
                                       method="sort")
                loc = jnp.minimum(loc, nk - 1)
                found = (hash_keys[loc] == mz_h) & mz_valid
        oc = offcnt[loc]
        if offcnt.dtype == jnp.uint32:
            # u32 offcnt tier (offsets < 2^20): ~2.4x cheaper gather
            off = (oc >> U32(12)).astype(jnp.int64)
            cnt = jnp.where(found, (oc & U32(0xFFF)).astype(jnp.int32), 0)
        else:
            off = (oc >> U64(12)).astype(jnp.int64)
            cnt = jnp.where(found, (oc & U64(0xFFF)).astype(jnp.int32), 0)
        if stop == "probe":
            return _stage_out(off, cnt, found)

        # round-1 frequency cap (candidate_processor.cc:24-32); the
        # per-read aggregates are axis-0 sums over the (MZ, B) planes
        # (the former scatter-adds are free column reductions here)
        cnt2 = cnt.reshape(MZ, B)
        cnt_eff2 = jnp.where(cnt2 < f0, cnt2, 0)
        total_rd = jnp.sum(cnt_eff2, axis=0, dtype=jnp.int32)
        # empty round 1 with a round-2 cap that would admit hits:
        # frequency escalation -> exact host path
        esc_any = ((cnt2 > 0) & (cnt2 < f1)).any(axis=0)
        round2 = (total_rd == 0) & esc_any
        overflow_rd = total_rd > HCAP
        if stop == "agg":
            return _stage_out(total_rd, round2, overflow_rd)

        # ---- repetitive-seed stats (index.cc:507-523) -------------------
        # per-column form: for each repetitive minimizer, the previous
        # repetitive one in the same read is an axis-0 cummax over masked
        # positions (positions ascend within a column); add min(gap, k)
        rep_mask = found.reshape(MZ, B) & (cnt2 >= f0)
        pos_i2 = c_pos.astype(jnp.int32)
        prev_incl = lax.cummax(jnp.where(rep_mask, pos_i2, -1), axis=0)
        prev_pos = jnp.concatenate(
            [jnp.full((1, B), -1, jnp.int32), prev_incl[:-1]], axis=0)
        gap = (pos_i2 - prev_pos).astype(jnp.uint32)
        inc = jnp.where(prev_pos < 0, np.uint32(k),
                        jnp.where(gap < np.uint32(k + w - 1), gap,
                                  np.uint32(k)))
        rep_len = jnp.sum(jnp.where(rep_mask, inc, U32(0)), axis=0,
                          dtype=jnp.uint32)
        rep_count = jnp.sum(rep_mask, axis=0, dtype=jnp.int32)
        num_required = jnp.clip(mm_count - rep_count, 1, min_seeds)
        if stop == "repstats":
            return _stage_out(rep_len, num_required)

        # ---- flat occurrence expansion (index.cc:237-349) ---------------
        cnt_eff = cnt_eff2.reshape(-1)                 # slot-major flat
        hcum = _cumsum1d(cnt_eff)                      # inclusive, (Mtot,)
        total_hits = hcum[-1]
        hbase = hcum - cnt_eff                         # exclusive
        slots = jnp.arange(Htot, dtype=jnp.int32)
        slot_ok = slots < jnp.minimum(total_hits, Htot)
        # per-hit-slot owner metadata and occurrence index WITHOUT an
        # owner gather: hit segments are contiguous, so the owner's meta
        # (segment-constant) and occ index base (segment-affine in the
        # slot) reconstruct from per-minimizer DELTAS scatter-added at
        # segment starts and prefix-summed over hit slots. Empty segments
        # share their start slot with the next nonzero segment and their
        # deltas telescope away; i32 wraparound in the deltas cancels in
        # the mod-2^32 prefix sum (true values fit i32: occurrence tables
        # are < 2^31 entries, meta is 23 bits). This replaces the former
        # (Mtot,)-element u64 owner gather (~8 ms at B=16k on v5e) with
        # two i32 scatter-adds + two i32 prefix sums (~3 ms).
        meta_s = lax.bitcast_convert_type(mz_packmeta, jnp.int32)
        dval = off.astype(jnp.int32) - hbase
        dm = meta_s - jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), meta_s[:-1]])
        dd = dval - jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), dval[:-1]])
        starts = jnp.minimum(hbase, Htot)
        metaH = _cumsum1d(jnp.zeros((Htot + 1,), jnp.int32)
                          .at[starts].add(dm, mode="drop")[:Htot])
        dH = _cumsum1d(jnp.zeros((Htot + 1,), jnp.int32)
                       .at[starts].add(dd, mode="drop")[:Htot])
        occ_idx = jnp.clip(dH + slots, 0, occurrences.shape[0] - 1)
        occ = occurrences[occ_idx]
        meta_i = lax.bitcast_convert_type(metaH, jnp.uint32)
        hit_row = (meta_i >> U32(9)).astype(jnp.int32)
        read_pos = (meta_i >> U32(1)) & U32(0xFF)
        m_strand = meta_i & U32(1)

        if occurrences.dtype == jnp.uint32:
            # u32 occurrence tier (genome < 2^24 bases, < 128 sequences):
            # rid<<25 | pos<<1 | strand; same uint32 candidate arithmetic
            rid = occ >> U32(25)
            ref_pos = (occ >> U32(1)) & U32(0xFFFFFF)
            same = (occ & U32(1)) == m_strand
        else:
            rid = (occ >> U64(33)).astype(jnp.uint32)
            ref_pos = (occ >> U64(1)).astype(jnp.uint32)
            same = (occ & U64(1)).astype(jnp.uint32) == m_strand
        start = jnp.where(same, ref_pos - read_pos,
                          ref_pos + read_pos - U32(k - 1))
        hit_hi = jnp.where(same, rid, rid | U32(1 << 31))
        hit_hi = jnp.where(slot_ok, hit_hi, UMAX32)
        hit_lo = jnp.where(slot_ok, start, UMAX32)
        if stop == "expand":
            return _stage_out(hit_hi, hit_lo, hit_row)

        # ---- per-read sort + scatter to the dense cluster tile ----------
        # single-key u64 sort: row(15) | strand(1) | rid(14) | start(32)
        # packs the whole lexicographic (row, hit_hi, hit_lo) order into
        # one word (rid < 2^14 is enforced at seeder init); ~2x cheaper
        # than the former two-key sort
        key1 = jnp.where(
            slot_ok,
            (hit_row.astype(jnp.uint64) << U64(47))
            | ((hit_hi >> U32(31)).astype(jnp.uint64) << U64(46))
            | ((hit_hi & U32(0x3FFF)).astype(jnp.uint64) << U64(32))
            | hit_lo.astype(jnp.uint64),
            UMAX64)
        skey = lax.sort(key1)
        srow_raw = (skey >> U64(47)).astype(jnp.int32)
        s_row = jnp.minimum(srow_raw, B - 1)
        if stop == "sort":
            return _stage_out(skey)
        # hits per read are contiguous after the flat sort; the in-read
        # rank is the slot minus the first slot of the row's sorted run
        # (a cummax over run starts -- no per-read base table, no gather)
        row_change = srow_raw != jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), srow_raw[:-1]])
        run_start = _cummax1d(jnp.where(row_change, slots, -1))
        dest_in = slots - run_start
        # scatter the packed sorted keys straight into the slot-major
        # (H+1, B) cluster tile as two u32 planes (TPU scatters of u64
        # values run ~4x slower than two u32 scatters, measured on v5e),
        # recombined elementwise for the scan; row bits stay in the word
        # -- they are constant within a column, so the scan's
        # full-top-word compares are equivalent. The never-written last
        # row doubles as the all-UMAX sentinel that closes each read's
        # final cluster.
        okd = slot_ok & (dest_in >= 0) & (dest_in < HCAP) \
            & (srow_raw < B)
        flatd = jnp.where(okd, dest_in * B + s_row, (HCAP + 1) * B)
        d_hi32 = jnp.full(((HCAP + 1) * B,), UMAX32).at[flatd].set(
            (skey >> U64(32)).astype(jnp.uint32), mode="drop")
        d_lo32 = jnp.full(((HCAP + 1) * B,), UMAX32).at[flatd].set(
            skey.astype(jnp.uint32), mode="drop")
        dense_w = (d_hi32.astype(jnp.uint64) << U64(32)
                   | d_lo32.astype(jnp.uint64)).reshape(HCAP + 1, B)
        if stop == "scatter":
            return _stage_out(dense_w)

        # ---- cluster (exact sequential semantics) ------------------------
        cl_emit, cl_w = _cluster_scan_W(dense_w, mm_count, num_required, e)
        # cl_w: start(32) | rid(14) | strand(1) | count<<47

        neg_w = ((cl_w >> U64(46)) & U64(1)).astype(jnp.int32)
        n_pos = (cl_emit & (neg_w == 0)).sum(axis=0).astype(jnp.int32)
        n_neg = (cl_emit & (neg_w == 1)).sum(axis=0).astype(jnp.int32)
        cand_over = (n_pos > CCAP) | (n_neg > CCAP)

        fallback = bad_mz | round2 | overflow_rd | cand_over
        n_pos = jnp.where(fallback, 0, n_pos)
        n_neg = jnp.where(fallback, 0, n_neg)

        # augment trigger (candidate_processor.cc:86-103): no candidate
        # supported by >= half the minimizers
        half = (mm_count // 2).astype(jnp.uint32)
        cnt_w = (cl_w >> U64(47)).astype(jnp.uint32) & U32(0xFF)
        supported = cl_emit & (cnt_w >= half[None, :])
        augment = ~supported.any(axis=0)
        if stop == "cluster":
            return _stage_out(cl_w, n_pos, n_neg, augment)

        # ---- per-read candidate compaction (one-hot sums) ---------------
        # emitted candidates per non-fallback read are <= 2*CCAP (the
        # cand_over gate), so 2*CCAP masked reductions compact the
        # (H+1, B) emission plane to (2*CCAP, B) with no scatter; the
        # remaining flat compaction scatters only the small plane
        emit_sel = cl_emit & ~fallback[None, :]
        crank = jnp.cumsum(emit_sel.astype(jnp.int32), axis=0) - 1
        pre_acc = []
        for d in range(2 * CCAP):
            seld = emit_sel & (crank == d)
            pre_acc.append(jnp.sum(jnp.where(seld, cl_w, U64(0)), axis=0))
        pre_w = jnp.stack(pre_acc)                    # (2*CCAP, B) u64
        n_emit = n_pos + n_neg
        pre_valid = (jnp.arange(2 * CCAP, dtype=jnp.int32)[:, None]
                     < n_emit[None, :])
        csrc, total_cands = _flat_compact_T(pre_valid, captot)
        sel_real = jnp.arange(captot, dtype=jnp.int32) < total_cands
        sc_w = pre_w.reshape(-1)[csrc]
        sc_lo = sc_w.astype(jnp.uint32)
        sc_cnt = (sc_w >> U64(47)) & U64(0xFF)
        sc_row = (csrc % U32(B)).astype(jnp.int32)
        if stop == "candcompact":
            return _stage_out(sc_w, sc_row)

        # ---- verification (alignment.cc:141-192 per candidate) ----------
        crid = ((sc_w >> U64(32)) & U64(0x3FFF)).astype(jnp.uint32)
        cneg = ((sc_w >> U64(46)) & U64(1)).astype(jnp.uint8)
        position = jnp.where(cneg == 1, sc_lo - U32(L - 1), sc_lo)
        pos64 = position.astype(jnp.int64)
        rid_c = jnp.minimum(crid, num_refs - 1).astype(jnp.int32)
        rl = jnp.where(crid < num_refs, ref_lens[rid_c], 0)
        vvalid = (sel_real & (crid < num_refs)
                  & (pos64 >= e) & (pos64 < rl)
                  & (pos64 + L + e < rl))
        pstart = jnp.where(vvalid, ref_offsets[rid_c] + pos64 - e, 0)
        patterns = _gather_ref_windows(ref_words, ref_nwords, pstart,
                                       L + 2 * e, captot)
        if stop == "gatherref":
            return _stage_out(patterns)

        if split:
            # split (drop-off) verification (draft_mapping_generator.cc:
            # 410-555): per candidate, the drop-off kernel from the
            # matching read end plus the unconditional 5'-gap retry.
            # Dropoff3End(p, t) == Dropoff(reverse(p), reverse(t)), and
            # reverse(neg_read) == complement(read), so negative
            # candidates ride the same forward kernel over reversed
            # windows and complemented (unreversed) read codes; both
            # retries are the kernel over operands sliced by the gap.
            from .pallas_myers import myers_dropoff_jnp
            negm = (cneg == 1)[:, None]
            patterns0 = jnp.where(negm, patterns[:, ::-1], patterns)
            if use_dense:
                tex = _gather_read_rows(packed, nmask, sc_row, L)
                texts0 = jnp.where(negm & (tex < 4), tex ^ 3, tex)
            else:
                comp_codes = jnp.where(codes < 4, codes ^ 3, 4)
                texts0 = jnp.where(negm, comp_codes[sc_row, :],
                                   codes[sc_row, :]).astype(jnp.int32)
            g = 20 - e  # allow_gap_beginning
            err0, end0, rml0 = myers_dropoff_jnp(patterns0.T, texts0.T,
                                                 e, L)
            err1, end1, rml1 = myers_dropoff_jnp(patterns0[:, g:].T,
                                                 texts0[:, g:].T, e, L - g)

            def packv(errv, endv, rmlv):
                s = (endv < 0).astype(jnp.uint64)
                return (jnp.clip(errv, 0, 127).astype(jnp.uint64)
                        | (s << U64(7))
                        | (jnp.minimum(jnp.abs(endv), 511).astype(jnp.uint64)
                           << U64(8))
                        | (jnp.clip(rmlv, 0, 255).astype(jnp.uint64)
                           << U64(17)))

            cand2 = packv(err0, end0, rml0) | (packv(err1, end1, rml1)
                                               << U64(25))
            cand2 = jnp.where(sel_real, cand2, U64(0))
            err_p = jnp.zeros((captot,), jnp.uint64)
            endp_p = jnp.zeros((captot,), jnp.uint64)
        else:
            if use_dense:
                tex = _gather_read_rows(packed, nmask, sc_row, L)
                tex_rev = tex[:, ::-1]
                rc = jnp.where(tex_rev < 4, tex_rev ^ 3, tex_rev)
                text_sel = jnp.where((cneg == 1)[:, None], rc, tex)
            else:
                rc_codes = jnp.where(codes[:, ::-1] < 4,
                                     codes[:, ::-1] ^ 3, 4)
                text_sel = jnp.where((cneg == 1)[:, None],
                                     rc_codes[sc_row, :],
                                     codes[sc_row, :]).astype(jnp.int32)

            from .pallas_myers import myers_jnp
            err, endp = myers_jnp(patterns.T, text_sel.T, e, L)
            # pack: err clamps at e+1 (only <= e is ever consumed), endp
            # is band-relative (end - (L-1) in [0, 2e])
            err_p = jnp.clip(err, 0, e + 1).astype(jnp.uint64)
            endp_p = jnp.clip(endp - (L - 1), 0, 2 * e).astype(jnp.uint64)

        # ---- packed outputs ---------------------------------------------
        flags = (fallback.astype(jnp.uint32) * FLAG_FALLBACK
                 | augment.astype(jnp.uint32) * FLAG_AUGMENT)
        read_meta = (jnp.minimum(mm_count, 255).astype(jnp.uint32)
                     | (jnp.minimum(rep_len, 511) << U32(8))
                     | (flags << U32(17))
                     | (n_pos.astype(jnp.uint32) << U32(19))
                     | (n_neg.astype(jnp.uint32) << U32(24)))
        cand = (sc_lo.astype(jnp.uint64)
                | (crid.astype(jnp.uint64) << U64(32))
                | (sc_cnt << U64(46))
                | (err_p << U64(54))
                | (endp_p << U64(59)))
        cand = jnp.where(sel_real, cand, U64(0))
        batch_over = (total_hits > Htot) | (total_cands > captot)
        # download: ONE stream [total, over, meta(B), cand32(2*dlcap)] whose
        # host copy starts asynchronously at submit time (each d2h transfer
        # costs ~40 ms fixed on the tunnel relay, and a transfer dispatched
        # at resolve time would also queue behind the next chunk's compute).
        # The full candidate stream is returned as a second, undownloaded
        # array for the rare chunks whose total exceeds the download cap.
        dlcap = (captot * DL_CANDS_PER_READ) // CANDS_PER_READ
        header = jnp.stack([total_cands.astype(jnp.uint32),
                            batch_over.astype(jnp.uint32)])
        if split:
            # split candidates carry a second u64 (the packed drop-off
            # results); interleave so each candidate is 4 consecutive u32s
            pair = jnp.stack([cand, cand2], axis=1)
            cand32 = lax.bitcast_convert_type(pair, jnp.uint32).reshape(-1)
            return (jnp.concatenate([header, read_meta,
                                     cand32[:4 * dlcap]]), cand32)
        cand32 = lax.bitcast_convert_type(cand, jnp.uint32).reshape(-1)
        return (jnp.concatenate([header, read_meta, cand32[:2 * dlcap]]),
                cand32)

    return step


@functools.lru_cache(maxsize=8)
def _jitted_step(k, w, e, f0, f1, min_seeds, num_refs, use_pallas,
                 split=False, dense_pallas=False, probe=None):
    return jax.jit(
        _build_step(k, w, e, f0, f1, min_seeds, num_refs, use_pallas,
                    split=split, dense_pallas=dense_pallas, probe=probe),
        static_argnames=("L", "B", "Mtot", "Htot", "captot"))


def unpack_download(meta32: np.ndarray, cand64: np.ndarray, L: int):
    """Unpack the device download (u32 per read, u64 per candidate) to the
    wide DevSeedView layout the C++ finish stage consumes
    (engine.cpp:1407-1455)."""
    mm = meta32 & 0xFF
    rep = (meta32 >> 8) & 0x1FF
    flags = (meta32 >> 17) & 0x3
    npos = (meta32 >> 19) & 0x1F
    nneg = (meta32 >> 24) & 0x1F
    meta_np = (mm.astype(np.uint64)
               | (rep.astype(np.uint64) << np.uint64(8))
               | (flags.astype(np.uint64) << np.uint64(24))
               | (npos.astype(np.uint64) << np.uint64(32))
               | (nneg.astype(np.uint64) << np.uint64(40)))
    pos_np = cand64 & np.uint64(0x3FFFFFFFFFFF)  # rid<<32 | start
    cnt_np = ((cand64 >> np.uint64(46)) & np.uint64(0xFF)).astype(np.uint32)
    err_np = ((cand64 >> np.uint64(54)) & np.uint64(0x1F)).astype(np.uint32)
    endp_np = np.minimum(
        ((cand64 >> np.uint64(59)) & np.uint64(0x1F)).astype(np.uint32)
        + (L - 1), 255)
    cmeta_np = (cnt_np | (err_np << 8) | (endp_np << 16)).astype(np.uint32)
    return meta_np, pos_np, cmeta_np


def _pack_reads(codes: np.ndarray):
    """(B, L) u8 codes -> (B, W+WN) u32: per row W 2-bit-code words then WN
    N-bitmap words (the cn_pack_reads upload layout, ~2.25 bits/base).
    numpy reference implementation; the pipeline packs in C++ straight
    from the FASTQ buffers (fresh numpy temporaries page-fault at
    ~200 s/GB on the target VM)."""
    B, L = codes.shape
    W = (L + 15) // 16
    WN = (L + 31) // 32
    pad = np.zeros((B, 16 * W - L), np.uint8)
    c = np.concatenate([codes, pad], axis=1)
    c2 = (c & 3).astype(np.uint32).reshape(B, W, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    packed = (c2 << shifts).sum(axis=2, dtype=np.uint32)
    padn = np.zeros((B, 32 * WN - L), np.uint8)
    n = np.concatenate([codes >= 4, padn.astype(bool)], axis=1)
    n2 = n.astype(np.uint32).reshape(B, WN, 32)
    nshifts = np.arange(32, dtype=np.uint32)[None, None, :]
    nmask = (n2 << nshifts).sum(axis=2, dtype=np.uint32)
    return np.concatenate([packed, nmask], axis=1)


def _pack_genome(ref_codes: np.ndarray):
    """(G,) u8 codes -> ((GW,) u32 2-bit words, (GN,) u32 N-bitmaps)."""
    G = len(ref_codes)
    GW = (G + 15) // 16 + 2
    GN = (G + 31) // 32 + 2
    c = np.zeros(16 * GW, np.uint8)
    c[:G] = ref_codes & 3
    c2 = c.astype(np.uint32).reshape(GW, 16)
    words = (c2 << (2 * np.arange(16, dtype=np.uint32))[None, :]).sum(
        axis=1, dtype=np.uint32)
    n = np.zeros(32 * GN, bool)
    n[:G] = ref_codes >= 4
    n2 = n.astype(np.uint32).reshape(GN, 32)
    nwords = (n2 << np.arange(32, dtype=np.uint32)[None, :]).sum(
        axis=1, dtype=np.uint32)
    return words, nwords


class DeviceSeeder:
    """Holds the device-resident index/reference and the jitted batch step.

    Per-read capacities (HCAP hits, CCAP candidates/strand) route
    overflowing reads to the exact host path; the flat per-batch budgets
    (minimizers/hits/candidates) trade device memory against whole-batch
    fallback, never correctness.
    """

    def __init__(self, index, ref_seqs, error_threshold: int,
                 min_num_seeds: int, max_seed_frequencies,
                 use_pallas: bool | None = None, split: bool = False,
                 **_compat):
        self.k = int(index.kmer_size)
        self.w = int(index.window_size)
        self.e = int(error_threshold)
        self.split = bool(split)
        self.f0 = int(max_seed_frequencies[0])
        self.f1 = int(max_seed_frequencies[1])
        self.min_num_seeds = int(min_num_seeds)
        if use_pallas is None:
            # the jnp Myers fuses into one XLA loop kernel (measured
            # 12.8 G band-cells/s on v5e); it also composes with the x64
            # tracing this module needs
            use_pallas = False
        self.use_pallas = use_pallas
        # the fused minimizer front end needs Mosaic (TPU backends only);
        # CPU meshes and tests take the bit-identical jnp stages
        try:
            self.dense_pallas = (jax.default_backend() not in
                                 ("cpu", "METAL"))
        except Exception:
            self.dense_pallas = False
        if os.environ.get("CHROMAP_TPU_DENSE_PALLAS") == "0":
            self.dense_pallas = False
        self.num_refs = len(ref_seqs)
        # packed-candidate format bounds: rid in 14 bits, occurrence counts
        # saturate at 12 bits (anything >= f1 behaves identically)
        if self.num_refs >= (1 << 14):
            raise ValueError("device seeding supports < 16384 reference "
                             "sequences (packed candidate format)")
        if self.f1 > 4000:
            raise ValueError("device seeding requires max seed frequency "
                             "<= 4000 (12-bit saturating counts)")

        self.hash_keys = jax.device_put(
            jnp.asarray(index.hash_keys, dtype=jnp.uint64))
        off = np.asarray(index.offsets, dtype=np.uint64)
        cnt = np.asarray(index.counts, dtype=np.uint64)
        offcnt = (off << np.uint64(12)) | np.minimum(cnt, 0xFFF)
        if off.size == 0 or int(off.max()) < (1 << 20):
            # u32 tier: offsets fit 20 bits -> the per-query offcnt gather
            # moves half the bytes (the in-graph unpack branches on dtype)
            offcnt = offcnt.astype(np.uint32)
        self.offcnt = jax.device_put(jnp.asarray(offcnt))
        occ = np.asarray(index.occurrences, dtype=np.uint64)
        occ_rid = occ >> np.uint64(33)
        occ_pos = (occ >> np.uint64(1)) & np.uint64(0xFFFFFFFF)
        if (self.num_refs <= 128
                and (occ.size == 0 or int(occ_pos.max()) < (1 << 24))):
            # u32 tier (rid<<25 | pos<<1 | strand): halves the expansion
            # stage's random-gather bytes on small genomes
            occ = ((occ_rid << np.uint64(25)) | (occ_pos << np.uint64(1))
                   | (occ & np.uint64(1))).astype(np.uint32)
        self.occurrences = jax.device_put(jnp.asarray(occ))
        # bucket table for the probe stage: top tbits of the (uniform)
        # 2k-bit hash space -> lower_bound range, capping the in-graph
        # binary search at `depth` halvings (see _build_step).
        # OFF by default: measured end-to-end on the v5e (16384x100 chunk,
        # 500k-key index, 2026-08-18) the sort-method searchsorted probe
        # runs the full program in 195 ms vs 226 ms with the bucketed
        # search -- the 2+depth dependent gather rounds serialize against
        # HBM latency while the concat-sort pipelines. Kept as an opt-in
        # (CHROMAP_TPU_PROBE=bucket) for larger indexes, where sort cost
        # grows O((M+K) log) and the bucket walk stays flat.
        keys_np = np.asarray(index.hash_keys, dtype=np.uint64)
        nk = len(keys_np)
        if nk > 0 and os.environ.get("CHROMAP_TPU_PROBE") == "bucket":
            tbits = min(22, max(10, int(np.ceil(np.log2(nk))) + 2))
            # the in-graph search compares only the low `shift` bits via a
            # u32 key copy, so the bucket must pin the rest: tbits >= 2k-32
            tbits = max(tbits, 2 * self.k - 32)
            shift = max(0, 2 * self.k - tbits)
            nb = 1 << tbits
            bounds = (np.arange(nb + 1, dtype=np.uint64)
                      << np.uint64(shift))
            table = np.searchsorted(keys_np, bounds,
                                    side="left").astype(np.int32)
            max_bucket = int(np.max(table[1:] - table[:-1]))
            depth = max(1, int(np.ceil(np.log2(max(max_bucket, 1)))) + 1)
            self._probe = (shift, depth)
            self.probe_table = jax.device_put(jnp.asarray(table))
        else:
            self._probe = None
            self.probe_table = None
        tbl = np.full(256, 4, np.uint8)
        for i, c in enumerate(b"ACGT"):
            tbl[c] = i
        for i, c in enumerate(b"acgt"):
            tbl[c] = i
        ref_codes = tbl[np.frombuffer(b"".join(ref_seqs), np.uint8)]
        words, nwords = _pack_genome(ref_codes)
        self.ref_words = jax.device_put(jnp.asarray(words))
        self.ref_nwords = jax.device_put(jnp.asarray(nwords))
        lens = np.array([len(s) for s in ref_seqs], dtype=np.int64)
        self.ref_lens = jax.device_put(jnp.asarray(lens))
        offr = np.zeros(len(ref_seqs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offr[1:])
        self.ref_offsets = jax.device_put(jnp.asarray(offr))
        self._lengths_cache = {}
        self._step = _jitted_step(self.k, self.w, self.e, self.f0, self.f1,
                                  self.min_num_seeds, self.num_refs,
                                  self.use_pallas, split=self.split,
                                  dense_pallas=self.dense_pallas,
                                  probe=self._probe)
        # the first device-to-host transfer of a process can stall for
        # minutes on relayed TPU links (connection establishment); start an
        # async copy so the handshake overlaps mapping work. This must NOT
        # be a Python daemon thread blocking in np.asarray: if the process
        # exits while the transfer is in flight, CPython 3.12 finalization
        # kills the thread via pthread_exit as it re-enters Python from
        # jaxlib C++, the forced unwind is swallowed by a catch(...) and
        # glibc aborts with "FATAL: exception not rethrown" (reproduced
        # and bisected 2026-08-18; this was ONCHIP_r03's parity_batch16k
        # rc=-6). copy_to_host_async warms the channel entirely in C++.
        try:
            self.ref_lens.copy_to_host_async()
        except Exception:
            pass

    def _drop_dense_pallas(self) -> bool:
        """A step call failed -- most likely the fused Pallas minimizer
        front end failing to lower on this backend. Fall back to the
        bit-identical jnp dense stages and let the caller retry once.
        Returns False when dense-Pallas was already off (nothing left to
        drop; the caller re-raises and the pipeline degrades to
        host-only)."""
        if not self.dense_pallas:
            return False
        import sys
        print("chromap-tpu: fused Pallas minimizer kernel failed; "
              "retrying with the jnp dense stages", file=sys.stderr)
        self.dense_pallas = False
        self._step = _jitted_step(self.k, self.w, self.e, self.f0,
                                  self.f1, self.min_num_seeds,
                                  self.num_refs, self.use_pallas,
                                  split=self.split, dense_pallas=False,
                                  probe=self._probe)
        steps = getattr(self, "_sharded_steps", None)
        if steps is not None:
            steps.clear()
        return True

    # ------------------------------------------------------------------
    def submit(self, codes: np.ndarray, lengths: np.ndarray):
        """Asynchronously dispatch one batch of (B, L) u8 codes; returns an
        opaque handle. Device compute and the host's work on other batches
        overlap until `resolve` forces the (small, exact-length)
        download."""
        B, L = codes.shape
        return self.submit_packed(_pack_reads(codes), B, L,
                                  lengths=lengths)

    def submit_packed(self, rw: np.ndarray, B: int, L: int,
                      lengths: np.ndarray | None = None):
        """Dispatch a prepacked (B, W+WN) u32 batch (cn_pack_reads layout).
        With lengths=None all reads are length L (the packer enforces
        uniformity), and the device-resident lengths vector is reused
        across batches."""
        Mtot = MZ_PER_READ * B
        Htot = HITS_PER_READ * B
        captot = CANDS_PER_READ * B
        if lengths is None:
            key = (B, L)
            lend = self._lengths_cache.get(key)
            if lend is None:
                lend = jax.device_put(
                    jnp.full((B,), L, dtype=jnp.int32))
                self._lengths_cache[key] = lend
        else:
            lend = jnp.asarray(lengths, dtype=jnp.int32)
        try:
            dl, full = self._step(jnp.asarray(rw), lend, self.hash_keys,
                                  self.offcnt, self.occurrences,
                                  self.ref_words, self.ref_nwords,
                                  self.ref_lens, self.ref_offsets,
                                  self.probe_table,
                                  L=L, B=B, Mtot=Mtot, Htot=Htot,
                                  captot=captot)
        except Exception:
            if not self._drop_dense_pallas():
                raise
            dl, full = self._step(jnp.asarray(rw), lend, self.hash_keys,
                                  self.offcnt, self.occurrences,
                                  self.ref_words, self.ref_nwords,
                                  self.ref_lens, self.ref_offsets,
                                  self.probe_table,
                                  L=L, B=B, Mtot=Mtot, Htot=Htot,
                                  captot=captot)
        try:
            dl.copy_to_host_async()
        except Exception:
            pass
        return ((dl, full, B), captot, L)

    def resolve(self, handle
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
        """Blocks on a submitted batch. Returns (read_meta u64 (B,),
        cand_pos u64, cand_meta u32, batch_overflow) in the wide
        DevSeedView layout the C++ finish stage consumes; candidates are
        row-major (read, strand, position-order). The whole result rides
        the one async transfer started at submit; only chunks whose
        candidate total exceeds the download cap pay a second pull."""
        (dl, full, B), captot, L = handle
        dl_np = np.asarray(dl)
        total = int(dl_np[0])
        if dl_np[1]:
            # flat budget exceeded: caller maps this batch on the host
            return None, None, None, True
        meta32 = dl_np[2:2 + B]
        dlcap = (captot * DL_CANDS_PER_READ) // CANDS_PER_READ
        upc = 4 if self.split else 2  # u32s per candidate
        if total <= dlcap:
            cand64 = dl_np[2 + B:2 + B + upc * total].view(np.uint64)
        else:
            cand64 = np.asarray(full[:upc * total]).view(np.uint64)
        if self.split:
            # interleaved (cand, split-ext) u64 pairs; cand_meta becomes
            # (cmeta, split_ext) for the split-aware finish stage
            meta_np, pos_np, cmeta_np = unpack_download(
                meta32, cand64[0::2], L)
            return meta_np, pos_np, (cmeta_np,
                                     np.ascontiguousarray(cand64[1::2])), \
                False
        meta_np, pos_np, cmeta_np = unpack_download(meta32, cand64, L)
        return meta_np, pos_np, cmeta_np, False

    def seed_and_verify(self, codes: np.ndarray, lengths: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Synchronous submit + resolve."""
        return self.resolve(self.submit(codes, lengths))


class MeshSeeder(DeviceSeeder):
    """DeviceSeeder running the seeding program under shard_map over a
    data mesh: the read batch shards over `n_devices` chips, the index
    and packed reference replicate (HBM-scale), and the download is one
    per-shard packed stream reassembled host-side in shard order (shards
    hold contiguous read ranges, so concatenation restores global read
    order). Interface-compatible with DeviceSeeder, so the hybrid
    scheduler and the CLI use it transparently whenever more than one
    device is visible (SURVEY.md §5 distributed plan: batch sharding
    across chips is the production configuration)."""

    def __init__(self, index, ref_seqs, error_threshold: int,
                 min_num_seeds: int, max_seed_frequencies,
                 num_devices: int | None = None, **kw):
        super().__init__(index, ref_seqs, error_threshold, min_num_seeds,
                         max_seed_frequencies, **kw)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()
        if num_devices:
            devices = devices[:num_devices]
        self.mesh = Mesh(np.array(devices), axis_names=("data",))
        self.n_dev = len(devices)
        repl = NamedSharding(self.mesh, P())
        # re-place the index/reference arrays replicated across the mesh
        for name in ("hash_keys", "offcnt", "occurrences", "ref_words",
                     "ref_nwords", "ref_lens", "ref_offsets",
                     "probe_table"):
            arr = getattr(self, name)
            if arr is not None:
                setattr(self, name, jax.device_put(arr, repl))
        self._row_sharding = NamedSharding(self.mesh, P("data", None))
        self._sharded_steps = {}

    def _sharded_step(self, B: int, L: int):
        key = (B, L)
        fn = self._sharded_steps.get(key)
        if fn is not None:
            return fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n = self.n_dev
        Bs = B // n
        Mtot, Htot = MZ_PER_READ * Bs, HITS_PER_READ * Bs
        captot = CANDS_PER_READ * Bs
        step = _build_step(self.k, self.w, self.e, self.f0, self.f1,
                           self.min_num_seeds, self.num_refs,
                           self.use_pallas, split=self.split,
                           dense_pallas=self.dense_pallas,
                           probe=self._probe)

        def shard_step(rw, lens, hash_keys, offcnt, occurrences,
                       ref_words, ref_nwords, ref_lens, ref_offsets,
                       probe_table):
            return step(rw, lens, hash_keys, offcnt, occurrences,
                        ref_words, ref_nwords, ref_lens, ref_offsets,
                        probe_table,
                        L=L, B=Bs, Mtot=Mtot, Htot=Htot, captot=captot)

        rep = P()
        fn = jax.jit(shard_map(
            shard_step, mesh=self.mesh,
            in_specs=(P("data", None), P("data"),
                      rep, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(P("data"), P("data")),
            check_vma=False))
        self._sharded_steps[key] = fn
        return fn

    def submit_packed(self, rw: np.ndarray, B: int, L: int,
                      lengths: np.ndarray | None = None):
        n = self.n_dev
        if B % n != 0:
            # row count must split evenly over the mesh; the hybrid pads
            # chunks to a fixed size, so this only rejects odd configs
            return super().submit_packed(rw, B, L, lengths=lengths)
        from jax.sharding import NamedSharding, PartitionSpec as P

        if lengths is None:
            key = (B, L)
            lend = self._lengths_cache.get(key)
            if lend is None:
                lend = jax.device_put(
                    np.full((B,), L, dtype=np.int32),
                    NamedSharding(self.mesh, P("data")))
                self._lengths_cache[key] = lend
        else:
            lend = jax.device_put(np.asarray(lengths, dtype=np.int32),
                                  NamedSharding(self.mesh, P("data")))
        rw_dev = jax.device_put(np.ascontiguousarray(rw),
                                self._row_sharding)
        try:
            dl, full = self._sharded_step(B, L)(
                rw_dev, lend, self.hash_keys, self.offcnt,
                self.occurrences, self.ref_words, self.ref_nwords,
                self.ref_lens, self.ref_offsets, self.probe_table)
        except Exception:
            if not self._drop_dense_pallas():
                raise
            dl, full = self._sharded_step(B, L)(
                rw_dev, lend, self.hash_keys, self.offcnt,
                self.occurrences, self.ref_words, self.ref_nwords,
                self.ref_lens, self.ref_offsets, self.probe_table)
        try:
            dl.copy_to_host_async()
        except Exception:
            pass
        captot_s = CANDS_PER_READ * (B // n)
        return ("mesh", dl, full, B, captot_s, L)

    def resolve(self, handle):
        if not (isinstance(handle, tuple) and handle and
                handle[0] == "mesh"):
            return super().resolve(handle)
        _, dl, full, B, captot_s, L = handle
        n = self.n_dev
        Bs = B // n
        dlcap_s = (captot_s * DL_CANDS_PER_READ) // CANDS_PER_READ
        upc = 4 if self.split else 2  # u32s per candidate
        rows = np.asarray(dl).reshape(n, -1)
        if rows[:, 1].any():
            return None, None, None, True
        totals = rows[:, 0].astype(np.int64)
        meta32 = rows[:, 2:2 + Bs].reshape(-1)
        full_np = None
        cand_parts = []
        for d in range(n):
            t = int(totals[d])
            if t <= dlcap_s:
                cand_parts.append(
                    rows[d, 2 + Bs:2 + Bs + upc * t].view(np.uint64))
            else:
                if full_np is None:
                    full_np = np.asarray(full).reshape(n, -1)
                cand_parts.append(full_np[d, :upc * t].view(np.uint64))
        cand64 = np.concatenate(cand_parts) if cand_parts else \
            np.empty(0, np.uint64)
        if self.split:
            meta_np, pos_np, cmeta_np = unpack_download(
                meta32, cand64[0::2], L)
            return meta_np, pos_np, (cmeta_np,
                                     np.ascontiguousarray(cand64[1::2])), \
                False
        meta_np, pos_np, cmeta_np = unpack_download(meta32, cand64, L)
        return meta_np, pos_np, cmeta_np, False


_seeder_cache: dict = {}


def get_device_seeder(index, ref_seqs, error_threshold: int,
                      min_num_seeds: int, max_seed_frequencies,
                      cache_key=None, mesh_devices: int = 0,
                      split: bool = False) -> "DeviceSeeder":
    """Process-wide DeviceSeeder cache.

    Uploading the index/reference to HBM costs ~0.25 s plus one h2d
    round per array on the relayed link; pipelines over the same index
    (the common case: repeated runs, multiple read files) share one
    device-resident copy. `cache_key` identifies the index/reference
    content (e.g. (index_path, mtime, ref_path, mtime)); None disables
    caching.

    mesh_devices: 0 = automatic (shard the read batch over ALL visible
    devices when more than one -- the multi-chip production
    configuration); 1 = force single-device; N>1 = use N devices."""
    if mesh_devices == 0:
        mesh_devices = len(jax.devices())

    def build():
        if mesh_devices > 1:
            return MeshSeeder(index, ref_seqs, error_threshold,
                              min_num_seeds, max_seed_frequencies,
                              num_devices=mesh_devices, split=split)
        return DeviceSeeder(index, ref_seqs, error_threshold,
                            min_num_seeds, max_seed_frequencies,
                            split=split)

    if cache_key is None:
        return build()
    key = (cache_key, int(error_threshold), int(min_num_seeds),
           tuple(int(f) for f in max_seed_frequencies), mesh_devices,
           split)
    seeder = _seeder_cache.get(key)
    if seeder is None:
        seeder = build()
        _seeder_cache.clear()  # one resident index at a time (HBM budget)
        _seeder_cache[key] = seeder
    return seeder
