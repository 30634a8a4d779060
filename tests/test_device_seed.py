"""Device-seeded engine: jnp seeding/verification vs the per-read oracle,
and end-to-end byte parity of cn_map_pairs_dev against the host engine.

Runs on the CPU backend (conftest pins JAX_PLATFORMS=cpu); the device
module enables x64 at import, which the rest of the suite tolerates
because all kernel code is dtype-explicit.
"""

import os

import numpy as np
import pytest

from chromap_tpu.index.index import build_index
from chromap_tpu.index.minimizers import generate_minimizers
from chromap_tpu.mapping.candidates import CandidateGenerator, ReadSeedState
from chromap_tpu.mapping.verify import banded_align

K, W, E = 17, 7, 8
F = (500, 1000)
MIN_SEEDS = 2
B2C = {0: b"A", 1: b"C", 2: b"G", 3: b"T", 4: b"N"}


def _to_seq(codes):
    return b"".join(B2C[int(c)] for c in codes)


@pytest.fixture(scope="module")
def small_world():
    rng = np.random.default_rng(7)
    core = rng.integers(0, 4, 12000, dtype=np.uint8)
    rep = core[500:700]
    genome = np.concatenate([core, rep, core[3000:5000], rep, rep])
    ref_codes = [genome, rng.integers(0, 4, 4000, dtype=np.uint8)]
    index = build_index(ref_codes, K, W)
    ref_seqs = [_to_seq(g) for g in ref_codes]
    return index, ref_codes, ref_seqs


def _simulate_reads(ref_codes, rng, B, L):
    reads = np.zeros((B, L), dtype=np.uint8)
    for i in range(B):
        g = ref_codes[i % len(ref_codes)]
        st = rng.integers(0, len(g) - L)
        r = g[st:st + L].copy()
        for _ in range(rng.integers(0, 4)):
            r[rng.integers(0, L)] = rng.integers(0, 4)
        if i % 13 == 0:
            r[rng.integers(0, L)] = 4          # N base
        if i % 17 == 0:
            r = rng.integers(0, 4, L, dtype=np.uint8)  # unmappable
        if i % 19 == 0:
            r[10:30] = r[9]                    # homopolymer: window ties
        if rng.random() < 0.5:
            r = np.where(r[::-1] < 4, r[::-1] ^ 3, 4).astype(np.uint8)
        reads[i] = r
    return reads


def test_device_seed_matches_oracle(small_world):
    from chromap_tpu.ops.device_seed import (FLAG_AUGMENT, FLAG_FALLBACK,
                                             DeviceSeeder)

    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(3)
    B, L = 96, 80
    reads = _simulate_reads(ref_codes, rng, B, L)
    lengths = np.full(B, L, dtype=np.int64)

    seeder = DeviceSeeder(index, ref_seqs, E, MIN_SEEDS, F, use_pallas=False)
    meta, cand_pos, cand_meta, overflow = seeder.seed_and_verify(
        reads, lengths)
    assert not overflow

    gen = CandidateGenerator(index, E, MIN_SEEDS, F)
    refcat = b"".join(ref_seqs)
    ref_off = np.zeros(len(ref_seqs), dtype=np.int64)
    np.cumsum([len(s) for s in ref_seqs][:-1], out=ref_off[1:])
    ref_lens = [len(s) for s in ref_seqs]

    cursor = 0
    n_fallback = 0
    for i in range(B):
        m = int(meta[i])
        mm, rep = m & 0xFF, (m >> 8) & 0xFFFF
        flags = (m >> 24) & 0xFF
        npos, nneg = (m >> 32) & 0xFF, (m >> 40) & 0xFF
        dev = [(int(cand_pos[cursor + j]), int(cand_meta[cursor + j]))
               for j in range(npos + nneg)]
        cursor += npos + nneg

        st = ReadSeedState()
        st.minimizers = generate_minimizers(reads[i], 0, K, W)
        gen.generate(st)
        if flags & FLAG_FALLBACK:
            n_fallback += 1
            assert npos == 0 and nneg == 0
            continue
        assert mm == min(len(st.minimizers), 255)
        assert rep == min(st.repetitive_seed_length, 0xFFFF)
        assert npos == len(st.positive_candidates)
        assert nneg == len(st.negative_candidates)
        o_aug = not any(c.count >= len(st.minimizers) // 2
                        for c in (st.positive_candidates
                                  + st.negative_candidates))
        assert bool(flags & FLAG_AUGMENT) == o_aug
        oracle = ([(c, False) for c in st.positive_candidates]
                  + [(c, True) for c in st.negative_candidates])
        for (dv, ml), (oc, neg) in zip(dev, oracle):
            assert dv == oc.position
            assert (ml & 0xFF) == (oc.count & 0xFF)
            derr, dend = (ml >> 8) & 0xFF, (ml >> 16) & 0xFF
            rid = oc.position >> 32
            pos = oc.position & 0xFFFFFFFF
            if neg:
                pos = (pos - L + 1) & 0xFFFFFFFF
            rl = ref_lens[rid] if rid < len(ref_lens) else 0
            if rid >= len(ref_lens) or pos < E or pos >= rl \
                    or pos + L + E >= rl:
                continue  # invalid candidate: device value never consumed
            pat = refcat[ref_off[rid] + pos - E:
                         ref_off[rid] + pos - E + L + 2 * E]
            rseq = (_to_seq(np.where(reads[i][::-1] < 4,
                                     reads[i][::-1] ^ 3, 4))
                    if neg else _to_seq(reads[i]))
            ne, endp = banded_align(E, pat, rseq, L)
            if ne <= E:
                assert derr == ne and dend == endp
            else:
                assert derr > E  # exact value immaterial past the threshold
    # homopolymer reads must route to the exact path
    assert n_fallback > 0


def test_dev_engine_byte_parity(small_world, tmp_path):
    """cn_map_pairs_dev output equals cn_map_pairs on simulated pairs."""
    from chromap_tpu.native import NativeEngine, load_library
    from chromap_tpu.ops.device_seed import DeviceSeeder

    if load_library() is None:
        pytest.skip("native engine unavailable")

    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(11)
    B, L = 200, 80
    # mates: r2 simulated near r1 on the opposite strand
    r1 = np.zeros((B, L), dtype=np.uint8)
    r2 = np.zeros((B, L), dtype=np.uint8)
    for i in range(B):
        g = ref_codes[i % len(ref_codes)]
        st = rng.integers(0, len(g) - 400)
        frag = g[st:st + rng.integers(2 * L, 400)].copy()
        a = frag[:L].copy()
        b = frag[-L:][::-1] ^ 3
        for _ in range(rng.integers(0, 3)):
            a[rng.integers(0, L)] = rng.integers(0, 4)
            b[rng.integers(0, L)] = rng.integers(0, 4)
        if i % 23 == 0:
            a = rng.integers(0, 4, L, dtype=np.uint8)
        if rng.random() < 0.5:
            a, b = (b[::-1] ^ 3) % 4, (a[::-1] ^ 3) % 4
        r1[i], r2[i] = a % 4, b % 4

    class Cfg:
        error_threshold = E
        min_num_seeds_required_for_mapping = MIN_SEEDS
        max_seed_frequencies = F
        max_num_best_mappings = 1
        max_insert_size = 1000
        min_read_length = 30
        drop_repetitive_reads = 500000
        cache_size = 4000003
        trim_adapters = False

    engine = NativeEngine(Cfg(), index, ref_seqs)
    reads1 = [_to_seq(r) for r in r1]
    reads2 = [_to_seq(r) for r in r2]
    out_host, _ = engine.map_pairs(reads1, reads2, 0, 0)

    seeder = DeviceSeeder(index, ref_seqs, E, MIN_SEEDS, F, use_pallas=False)
    codes = np.empty((2 * B, L), dtype=np.uint8)
    codes[0::2] = r1
    codes[1::2] = r2
    meta, cand_pos, cand_meta, overflow = seeder.seed_and_verify(
        codes, np.full(2 * B, L, dtype=np.int64))
    assert not overflow

    import ctypes
    r1b = b"".join(reads1)
    r2b = b"".join(reads2)
    off = np.arange(B + 1, dtype=np.int64) * L
    offp = off.ctypes.data_as(ctypes.c_void_p)
    # a second engine so the mt19937 stream starts fresh for the dev run
    engine2 = NativeEngine(Cfg(), index, ref_seqs)
    out_dev, _ = engine2.map_pairs_dev_seeded(r1b, offp, r2b, offp, B, 0,
                                              meta, cand_pos, cand_meta)
    assert set(out_host) == set(out_dev)
    for key in out_host:
        np.testing.assert_array_equal(out_host[key], out_dev[key], err_msg=key)


def test_mt_engine_byte_parity(small_world):
    """cn_map_pairs output is byte-identical at any thread count: phase 1
    (seed+verify) and selection-emit fan out over threads while the
    reservoir draws stay one ordered mt19937 stream (select_draw). The
    small_world genome embeds 3x repeats and max_num_best_mappings=3
    admits multi-mappings, so reservoir sampling genuinely draws here --
    a thread-count-dependent stream would fail this byte compare."""
    from chromap_tpu.native import NativeEngine, load_library

    if load_library() is None:
        pytest.skip("native engine unavailable")

    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(21)
    B, L = 300, 80
    reads1, reads2 = [], []
    for i in range(B):
        g = ref_codes[i % len(ref_codes)]
        st = rng.integers(0, len(g) - 400)
        frag = g[st:st + rng.integers(2 * L, 400)].copy()
        a, b = frag[:L].copy(), (frag[-L:][::-1] ^ 3) % 4
        for _ in range(rng.integers(0, 3)):
            a[rng.integers(0, L)] = rng.integers(0, 4)
        reads1.append(_to_seq(a % 4))
        reads2.append(_to_seq(b))
    # reads straight from the repeat region: tied best pairs
    rep = ref_codes[0][12000:12200]
    for st in range(0, 100, 5):
        reads1.append(_to_seq(rep[st:st + L]))
        mate = rep[st + 40:st + 40 + L]
        reads2.append(_to_seq((mate[::-1] ^ 3) % 4))

    class Cfg:
        error_threshold = E
        min_num_seeds_required_for_mapping = MIN_SEEDS
        max_seed_frequencies = F
        max_num_best_mappings = 3
        max_insert_size = 1000
        min_read_length = 30
        drop_repetitive_reads = 500000
        cache_size = 4000003
        trim_adapters = False
        num_threads = 1

    outs = []
    for t in (1, 2, 5):
        cfg = Cfg()
        cfg.num_threads = t
        engine = NativeEngine(cfg, index, ref_seqs)
        out, _ = engine.map_pairs(reads1, reads2, 0,
                                  len(reads1))  # cache updates on
        outs.append(out)
    assert len(outs[0]["read_id"]) > 0
    for out in outs[1:]:
        for key in outs[0]:
            np.testing.assert_array_equal(outs[0][key], out[key],
                                          err_msg=key)


def test_parallel_index_build_exact():
    """Chunked multi-threaded minimizer collection equals single-thread
    (warmup re-derives the window state; the (hash,hit) sort makes
    emission order irrelevant). Genome larger than one 16M chunk."""
    from chromap_tpu.native import load_library, native_build_index_arrays

    if load_library() is None:
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(9)
    core = rng.integers(0, 4, 17_000_000, dtype=np.uint8)
    core[rng.integers(0, len(core), 5000)] = 4  # N runs crossing chunks
    rep = core[100_000:100_400]
    g = np.concatenate([core, rep, rep])
    a1 = native_build_index_arrays([g], 17, 7, 1)
    a3 = native_build_index_arrays([g], 17, 7, 3)
    for x, y in zip(a1, a3):
        np.testing.assert_array_equal(x, y)


def test_phase1_split_byte_parity(small_world):
    """cn_phase1_run + cn_phase1_finish (the hybrid scheduler's split) is
    byte-identical to the single-call cn_map_pairs, including cache
    updates and the mt19937 stream across chunk boundaries."""
    from chromap_tpu.native import NativeEngine, load_library

    if load_library() is None:
        pytest.skip("native engine unavailable")

    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(31)
    B, L = 300, 80
    reads1, reads2 = [], []
    for i in range(B):
        g = ref_codes[i % len(ref_codes)]
        st = rng.integers(0, len(g) - 400)
        frag = g[st:st + rng.integers(2 * L, 400)].copy()
        a, b = frag[:L].copy(), (frag[-L:][::-1] ^ 3) % 4
        for _ in range(rng.integers(0, 3)):
            a[rng.integers(0, L)] = rng.integers(0, 4)
        reads1.append(_to_seq(a % 4))
        reads2.append(_to_seq(b))

    class Cfg:
        error_threshold = E
        min_num_seeds_required_for_mapping = MIN_SEEDS
        max_seed_frequencies = F
        max_num_best_mappings = 1
        max_insert_size = 1000
        min_read_length = 30
        drop_repetitive_reads = 500000
        cache_size = 4000003
        trim_adapters = False

    import ctypes
    eng1 = NativeEngine(Cfg(), index, ref_seqs)
    out_ref, _ = eng1.map_pairs(reads1, reads2, 0, B)  # cache updates on

    # split path: two chunks, phase1 for both, then finishes in order
    eng2 = NativeEngine(Cfg(), index, ref_seqs)
    half = B // 2
    outs = []
    for lo, hi in ((0, half), (half, B)):
        r1b = b"".join(reads1[lo:hi])
        r2b = b"".join(reads2[lo:hi])
        off = np.arange(hi - lo + 1, dtype=np.int64) * L
        offp = off.ctypes.data_as(ctypes.c_void_p)
        h = eng2.phase1_run(r1b, offp, r2b, offp, hi - lo, hi - lo)
        outs.append((h, hi - lo, lo, r1b, r2b, off))
    merged = {}
    for h, n, base, r1b, r2b, off in outs:
        out, _ = eng2.phase1_finish(h, n, base)
        for key, arr in out.items():
            merged.setdefault(key, []).append(arr)
    for key in out_ref:
        got = np.concatenate(merged[key])
        np.testing.assert_array_equal(out_ref[key], got, err_msg=key)


def test_se_dev_engine_byte_parity(small_world):
    """cn_map_single_dev output equals cn_map_single on simulated reads
    (single-end device coverage)."""
    from chromap_tpu.native import NativeEngine, load_library
    from chromap_tpu.ops.device_seed import DeviceSeeder

    if load_library() is None:
        pytest.skip("native engine unavailable")

    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(17)
    B, L = 200, 80
    reads = _simulate_reads(ref_codes, rng, B, L)
    read_seqs = [_to_seq(r) for r in reads]

    class Cfg:
        error_threshold = E
        min_num_seeds_required_for_mapping = MIN_SEEDS
        max_seed_frequencies = F
        max_num_best_mappings = 3
        max_insert_size = 1000
        min_read_length = 30
        drop_repetitive_reads = 500000
        cache_size = 4000003
        trim_adapters = False

    import ctypes
    r_bytes = b"".join(read_seqs)
    off = np.arange(B + 1, dtype=np.int64) * L
    offp = off.ctypes.data_as(ctypes.c_void_p)
    eng1 = NativeEngine(Cfg(), index, ref_seqs)
    out_host, _ = eng1.map_single_raw(r_bytes, offp, B, 0, 0)

    seeder = DeviceSeeder(index, ref_seqs, E, MIN_SEEDS, F, use_pallas=False)
    meta, cand_pos, cand_meta, overflow = seeder.seed_and_verify(
        reads, np.full(B, L, dtype=np.int64))
    assert not overflow
    eng2 = NativeEngine(Cfg(), index, ref_seqs)
    out_dev, _ = eng2.map_single_dev_seeded(r_bytes, offp, B, 0, meta,
                                            cand_pos, cand_meta)
    for key in out_host:
        np.testing.assert_array_equal(out_host[key], out_dev[key],
                                      err_msg=key)


def test_dense_pallas_failure_falls_back(small_world, monkeypatch):
    """If the fused Pallas minimizer front end fails to lower (Mosaic
    backend quirks), the seeder must retry the same chunk through the
    bit-identical jnp dense stages instead of losing the device path."""
    from chromap_tpu.ops import pallas_dense
    from chromap_tpu.ops import device_seed as ds

    def boom(*a, **kw):
        raise RuntimeError("injected Mosaic lowering failure")

    monkeypatch.setattr(pallas_dense, "dense_minimizer_device", boom)
    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(5)
    B, L = 1024, 80      # use_dense needs B % 1024 == 0 (and 2k > 32)
    reads = _simulate_reads(ref_codes, rng, B, L)
    lengths = np.full(B, L, dtype=np.int64)

    seeder = ds.DeviceSeeder(index, ref_seqs, E, MIN_SEEDS, F,
                             use_pallas=False)
    seeder.dense_pallas = True
    seeder._step = ds._jitted_step(seeder.k, seeder.w, seeder.e, seeder.f0,
                                   seeder.f1, seeder.min_num_seeds,
                                   seeder.num_refs, False, split=False,
                                   dense_pallas=True, probe=seeder._probe)
    out = seeder.seed_and_verify(reads, lengths)
    assert seeder.dense_pallas is False, "fallback did not disarm the kernel"

    base_seeder = ds.DeviceSeeder(index, ref_seqs, E, MIN_SEEDS, F,
                                  use_pallas=False)
    base = base_seeder.seed_and_verify(reads, lengths)
    assert out[3] == base[3]
    for a, b in zip(out[:3], base[:3]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_gather_read_rows_matches_unpack():
    """_gather_read_rows (per-candidate packed-word texts, the Pallas-path
    verify input) must equal row-gathering the dense unpacked plane."""
    from chromap_tpu.ops import device_seed as ds
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    B, L = 64, 100
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    codes[rng.random((B, L)) < 0.03] = 4          # N positions
    rw = jnp.asarray(ds._pack_reads(codes))
    W = (L + 15) // 16
    packed, nmask = rw[:, :W], rw[:, W:]
    dense = ds._unpack_codes(packed, nmask, B, L)
    rows = jnp.asarray(rng.integers(0, B, 200).astype(np.int32))
    got = np.asarray(ds._gather_read_rows(packed, nmask, rows, L))
    want = np.asarray(dense)[np.asarray(rows)].astype(np.int32)
    assert np.array_equal(got, want)


def test_probe_merge_sort_matches_searchsorted():
    """The packed single-sort probe (_probe_merge_sort) must reproduce
    searchsorted-left (low 31 bits) and the key-present bit (bit 31)
    exactly, including exact hits, misses, duplicate queries, and UMAX64
    invalid lanes (whose loc must land at num_keys)."""
    from chromap_tpu.ops import device_seed as ds
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    k = 17
    nk, M = 7919, 2048
    keys = np.sort(rng.choice(1 << (2 * k), size=nk,
                              replace=False).astype(np.uint64))
    q = rng.integers(0, 1 << (2 * k), size=M, dtype=np.uint64)
    q[: M // 2] = rng.choice(keys, size=M // 2)   # exact hits incl. dups
    q[-19:] = np.uint64(0xFFFFFFFFFFFFFFFF)       # invalid lanes
    ib = max(1, (M - 1).bit_length())
    assert 2 * k + 1 + ib <= 64
    lf = np.asarray(ds._probe_merge_sort(jnp.asarray(keys),
                                         jnp.asarray(q), M, ib))
    loc = lf & 0x7FFFFFFF
    found = lf < 0
    want = np.searchsorted(keys, q, side="left")
    want_found = (want < nk) & (keys[np.minimum(want, nk - 1)] == q)
    assert np.array_equal(loc[:-19], want[:-19])
    assert np.array_equal(found[:-19], want_found[:-19])
    assert (loc[-19:] == nk).all()


def test_device_seed_32k_rows(small_world):
    """Regression for the 16384-pair (32768-row) device chunk: the hit-sort
    key carries 15 row bits, so B = 2^15 must seed correctly (round-3's
    14-bit assert made every 16k-pair dispatch fall back to the host, and
    ONCHIP_r03 recorded an rc=-6 teardown abort in that configuration)."""
    from chromap_tpu.ops.device_seed import FLAG_FALLBACK, DeviceSeeder

    index, ref_codes, ref_seqs = small_world
    rng = np.random.default_rng(5)
    B, L = 1 << 15, 48
    reads = _simulate_reads(ref_codes, rng, B, L)
    lengths = np.full(B, L, dtype=np.int64)

    seeder = DeviceSeeder(index, ref_seqs, E, MIN_SEEDS, F,
                          use_pallas=False)
    meta, cand_pos, cand_meta, overflow = seeder.seed_and_verify(
        reads, lengths)
    assert not overflow

    # oracle-check a spread of reads across the whole row range (rows
    # above 2^14 exercise the widened row bits in the sort key and the
    # expansion metadata)
    gen = CandidateGenerator(index, E, MIN_SEEDS, F)
    starts = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(((meta >> 32) & 0xFF) + ((meta >> 40) & 0xFF),
              out=starts[1:])
    for i in list(range(0, B, 4093)) + [B - 2, B - 1]:
        m = int(meta[i])
        flags = (m >> 24) & 0xFF
        npos, nneg = (m >> 32) & 0xFF, (m >> 40) & 0xFF
        st = ReadSeedState()
        st.minimizers = generate_minimizers(reads[i], 0, K, W)
        gen.generate(st)
        if flags & FLAG_FALLBACK:
            assert npos == 0 and nneg == 0
            continue
        assert npos == len(st.positive_candidates)
        assert nneg == len(st.negative_candidates)
        oracle = ([c.position for c in st.positive_candidates]
                  + [c.position for c in st.negative_candidates])
        got = [int(cand_pos[starts[i] + j]) for j in range(npos + nneg)]
        assert got == oracle
