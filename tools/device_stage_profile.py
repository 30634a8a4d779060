#!/usr/bin/env python
"""Per-stage timing of the device seeding program on the real chip.

Builds truncated variants of ops/device_seed._build_step (the `stop`
checkpoints), runs each on one real 8192-pair bench chunk, and prints the
cumulative and incremental (per-stage) times. Incremental numbers are
in-context costs: stage i's delta includes whatever fusion/layout changes
its presence causes, which is what matters for optimizing the full
program.

Usage: python tools/device_stage_profile.py [B] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod

STAGES = ["unpack", "kmer", "emission", "mzcompact", "probe", "agg",
          "repstats", "expand", "sort", "scatter", "cluster",
          "candcompact", "gatherref", None]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    benchmod.ensure_data(benchmod.CACHE, benchmod.NUM_PAIRS)
    cache = benchmod.CACHE

    import jax
    import jax.numpy as jnp
    from chromap_tpu.index.index import MinimizerIndex
    from chromap_tpu.io.fastx import FastxReader
    from chromap_tpu.ops import device_seed as ds

    index = MinimizerIndex.load(f"{cache}/index")
    ref_seqs = []
    for rec in FastxReader(f"{cache}/ref.fa"):
        ref_seqs.append(bytes(rec.seq))

    reads = []
    for path in (f"{cache}/r1.fq", f"{cache}/r2.fq"):
        r = FastxReader(path)
        while len(reads) < B:
            rec = r.read_one()
            if rec is None:
                break
            reads.append(rec.codes())
        r.close()
        if len(reads) >= B:
            break
    L = len(reads[0])
    codes = np.full((B, L), 4, np.uint8)
    for i, c in enumerate(reads[:B]):
        codes[i, :len(c)] = c

    seeder = ds.DeviceSeeder(index, ref_seqs, error_threshold=8,
                             min_num_seeds=2, max_seed_frequencies=(500, 1000))
    rw = jnp.asarray(ds._pack_reads(codes))
    lend = jnp.full((B,), L, dtype=jnp.int32)
    Mtot, Htot, captot = ds.MZ_PER_READ * B, ds.HITS_PER_READ * B, \
        ds.CANDS_PER_READ * B
    args = (rw, lend, seeder.hash_keys, seeder.offcnt, seeder.occurrences,
            seeder.ref_words, seeder.ref_nwords, seeder.ref_lens,
            seeder.ref_offsets, seeder.probe_table)
    kw = dict(L=L, B=B, Mtot=Mtot, Htot=Htot, captot=captot)

    prev = 0.0
    print(f"B={B} L={L} Mtot={Mtot} Htot={Htot} captot={captot} "
          f"index={len(index.hash_keys)} keys "
          f"{len(index.occurrences)} occs")
    for stop in STAGES:
        fn = jax.jit(
            ds._build_step(seeder.k, seeder.w, seeder.e, seeder.f0,
                           seeder.f1, seeder.min_num_seeds,
                           seeder.num_refs, False, stop=stop,
                           dense_pallas=seeder.dense_pallas,
                           probe=seeder._probe),
            static_argnames=("L", "B", "Mtot", "Htot", "captot"))
        # time-to-host-scalar: the relay's ready signal can fire before
        # the program finishes (the round-3 bench bug), so the timed
        # region fetches the tiny checkpoint scalar -- completion proof.
        # The fixed d2h cost is constant across stages and cancels in
        # the deltas.
        out = fn(*args, **kw)
        np.asarray(out[0])
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args, **kw)[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        name = stop or "FULL"
        print(f"{name:12s} cum {best * 1e3:8.2f} ms   "
              f"delta {(best - prev) * 1e3:8.2f} ms")
        prev = best


if __name__ == "__main__":
    main()
