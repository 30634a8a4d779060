#!/usr/bin/env python
"""Quick FULL-program timing of the device seeding step on the real chip.

Usage: python tools/device_full_time.py [B] [reps] [stage1,stage2,...]

Times the end-to-end jitted seeding program (and optionally named
truncation checkpoints) on one real bench chunk. Unlike
device_stage_profile.py this compiles only the requested variants, so an
optimize-measure loop turns around in ~1 compile instead of 14.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    stages = (sys.argv[3].split(",") if len(sys.argv) > 3 else []) + [None]

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
    print(f"B={B} L={L} offcnt={seeder.offcnt.dtype} "
          f"occ={seeder.occurrences.dtype} dense={seeder.dense_pallas} "
          f"probe={seeder._probe}")
    for stop in stages:
        fn = jax.jit(
            ds._build_step(seeder.k, seeder.w, seeder.e, seeder.f0,
                           seeder.f1, seeder.min_num_seeds,
                           seeder.num_refs, False, stop=stop,
                           dense_pallas=seeder.dense_pallas,
                           probe=seeder._probe),
            static_argnames=("L", "B", "Mtot", "Htot", "captot"))
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, **kw))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        name = stop or "FULL"
        print(f"{name:12s} {best * 1e3:8.2f} ms   (first call "
              f"{compile_s:.1f} s)")


if __name__ == "__main__":
    main()
