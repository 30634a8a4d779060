#!/usr/bin/env python
"""Weak-scaling curve of the device seeding program on a virtual mesh.

Runs the sharded seeding step at 1/2/4/8 devices with a FIXED per-device
shard (weak scaling: total work grows with the mesh). On the virtual CPU
mesh every "device" executes serially on the same host, so wall time
should grow linearly with the mesh and the honest scalar is the
PER-READ time t_n / (n * S).

Efficiency model (round 4; the round-3 "ideal t_n = n*t_1" model
produced efficiencies up to 114% because n separate t_1 dispatches pay
n fixed overheads while the sharded program pays one): efficiency_n =
min_m(per_read_time_m) / per_read_time_n -- normalized per-read
throughput relative to the best observed mesh size. This is <= 1 by
construction; a drop below 1 at larger n measures the real growth of
sharding/collective overhead (the program's only cross-shard
communication is one scalar psum). Writes one JSON line per mesh size
and a summary file when --out is given.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/weak_scaling.py [--out SCALING.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Self-set the virtual-mesh platform: this image's sitecustomize
# pre-imports jax with JAX_PLATFORMS=axon pinned, so env vars set here (or
# even JAX_PLATFORMS in the caller's shell) are too late/ignored; only
# jax.config.update before backend init wins. Without this the tool
# silently captures a 1-device TPU artifact instead of the 1/2/4/8 curve.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402  (sitecustomize imported it already anyway)

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--per-device-reads", type=int, default=2048)
    args = ap.parse_args()

    import jax
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from chromap_tpu.index.index import build_index
    from chromap_tpu.ops import device_seed as ds

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 400_000, dtype=np.uint8)
    index = build_index([genome], 17, 7)
    B2C = {0: b"A", 1: b"C", 2: b"G", 3: b"T"}
    ref_seqs = [b"".join(B2C[int(c)] for c in genome)]
    seeder = ds.DeviceSeeder(index, ref_seqs, error_threshold=8,
                             min_num_seeds=2, max_seed_frequencies=(500,
                                                                    1000))

    L = 100
    S = args.per_device_reads  # per-device shard (weak scaling)
    max_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= max_dev]

    def make_reads(B):
        reads = np.zeros((B, L), dtype=np.uint8)
        for i in range(B):
            st = rng.integers(0, len(genome) - L - 8)
            r = genome[st:st + L].copy()
            for _ in range(rng.integers(0, 3)):
                r[rng.integers(0, L)] = rng.integers(0, 4)
            reads[i] = r
        return reads

    results = []
    for n in sizes:
        B = S * n
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("data",))
        Mtot, Htot = ds.MZ_PER_READ * S, ds.HITS_PER_READ * S
        captot = ds.CANDS_PER_READ * S
        step = ds._build_step(seeder.k, seeder.w, seeder.e, seeder.f0,
                              seeder.f1, seeder.min_num_seeds,
                              seeder.num_refs, False, probe=seeder._probe)

        def shard_step(rw, lens, hk, oc, occ, rw_, rn_, rl_, ro_, pt):
            dl, full = step(rw, lens, hk, oc, occ, rw_, rn_, rl_, ro_, pt,
                            L=L, B=S, Mtot=Mtot, Htot=Htot, captot=captot)
            total = jax.lax.psum(dl[0].astype(np.int32), "data")
            return dl, total

        rep = P()
        fn = jax.jit(shard_map(
            shard_step, mesh=mesh,
            in_specs=(P("data", None), P("data"),
                      rep, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(P("data"), P()), check_vma=False))
        rw = ds._pack_reads(make_reads(B))
        repl = NamedSharding(mesh, P())
        a = (jax.device_put(np.ascontiguousarray(rw),
                            NamedSharding(mesh, P("data", None))),
             jax.device_put(np.full(B, L, np.int32),
                            NamedSharding(mesh, P("data"))),
             jax.device_put(seeder.hash_keys, repl),
             jax.device_put(seeder.offcnt, repl),
             jax.device_put(seeder.occurrences, repl),
             jax.device_put(seeder.ref_words, repl),
             jax.device_put(seeder.ref_nwords, repl),
             jax.device_put(seeder.ref_lens, repl),
             jax.device_put(seeder.ref_offsets, repl),
             jax.device_put(seeder.probe_table, repl))
        with mesh:
            jax.block_until_ready(fn(*a))  # compile + warm
            best = None
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(fn(*a))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        row = {"devices": n, "reads": B, "wall_s": round(best, 4),
               "per_read_us": round(1e6 * best / B, 3)}
        results.append(row)

    # efficiency <= 1 by construction: normalized per-read throughput
    # relative to the best observed mesh size
    best_pr = min(r["per_read_us"] for r in results)
    for row in results:
        row["weak_scaling_efficiency"] = round(
            best_pr / row["per_read_us"], 4)
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"metric": "device seeding weak scaling "
                                 "(virtual CPU mesh, serialized devices; "
                                 "efficiency = best per-read time / "
                                 "per-read time, <= 1 by construction)",
                       "per_device_reads": S,
                       "results": results}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
