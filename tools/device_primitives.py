#!/usr/bin/env python
"""Microbenchmark of the TPU primitives the device seeding program is
built from, at the program's actual sizes (B=16384 reads, Mtot=425984,
Htot=491520). Uses the chain-delta method (see bench.py): each op chained
k times with a data dependency, timed at two ks, cost = delta / (k2-k1).
This removes dispatch floors and any async-ready-signal error, so the
numbers are true in-context incremental costs -- directly comparable to
the stage deltas from tools/device_stage_profile.py.

Usage: python tools/device_primitives.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import chromap_tpu.ops.device_seed  # enable x64 like production
import jax
import jax.numpy as jnp
from jax import lax


def chain_time(make_op, init, k1=2, k2=8, reps=3):
    """Cost of one op: chain it k times with a data dependency, measure
    at two chain lengths, return delta/(k2-k1). make_op(x) must return an
    array the next iteration can consume (same shape/dtype as init)."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x0, k):
        def body(i, x):
            return make_op(x)
        return lax.fori_loop(0, k, body, x0)

    def timed(k):
        np.asarray(jax.block_until_ready(chain(init, k)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(chain(init, k)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t1, t2 = timed(k1), timed(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    rng = np.random.default_rng(0)
    B = 16384
    Mtot = 26 * B
    Htot = 30 * B
    NK = 500_082            # index keys (bench genome)

    rows = []

    def rep(name, dt, n=None):
        per = f"  {dt / n * 1e9:7.2f} ns/elem" if n else ""
        print(f"{name:44s} {dt * 1e3:9.3f} ms{per}")
        rows.append((name, dt))

    # --- gathers -------------------------------------------------------
    tbl32 = jnp.asarray(rng.integers(0, 1 << 30, NK, dtype=np.uint32))
    tbl64 = jnp.asarray(rng.integers(0, 1 << 60, NK, dtype=np.uint64))
    idx0 = jnp.asarray(rng.integers(0, NK, Mtot, dtype=np.int32))

    def g32(ix):
        v = tbl32[ix]
        return (ix + (v & 1).astype(jnp.int32)) % NK
    rep(f"u32 gather x{Mtot} from {NK}", chain_time(g32, idx0), Mtot)

    def g64(ix):
        v = tbl64[ix]
        return (ix + (v & 1).astype(jnp.int32)) % NK
    rep(f"u64 gather x{Mtot} from {NK}", chain_time(g64, idx0), Mtot)

    idxh = jnp.asarray(rng.integers(0, NK, Htot, dtype=np.int32))

    def g64h(ix):
        v = tbl64[ix]
        return (ix + (v & 1).astype(jnp.int32)) % NK
    rep(f"u64 gather x{Htot} from {NK}", chain_time(g64h, idxh), Htot)

    # --- scatter -------------------------------------------------------
    dest_n = (128 + 1) * B

    def scat(ix):
        out = jnp.zeros((dest_n,), jnp.uint32).at[ix].set(
            ix.astype(jnp.uint32), mode="drop")
        return (ix + (out[0] & 1).astype(jnp.int64)) % dest_n
    idxs = jnp.asarray(rng.integers(0, dest_n, Htot, dtype=np.int64))
    rep(f"u32 scatter x{Htot} into {dest_n}", chain_time(scat, idxs), Htot)

    # --- sorts ---------------------------------------------------------
    v64 = jnp.asarray(rng.integers(0, 1 << 62, Mtot + NK, dtype=np.uint64))

    def s64(x):
        s = lax.sort(x)
        return s ^ (s >> np.uint64(1))
    rep(f"u64 flat sort x{Mtot + NK}", chain_time(s64, v64))

    vh = jnp.asarray(rng.integers(0, 1 << 62, Htot, dtype=np.uint64))
    rep(f"u64 flat sort x{Htot}", chain_time(s64, vh))

    t2d = jnp.asarray(
        rng.integers(0, 1 << 62, (129, B), dtype=np.uint64))

    def s2d(x):
        s = lax.sort(x, dimension=0)
        return s ^ (s >> np.uint64(1))
    rep(f"u64 axis-0 sort (129, {B})", chain_time(s2d, t2d))

    t2d32 = jnp.asarray(
        rng.integers(0, 1 << 30, (2, 129, B), dtype=np.uint32))

    def s2d32(x):
        a, b = lax.sort((x[0], x[1]), dimension=1, num_keys=2)
        return jnp.stack([a ^ (a >> np.uint32(1)), b])
    rep(f"u32x2 axis-0 sort (129, {B})", chain_time(s2d32, t2d32))

    # --- scans ---------------------------------------------------------
    st0 = jnp.asarray(rng.integers(0, 1 << 30, (129, B), dtype=np.uint32))

    def scan_op(x):
        def stp(c, row):
            nc = c + row
            return nc, nc & np.uint32(0xFFFF)
        _, out = lax.scan(stp, jnp.zeros((B,), jnp.uint32), x)
        return out
    rep(f"lax.scan 129 steps x ({B},) 1-op", chain_time(scan_op, st0))

    def scan_op20(x):
        def stp(c, row):
            a = c
            for _ in range(10):
                a = (a ^ row) + (a >> np.uint32(3))
                a = a | (row & np.uint32(7))
            return a, a
        _, out = lax.scan(stp, jnp.zeros((B,), jnp.uint32), x)
        return out
    rep(f"lax.scan 129 steps x ({B},) 20-op", chain_time(scan_op20, st0))

    # --- elementwise op overhead ----------------------------------------
    x1 = jnp.asarray(rng.integers(0, 1 << 30, (B,), dtype=np.uint32))

    def elem100(x):
        a = x
        for _ in range(50):
            a = (a ^ np.uint32(0x9E3779B9)) + (a >> np.uint32(5))
        return a
    rep(f"100 elementwise u32 ops on ({B},)", chain_time(elem100, x1))

    xb = jnp.asarray(rng.integers(0, 1 << 30, (B, 128), dtype=np.uint32))

    def elemB(x):
        a = x
        for _ in range(50):
            a = (a ^ np.uint32(0x9E3779B9)) + (a >> np.uint32(5))
        return a
    rep(f"100 elementwise u32 ops on ({B},128)", chain_time(elemB, xb))

    # --- cumsum --------------------------------------------------------
    from chromap_tpu.ops.device_seed import _cumsum1d

    xc = jnp.asarray(rng.integers(0, 4, (Htot,), dtype=np.int32))

    def cs(x):
        c = _cumsum1d(x)
        return (x + (c & 1)) & np.int32(3)
    rep(f"tiled cumsum x{Htot}", chain_time(cs, xc))

    xc2 = jnp.asarray(rng.integers(0, 4, (B, 26), dtype=np.int32))

    def cs2(x):
        c = jnp.cumsum(x, axis=1)
        return (x + (c & 1)) & np.int32(3)
    rep(f"row cumsum ({B}, 26)", chain_time(cs2, xc2))


if __name__ == "__main__":
    main()
