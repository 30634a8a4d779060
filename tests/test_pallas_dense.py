"""Parity of the fused Pallas minimizer front end (ops/pallas_dense)
against the jnp stages it replaces (ops/device_seed._kmer_stage /
_emission_stage), in Pallas interpret mode (runs on the CPU backend; the
real-chip execution is covered by the on-TPU device parity check)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chromap_tpu.ops import device_seed as ds
from chromap_tpu.ops.pallas_dense import dense_minimizer_device, LANE_TILE


def _random_codes(rng, B, L, n_rate=0.01):
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    nmask = rng.random((B, L)) < n_rate
    codes[nmask] = 4
    return codes


@pytest.mark.parametrize("k,w", [(17, 7), (19, 5), (23, 11)])
def test_dense_kernel_matches_jnp_stages(k, w):
    rng = np.random.default_rng(11 + k)
    B, L = LANE_TILE, 100
    codes = _random_codes(rng, B, L)
    # a few reads with long N runs and leading/trailing Ns
    codes[0, :k + 2] = 4
    codes[1, L - (k + 1):] = 4
    codes[2, 10:90] = 4
    lengths = np.full((B,), L, np.int32)

    h, strand, symmetric, run = ds._kmer_stage(jnp.asarray(codes), k)
    emit, tie = ds._emission_stage(h, run, jnp.asarray(lengths), k, w)
    mm_ref = np.asarray(emit.sum(axis=1))
    bad_ref = np.asarray((tie | symmetric).any(axis=1))

    codes_T = jnp.asarray(codes.T.astype(np.int32))
    len_row = jnp.asarray(lengths.reshape(1, B))
    hlo, hhi, emit_k, mm_k, bad_k = dense_minimizer_device(
        codes_T, len_row, k, w, L, interpret=True)

    np.testing.assert_array_equal(np.asarray(emit_k).T != 0,
                                  np.asarray(emit))
    np.testing.assert_array_equal(np.asarray(mm_k)[0], mm_ref)
    np.testing.assert_array_equal(np.asarray(bad_k)[0] != 0, bad_ref)

    # hash planes: compare at every finite position (invalid rows are -1)
    h_np = np.asarray(h)
    finite = h_np != np.uint64(0xFFFFFFFFFFFFFFFF)
    lo = np.asarray(hlo).T.astype(np.uint32)
    hi = np.asarray(hhi).T.astype(np.uint32)
    got = (lo.astype(np.uint64)
           | ((hi & np.uint32(0x7FFFFFFF)).astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(got[finite], h_np[finite])
    np.testing.assert_array_equal((hi >> 31)[finite],
                                  np.asarray(strand).astype(np.uint32)[finite])
    # invalid positions carry the all-ones marker
    assert (lo[~finite] == 0xFFFFFFFF).all()
    assert (hi[~finite] == 0xFFFFFFFF).all()


def test_dense_kernel_short_reads():
    """Reads shorter than the chunk width (padded with N, lengths < L)."""
    k, w = 17, 7
    rng = np.random.default_rng(3)
    B, L = LANE_TILE, 100
    codes = _random_codes(rng, B, L, n_rate=0.0)
    lengths = np.full((B,), L, np.int32)
    short = rng.integers(0, B, 50)
    for r in short:
        ln = int(rng.integers(k + w, L))
        codes[r, ln:] = 4
        lengths[r] = ln

    h, strand, symmetric, run = ds._kmer_stage(jnp.asarray(codes), k)
    emit, _ = ds._emission_stage(h, run, jnp.asarray(lengths), k, w)

    codes_T = jnp.asarray(codes.T.astype(np.int32))
    len_row = jnp.asarray(lengths.reshape(1, B))
    _, _, emit_k, mm_k, _ = dense_minimizer_device(
        codes_T, len_row, k, w, L, interpret=True)
    np.testing.assert_array_equal(np.asarray(emit_k).T != 0,
                                  np.asarray(emit))
