"""Multi-chip / multi-host scaling.

Read mapping has one natural scaling axis -- the read/candidate batch --
and per SURVEY.md §5 the TPU-native plan is:

  * device mesh ("data",): verification work (Myers tiles) sharded over
    chips with jax.sharding; the reference index and genome are replicated
    (a human-genome index is a few GB and fits HBM/host RAM);
  * statistics merged with collectives (jnp reductions under the sharded
    computation lower to psum over ICI);
  * host level: each host maps a shard of the read files and spills
    per-rid sorted shards; the low-memory k-way merge
    (io/lowmem.py merge_and_output_low_memory) unifies shards from any
    number of hosts into one deduplicated output -- the same merge the
    reference uses for its temp files generalizes unchanged.

`sharded_myers` is the in-mesh verification step (runs on any mesh,
including the CPU-device test mesh); `shard_reads`/`merge_shards` are the
host-level building blocks driven by the CLI's --num-shards/--shard-index.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def sharded_myers(mesh: Mesh, patterns_T: np.ndarray, texts_T: np.ndarray,
                  e: int, read_length: int
                  ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Run the Myers verification sharded over the mesh's data axis.

    patterns_T: (L+2e, N) int32; texts_T: (L, N) with N divisible by the
    mesh size. Returns (errors, end_positions, num_accepted) where
    num_accepted is globally reduced across devices.
    """
    from ..ops.pallas_myers import myers_jnp

    batch_sharding = NamedSharding(mesh, P(None, "data"))
    pt = jax.device_put(jnp.asarray(patterns_T), batch_sharding)
    tt = jax.device_put(jnp.asarray(texts_T), batch_sharding)

    @jax.jit
    def step(pt, tt):
        errors, ends = myers_jnp(pt, tt, e, read_length)
        accepted = (errors <= e).sum()
        return errors, ends, accepted

    with mesh:
        errors, ends, accepted = step(pt, tt)
        jax.block_until_ready(errors)
    return np.asarray(errors), np.asarray(ends), int(accepted)


def shard_read_indices(read_index: int, num_shards: int) -> int:
    """Shard assignment: interleaved by read index so shards stay balanced
    regardless of file composition."""
    return read_index % num_shards


def merge_shards(cfg, shard_paths: List[str], writer, whitelist=None,
                 summary=None):
    """Merge sorted spill shards from any number of hosts into one output.

    This is exactly the low-memory k-way merge; shards produced by
    different hosts (or the same host across batches) are
    indistinguishable to it.
    """
    from ..io.lowmem import merge_and_output_low_memory

    return merge_and_output_low_memory(cfg, shard_paths, writer,
                                       whitelist=whitelist, summary=summary)
