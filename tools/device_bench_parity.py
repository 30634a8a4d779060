#!/usr/bin/env python
"""On-chip validation: map the bench set host-only and device-hybrid and
byte-compare the outputs, then print both throughputs. Run on the real
TPU (no JAX_PLATFORMS override) after device-path changes; the CPU-mesh
tests cover the same logic, this checks real-chip numerics + transport.

Usage: python tools/device_bench_parity.py [num_pairs] [runs] [batch_size]
(batch_size = device_batch_size in pairs; default 8192 -- larger chunks
amortize the relay's fixed dispatch/transfer floors over more work)
"""

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod


def map_once(cache, num_pairs, use_device, out_name, batch_size=None):
    from chromap_tpu.config import MappingConfig
    from chromap_tpu.pipeline import MappingPipeline

    cfg = MappingConfig(
        reference_file_path=f"{cache}/ref.fa",
        index_file_path=f"{cache}/index",
        read_file1_paths=[f"{cache}/r1.fq"],
        read_file2_paths=[f"{cache}/r2.fq"],
        mapping_output_file_path=f"{cache}/{out_name}",
        max_insert_size=2000,
        use_device=use_device,
        engine="auto",
        num_threads=os.cpu_count() or 1,
    )
    if batch_size:
        cfg.device_batch_size = batch_size
    with contextlib.redirect_stderr(io.StringIO()):
        pipeline = MappingPipeline(cfg)
        t0 = time.time()
        pipeline.map_paired_end()
        return time.time() - t0


def main():
    num_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else benchmod.NUM_PAIRS
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else None
    # one cache dir per dataset size (ensure_data writes r1/r2 in place)
    cache = (benchmod.CACHE if num_pairs == benchmod.NUM_PAIRS
             else benchmod.CACHE_LARGE
             if num_pairs == benchmod.NUM_PAIRS_LARGE
             else f"/tmp/chromap_tpu_bench{num_pairs}")
    benchmod.ensure_data(cache, num_pairs)

    th = min(map_once(cache, num_pairs, False, "host.bed")
             for _ in range(runs))
    td = min(map_once(cache, num_pairs, True, "dev.bed", batch)
             for _ in range(runs))
    with open(f"{cache}/host.bed", "rb") as f1, \
            open(f"{cache}/dev.bed", "rb") as f2:
        same = f1.read() == f2.read()
    print(f"host: {2 * num_pairs / th:,.0f} reads/s  "
          f"device: {2 * num_pairs / td:,.0f} reads/s  "
          f"parity: {'OK' if same else 'MISMATCH'}")
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main()
