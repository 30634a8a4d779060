"""Deterministic read/genome simulator shared by tests and bench.

The fixed seed makes outputs reproducible; the committed goldens in
tests/golden/sim_* were produced by the reference chromap binary
(0.3.3-r521) on exactly these files.
"""

import numpy as np

COMP = dict(zip(b"ACGTN", b"TGCAN"))


def rc(s: bytes) -> bytes:
    return bytes(COMP[c] for c in reversed(s))


def write_simulated_dataset(out_dir: str, num_pairs: int = 5000,
                            seed: int = 123, read_length: int = 100,
                            genome_core: int = 300_000,
                            max_mismatches: int = 7,
                            indel_rate: float = 0.15) -> None:
    import os
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, genome_core)
    genome = np.concatenate([base,
                             base[genome_core // 3: genome_core // 3
                                  + genome_core * 2 // 15],
                             rng.integers(0, 4, genome_core // 3)])
    garr = np.frombuffer(b"ACGT", dtype=np.uint8)[genome].copy()
    for p in rng.integers(0, len(garr), 30):
        garr[p] = ord("N")
    with open(f"{out_dir}/ref.fa", "wb") as f:
        f.write(b">chr1\n")
        for i in range(0, len(garr), 70):
            f.write(garr[i:i + 70].tobytes() + b"\n")

    L = read_length
    with open(f"{out_dir}/r1.fq", "wb") as r1f, \
            open(f"{out_dir}/r2.fq", "wb") as r2f:
        for i in range(num_pairs):
            frag = int(rng.integers(150, 500))
            p = int(rng.integers(0, len(garr) - frag))
            fseq = garr[p:p + frag].tobytes()
            s1 = bytearray(fseq[:L])
            s2 = bytearray(rc(fseq)[:L])
            for s in (s1, s2):
                for _ in range(rng.integers(0, max_mismatches)):
                    s[rng.integers(0, L)] = b"ACGT"[rng.integers(0, 4)]
                if rng.random() < indel_rate:
                    q = int(rng.integers(10, L - 10))
                    del s[q]
                    s.append(b"ACGT"[rng.integers(0, 4)])
            qual = bytes(33 + rng.integers(20, 40, L).astype(np.uint8))
            r1f.write(b"@sim." + str(i).encode() + b"/1\n" + bytes(s1)
                      + b"\n+\n" + qual + b"\n")
            r2f.write(b"@sim." + str(i).encode() + b"/2\n" + bytes(s2)
                      + b"\n+\n" + qual + b"\n")


def write_simulated_barcodes(out_dir: str, num_pairs: int = 5000,
                             seed: int = 77, barcode_length: int = 16,
                             num_whitelist: int = 300) -> None:
    """Deterministic barcode fastq + whitelist for the simulated dataset:
    ~85%% exact whitelist hits, ~12%% one substitution (incl. N bases),
    ~3%% random (unmatchable)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    whitelist = ["".join(bases[c] for c in rng.integers(0, 4, barcode_length))
                 for _ in range(num_whitelist)]
    with open(f"{out_dir}/whitelist.txt", "w") as f:
        f.write("\n".join(sorted(set(whitelist))) + "\n")
    with open(f"{out_dir}/bc.fq", "w") as f:
        for i in range(num_pairs):
            bc = list(whitelist[rng.integers(0, num_whitelist)])
            r = rng.random()
            if r < 0.12:
                p = int(rng.integers(0, barcode_length))
                bc[p] = "N" if rng.random() < 0.3 else bases[rng.integers(0, 4)]
            elif r < 0.15:
                bc = [bases[c] for c in rng.integers(0, 4, barcode_length)]
            qual = "".join(chr(33 + int(q))
                           for q in rng.integers(20, 40, barcode_length))
            f.write(f"@sim_bc.{i}\n{''.join(bc)}\n+\n{qual}\n")



def write_simulated_multichrom_dataset(out_dir: str, num_pairs: int = 3000,
                                       seed: int = 55,
                                       read_length: int = 100,
                                       chrom_sizes=(120_000, 90_000,
                                                    60_000)) -> None:
    """Multi-chromosome genome + paired reads for --chr-order and pairs
    flipping tests. Chromosomes are named chrA/chrB/chrC in file order;
    chr_order.txt lists them in the custom order chrC, chrA, chrB."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    names = [b"chrA", b"chrB", b"chrC"]
    seqs = []
    with open(f"{out_dir}/ref.fa", "wb") as f:
        for name, size in zip(names, chrom_sizes):
            garr = np.frombuffer(b"ACGT", dtype=np.uint8)[
                rng.integers(0, 4, size)].copy()
            seqs.append(garr)
            f.write(b">" + name + b"\n")
            for i in range(0, len(garr), 70):
                f.write(garr[i:i + 70].tobytes() + b"\n")
    with open(f"{out_dir}/chr_order.txt", "wb") as f:
        f.write(b"chrC\nchrA\nchrB\n")
    with open(f"{out_dir}/chr_order2.txt", "wb") as f:
        f.write(b"chrB\nchrC\nchrA\n")

    L = read_length
    with open(f"{out_dir}/r1.fq", "wb") as r1f, \
            open(f"{out_dir}/r2.fq", "wb") as r2f:
        for i in range(num_pairs):
            ci = int(rng.integers(0, len(seqs)))
            garr = seqs[ci]
            frag = int(rng.integers(150, 500))
            p = int(rng.integers(0, len(garr) - frag))
            fseq = garr[p:p + frag].tobytes()
            s1 = bytearray(fseq[:L])
            s2 = bytearray(rc(fseq)[:L])
            for s in (s1, s2):
                for _ in range(rng.integers(0, 4)):
                    s[rng.integers(0, L)] = b"ACGT"[rng.integers(0, 4)]
            qual = bytes(33 + rng.integers(20, 40, L).astype(np.uint8))
            r1f.write(b"@simc." + str(i).encode() + b"/1\n" + bytes(s1)
                      + b"\n+\n" + qual + b"\n")
            r2f.write(b"@simc." + str(i).encode() + b"/2\n" + bytes(s2)
                      + b"\n+\n" + qual + b"\n")


def write_barcode_translate_table(out_dir: str) -> None:
    """(to,from) translate table covering the simulated whitelist
    (barcode_translator.h:23-138 semantics)."""
    with open(f"{out_dir}/whitelist.txt") as f:
        barcodes = [line.strip() for line in f if line.strip()]
    with open(f"{out_dir}/translate.csv", "w") as f:
        for i, bc in enumerate(barcodes):
            f.write(f"BC{i}-1,{bc}\n")
