"""Benchmark: dual-index demux throughput (reads/s/chip) vs CPU baseline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline metric matches BASELINE.json: reads/s/chip for dual-index
demux with cutadapt-equivalent semantics (--rc, both rounds scored).
vs_baseline is measured against the in-repo C++ oracle running the exact
same locate semantics on this host's CPUs — the reference pipeline's own
compute engine for this stage is cutadapt's C aligner doing the same DP
(the reference publishes no numbers, BASELINE.md).

Secondary details: all-vs-all Myers clustering throughput (cells/s and
pairwise alignments/s) on device vs the C++ 64-bit Myers.
"""
import json
import os
import time

# enable the persistent compilation cache BEFORE jax is imported anywhere
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def main():
    import jax
    from tpu_orc.demux.adapters import AdapterBank
    from tpu_orc.demux.fused import FusedDemux
    from tpu_orc.align.spec import FRONT, BACK
    from tpu_orc.align import myers
    from tpu_orc.io import encode
    from tpu_orc.io.fastq import Record
    from tpu_orc import native

    REF = "/root/reference/adapters_primers"
    sp5 = AdapterBank.from_fasta(f"{REF}/M13_amplicon_indices_forward.fa",
                                 0.1)
    sp27 = AdapterBank.from_fasta(
        f"{REF}/M13_amplicon_indices_reverse_rc.fa", 0.1)

    rng = np.random.default_rng(0)
    B = 8192  # throughput metric: large batches amortize tunnel latency
    reads = []
    for i in range(B):
        ins = "".join(rng.choice(list("ACGT"), size=260))
        s = sp5.seqs[i % 12] + ins + sp27.seqs[i % 8]
        if i % 2:
            s = encode.revcomp(s)
        reads.append(s)
    recs = [Record(f"r{i}", f"r{i}", s, "I" * len(s))
            for i, s in enumerate(reads)]

    # --- device: fused dual-round demux (one upload; rc, round-1 FRONT,
    # on-device trim, round-2 BACK all in one device program), including
    # host packing and output-read materialization
    fd = FusedDemux(sp5, sp27)
    device_round = lambda: fd.assign(recs, batch_size=B, max_len=512)
    device_round()  # warmup/compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        device_round()
    t_dev = (time.time() - t0) / reps
    tpu_rps = B / t_dev

    # --- CPU baseline: identical semantics via the C++ oracle
    ref_masks5 = [encode.encode_ref_masks(s) for s in sp5.seqs]
    ref_masks27 = [encode.encode_ref_masks(s) for s in sp27.seqs]
    n_cpu = 256
    cpu_reads = reads[:n_cpu // 2]
    cpu_reads = cpu_reads + [encode.revcomp(s) for s in cpu_reads]
    qm = [encode.encode_read_masks(s) for s in cpu_reads]
    t0 = time.time()
    native.locate_batch(ref_masks5, qm, 0.1, int(FRONT), nthreads=1)
    native.locate_batch(ref_masks27, qm, 0.1, int(BACK), nthreads=1)
    t_cpu = time.time() - t0
    cpu_rps = (n_cpu / 2) / t_cpu  # fwd+rc of n_cpu/2 reads, both rounds

    # --- clustering: device Myers all-vs-all tile vs C++ Myers
    # (1024 reads ~ the reference's 1000-read all-vs-all blocks,
    # amplicon_sorter.py:571-623)
    N, L = 1024, 512
    fam = []
    base = "".join(rng.choice(list("ACGT"), size=480))
    for _ in range(N):
        s = list(base)
        for _ in range(30):
            s[int(rng.integers(0, len(s)))] = str(rng.choice(list("ACGT")))
        fam.append(encode.encode_codes("".join(s)))
    pat = np.full((N, L), 4, np.uint8)
    lens = np.zeros(N, np.int32)
    for i, c in enumerate(fam):
        pat[i, :len(c)] = c
        lens[i] = len(c)
    if jax.default_backend() == "cpu":
        tile_fn = lambda: myers.distances(pat, lens, pat, lens)
    else:  # production scorer path: Pallas kernel, auto-tuned tiles
        # (fetch_pos=False: the NW scorer never reads the position
        # matrix — matches cluster/scoring.py)
        from tpu_orc.align.pallas_myers import distances_pallas
        tile_fn = lambda: distances_pallas(pat, lens, pat, lens, "NW",
                                           fetch_pos=False)
    tile_fn()  # compile
    t0 = time.time()
    for _ in range(reps):
        tile_fn()
    t_tile = (time.time() - t0) / reps
    cells = float(N) * N * np.mean(lens) * np.mean(lens)
    tpu_cells = cells / t_tile
    tpu_pairs = N * N / t_tile

    n_cpu_pairs = 0
    t0 = time.time()
    D = native.all_vs_all(fam[:64], band=0.0, nthreads=1)
    t_cpu_aa = time.time() - t0
    n_cpu_pairs = (D >= 0).sum()
    cpu_cells = float(n_cpu_pairs) * np.mean(lens) ** 2 / t_cpu_aa

    # --- clustering end-to-end: full engine on one 1000-read 2-species
    # bin (the reference's SLURM-array unit of work)
    import random
    from tpu_orc.cluster.engine import AmpliconSorter, SorterConfig
    from tpu_orc.io.fastq import Record
    random.seed(2)

    def mutate(s, k):
        s = list(s)
        for _ in range(k):
            op = random.randrange(3)
            p = random.randrange(len(s))
            if op == 0:
                s[p] = random.choice("ACGT")
            elif op == 1 and len(s) > 1:
                del s[p]
            else:
                s.insert(p, random.choice("ACGT"))
        return "".join(s)

    t1 = "".join(random.choice("ACGT") for _ in range(450))
    t2 = mutate(t1, 60)
    recs = []
    for k, tmpl in enumerate((t1, t2)):
        for i in range(500):
            recs.append(Record(f"r{k}_{i}", "", mutate(tmpl, 27), None))
    random.shuffle(recs)
    AmpliconSorter(SorterConfig(min_length=300, seed=7)).sort_records(
        recs)  # warm/compile
    t0 = time.time()
    sres = AmpliconSorter(SorterConfig(min_length=300,
                                       seed=7)).sort_records(recs)
    t_sort = time.time() - t0
    n_species = sum(len(g) for g in sres.species)

    # Baseline framing (VERDICT r1 next#9): cpu_* numbers are ONE core
    # running the in-repo C++ oracle with identical semantics (the
    # reference's compute engines for these stages are cutadapt's C
    # aligner / edlib, SURVEY.md §2.3). The reference's actual budgets
    # are 24 cores for demux (02_cutadapt_loop.sh:2-6) and 12 for
    # amplicon_sorter (03_amplicon_sorter.sh:2-7), so vs_ref_24core /
    # cluster_vs_ref_12core report the linearly core-scaled comparison
    # against those budgets alongside the single-core ratio.
    out = {
        "metric": "demux_reads_per_s_per_chip",
        "value": round(tpu_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(tpu_rps / cpu_rps, 2),
        "details": {
            "backend": jax.default_backend(),
            "cpu_demux_reads_per_s_1core": round(cpu_rps, 1),
            "vs_ref_24core": round(tpu_rps / (cpu_rps * 24), 2),
            "cluster_device_cells_per_s": round(tpu_cells, 0),
            "cluster_device_pairs_per_s": round(tpu_pairs, 1),
            "cluster_cpu_cells_per_s_1core": round(cpu_cells, 0),
            "cluster_vs_cpu": round(tpu_cells / cpu_cells, 2),
            "cluster_vs_ref_12core": round(tpu_cells / (cpu_cells * 12),
                                           2),
            "sort_1000reads_e2e_s": round(t_sort, 2),
            "sort_species_found": n_species,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
