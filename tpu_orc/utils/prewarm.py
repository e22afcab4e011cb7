"""Kernel prewarm: compile the hot device programs ahead of first use.

The axon IFRT executables carry no fingerprint, so JAX's persistent
compilation cache cannot capture Pallas kernels — every process pays a
one-time server-side Mosaic compile per kernel shape (seconds to
minutes). Production deployments call ``python -m tpu_orc.cli prewarm``
(or :func:`prewarm`) once at startup so the first real batch runs at
full speed. Shapes compiled here are exactly the jit keys the pipeline
uses: the fused dual-round demux program at the standard read-length
buckets, the reorient INFIX locate, and the all-vs-all Myers tiles at
the standard length buckets (short 512 / long 4096 / streamed 8192).
"""
from __future__ import annotations

import time
from typing import Iterable, Optional

import numpy as np


def prewarm(adapters_dir: str = "/root/reference/adapters_primers",
            demux_lens: Iterable[int] = (384, 512, 640),
            demux_batch: int = 2048,
            myers_lens: Iterable[int] = (512, 4096, 8192),
            verbose: bool = True) -> dict:
    """Compile the production kernels; returns {kernel: seconds}."""
    import jax

    from ..demux.adapters import AdapterBank
    from ..io import encode

    timings = {}

    def _t(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 1)
        if verbose:
            print(f"[prewarm] {name}: {timings[name]}s", flush=True)

    on_cpu = jax.default_backend() == "cpu"
    sp5 = AdapterBank.from_fasta(
        f"{adapters_dir}/M13_amplicon_indices_forward.fa", 0.1)
    sp27 = AdapterBank.from_fasta(
        f"{adapters_dir}/M13_amplicon_indices_reverse_rc.fa", 0.1)
    rng = np.random.default_rng(0)

    # fused dual-round demux at each read-length bucket
    from ..demux.fused import FusedDemux
    fd = FusedDemux(sp5, sp27)
    for L in demux_lens:
        masks = np.zeros((demux_batch, L), np.uint8)
        seqs = ["".join(rng.choice(list("ACGT"), size=min(L - 8, 300)))
                for _ in range(8)]
        m8, l8 = encode.pack_batch(seqs, max_len=L, pad_multiple=1,
                                   encoder=encode.encode_read_masks,
                                   pad_value=0)
        masks[:8] = m8
        lens = np.ones(demux_batch, np.int32)
        lens[:8] = l8
        _t(f"fused_demux_L{L}_B{demux_batch}",
           lambda: fd.decide(masks, lens))

    # all-vs-all Myers tiles (the gene-stage sparse-pair kernel warms
    # through the scorer path; the dense ladder kernel via distances)
    if not on_cpu:
        from ..align.pallas_myers import distances_pallas
        for L in myers_lens:
            n = 32
            pat = np.full((n, L), 4, np.uint8)
            pl_ = np.full(n, max(8, L // 2), np.int32)
            pat[:, :L // 2] = rng.integers(0, 4, (n, L // 2))
            _t(f"myers_NW_L{L}",
               lambda: distances_pallas(pat, pl_, pat, pl_, "NW",
                                        fetch_pos=False))
    return timings
