"""Multi-chip data parallelism for demux and clustering.

The reference's only parallelism is SLURM array fan-out over barcode files
plus in-node multiprocessing (SURVEY.md §2.4). The TPU-native mapping:

* **reads** are the data-parallel axis: a batch [B, L] is sharded over the
  mesh 'data' axis; the adapter/primer bank is replicated per chip;
* **per-bin demux histograms** merge with ``psum`` over ICI;
* the **all-vs-all pair matrix** is sharded over the 'pair' axis (each
  chip owns a row-stripe of pattern tiles) — the 2-D analogue of model
  parallelism for this workload; cluster edges are gathered to host for
  the union-find (host-sequential by design, SURVEY.md §7.4.4).

Everything compiles under one jit per step with static shapes; tested on
a virtual 8-device CPU mesh (tests/conftest.py) and dry-run by the driver
via __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align import myers
from ..align.batched import batched_locate
from ..align.spec import FRONT


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """2-D mesh ('data', 'pair'). Default: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "pair"))


# ---------------------------------------------------------------------------
# Demux step: sharded reads x replicated bank -> assignments + psum histogram
# ---------------------------------------------------------------------------

def choose_best_jnp(res):
    """cutadapt across-adapter selection in jnp (first max wins ties)."""
    matches = jnp.where(res.valid.astype(bool), res.matches, -1)
    idx = jnp.argmax(matches, axis=1).astype(jnp.int32)
    b = jnp.arange(matches.shape[0])
    best_m = matches[b, idx]
    idx = jnp.where(best_m < 0, -1, idx)
    qstop = res.querystop[b, jnp.maximum(idx, 0)]
    qstart = res.querystart[b, jnp.maximum(idx, 0)]
    return idx, best_m, qstart, qstop


def sharded_demux_step(mesh: Mesh, bank, read_masks, read_lens,
                       flags: int = int(FRONT)):
    """One demux step over the mesh: returns (adapter_idx [B], matches [B],
    qstart [B], qstop [B], bin_histogram [A+1] globally psum-reduced).

    read rows must be divisible by the 'data' axis size.
    """
    A = bank.masks.shape[0]
    masks = jnp.asarray(bank.masks)
    lens = jnp.asarray(bank.lens)
    ktab = jnp.asarray(bank.k_table)
    npre = jnp.asarray(bank.n_prefix)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data"), P()),
        check_vma=False)
    def step(m, l, k, np_, rm, rl):
        res = batched_locate(m, l, k, np_, rm, rl, flags)
        idx, best_m, qstart, qstop = choose_best_jnp(res)
        onehot = (idx[:, None] == jnp.arange(A + 1)[None, :] - 1)
        hist = jnp.sum(onehot, axis=0, dtype=jnp.int32)  # slot 0 = unknown
        hist = jax.lax.psum(hist, "data")
        return idx, best_m, qstart, qstop, hist

    return step(masks, lens, ktab, npre, jnp.asarray(read_masks),
                jnp.asarray(read_lens))


# ---------------------------------------------------------------------------
# Pairwise tile step: pattern stripe per 'pair' rank, texts replicated
# ---------------------------------------------------------------------------

def sharded_pairwise_step(mesh: Mesh, pat_codes, pat_lens, txt_codes,
                          txt_lens):
    """All patterns vs all texts, pattern rows sharded over 'pair' (with
    'data' folded in when it is the only axis): returns [Ptot, T] distance
    matrix, all-gathered so every chip (and the host) sees the full edge
    set for the union-find merge."""
    W = myers.n_words(int(pat_codes.shape[1]))

    shard_axes = ("data", "pair")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(shard_axes), P(shard_axes), P(), P()),
        out_specs=P(), check_vma=False)
    def step(pc, pl, tc, tl):
        peq = myers.build_peq(pc, W, pl)
        d, _ = myers.myers_tile(peq, pl, tc, tl, "NW", W)
        return jax.lax.all_gather(d, shard_axes, axis=0, tiled=True)

    return step(jnp.asarray(pat_codes), jnp.asarray(pat_lens),
                jnp.asarray(txt_codes), jnp.asarray(txt_lens))
