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
from ..align.spec import FRONT, BACK


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
    errs = res.errors[b, jnp.maximum(idx, 0)]
    return idx, best_m, qstart, qstop, errs


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
        idx, best_m, qstart, qstop, _ = choose_best_jnp(res)
        onehot = (idx[:, None] == jnp.arange(A + 1)[None, :] - 1)
        hist = jnp.sum(onehot, axis=0, dtype=jnp.int32)  # slot 0 = unknown
        hist = jax.lax.psum(hist, "data")
        return idx, best_m, qstart, qstop, hist

    return step(masks, lens, ktab, npre, jnp.asarray(read_masks),
                jnp.asarray(read_lens))


# ---------------------------------------------------------------------------
# Dual-round demux step: the full 02-stage decision per read, sharded
# ---------------------------------------------------------------------------

def sharded_dual_demux_step(mesh: Mesh, sp5, sp27rc, read_masks,
                            read_lens):
    """Both cutadapt rounds (SP5 FRONT + SP27-rc BACK, --rc each round,
    on-device trim between rounds) for a read batch sharded over 'data';
    the multi-chip form of demux.fused. Uses the XLA locate core so the
    same program compiles on a virtual CPU mesh and on TPU slices.

    Returns per-read vectors (idx1, rc1, qe1, idx2, rc2, qs2, err1,
    err2), each [B] sharded over 'data', plus psum-merged histograms
    hist1 [A5+1] and hist2 [A27+1] (slot 0 = unknown).
    """
    from ..demux.fused import _revcomp_rows, _shift_left

    A5 = sp5.masks.shape[0]
    A27 = sp27rc.masks.shape[0]
    b5 = tuple(jnp.asarray(x) for x in
               (sp5.masks, sp5.lens, sp5.k_table, sp5.n_prefix))
    b27 = tuple(jnp.asarray(x) for x in
                (sp27rc.masks, sp27rc.lens, sp27rc.k_table,
                 sp27rc.n_prefix))

    def best_both(res, B):
        idx, m, qs, qe, e = choose_best_jnp(res)
        return ((idx[:B], m[:B], qs[:B], qe[:B], e[:B]),
                (idx[B:], m[B:], qs[B:], qe[B:], e[B:]))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data"),
                   P("data"), P("data"), P("data"), P("data"), P(), P()),
        check_vma=False)
    def step(bank5, bank27, rm, rl):
        B = rm.shape[0]
        m32 = rm.astype(jnp.int32)
        rl = rl.astype(jnp.int32)
        rc = _revcomp_rows(m32, rl)
        both = jnp.concatenate([m32, rc])
        lens2 = jnp.concatenate([rl, rl])
        res = batched_locate(*bank5, both, lens2, int(FRONT))
        (fi, fm, _, fqe, fe), (ri, rm_, _, rqe, re) = best_both(res, B)
        use_rc1 = (rm_ >= 0) & ((fm < 0) | (rm_ > fm))
        idx1 = jnp.where(use_rc1, ri, fi)
        qe1 = jnp.where(idx1 >= 0, jnp.where(use_rc1, rqe, fqe), 0)
        err1 = jnp.where(use_rc1, re, fe)
        oriented = jnp.where(use_rc1[:, None], rc, m32)
        trimmed = _shift_left(oriented, qe1)
        lens_t = rl - qe1
        rc_t = _revcomp_rows(trimmed, lens_t)
        both2 = jnp.concatenate([trimmed, rc_t])
        lens2t = jnp.concatenate([lens_t, lens_t])
        res2 = batched_locate(*bank27, both2, lens2t, int(BACK))
        (fi2, fm2, fqs2, _, fe2), (ri2, rm2, rqs2, _, re2) = \
            best_both(res2, B)
        use_rc2 = (rm2 >= 0) & ((fm2 < 0) | (rm2 > fm2))
        idx2 = jnp.where(use_rc2, ri2, fi2)
        qs2 = jnp.where(idx2 >= 0,
                        jnp.maximum(jnp.where(use_rc2, rqs2, fqs2), 0), 0)
        err2 = jnp.where(use_rc2, re2, fe2)
        h1 = jnp.sum(idx1[:, None] == jnp.arange(A5 + 1)[None, :] - 1,
                     axis=0, dtype=jnp.int32)
        h2 = jnp.sum(idx2[:, None] == jnp.arange(A27 + 1)[None, :] - 1,
                     axis=0, dtype=jnp.int32)
        return (idx1, use_rc1.astype(jnp.int32), qe1, idx2,
                use_rc2.astype(jnp.int32), qs2, err1, err2,
                jax.lax.psum(h1, "data"), jax.lax.psum(h2, "data"))

    return step(b5, b27, jnp.asarray(read_masks), jnp.asarray(read_lens))


# ---------------------------------------------------------------------------
# Per-device Pallas dispatch (the PRODUCTION multi-chip scoring path)
# ---------------------------------------------------------------------------

def device_parallel_pairwise(devices, pat_codes, pat_lens, txt_codes,
                             txt_lens, mode: str = "NW",
                             gate: Optional[np.ndarray] = None
                             ) -> np.ndarray:
    """All patterns vs all texts with pattern rows striped over explicit
    devices; each stripe runs the SAME single-chip production kernel
    (Pallas on accelerators, XLA Myers on CPU — bit-identical,
    parity-tested) committed to its device; stripes are all dispatched
    before any fetch, so devices compute concurrently; results gather on
    host, where the union-find consumer lives anyway (SURVEY.md §7.4.4).

    This replaces the shard_map-over-XLA path for production scoring
    (VERDICT r2 next#1): per-chip throughput equals the single-chip
    Pallas kernel instead of the ~8x slower XLA core.

    gate: optional [P, T] bool — with the Pallas backend only the
    (TI, TJ) tiles containing a True survive into the sparse tile list;
    un-gated entries of the result are unspecified (callers mask).
    Returns [P, T] int32 distances (numpy).
    """
    import jax
    devices = list(devices)
    ndev = len(devices)
    P0 = int(pat_codes.shape[0])
    T0 = int(txt_codes.shape[0])
    use_pallas = jax.default_backend() not in ("cpu",)
    stripe = -(-P0 // ndev)
    lazies = []  # (r0, r1, lazy_dist, Tpad)
    for k, dev in enumerate(devices):
        r0, r1 = k * stripe, min((k + 1) * stripe, P0)
        if r0 >= r1:
            break
        pc = np.ascontiguousarray(pat_codes[r0:r1])
        pl = np.ascontiguousarray(pat_lens[r0:r1])
        if use_pallas:
            from ..align.pallas_myers import (WORD, distances_pallas,
                                              distances_pallas_pairs,
                                              tile_shape)
            if gate is not None:
                W = max(1, -(-int(pc.shape[1]) // WORD))
                TI, TJ = tile_shape(W)
                g = gate[r0:r1]
                Pp = -(-g.shape[0] // TI) * TI
                Tp = -(-T0 // TJ) * TJ
                gf = np.zeros((Pp, Tp), bool)
                gf[:g.shape[0], :T0] = g
                need = gf.reshape(Pp // TI, TI, Tp // TJ, TJ).any(
                    axis=(1, 3))
                pairs = np.argwhere(need).astype(np.int32)
                if len(pairs) == 0:
                    lazies.append((r0, r1, None, None))
                    continue
                d, _ = distances_pallas_pairs(pc, pl, txt_codes, txt_lens,
                                              pairs, mode, TI=TI, TJ=TJ,
                                              device=dev)
            else:
                d, _ = distances_pallas(pc, pl, txt_codes, txt_lens, mode,
                                        fetch_pos=False, device=dev,
                                        lazy=True)
            lazies.append((r0, r1, d, None))
        else:
            import jax.numpy as jnp
            W = myers.n_words(int(pc.shape[1]))
            put = functools.partial(jax.device_put, device=dev)
            peq = myers.build_peq(put(jnp.asarray(pc)), W,
                                  put(jnp.asarray(pl, dtype=np.int32)))
            d, _ = myers.myers_tile(peq, put(jnp.asarray(pl, np.int32)),
                                    put(jnp.asarray(txt_codes)),
                                    put(jnp.asarray(txt_lens, np.int32)),
                                    mode, W)
            lazies.append((r0, r1, d, None))
    out = np.zeros((P0, T0), np.int32)
    for r0, r1, d, _ in lazies:   # fetch AFTER all dispatches
        if d is not None:
            out[r0:r1] = np.asarray(d)[:r1 - r0, :T0]
    return out


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
