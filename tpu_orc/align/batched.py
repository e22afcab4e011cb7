"""Batched JAX implementation of cutadapt-equivalent locate().

Semantics: bit-identical to ``tpu_orc.align.oracle.locate`` (see spec.py),
vectorized over [B reads x A adapters] on device. This is the demux compute
path; reference behavior being replaced: cutadapt's semi-global aligner as
driven by /root/reference/scripts/02_cutadapt_loop.sh:64-102.

TPU-first design notes
----------------------
* The column DP is a ``lax.fori_loop`` over read positions; state is
  [B, A, M+1] int32 — static shapes, no data-dependent control flow.
* The intra-column (vertical) dependency ``cur[i] = min(cand[i],
  cur[i-1]+1)`` (strict preference for ``cand`` on ties) is resolved with a
  Kogge-Stone (min,+) prefix scan on the index-adjusted cost ``v[i] =
  cand[i] - i`` with tie-to-**larger** index, which is provably equivalent
  to the sequential rule (a vertical step is taken only when strictly
  cheaper).
* cutadapt's error threshold ``errors <= e * effective_length`` is IEEE
  double math in the original; we precompute integer tables
  ``k_table[a, eff] = floor_f64(e * eff)`` on host so the device compares
  integers only — exact double semantics without enabling x64.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .spec import Flag, DEFAULT_MIN_OVERLAP

BIG = 1 << 28


class LocateResult(NamedTuple):
    """Best location per (read, adapter); fields [B, A] int32.

    valid==0 rows have unspecified other fields. refstart/refstop/
    querystart/querystop follow spec.py conventions.
    """
    valid: jnp.ndarray
    matches: jnp.ndarray
    errors: jnp.ndarray
    refstart: jnp.ndarray
    refstop: jnp.ndarray
    querystart: jnp.ndarray
    querystop: jnp.ndarray


def make_k_table(max_error_rate: float, ref_masks: np.ndarray,
                 ref_lens: np.ndarray) -> np.ndarray:
    """Host-side exact-double error-budget tables.

    Returns [A, M+1] int32 where entry [a, eff] = floor(e * eff) computed in
    float64 (cutadapt's C-double semantics), independent of adapter — kept
    per-adapter for future per-adapter error rates.
    """
    A, M = ref_masks.shape
    eff = np.arange(M + 1, dtype=np.float64)
    row = np.floor(max_error_rate * eff).astype(np.int32)
    return np.broadcast_to(row, (A, M + 1)).copy()


def make_n_prefix(ref_masks: np.ndarray) -> np.ndarray:
    """[A, M+1] int32 prefix counts of N wildcards per adapter row."""
    is_n = (ref_masks & 0b1111) == 0b1111
    out = np.zeros((ref_masks.shape[0], ref_masks.shape[1] + 1), dtype=np.int32)
    np.cumsum(is_n, axis=1, out=out[:, 1:])
    return out


def _prefix_min_scan(v, matches, origin):
    """Inclusive prefix-min over the row axis (last), tie -> larger index.

    v/matches/origin: [..., R]. Returns scanned (v, matches, origin).
    """
    R = v.shape[-1]
    d = 1
    while d < R:
        # shift down the row axis by d (elements from i-d), pad with BIG
        pad = [(0, 0)] * (v.ndim - 1) + [(d, 0)]
        sv = jnp.pad(v, pad, constant_values=1 << 28)[..., :R]
        sm = jnp.pad(matches, pad)[..., :R]
        so = jnp.pad(origin, pad)[..., :R]
        take = sv < v  # strictly cheaper only: tie keeps the later (current)
        v = jnp.where(take, sv, v)
        matches = jnp.where(take, sm, matches)
        origin = jnp.where(take, so, origin)
        d *= 2
    return v, matches, origin


@functools.partial(jax.jit, static_argnames=("flags", "min_overlap"))
def batched_locate(ref_masks, ref_lens, k_table, n_prefix,
                   read_masks, read_lens,
                   flags: int, min_overlap: int = DEFAULT_MIN_OVERLAP
                   ) -> LocateResult:
    """Locate every adapter in every read.

    ref_masks [A, M] uint8, ref_lens [A] int32, k_table/n_prefix [A, M+1]
    int32, read_masks [B, L] uint8, read_lens [B] int32. ``flags`` static
    (int of spec.Flag combination).
    """
    start_in_ref = bool(flags & Flag.START_WITHIN_SEQ1)
    start_in_qry = bool(flags & Flag.START_WITHIN_SEQ2)
    stop_in_ref = bool(flags & Flag.STOP_WITHIN_SEQ1)
    stop_in_qry = bool(flags & Flag.STOP_WITHIN_SEQ2)

    A, M = ref_masks.shape
    B, L = read_masks.shape
    R = M + 1  # DP rows

    ref_masks = ref_masks.astype(jnp.int32)
    read_masks = read_masks.astype(jnp.int32)
    ref_lens = ref_lens.astype(jnp.int32)
    read_lens = read_lens.astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)  # [1,1,R]

    # --- initial column (j = 0) -------------------------------------------
    if start_in_ref:
        cost0 = jnp.zeros((B, A, R), jnp.int32)
        origin0 = -jnp.broadcast_to(rows, (B, A, R))
    else:
        cost0 = jnp.broadcast_to(rows, (B, A, R)).astype(jnp.int32)
        origin0 = jnp.zeros((B, A, R), jnp.int32)
    matches0 = jnp.zeros((B, A, R), jnp.int32)

    # per-adapter candidate row (= adapter length), [1, A]
    m_row = ref_lens[None, :]
    lens_b = read_lens[:, None]  # [B, 1]

    # gather helpers ------------------------------------------------------
    def at_row_m(x):  # x: [B, A, R] -> [B, A] at row ref_lens[a]
        return jnp.take_along_axis(
            x, jnp.broadcast_to(m_row[:, :, None], (B, A, 1)), axis=2
        )[..., 0]

    n_pref_at_m = jnp.take_along_axis(
        n_prefix, ref_lens[:, None], axis=1)[:, 0][None, :]  # [1, A]

    def eval_row_m(cost, matches, origin, j):
        """Candidate at row m_a, column j. Returns packed candidate fields."""
        c = at_row_m(cost)
        mt = at_row_m(matches)
        og = at_row_m(origin)
        refstart = jnp.maximum(-og, 0)
        length = m_row - refstart
        # effective length: subtract Ns in ref[refstart:m]
        n_start = _gather_per_ba(n_prefix, refstart)  # [B, A]
        eff = length - (n_pref_at_m - n_start)
        kmax = _gather_per_ba(k_table, eff)
        ok = (length >= min_overlap) & (c <= kmax) & (j <= lens_b)
        if not stop_in_qry:
            ok = ok & (j == lens_b)
        return ok, mt, c, og, refstart

    def _gather_per_ba(table, idx):
        # table [A, M+1], idx [B, A] -> [B, A]
        return jnp.take_along_axis(
            jnp.broadcast_to(table[None], (B, A, R)), idx[:, :, None], axis=2
        )[..., 0]

    # --- running best -----------------------------------------------------
    neg1 = jnp.full((B, A), -1, jnp.int32)
    best = dict(
        valid=jnp.zeros((B, A), jnp.bool_),
        matches=neg1, errors=jnp.full((B, A), BIG, jnp.int32),
        origin=jnp.zeros((B, A), jnp.int32), refstop=jnp.zeros((B, A), jnp.int32),
        qstop=jnp.zeros((B, A), jnp.int32),
    )

    def update_best(best, ok, mt, c, og, refstop, qstop):
        better = ok & ((mt > best["matches"]) |
                       ((mt == best["matches"]) & (c < best["errors"])))
        sel = lambda new, old: jnp.where(better, new, old)
        return dict(
            valid=best["valid"] | better,
            matches=sel(mt, best["matches"]), errors=sel(c, best["errors"]),
            origin=sel(og, best["origin"]), refstop=sel(refstop, best["refstop"]),
            qstop=sel(qstop, best["qstop"]),
        )

    ok, mt, c, og, refstart = eval_row_m(cost0, matches0, origin0, jnp.int32(0))
    best = update_best(best, ok, mt, c, og,
                       jnp.broadcast_to(m_row, (B, A)),
                       jnp.zeros((B, A), jnp.int32))

    # For the final-column (STOP_WITHIN_SEQ1) scan we need the column state
    # at j == read_len per read: evaluate all-row candidates each column,
    # masked by j == len, folding with the *final-column ordering* (rows
    # ascending). Collected separately, merged after the loop (oracle scans
    # them after all row-m candidates).
    fin = dict(
        valid=jnp.zeros((B, A), jnp.bool_), matches=neg1,
        errors=jnp.full((B, A), BIG, jnp.int32),
        origin=jnp.zeros((B, A), jnp.int32),
        refstop=jnp.zeros((B, A), jnp.int32),
    )

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, A, R), 2)

    def eval_final_col(fin, cost, matches, origin, j):
        # all rows i: refstart = max(-origin,0); length = i - refstart
        refstart = jnp.maximum(-origin, 0)
        length = row_ids - refstart
        n_start = jnp.take_along_axis(
            jnp.broadcast_to(n_prefix[None], (B, A, R)), refstart, axis=2)
        n_here = jnp.take_along_axis(
            jnp.broadcast_to(n_prefix[None], (B, A, R)),
            jnp.minimum(row_ids, M), axis=2)
        eff = length - (n_here - n_start)
        kmax = jnp.take_along_axis(
            jnp.broadcast_to(k_table[None], (B, A, R)),
            jnp.clip(eff, 0, M), axis=2)
        ok = ((length >= min_overlap) & (cost <= kmax)
              & (row_ids <= ref_lens[None, :, None])
              & (j == lens_b[:, :, None]))
        # lexicographic best over rows: (-matches, errors, row) ascending
        key = jnp.where(
            ok,
            ((M - matches) << 16) + (jnp.minimum(cost, (1 << 8) - 1) << 8)
            + row_ids,
            BIG)
        kbest = jnp.min(key, axis=2)
        ibest = jnp.argmin(key, axis=2).astype(jnp.int32)
        okb = kbest < BIG
        g = lambda x: jnp.take_along_axis(x, ibest[:, :, None], axis=2)[..., 0]
        mt, c, og = g(matches), g(cost), g(origin)
        better = okb & ((mt > fin["matches"]) |
                        ((mt == fin["matches"]) & (c < fin["errors"])))
        sel = lambda new, old: jnp.where(better, new, old)
        return dict(
            valid=fin["valid"] | better, matches=sel(mt, fin["matches"]),
            errors=sel(c, fin["errors"]), origin=sel(og, fin["origin"]),
            refstop=sel(ibest, fin["refstop"]),
        )

    if stop_in_ref:
        fin = eval_final_col(fin, cost0, matches0, origin0, jnp.int32(0))

    def body(j, carry):
        cost, matches, origin, best, fin = carry
        qc = jax.lax.dynamic_slice_in_dim(read_masks, j - 1, 1, axis=1)  # [B,1]
        eq = (ref_masks[None] & qc[:, :, None]) != 0  # [B, A, M]

        # row 0 of new column
        if start_in_qry:
            r0c, r0m, r0o = jnp.zeros((B, A), jnp.int32), jnp.zeros((B, A), jnp.int32), jnp.full((B, A), j, jnp.int32)
        else:
            r0c, r0m, r0o = jnp.full((B, A), j, jnp.int32), jnp.zeros((B, A), jnp.int32), jnp.zeros((B, A), jnp.int32)

        diag_c, diag_m, diag_o = cost[..., :M], matches[..., :M], origin[..., :M]
        horiz_c, horiz_m, horiz_o = cost[..., 1:], matches[..., 1:], origin[..., 1:]

        # diagonal candidate
        dc = jnp.where(eq, diag_c, diag_c + 1)
        dm = jnp.where(eq, diag_m + 1, diag_m)
        do = diag_o
        # horizontal candidate (consume query char): cost+1
        hc = horiz_c + 1
        # priority diag <= horiz on tie
        use_h = hc < dc
        cand_c = jnp.where(use_h, hc, dc)
        cand_m = jnp.where(use_h, horiz_m, dm)
        cand_o = jnp.where(use_h, horiz_o, do)

        # assemble rows 0..M then resolve vertical chains via prefix scan
        full_c = jnp.concatenate([r0c[:, :, None], cand_c], axis=2)
        full_m = jnp.concatenate([r0m[:, :, None], cand_m], axis=2)
        full_o = jnp.concatenate([r0o[:, :, None], cand_o], axis=2)
        v = full_c - row_ids
        v, sm, so = _prefix_min_scan(v, full_m, full_o)
        ncost = v + row_ids
        nmatches, norigin = sm, so

        ok, mt, c, og, _ = eval_row_m(ncost, nmatches, norigin, j)
        best = update_best(best, ok, mt, c, og,
                           jnp.broadcast_to(m_row, (B, A)),
                           jnp.full((B, A), j, jnp.int32))
        if stop_in_ref:
            fin = eval_final_col(fin, ncost, nmatches, norigin, j)
        return ncost, nmatches, norigin, best, fin

    cost, matches, origin, best, fin = jax.lax.fori_loop(
        1, L + 1, body, (cost0, matches0, origin0, best, fin))

    if stop_in_ref:
        # final-column candidates come after all row-m candidates
        better = fin["valid"] & ((fin["matches"] > best["matches"]) |
                                 ((fin["matches"] == best["matches"]) &
                                  (fin["errors"] < best["errors"])))
        sel = lambda new, old: jnp.where(better, new, old)
        best = dict(
            valid=best["valid"] | better,
            matches=sel(fin["matches"], best["matches"]),
            errors=sel(fin["errors"], best["errors"]),
            origin=sel(fin["origin"], best["origin"]),
            refstop=sel(fin["refstop"], best["refstop"]),
            qstop=sel(jnp.broadcast_to(lens_b, (B, A)), best["qstop"]),
        )

    og = best["origin"]
    return LocateResult(
        valid=best["valid"].astype(jnp.int32),
        matches=best["matches"], errors=best["errors"],
        refstart=jnp.maximum(-og, 0), refstop=best["refstop"],
        querystart=jnp.maximum(og, 0), querystop=best["qstop"],
    )
