"""Pallas TPU kernel: cutadapt-equivalent locate over [reads x adapters].

The XLA implementation (align/batched.py) spends ~60 full-tensor passes
per DP column through HLO ops with an awkward [B, A, R] layout (R=60 is
not lane-aligned). This kernel pins the layout for the VPU:

* state lives in VMEM as [Ap, Rp, TB] int32 — adapters (padded to Ap) on
  the leading axis, DP rows on sublanes (Rp=64), a 128-read tile on
  lanes;
* the intra-column Kogge-Stone (min,+) scan runs along the sublane axis
  via pltpu.roll with an index guard;
* row-m candidate fields use one-hot masked reductions (no gathers);
  error-budget thresholds (including the min-overlap rule) are baked
  into host-precomputed tables: for FRONT a single one-hot lookup keyed
  on the candidate's refstart (``kbyrs``), for BACK a per-adapter
  constant (``kconst``); a table value of -1 encodes "never accept";
* the STOP_WITHIN_SEQ1 (BACK) final-column candidates are captured via a
  j==len snapshot and reduced once after the column loop against the
  per-(adapter, row) table ``kfin``.

Supported modes: FRONT and BACK (the demux hot paths) and INFIX
(START+STOP_WITHIN_SEQ2 — the pychopper reorientation primer scan;
BACK's recurrence without the final-column candidate set). Other flag
combinations fall back to align/batched.py. Semantics are bit-identical
to the oracle; enforced by tests/test_pallas_locate.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spec import Flag, FRONT, BACK, DEFAULT_MIN_OVERLAP

INFIX = Flag.START_WITHIN_SEQ2 | Flag.STOP_WITHIN_SEQ2

BIG = 1 << 28
RP = 64      # padded DP rows (adapter length <= 63)
TB = 128     # reads per tile


#: payload packing: pay = (matches << PAYB) | (origin + RP). matches
#: <= RP-1 fits 6 bits above PAYB; origin in [-RP+1, L] needs
#: L < 2**PAYB - RP. Packing matches+origin into ONE plane halves the
#: Kogge-Stone payload traffic (2 rolls+selects per step instead of 3)
#: and the DP/snapshot state (2 planes instead of 3).
PAYB = 20
PAYMASK = (1 << PAYB) - 1


def _kernel(mode: str, Ap: int, L: int,
            ref_ref, kbyrs_ref, kfin_ref, onem_ref, mrow_ref,
            kconst_ref, reads_ref, lens_ref,
            out_m, out_c, out_o, out_q, out_v, out_r, out_nl, out_na,
            cost, pay, sc, spay, pok):
    mode_front = mode == "front"
    snapshot = mode == "back"
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (Ap, RP, TB), 1)
    lens = lens_ref[0, :][None, :]                  # [1, TB]
    mrow = mrow_ref[:, 0][:, None]                  # [Ap, 1]
    onem = onem_ref[...][:, :, None] != 0           # [Ap, RP, 1]
    refm = ref_ref[...][:, :, None]                 # row i = adapter char i-1

    if mode_front:  # free ref-prefix skip: cost 0, origin -i
        cost[...] = jnp.zeros((Ap, RP, TB), jnp.int32)
        pay[...] = RP - rows3                        # m=0, o=-i
    else:           # pay deletions: cost i
        cost[...] = rows3
        pay[...] = jnp.full((Ap, RP, TB), RP, jnp.int32)  # m=0, o=0
    if snapshot:  # j==len column snapshot state (BACK only)
        sc[...] = cost[...]
        spay[...] = pay[...]

    def row_m_eval(j, cst, py):
        cm = jnp.sum(jnp.where(onem, cst, 0), axis=1)   # [Ap, TB]
        pm = jnp.sum(jnp.where(onem, py, 0), axis=1)
        mm = pm >> PAYB
        om = (pm & PAYMASK) - RP
        if mode_front:
            # kbyrs[a, refstart] bakes floor(e*eff) and min-overlap (-1
            # encodes reject); single one-hot lookup keyed on refstart.
            refstart = jnp.maximum(-om, 0)
            oh_rs = rows3 == refstart[:, None, :]
            kmax = jnp.sum(jnp.where(oh_rs, kbyrs_ref[...][:, :, None], 0),
                           axis=1)
        else:
            kmax = jnp.broadcast_to(kconst_ref[:, 0][:, None], cm.shape)
        ok = (cm <= kmax) & (j <= lens)
        return ok, mm, cm, om

    out_v[...] = jnp.zeros((Ap, TB), jnp.int32)
    out_m[...] = jnp.full((Ap, TB), -1, jnp.int32)
    out_c[...] = jnp.full((Ap, TB), BIG, jnp.int32)
    out_o[...] = jnp.zeros((Ap, TB), jnp.int32)
    out_q[...] = jnp.zeros((Ap, TB), jnp.int32)
    out_r[...] = jnp.broadcast_to(mrow, (Ap, TB))

    def update_best(ok, mm, cm, om, qstop):
        better = ok & ((mm > out_m[...]) |
                       ((mm == out_m[...]) & (cm < out_c[...])))
        out_v[...] = jnp.where(better, 1, out_v[...])
        out_m[...] = jnp.where(better, mm, out_m[...])
        out_c[...] = jnp.where(better, cm, out_c[...])
        out_o[...] = jnp.where(better, om, out_o[...])
        out_q[...] = jnp.where(better, qstop, out_q[...])

    ok0, mm0, cm0, om0 = row_m_eval(jnp.int32(0), cost[...], pay[...])
    update_best(ok0, mm0, cm0, om0, jnp.zeros((Ap, TB), jnp.int32))
    # acceptable-column run counting (LocateResult.nloc/nacc): rising
    # edges + total count of the per-column acceptance series the scan
    # already evaluates — free multiplicity evidence that lets the
    # reorient fast path skip its masked verification re-scan.
    ok0i = ok0.astype(jnp.int32)
    pok[...] = ok0i
    out_nl[...] = ok0i
    out_na[...] = ok0i

    # the scan key packs v = cost - row (bounded: cost <= row + 1 and
    # cost - row >= -RP) above an inverted-row tie-break field, so a
    # single strict < reproduces the sequential DP's "largest tied row
    # wins" resolution exactly (a vertical chain never displaces an
    # equal-cost local candidate).
    inv_rows = (RP - 1) - rows3

    def col(j, _):
        qc = reads_ref[j - 1, :][None, None, :]      # [1, 1, TB]
        eq = (refm & qc) != 0
        pc, pp = cost[...], pay[...]
        diag_c = pltpu.roll(pc, 1, 1)
        diag_p = pltpu.roll(pp, 1, 1)
        dc = jnp.where(eq, diag_c, diag_c + 1)
        dp_ = jnp.where(eq, diag_p + (1 << PAYB), diag_p)
        hc = pc + 1
        use_h = hc < dc
        cand_c = jnp.where(use_h, hc, dc)
        cand_p = jnp.where(use_h, pp, dp_)
        # row 0: both FRONT and BACK have START_WITHIN_SEQ2 -> (0, 0, j)
        is0 = rows3 == 0
        cand_c = jnp.where(is0, 0, cand_c)
        cand_p = jnp.where(is0, j + RP, cand_p)      # m=0, o=j
        # Kogge-Stone (min,+) along rows, tie -> larger index
        key = ((cand_c - rows3 + RP) << 6) | inv_rows
        p_ = cand_p
        d = 1
        while d < RP:
            skk = pltpu.roll(key, d, 1)
            spp = pltpu.roll(p_, d, 1)
            take = (rows3 >= d) & (skk < key)
            key = jnp.where(take, skk, key)
            p_ = jnp.where(take, spp, p_)
            d *= 2
        ncost = (key >> 6) - RP + rows3
        cost[...] = ncost
        pay[...] = p_

        ok, mm, cm, om = row_m_eval(j, ncost, p_)
        update_best(ok, mm, cm, om,
                    jnp.broadcast_to(j, (Ap, TB)).astype(jnp.int32))
        oki = ok.astype(jnp.int32)
        out_nl[...] = out_nl[...] + oki * (1 - pok[...])
        out_na[...] = out_na[...] + oki
        pok[...] = oki
        if snapshot:
            at_end = j == lens[:, None, :]           # [1, 1, TB]
            sc[...] = jnp.where(at_end, ncost, sc[...])
            spay[...] = jnp.where(at_end, p_, spay[...])
        return 0

    jax.lax.fori_loop(1, L + 1, col, 0)

    if snapshot:
        # final-column candidates from the snapshot; thresholds kfin are
        # per-(adapter,row) constants (refstart == 0 for BACK) with the
        # min-overlap and row<=m rules baked in as -1
        sm = spay[...] >> PAYB
        okf = sc[...] <= kfin_ref[...][:, :, None]
        key = jnp.where(okf,
                        ((RP - sm) << 16)
                        + (jnp.minimum(sc[...], 255) << 8) + rows3,
                        BIG)
        kbest = jnp.min(key, axis=1)                 # [Ap, TB]
        okb = kbest < BIG
        fm = RP - (kbest >> 16)
        fc = (kbest >> 8) & 255
        frow = kbest & 255
        oh = (key == kbest[:, None, :]) & okf
        so = (spay[...] & PAYMASK) - RP
        fo = jnp.sum(jnp.where((rows3 == frow[:, None, :]) & oh, so,
                               0), axis=1)
        better = okb & ((fm > out_m[...]) |
                        ((fm == out_m[...]) & (fc < out_c[...])))
        out_v[...] = jnp.where(better, 1, out_v[...])
        out_m[...] = jnp.where(better, fm, out_m[...])
        out_c[...] = jnp.where(better, fc, out_c[...])
        out_o[...] = jnp.where(better, fo, out_o[...])
        out_q[...] = jnp.where(better, jnp.broadcast_to(lens, (Ap, TB)),
                               out_q[...])
        out_r[...] = jnp.where(better, frow, out_r[...])


def _kernel_wf(mode: str, Ap: int, As: int, L: int,
               ref_ref, kbyrs_ref, kfin_ref, onem_ref, mrow_ref,
               kconst_ref, erev_ref, lens_ref,
               out_m, out_c, out_o, out_q, out_v, out_r, out_nl, out_na,
               ca, pa, cb, pb, sc, spay, pok):
    """Anti-diagonal wavefront variant of ``_kernel`` — identical
    semantics, ~2x fewer vector ops per cell.

    On anti-diagonal d the cell (row i, column j = d - i) depends on
    (i-1, j-1) [diagonal, step d-2], (i, j-1) [left, d-1] and
    (i-1, j) [up, d-1] — the vertical dependency lands in the PREVIOUS
    step, so the per-column Kogge-Stone (min,+) scan (6 roll+select
    stages, ~60% of the column kernel's op count) disappears and the
    kernel IS the sequential DP evaluation order (no tie-break
    emulation needed). Steps run d = 1 .. L+RP-1 (each adapter's row-m
    cell for column j sits on diagonal j + m). ``erev_ref`` is the
    read matrix REVERSED along L and padded with RP zero rows on both
    sides, so the per-step window win[i] = read[d-1-i] is one
    contiguous ascending slice at offset L - d + RP.

    Two DP planes (cost, pay) per parity: step d overwrites the d-2
    plane; the loop body unrolls two steps so plane roles are static.

    ``As`` is the STATE adapter count: the adapter axis of the 3-D
    planes has no sublane-tiling constraint (minor dims are RP x TB),
    so it runs at the TRUE bank size while the constant tables stay at
    the 8-sublane minimum and are sliced — a 4-primer reorient bank
    halves its per-column vector work vs the Ap=8 padding.
    """
    mode_front = mode == "front"
    snapshot = mode == "back"
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (As, RP, TB), 1)
    lens = lens_ref[0, :][None, :]                  # [1, TB]
    # table slices to the state adapter count via lax.slice (a basic
    # [:As] getitem lowers to an unsupported gather under Mosaic)
    def tslice(ref2d, rows):
        return jax.lax.slice(ref2d[...], (0, 0), (rows, ref2d.shape[1]))

    mrow = jax.lax.slice(mrow_ref[...], (0, 0), (As, 1))  # [As, 1]
    onem = tslice(onem_ref, As)[:, :, None] != 0          # [As, RP, 1]
    refm = tslice(ref_ref, As)[:, :, None]   # row i = adapter char i-1

    # boundary column j=0 values (written when row i == d)
    if mode_front:  # free ref-prefix skip: cost 0, origin -i
        bnd_c = jnp.zeros((As, RP, TB), jnp.int32)
        bnd_p = RP - rows3                           # m=0, o=-i
    else:           # pay deletions: cost i
        bnd_c = rows3
        bnd_p = jnp.full((As, RP, TB), RP, jnp.int32)  # m=0, o=0
    big3 = jnp.full((As, RP, TB), BIG, jnp.int32)
    zero3 = jnp.zeros((As, RP, TB), jnp.int32)
    is0 = rows3 == 0

    # plane for d = 0: cell (0, 0) = boundary; unreached rows BIG
    ca[...] = jnp.where(is0, bnd_c, big3)
    pa[...] = jnp.where(is0, bnd_p, zero3)
    # plane for d = -1 (diag source of step 1): all BIG
    cb[...] = big3
    pb[...] = zero3
    if snapshot:
        sc[...] = big3
        spay[...] = zero3

    out_v[...] = jnp.zeros((As, TB), jnp.int32)
    out_m[...] = jnp.full((As, TB), -1, jnp.int32)
    out_c[...] = jnp.full((As, TB), BIG, jnp.int32)
    out_o[...] = jnp.zeros((As, TB), jnp.int32)
    out_q[...] = jnp.zeros((As, TB), jnp.int32)
    out_r[...] = jnp.broadcast_to(mrow, (As, TB))
    out_nl[...] = jnp.zeros((As, TB), jnp.int32)
    out_na[...] = jnp.zeros((As, TB), jnp.int32)
    pok[...] = jnp.zeros((As, TB), jnp.int32)

    def step(d, cprev, pprev, cprev2, pprev2):
        """One wavefront step; reads planes d-1/d-2, returns plane d."""
        win = erev_ref[pl.ds(L - d + RP, RP), :]     # [RP, TB]
        eq = (refm & win[None, :, :]) != 0
        diag_c = pltpu.roll(cprev2[...], 1, 1)
        diag_p = pltpu.roll(pprev2[...], 1, 1)
        up_c = pltpu.roll(cprev[...], 1, 1)
        up_p = pltpu.roll(pprev[...], 1, 1)
        left_c = cprev[...]
        left_p = pprev[...]
        dc = jnp.where(eq, diag_c, diag_c + 1)
        dp_ = jnp.where(eq, diag_p + (1 << PAYB), diag_p)
        hc = left_c + 1
        use_h = hc < dc                  # diag preferred on ties
        cand_c = jnp.where(use_h, hc, dc)
        cand_p = jnp.where(use_h, left_p, dp_)
        vc = up_c + 1
        use_v = vc < cand_c              # vertical only when strictly cheaper
        cand_c = jnp.where(use_v, vc, cand_c)
        cand_p = jnp.where(use_v, up_p, cand_p)
        # row 0 at column j = d: START_WITHIN_SEQ2 reset (0, m=0, o=j)
        cand_c = jnp.where(is0, 0, cand_c)
        cand_p = jnp.where(is0, d + RP, cand_p)
        # column j = 0 boundary at row i == d (false once d >= RP)
        at_b = rows3 == d
        cand_c = jnp.where(at_b, bnd_c, cand_c)
        cand_p = jnp.where(at_b, bnd_p, cand_p)

        # row-m candidate of each adapter: column j_a = d - m_a
        cm = jnp.sum(jnp.where(onem, cand_c, 0), axis=1)   # [Ap, TB]
        pm = jnp.sum(jnp.where(onem, cand_p, 0), axis=1)
        mm = pm >> PAYB
        om = (pm & PAYMASK) - RP
        if mode_front:
            refstart = jnp.maximum(-om, 0)
            oh_rs = rows3 == refstart[:, None, :]
            kmax = jnp.sum(jnp.where(oh_rs, tslice(kbyrs_ref,
                                                   As)[:, :, None],
                                     0), axis=1)
        else:
            kmax = jnp.broadcast_to(
                jax.lax.slice(kconst_ref[...], (0, 0), (As, 1)),
                cm.shape)
        ja = jnp.broadcast_to(d - mrow, cm.shape)
        ok = (cm <= kmax) & (ja <= lens)  # d < m rows hold BIG cost
        better = ok & ((mm > out_m[...]) |
                       ((mm == out_m[...]) & (cm < out_c[...])))
        out_v[...] = jnp.where(better, 1, out_v[...])
        out_m[...] = jnp.where(better, mm, out_m[...])
        out_c[...] = jnp.where(better, cm, out_c[...])
        out_o[...] = jnp.where(better, om, out_o[...])
        out_q[...] = jnp.where(better, ja, out_q[...])
        oki = ok.astype(jnp.int32)
        out_nl[...] = out_nl[...] + oki * (1 - pok[...])
        out_na[...] = out_na[...] + oki
        pok[...] = oki
        if snapshot:
            at_end = (d - rows3) == lens[None, :, :]
            sc[...] = jnp.where(at_end, cand_c, sc[...])
            spay[...] = jnp.where(at_end, cand_p, spay[...])
        return cand_c, cand_p

    D = L + RP - 1
    nit = (D + 1) // 2

    def two(t, _):
        d = 2 * t + 1
        nc, np_ = step(d, ca, pa, cb, pb)    # writes plane parity odd
        cb[...] = nc
        pb[...] = np_
        nc, np_ = step(d + 1, cb, pb, ca, pa)
        ca[...] = nc
        pa[...] = np_
        return 0

    jax.lax.fori_loop(0, nit, two, 0)

    if snapshot:
        # final-column candidates from the snapshot (identical to
        # _kernel's epilogue)
        sm = spay[...] >> PAYB
        okf = sc[...] <= tslice(kfin_ref, As)[:, :, None]
        key = jnp.where(okf,
                        ((RP - sm) << 16)
                        + (jnp.minimum(sc[...], 255) << 8) + rows3,
                        BIG)
        kbest = jnp.min(key, axis=1)                 # [Ap, TB]
        okb = kbest < BIG
        fm = RP - (kbest >> 16)
        fc = (kbest >> 8) & 255
        frow = kbest & 255
        oh = (key == kbest[:, None, :]) & okf
        so = (spay[...] & PAYMASK) - RP
        fo = jnp.sum(jnp.where((rows3 == frow[:, None, :]) & oh, so,
                               0), axis=1)
        better = okb & ((fm > out_m[...]) |
                        ((fm == out_m[...]) & (fc < out_c[...])))
        out_v[...] = jnp.where(better, 1, out_v[...])
        out_m[...] = jnp.where(better, fm, out_m[...])
        out_c[...] = jnp.where(better, fc, out_c[...])
        out_o[...] = jnp.where(better, fo, out_o[...])
        out_q[...] = jnp.where(better, jnp.broadcast_to(lens, (As, TB)),
                               out_q[...])
        out_r[...] = jnp.where(better, frow, out_r[...])


#: locate kernel implementation: 'wf' (anti-diagonal wavefront, default)
#: or 'ks' (per-column Kogge-Stone scan). Bit-identical outputs
#: (tests/test_pallas_locate.py runs both); env escape hatch.
import os as _os
LOCATE_IMPL = _os.environ.get("TPU_ORC_LOCATE_IMPL", "wf")


@functools.partial(jax.jit,
                   static_argnames=("mode", "Ap", "L", "interpret",
                                    "impl", "As"))
def locate_tiles(ref, kbyrs, kfin, onem, mrow, kconst, reads_T, lens,
                 mode, Ap: int, L: int,
                 interpret: bool = False, impl: str | None = None,
                 As: int | None = None):
    """reads_T [L, B] int32, lens [1, B]; B % TB == 0. Returns 8 arrays
    [As, B] (wf) / [Ap, B] (ks): matches, errors, origin, qstop, valid,
    refstop-row, nloc, nacc. mode: 'front' | 'back' | 'infix' (legacy
    bool = front/back). impl: 'wf' | 'ks' (None = LOCATE_IMPL env
    default). As: true adapter count for the wavefront kernel's 3-D
    state (defaults to Ap; a 4-primer reorient bank at As=4 halves the
    per-column vector work the Ap=8 table padding would cost)."""
    if mode is True or mode is False:
        mode = "front" if mode else "back"
    if impl is None:
        impl = LOCATE_IMPL
    if As is None or impl != "wf":
        As = Ap
    if L >= (1 << PAYB) - RP:
        raise ValueError(f"read length {L} overflows the packed origin "
                         f"field (max {(1 << PAYB) - RP - 1})")
    B = reads_T.shape[1]
    grid = (B // TB,)
    const_spec = pl.BlockSpec((Ap, RP), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    vec_spec = [pl.BlockSpec((Ap, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)] * 2
    if impl == "wf":
        # reversed + RP-zero-padded read rows: win[i] = read[d-1-i] is
        # one ascending slice at offset L - d + RP (kernel docstring)
        zpad = jnp.zeros((RP, B), reads_T.dtype)
        erev = jnp.concatenate([zpad, reads_T[::-1], zpad], axis=0)
        kernel = functools.partial(_kernel_wf, mode, Ap, As, L)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[const_spec] * 4 + vec_spec + [
                pl.BlockSpec((L + 2 * RP, TB), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((As, TB), lambda b: (0, b),
                                    memory_space=pltpu.VMEM)] * 8,
            out_shape=[jax.ShapeDtypeStruct((As, B), jnp.int32)] * 8,
            scratch_shapes=[pltpu.VMEM((As, RP, TB), jnp.int32)] * 6
            + [pltpu.VMEM((As, TB), jnp.int32)],
            interpret=interpret,
        )(ref, kbyrs, kfin, onem, mrow, kconst, erev, lens)
    kernel = functools.partial(_kernel, mode, Ap, L)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[const_spec] * 4 + vec_spec + [
            pl.BlockSpec((L, TB), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((Ap, TB), lambda b: (0, b),
                                memory_space=pltpu.VMEM)] * 8,
        out_shape=[jax.ShapeDtypeStruct((Ap, B), jnp.int32)] * 8,
        scratch_shapes=[pltpu.VMEM((Ap, RP, TB), jnp.int32)] * 4
        + [pltpu.VMEM((Ap, TB), jnp.int32)],
        interpret=interpret,
    )(ref, kbyrs, kfin, onem, mrow, kconst, reads_T, lens)


class BankTables:
    """Host-precomputed constant tables for one adapter bank + mode.

    All acceptance rules (error budget floor(e*eff) with N-wildcard
    corrections, min-overlap) are encoded as int32 thresholds; -1 means
    "never accept". Fields are numpy, shaped for locate_tiles.
    """

    def __init__(self, bank_masks, bank_lens, k_table, n_prefix,
                 mode_front: bool, min_overlap: int):
        A, M = bank_masks.shape
        if M >= RP:
            raise ValueError(f"adapter length {M} >= RP-1 ({RP - 1})")
        # Ap is a pure batch dimension of [Ap, RP, TB] VPU work: pad only
        # to the 8-sublane minimum, not to a multiple of 8 — a 12-adapter
        # bank at Ap=16 wastes 25% of every column's vector ops
        # (measured r3: kernel 451 -> ~350 ms per 8192x512 dual-round).
        Ap = max(8, A)
        k_table = np.asarray(k_table)
        n_prefix = np.asarray(n_prefix)
        bank_lens = np.asarray(bank_lens)
        ref = np.zeros((Ap, RP), np.int32)
        ref[:A, 1:M + 1] = bank_masks
        # FRONT row-m thresholds keyed on candidate refstart
        kbyrs = np.full((Ap, RP), -1, np.int32)
        # BACK final-column thresholds keyed on row (refstop)
        kfin = np.full((Ap, RP), -1, np.int32)
        # BACK row-m threshold constant
        kconst = np.full((Ap, 1), -1, np.int32)
        for a in range(A):
            m = int(bank_lens[a])
            for rs in range(m + 1):
                length = m - rs
                if length < min_overlap:
                    continue
                eff = length - int(n_prefix[a, m] - n_prefix[a, rs])
                kbyrs[a, rs] = k_table[a, max(0, min(eff, M))]
            for row in range(min_overlap, m + 1):
                eff = row - int(n_prefix[a, row])
                kfin[a, row] = k_table[a, max(0, min(eff, M))]
            if m >= min_overlap:
                kconst[a, 0] = k_table[a, max(0, m - int(n_prefix[a, m]))]
        onem = np.zeros((Ap, RP), np.int32)
        onem[np.arange(A), bank_lens] = 1
        mrow = np.ones((Ap, 1), np.int32)
        mrow[:A, 0] = bank_lens
        self.A, self.Ap, self.M = A, Ap, M
        self.mode_front = mode_front
        self.ref, self.kbyrs, self.kfin = ref, kbyrs, kfin
        self.onem, self.mrow, self.kconst = onem, mrow, kconst

    def arrays(self):
        """Device copies of the constant tables (memoized: a reorient/
        demux run dispatches thousands of chunks against one bank)."""
        if not hasattr(self, "_dev_arrays"):
            self._dev_arrays = (
                jnp.asarray(self.ref), jnp.asarray(self.kbyrs),
                jnp.asarray(self.kfin), jnp.asarray(self.onem),
                jnp.asarray(self.mrow), jnp.asarray(self.kconst))
        return self._dev_arrays


def tables_for_bank(bank, mode: str, min_overlap: int) -> BankTables:
    """BankTables for an AdapterBank, cached on the bank instance —
    BankTables construction is a Python A x RP double loop that the
    per-chunk hot paths must not repay (reorient dispatches one locate
    per 2048-read chunk)."""
    cache = getattr(bank, "_pl_tables", None)
    if cache is None:
        cache = {}
        bank._pl_tables = cache
    key = (mode, min_overlap)
    if key not in cache:
        # Copy the bank tables at cache time: BankTables (and its
        # memoized device arrays) freeze the thresholds for the life of
        # the bank, so a caller mutating bank.k_table after a locate has
        # run must not silently keep the stale copy alive inside the
        # cache while reading fresh values elsewhere.
        cache[key] = BankTables(bank.masks.copy(), bank.lens.copy(),
                                bank.k_table.copy(),
                                bank.n_prefix, mode == "front", min_overlap)
    return cache[key]


def _mode_of(flags: int) -> str:
    if int(flags) == int(FRONT):
        return "front"
    if int(flags) == int(BACK):
        return "back"
    if int(flags) == int(INFIX):
        return "infix"
    raise ValueError("pallas locate supports FRONT/BACK/INFIX only")


def locate_dispatch(tabs: BankTables, read_masks: np.ndarray,
                    read_lens: np.ndarray, mode: str,
                    interpret: bool = False):
    """Phase A of a pipelined locate: upload + launch, NO fetch.

    Returns (lazy [8, Ap, B] device array, A, B0) for locate_collect.
    Dispatching every chunk before fetching any lets host materialize
    work for chunk k overlap device compute for chunks k+1... (the
    demux host-overlap pattern, BENCH.md r3)."""
    B0, L = read_masks.shape
    # pad the batch to a power-of-two multiple of TB, not just the next
    # TB multiple: every distinct padded B is a separate Mosaic compile
    # (minutes each on a slow service phase), and odd tail chunks — the
    # last partial chunk of a pipelined pass, small slow-path re-scans —
    # would otherwise each mint a fresh shape instead of reusing the
    # main chunk's program. Growth is capped at 2048 (the pipelined
    # chunk size): beyond it, round to the next 2048 multiple so a
    # caller dispatching just past a power of two (e.g. 2049) pads to
    # 4096 at most once, not ~2x at every size (advisor r4).
    B = TB
    while B < B0 and B < 2048:
        B *= 2
    if B0 > B:
        B = -(-B0 // 2048) * 2048
    reads_T = np.zeros((L, B), np.int32)
    reads_T[:, :B0] = read_masks.T
    lens = np.zeros((1, B), np.int32)
    lens[0, :B0] = read_lens
    m, c, o, q, v, r, nl, na = locate_tiles(
        *tabs.arrays(), jnp.asarray(reads_T), jnp.asarray(lens),
        mode, tabs.Ap, L, interpret, As=tabs.A)
    return jnp.stack([m, c, o, q, v, r, nl, na]), tabs.A, B0


def locate_collect(lazy, A: int, B0: int):
    """Phase B: ONE stacked device->host transfer -> LocateResult."""
    from .batched import LocateResult
    stk = np.asarray(lazy)
    tr = lambda x: x[:A, :B0].T
    bo = tr(stk[2])
    return LocateResult(
        valid=tr(stk[4]), matches=tr(stk[0]), errors=tr(stk[1]),
        refstart=np.maximum(-bo, 0), refstop=tr(stk[5]),
        querystart=np.maximum(bo, 0), querystop=tr(stk[3]),
        nloc=tr(stk[6]), nacc=tr(stk[7]))


def locate_pallas(bank_masks: np.ndarray, bank_lens: np.ndarray,
                  k_table: np.ndarray, n_prefix: np.ndarray,
                  read_masks: np.ndarray, read_lens: np.ndarray,
                  flags: int, min_overlap: int = DEFAULT_MIN_OVERLAP,
                  interpret: bool = False):
    """Host wrapper producing batched_locate-compatible LocateResult
    fields as numpy arrays [B, A]. FRONT/BACK/INFIX only."""
    mode = _mode_of(flags)
    tabs = BankTables(bank_masks, bank_lens, k_table, n_prefix,
                      mode == "front", min_overlap)
    lazy, A, B0 = locate_dispatch(tabs, read_masks, read_lens, mode,
                                  interpret)
    return locate_collect(lazy, A, B0)
