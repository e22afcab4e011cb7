"""Star-alignment majority consensus (amplicon_sorter-equivalent).

Behavioral port of the reference consensus builder
(amplicon_sorter.py:324-441: ``create_alignment`` + ``homopolymersort`` +
``create_consensus``), re-implemented on top of the native banded NW
traceback (tpu_orc/native) instead of edlib, with deterministic inputs.
Peculiarities of the original are reproduced deliberately where they affect
output (documented inline): vote counts include the draft-consensus row;
the homopolymer decay correction uses Python negative-index wraparound at
the first column; `b` run-length bookkeeping is only updated on appended
bases.

The reference's IUPAC additionalEqualities only matter when ambiguity
calling is enabled (off by default) — consensus drafts here are plain
ACGT/N, so literal code comparison is equivalent.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .. import native
from ..io import encode

GAP = 255  # gap marker in alignment matrices


def _align_rows(consensus_codes: np.ndarray,
                reads: Sequence[np.ndarray]) -> np.ndarray:
    """Star alignment of reads against the consensus draft.

    Deviation from the reference's create_alignment (documented): the
    reference aligns each read against the *progressively gapped* draft and
    gives every insertion event its own column; we align every read against
    the original draft coordinates and merge insertions at the same
    position into shared columns (counts then reflect insertion support).
    This preserves strictly more signal for the majority vote; the output
    contract is consensus *equivalence* (SURVEY.md §7.4.3), not
    column-structure parity. Returns int16 matrix [n_reads+1, width],
    GAP=255, row 0 = draft."""
    t = [int(c) for c in consensus_codes]
    rows: List[List[int]] = [t[:]]
    # map: original consensus position -> current column index
    for q_arr in reads:
        ops = native.nw_path(np.asarray(q_arr, dtype=np.uint8),
                             np.asarray(consensus_codes, dtype=np.uint8))
        # Build the read row in ORIGINAL consensus coordinates, collecting
        # insertion positions (consume-read-only ops).
        q = [int(c) for c in q_arr]
        qi = 0
        ti = 0
        row_vals: List[Tuple[int, int]] = []  # (orig_t_pos, value) for diag/del
        inserts: List[Tuple[int, int]] = []   # (orig_t_pos, value)
        for op in ops:
            if op == 0:        # diag: consume read + consensus
                row_vals.append((ti, q[qi])); qi += 1; ti += 1
            elif op == 1:      # consume read only -> insertion before ti
                inserts.append((ti, q[qi])); qi += 1
            else:              # consume consensus only -> gap in read
                row_vals.append((ti, GAP)); ti += 1
        rows.append((row_vals, inserts))  # type: ignore[arg-type]
    # Assemble columns: count max insertions before each consensus position
    n_t = len(t)
    ins_count = np.zeros(n_t + 1, dtype=np.int64)
    for rv in rows[1:]:
        _, inserts = rv  # type: ignore[misc]
        per = {}
        for pos, _val in inserts:
            per[pos] = per.get(pos, 0) + 1
        for pos, cnt in per.items():
            ins_count[pos] = max(ins_count[pos], cnt)
    # column layout: [ins slots before pos 0][pos 0][ins before 1][pos 1]...
    col_of_t = np.zeros(n_t, dtype=np.int64)
    width = 0
    for p in range(n_t):
        width += int(ins_count[p])
        col_of_t[p] = width
        width += 1
    width += int(ins_count[n_t])
    ins_base = np.zeros(n_t + 1, dtype=np.int64)  # first ins column before p
    for p in range(n_t + 1):
        ins_base[p] = (col_of_t[p] - ins_count[p]) if p < n_t else width - ins_count[n_t]
    out = np.full((len(reads) + 1, width), GAP, dtype=np.int16)
    for p in range(n_t):
        out[0, col_of_t[p]] = t[p]
    for ri, rv in enumerate(rows[1:], start=1):
        row_vals, inserts = rv  # type: ignore[misc]
        for pos, val in row_vals:
            if val != GAP:
                out[ri, col_of_t[pos]] = val
        per_pos: dict = {}
        for pos, val in inserts:
            k = per_pos.get(pos, 0)
            # right-align inserted bases against the consensus position
            out[ri, ins_base[pos] + int(ins_count[pos]) - 1 - k] = val
            per_pos[pos] = k + 1
    return out


def column_counts(aln: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-column (top1, top2) base/count pairs, gaps excluded.

    Returns (bases [W, 2] int16 with -1 = none, counts [W, 2] int64).
    Ties between bases break toward the smaller code (A<C<G<T<N), matching
    a count-sort that is stable on first-seen order only approximately —
    the reference's dict ordering is insertion (read) order; documented
    deviation with no effect above the 10%/threshold cuts in practice.
    """
    W = aln.shape[1]
    counts = np.zeros((W, 5), dtype=np.int64)
    for sym in range(5):
        counts[:, sym] = (aln == sym).sum(axis=0)
    order = np.argsort(-counts, axis=1, kind="stable")
    top_bases = order[:, :2].astype(np.int16)
    top_counts = np.take_along_axis(counts, order[:, :2], axis=1)
    top_bases[top_counts == 0] = -1
    return top_bases, top_counts


def _homopolymersort(entries: List[Tuple[int, int, int, int]]):
    """Reference homopolymersort (:244-257): within runs of consecutive
    columns sharing the same top base, sort entries by top count desc."""
    if not entries:
        return entries
    out: List = []
    run = [entries[0]]
    for e in entries[1:]:
        if e[0] == run[0][0]:
            run.append(e)
        else:
            run.sort(key=lambda x: x[1], reverse=True)
            out.extend(run)
            run = [e]
    out.extend(run)
    return out


_IUPAC_PAIR = {frozenset((1, 3)): "Y", frozenset((0, 2)): "R",
               frozenset((0, 1)): "M", frozenset((2, 3)): "K",
               frozenset((2, 1)): "S", frozenset((0, 3)): "W"}


def build_consensus_iupac(read_codes: Sequence[np.ndarray],
                          thresholds=(0.45, 0.15, 0.5)) -> str:
    """Ambiguity-calling variant (reference -amb option,
    degenerate/ambiguity at :259-322): columns whose top base holds 35-65%
    support and whose top-2 together hold 75-120% emit the IUPAC code of
    the pair. Returns an ASCII string (may contain IUPAC letters)."""
    codes, amb = _build_consensus_impl(read_codes, thresholds,
                                       want_ambiguity=True)
    out = []
    for base, code2, is_amb in amb:
        if is_amb:
            out.append(_IUPAC_PAIR.get(frozenset((base, code2)),
                                       encode.decode(
                                           np.array([base], np.uint8))))
        else:
            out.append(encode.decode(np.array([base], np.uint8)))
    return "".join(out)


def build_consensus(read_codes: Sequence[np.ndarray],
                    thresholds=(0.45, 0.15, 0.5)) -> np.ndarray:
    """Reference create_consensus (:358-441): iterative column-majority with
    homopolymer handling. Input: list of code arrays. Output: codes."""
    return _build_consensus_impl(read_codes, thresholds,
                                 want_ambiguity=False)[0]


def _build_consensus_impl(read_codes: Sequence[np.ndarray],
                          thresholds=(0.45, 0.15, 0.5),
                          want_ambiguity: bool = False):
    if not read_codes:
        return np.zeros(0, dtype=np.uint8), []
    rl = sorted(read_codes, key=len, reverse=True)
    consensus = np.asarray(rl[0], dtype=np.uint8)
    first_pass_reads = rl[1:]
    entries: List[Tuple[int, int, int, int]] = []
    for pi, thr in enumerate(thresholds):
        reads = first_pass_reads if pi == 0 else rl
        if len(consensus) == 0:
            consensus = np.asarray(rl[0], dtype=np.uint8)
        aln = _align_rows(consensus, reads)
        c = aln.shape[0]  # rows incl. draft row (reference counts it too)
        tb, tc = column_counts(aln)
        entries = []
        for w in range(aln.shape[1]):
            if tb[w, 0] >= 0 and tc[w, 0] > c * 0.10:
                entries.append((int(tb[w, 0]), int(tc[w, 0]),
                                int(tb[w, 1]), int(tc[w, 1])))
        entries = _homopolymersort(entries)
        consensus = np.asarray([e[0] for e in entries if e[1] > c * thr],
                               dtype=np.uint8)
    # final homopolymer decay correction (:398-427), threshold = last (0.5)
    thr = thresholds[-1]
    out: List[int] = []
    amb: List[tuple] = []  # (base, top2_base, is_ambiguous) per kept column
    b = 1

    def emit(e):
        base, cnt, base2, cnt2 = e
        is_amb = (want_ambiguity and base2 >= 0 and base < 4 and base2 < 4
                  and c * 0.35 <= cnt <= c * 0.65
                  and c * 0.75 < cnt + cnt2 < c * 1.2)
        out.append(base)
        amb.append((base, base2, is_amb))

    for n, e in enumerate(entries):
        prev = entries[n - 1]  # n==0 wraps to last entry, as in the original
        base, cnt = e[0], e[1]
        if base == prev[0]:
            if base in (0, 3):  # A or T
                if b >= 4:
                    if cnt > c * 0.2:
                        emit(e); b += 1
                else:
                    if cnt > c * thr:
                        emit(e); b += 1
            elif base in (1, 2):  # C or G
                if b >= 3:
                    if prev[1] * 0.5 < cnt and cnt > c * 0.2:
                        emit(e); b += 1
                else:
                    if cnt > c * thr:
                        emit(e); b += 1
            else:  # N runs: treat as plain threshold
                if cnt > c * thr:
                    emit(e)
        else:
            if cnt > c * thr:
                emit(e); b = 1
    return np.asarray(out, dtype=np.uint8), amb


def consensus_direction(code_list: List[np.ndarray]) -> List[np.ndarray]:
    """Orient all sequences to the first by fwd-vs-revcomp NW similarity
    (amplicon_sorter.py:1826-1838)."""
    if not code_list:
        return code_list
    first = code_list[0]
    out = [first]
    for c in code_list[1:]:
        rc = encode.revcomp_codes(np.asarray(c))
        d_f = native.edit_distance(first, c)
        d_r = native.edit_distance(first, rc)
        longer = max(len(first), len(c))
        out.append(c if (1 - d_f / longer) >= (1 - d_r / longer) else rc)
    return out
