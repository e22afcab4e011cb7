"""Generate the systematic cutadapt-semantics edge grid (VERDICT r2 #4).

Every case is CONSTRUCTED so its expected outcome follows directly from
cutadapt's documented rules — the expectations are computed from the
construction parameters (planted occurrence position/length/errors), not
by running any aligner in this repo. The rules used (cutadapt docs /
algorithm.rst, mirrored in align/spec.py):

  * acceptance: a candidate covering ref[rs:rstop] with E errors is
    accepted iff (rstop-rs) >= min_overlap and
    E <= floor(max_error_rate * eff_len), eff_len = length minus the
    number of 'N' in the covered reference region;
  * -g (FRONT): adapter 3' end anchored (refstop == m); refstart and
    querystart free; trim read[:querystop];
  * -a (BACK): adapter 5' end anchored (refstart == 0); refstop and
    querystop free; trim read[querystart:];
  * best location: max matches, then min errors, then earliest scan
    position; across adapters: max matches, first-in-file on ties;
  * --rc: reverse complement wins only with STRICTLY more matches.

Construction invariants that make the expectations derivable by hand
(asserted below for every case):
  * adapters are aperiodic strings over {A,C,T}; read padding is all-G,
    so no adapter suffix/prefix can match padding, and planted 'G'
    mismatches can never be matched by any alignment;
  * any shifted self-alignment of the adapter matches < 50% of its
    positions, so indel-shifted candidates always have fewer matches
    than the planted candidate;
  * planted mismatches sit >= 2 from the occurrence ends and >= 4
    apart, so the longest exact sub-suffix/prefix run is shorter than
    (occurrence matches), keeping the planted candidate the unique
    max-matches winner.

Run:  python tests/fixtures/gen_cutadapt_grid.py   (writes
cutadapt_grid.json next to itself; deterministic).
"""
import json
import os
import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "cutadapt_grid.json")

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def aperiodic_adapter(rng, m):
    """Random {A,C,T} string whose shifted self-matches stay < 50% and
    with no two equal adjacent chars (blocks indel-shift candidates)."""
    while True:
        s = [rng.choice("ACT")]
        for _ in range(m - 1):
            s.append(rng.choice([c for c in "ACT" if c != s[-1]]))
        s = "".join(s)
        ok = True
        for d in range(1, m):
            eq = sum(1 for i in range(m - d) if s[i] == s[i + d])
            if eq > (m - d) // 2:
                ok = False
                break
        if ok:
            return s


def plant_mismatches(seg, positions):
    """Replace the given 0-based positions with 'G' (never in adapters)."""
    seg = list(seg)
    for p in positions:
        assert 2 <= p < len(seg) - 2 or len(seg) <= 5, \
            f"mismatch at {p} too close to occurrence end (len {len(seg)})"
        seg[p] = "G"
    return "".join(seg)


def check_invariants(adapter, read):
    assert "G" not in adapter, adapter
    m = len(adapter)
    for d in range(1, m):
        eq = sum(1 for i in range(m - d) if adapter[i] == adapter[i + d])
        assert eq <= (m - d) // 2 + 1, (adapter, d, eq)


# ---------------------------------------------------------------------------
# Independent mini reference DP, written directly from cutadapt's
# documented algorithm (docs/algorithm.rst + the DP description in
# _align.pyx docstrings): unit-cost semi-global alignment, acceptance by
# errors <= floor(e * eff_len) and length >= min_overlap, best match by
# (max matches, min errors, earliest scan position). It exists ONLY to
# cross-check the constructed expectations below — if a construction
# accidentally allows a spurious candidate (e.g. a repeated 3-mer), the
# assert fails and the case must be redesigned. O(m*n) per case; cases
# are tiny.
# ---------------------------------------------------------------------------

_IUPAC = {"A": 1, "C": 2, "G": 4, "T": 8, "U": 8, "R": 5, "Y": 10,
          "S": 6, "W": 9, "K": 12, "M": 3, "B": 14, "D": 13, "H": 11,
          "V": 7, "N": 15}
N_BIT = 16


def _ref_mask(c):
    m = _IUPAC.get(c.upper(), 0)
    return m | (N_BIT if c.upper() == "N" else 0)


def _read_mask(c, wildcards):
    if wildcards:
        return _ref_mask(c)
    u = c.upper()
    if u in "ACGT":
        return _IUPAC[u]
    return N_BIT


def mini_locate(ref, query, e, flags, min_overlap, wildcards=False):
    """(refstart, refstop, querystart, querystop, matches, errors) of the
    best acceptable semi-global match, or None. flags: (start_in_ref,
    start_in_query, stop_in_ref, stop_in_query) booleans."""
    sr, sq, tr, tq = flags
    m, n = len(ref), len(query)
    rm = [_ref_mask(c) for c in ref]
    qm = [_read_mask(c, wildcards) for c in query]
    nref = [0] * (m + 1)  # prefix count of N's in ref
    for i in range(m):
        nref[i + 1] = nref[i] + (1 if ref[i].upper() == "N" else 0)
    BIG = 10 ** 9
    # D[i][j] = (cost, matches, origin) — origin = -refstart (if sr) or
    # querystart (if sq); per-cell tie-break documented in spec.py:
    # diagonal, then horizontal (consume query), then vertical.
    D = [[None] * (n + 1) for _ in range(m + 1)]
    for j in range(n + 1):
        D[0][j] = (0, 0, j) if sq else (j, 0, 0)
    for i in range(1, m + 1):
        D[i][0] = (0, 0, -i) if sr else (i, 0, 0)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            eq = (rm[i - 1] & qm[j - 1]) != 0
            dc, dm, do = D[i - 1][j - 1]
            cand = [(dc + (0 if eq else 1), dm + (1 if eq else 0), do)]
            hc, hm, ho = D[i][j - 1]
            cand.append((hc + 1, hm, ho))
            vc, vm, vo = D[i - 1][j]
            cand.append((vc + 1, vm, vo))
            best = cand[0]
            for c in cand[1:]:
                if c[0] < best[0]:
                    best = c
            D[i][j] = best
    # candidate cells in scan order: columns left to right (row m), then
    # — only with STOP_WITHIN_SEQ1 — the final column by increasing row.
    # A duplicate (m, n) is harmless (same value, first-wins ties).
    cells = []
    if tq:
        cells += [(m, j) for j in range(n + 1)]
    if tr:
        cells += [(i, n) for i in range(m + 1)]
    if not cells:
        cells = [(m, n)]
    best = None
    for (i, j) in cells:
        cost, mat, org = D[i][j]
        refstart = -org if org < 0 else 0
        length = i - refstart
        if length < min_overlap:
            continue
        eff = length - (nref[i] - nref[refstart])
        if cost > int(e * eff + 1e-9):
            continue
        key = (-mat, cost)
        if best is None or key < best[0]:
            qs = org if org > 0 else 0
            best = (key, (refstart, i, qs, j, mat, cost))
    return None if best is None else best[1]


FRONT_FLAGS = (True, True, False, True)
BACK_FLAGS = (False, True, True, True)


def mini_assign(adapters, read, mode, e, min_overlap, rc, wildcards):
    """Full per-read decision: across-adapter max-matches/file-order,
    --rc strictly-more-matches; returns (name|None, rc, trimmed)."""
    flags = FRONT_FLAGS if mode == "front" else BACK_FLAGS

    def best_for(q):
        top = None
        for k, (name, seq) in enumerate(adapters):
            loc = mini_locate(seq, q, e, flags, min_overlap, wildcards)
            if loc is None:
                continue
            if top is None or loc[4] > top[1][4]:
                top = (name, loc)
        return top

    fwd = best_for(read)
    use = ("fwd", fwd)
    if rc:
        rcread = revcomp_iupac(read)
        rev = best_for(rcread)
        fm = fwd[1][4] if fwd else -1
        rm_ = rev[1][4] if rev else -1
        if rm_ >= 0 and rm_ > fm:
            use = ("rc", rev)
    ori, hit = use
    if hit is None:
        return None, False, read
    q = revcomp_iupac(read) if ori == "rc" else read
    name, loc = hit
    if mode == "front":
        return name, ori == "rc", q[loc[3]:]
    return name, ori == "rc", q[:loc[2]]


_ICOMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N", "R": "Y",
          "Y": "R", "S": "S", "W": "W", "K": "M", "M": "K", "B": "V",
          "V": "B", "D": "H", "H": "D", "U": "A"}


def revcomp_iupac(s):
    return "".join(_ICOMP[c.upper()] for c in reversed(s))


CASES = []
LINKED = []


def case(name, desc, mode, adapters, read, expect, e=0.1, min_overlap=3,
         rc=False, read_wildcards=False):
    for _, seq in adapters:
        check_invariants(seq.replace("N", "A"), read)
    CASES.append({
        "name": name, "desc": desc, "mode": mode, "e": e,
        "min_overlap": min_overlap, "rc": rc,
        "read_wildcards": read_wildcards,
        "adapters": adapters, "read": read, "expect": expect,
    })


def main():
    rng = random.Random(20260819)
    A10 = aperiodic_adapter(rng, 10)
    A20 = aperiodic_adapter(rng, 20)
    A30 = aperiodic_adapter(rng, 30)
    GT = lambda n: "G" * n

    # ---- family A: FRONT full internal occurrence, error floor over m
    for nm, A in (("m10", A10), ("m20", A20), ("m30", A30)):
        m = len(A)
        floor = m // 10
        lead, tail = GT(6), GT(12)
        # exact
        case(f"front_full_{nm}_exact",
             f"full {m}nt occurrence after 6 G's; exact -> trim "
             f"everything through the adapter",
             "front", [["A1", A]], lead + A + tail,
             {"adapter": "A1", "rc": False, "trimmed": tail})
        # k = floor mismatches, mid-occurrence, >=4 apart, >=2 from ends
        pos = [3 + 4 * i for i in range(floor)]
        occ = plant_mismatches(A, pos)
        case(f"front_full_{nm}_floor_errors",
             f"full occurrence with {floor} G-mismatches (budget "
             f"floor(0.1*{m})={floor}) -> accepted, trim at occurrence "
             f"end",
             "front", [["A1", A]], lead + occ + tail,
             {"adapter": "A1", "rc": False, "trimmed": tail})

    # reject: m=10 with 2 mismatches, one at position m-3 so every >=3
    # suffix window has >=1 error with budget floor(s/10)=0 (s<10) and
    # the full region has 2 > 1
    occ = plant_mismatches(A10, [3, 7])
    case("front_full_m10_over_budget",
         "2 G-mismatches on a 10nt adapter (budget 1); suffix windows "
         "s in [3,7) contain the pos-7 mismatch (budget 0), s in [8,10] "
         "contain both -> no acceptable candidate",
         "front", [["A1", A10]], GT(6) + occ + GT(12),
         {"adapter": None, "rc": False,
          "trimmed": GT(6) + occ + GT(12)})
    # reject: m=20 with 3 mismatches at 17, 13, 8 (0-based)
    occ = plant_mismatches(A20, [8, 13, 17])
    case("front_full_m20_over_budget",
         "3 G-mismatches on a 20nt adapter: suffixes s in [3,7) hit "
         "pos-17 (budget 0); s in [7,12) hold 2 errors (budget <=1); "
         "s in [12,20] hold 3 (budget <=2) -> reject everywhere",
         "front", [["A1", A20]], GT(6) + occ + GT(12),
         {"adapter": None, "rc": False,
          "trimmed": GT(6) + occ + GT(12)})

    # ---- family C: FRONT prefix-skip ladder (adapter suffix of length
    # s at read start), exact and 1-mismatch, across floor boundaries
    for s, A in ((9, A10), (10, A20), (11, A20), (19, A20), (20, A30),
                 (29, A30), (30, A30)):
        m = len(A)
        if s > m:
            continue
        suf = A[m - s:]
        tail = GT(14)
        case(f"front_prefix_s{s}_m{m}_exact",
             f"{s}nt adapter suffix at read start (refstart {m - s}) "
             f"exact -> trim read[:{s}]",
             "front", [["A1", A]], suf + tail,
             {"adapter": "A1", "rc": False, "trimmed": tail})
    # 1 mismatch mid-suffix: s=9 budget 0 -> reject; s=10 budget 1 ->
    # accept; s=19 budget 1 -> accept
    for s, A, ok in ((9, A10, False), (10, A20, True), (19, A20, True)):
        m = len(A)
        suf = plant_mismatches(A[m - s:], [s // 2])
        tail = GT(14)
        exp = ({"adapter": "A1", "rc": False, "trimmed": tail} if ok else
               {"adapter": None, "rc": False, "trimmed": suf + tail})
        case(f"front_prefix_s{s}_m{m}_one_mismatch",
             f"{s}nt suffix occurrence with 1 mid G-mismatch; budget "
             f"floor(0.1*{s})={s // 10} -> "
             f"{'accept' if ok else 'reject'}",
             "front", [["A1", A]], suf + tail, exp)
    # 2 mismatches at s=19 (budget 1): positions s-3 and s-10 kill every
    # window (s'<10 has >=1 err budget 0; s'>=10 has 2 errs budget 1)
    s = 19
    suf = plant_mismatches(A20[1:], [s - 10, s - 3])
    case("front_prefix_s19_two_mismatches",
         "19nt suffix occurrence, G-mismatches at offsets 9 and 16: "
         "windows s'<10 contain >=1 error (budget 0), s'>=10 contain "
         "both (budget 1) -> reject",
         "front", [["A1", A20]], suf + GT(14),
         {"adapter": None, "rc": False, "trimmed": suf + GT(14)})

    # ---- family D: min_overlap boundaries
    case("front_min_overlap5_below",
         "4nt exact suffix with min_overlap=5 -> reject",
         "front", [["A1", A10]], A10[-4:] + GT(12),
         {"adapter": None, "rc": False, "trimmed": A10[-4:] + GT(12)},
         min_overlap=5)
    case("front_min_overlap5_at",
         "5nt exact suffix with min_overlap=5 -> accept",
         "front", [["A1", A10]], A10[-5:] + GT(12),
         {"adapter": "A1", "rc": False, "trimmed": GT(12)},
         min_overlap=5)

    # ---- family E: BACK (-a) mirror
    for nm, A in (("m10", A10), ("m20", A20)):
        m = len(A)
        floor = m // 10
        lead = "".join(rng.choice("ACT") for _ in range(12))
        # ensure the lead itself has no G and differs from the adapter
        case(f"back_full_{nm}_exact",
             f"full {m}nt -a occurrence mid-read; adapter and everything "
             "after it removed",
             "back", [["A1", A]], GT(10) + A + GT(8),
             {"adapter": "A1", "rc": False, "trimmed": GT(10)})
        pos = [3 + 4 * i for i in range(floor)]
        occ = plant_mismatches(A, pos)
        case(f"back_full_{nm}_floor_errors",
             f"-a occurrence with {floor} mismatches (budget {floor}) "
             "-> accepted",
             "back", [["A1", A]], GT(10) + occ + GT(8),
             {"adapter": "A1", "rc": False, "trimmed": GT(10)})
    # BACK end-partial ladder: adapter PREFIX of length s at read end
    for s, A, mo, ok in ((2, A10, 3, False), (3, A10, 3, True),
                         (9, A20, 3, True), (10, A20, 3, True)):
        pre = A[:s]
        lead = GT(11)
        exp = ({"adapter": "A1", "rc": False, "trimmed": lead} if ok else
               {"adapter": None, "rc": False, "trimmed": lead + pre})
        case(f"back_endpartial_s{s}_m{len(A)}",
             f"{s}nt adapter prefix at read end; min_overlap={mo} -> "
             f"{'accept' if ok else 'reject'}",
             "back", [["A1", A]], lead + pre, exp, min_overlap=mo)
    # BACK end-partial reject on budget: s=9 with 1 mismatch (budget 0)
    pre = plant_mismatches(A20[:9], [4])
    case("back_endpartial_s9_one_mismatch",
         "9nt prefix at read end with 1 mid G-mismatch: budget "
         "floor(0.9)=0; shorter windows still contain it or fall under "
         "min_overlap -> reject",
         "back", [["A1", A20]], GT(11) + pre,
         {"adapter": None, "rc": False, "trimmed": GT(11) + pre})

    # ---- family F: selection-order ties
    B10 = aperiodic_adapter(rng, 10)
    while B10 == A10:
        B10 = aperiodic_adapter(rng, 10)
    # A2 strictly more matches beats file order
    occ1 = plant_mismatches(A10, [4])   # 9 matches
    case("across_adapters_more_matches_wins",
         "A1 occurs with 1 mismatch (9 matches), A2 exactly (10): A2 "
         "wins despite file order",
         "front", [["A1", A10], ["A2", B10]],
         GT(4) + occ1 + GT(5) + B10 + GT(9),
         {"adapter": "A2", "rc": False, "trimmed": GT(9)})
    # equal matches -> first in file order even when SECOND has fewer
    # errors is not reachable with equal matches & exact constructions;
    # classic equal-matches tie:
    case("across_adapters_file_order_tie2",
         "both adapters occur exactly (10 matches each), A1 first in "
         "file wins; trim stops at A1's occurrence",
         "front", [["A1", A10], ["A2", B10]],
         GT(4) + A10 + GT(5) + B10 + GT(9),
         {"adapter": "A1", "rc": False,
          "trimmed": GT(5) + B10 + GT(9)})
    # BACK file-order tie: first-in-file wins; trims from ITS occurrence
    case("back_file_order_tie",
         "-a mode: both adapters occur exactly; A1 first in file wins "
         "and the trim runs from A1's (earlier) occurrence start",
         "back", [["A1", A10], ["A2", B10]],
         GT(7) + A10 + GT(4) + B10 + GT(3),
         {"adapter": "A1", "rc": False, "trimmed": GT(7)})
    # read = revcomp(A10 + tail): in rc orientation the read is
    # A10 + tail (exact, 10 matches). In forward orientation the read
    # contains revcomp(A10) which (aperiodicity + complement alphabet)
    # matches < 6 positions of any adapter suffix — every forward
    # candidate has fewer matches, so rc wins strictly.
    tail = GT(9)
    case("rc_only_exact",
         "read is the reverse complement of (adapter + tail): rc "
         "orientation scores 10 matches, forward none -> rc wins and "
         "the trimmed output is the tail in rc orientation",
         "front", [["A1", A10]], revcomp(A10 + tail),
         {"adapter": "A1", "rc": True, "trimmed": tail}, rc=True)

    # ---- family G: N wildcards in the adapter
    AN = A10[:3] + "NN" + A10[5:]
    # eff = 8 for the full region; budget floor(0.8) = 0
    case("adapter_N_eff_budget_reject",
         "10nt adapter with 2 N's: eff_len 8 -> budget floor(0.8)=0; "
         "one real mismatch -> reject",
         "front", [["A1", AN]],
         plant_mismatches(A10, [7]) + GT(12),
         {"adapter": None, "rc": False,
          "trimmed": plant_mismatches(A10, [7]) + GT(12)})
    case("adapter_N_matches_any",
         "the N positions match arbitrary read chars (here G,G) and "
         "count as matches; zero errors -> accept",
         "front", [["A1", AN]], A10[:3] + "GG" + A10[5:] + GT(12),
         {"adapter": "A1", "rc": False, "trimmed": GT(12)})
    # read N: by default read-N matches only adapter-N
    case("read_N_is_mismatch_by_default",
         "read N under a non-N adapter position = mismatch; with "
         "budget 1 on a full 10nt occurrence it still accepts",
         "front", [["A1", A10]],
         A10[:4] + "N" + A10[5:] + GT(12),
         {"adapter": "A1", "rc": False, "trimmed": GT(12)})
    case("read_two_N_over_budget",
         "two read N's = 2 mismatches > budget 1 -> reject (dense "
         "placement: positions 4 and 7 poison every window)",
         "front", [["A1", A10]],
         A10[:4] + "N" + A10[5:7] + "N" + A10[8:] + GT(12),
         {"adapter": None, "rc": False,
          "trimmed": A10[:4] + "N" + A10[5:7] + "N" + A10[8:] + GT(12)})

    # ---- family H: --match-read-wildcards
    # 'R' = A/G purine. Choose two adapter positions holding 'A': with
    # wildcards ON, R matches A (0 errors); OFF, each R is a mismatch.
    apos = [i for i, c in enumerate(A10) if c == "A" and 2 <= i <= 7]
    p1, p2 = apos[0], apos[1]
    rd = list(A10)
    rd[p1] = "R"
    rd[p2] = "R"
    rd = "".join(rd) + GT(12)
    case("match_read_wildcards_on",
         "read has R (purine) at two adapter-A positions: with "
         "--match-read-wildcards they match -> exact accept",
         "front", [["A1", A10]], rd,
         {"adapter": "A1", "rc": False, "trimmed": GT(12)},
         read_wildcards=True)
    case("match_read_wildcards_off",
         "same read without the flag: R is a non-ACGT char = 2 "
         "mismatches > budget 1 -> reject",
         "front", [["A1", A10]], rd,
         {"adapter": None, "rc": False, "trimmed": rd})

    # ---- linked FWD...REV grid
    FWD = aperiodic_adapter(rng, 12)
    REV = aperiodic_adapter(rng, 12)
    mid = "".join(rng.choice("ACT") for _ in range(30))
    LINKED.extend([
        {"name": "linked_rev_over_budget",
         "desc": "REV present but with 2 G-mismatches (budget "
                 "floor(1.2)=1 over 12nt) -> linked match fails, read "
                 "goes to untrimmed-output",
         "fwd": FWD, "rev": REV, "e": 0.1,
         "read": GT(4) + FWD + mid + plant_mismatches(REV, [3, 8])
                 + GT(4),
         "expect": {"untrimmed": True}},
        {"name": "linked_rev_partial_at_end",
         "desc": "REV occurs as its first 6nt at the read end "
                 "(partial, exact, >= min_overlap) -> linked trim keeps "
                 "only the middle",
         "fwd": FWD, "rev": REV, "e": 0.1,
         "read": GT(4) + FWD + mid + REV[:6],
         "expect": {"untrimmed": False, "trimmed": mid}},
        {"name": "linked_fwd_missing",
         "desc": "REV present, FWD absent -> untrimmed (both halves of "
                 "a linked -g adapter are required)",
         "fwd": FWD, "rev": REV, "e": 0.1,
         "read": GT(4) + mid + REV + GT(4),
         "expect": {"untrimmed": True}},
        {"name": "linked_fwd_one_error",
         "desc": "FWD with 1 mismatch (budget 1), REV exact -> trimmed",
         "fwd": FWD, "rev": REV, "e": 0.1,
         "read": GT(4) + plant_mismatches(FWD, [5]) + mid + REV + GT(4),
         "expect": {"untrimmed": False, "trimmed": mid}},
    ])

    # ---- family I (round 3): fwd/rc tie semantics + linked edges
    # read = A10 + pad + revcomp(A10): forward scores 10 via the planted
    # A10; revcomp(read) = A10 + revcomp(pad) + revcomp(A10) also scores
    # exactly 10 (revcomp segments contain G's which never match the
    # {A,C,T} adapters, so neither orientation can exceed 10). --rc
    # requires STRICTLY more matches -> forward wins the tie.
    case("rc_equal_matches_forward_wins",
         "forward and rc orientations both score a full exact 10-match "
         "occurrence: tie -> forward kept (--rc needs strictly more)",
         "front", [["A1", A10]], A10 + GT(6) + revcomp(A10),
         {"adapter": "A1", "rc": False,
          "trimmed": GT(6) + revcomp(A10)}, rc=True)
    # forward partial (6nt exact suffix) vs rc full exact occurrence:
    # rc has 10 > 6 matches -> rc wins even though forward matched.
    case("rc_more_matches_beats_forward_partial",
         "forward holds a 6nt exact adapter suffix, rc orientation a "
         "full exact occurrence: 10 > 6 -> rc wins",
         "front", [["A1", A10]],
         revcomp(GT(3) + A10 + GT(9)) + A10[-6:] + GT(2),
         {"adapter": "A1", "rc": True, "trimmed": GT(9)}, rc=True)

    LINKED.extend([
        {"name": "linked_rev_below_min_overlap",
         "desc": "REV occurs only as its first 2nt at the read end "
                 "(< min_overlap 3) -> linked match fails, untrimmed",
         "fwd": FWD, "rev": REV, "e": 0.1,
         "read": GT(4) + FWD + mid + REV[:2],
         "expect": {"untrimmed": True}},
        {"name": "linked_rev_before_fwd",
         "desc": "both adapters exact but REV precedes FWD: the FRONT "
                 "half consumes through FWD, no REV remains -> "
                 "untrimmed (linked order is mandatory)",
         "fwd": FWD, "rev": REV, "e": 0.1,
         "read": GT(4) + REV + GT(5) + FWD + GT(6),
         "expect": {"untrimmed": True}},
    ])

    # ---- cross-check every constructed expectation with the mini DP
    for c in CASES:
        name, is_rc, trimmed = mini_assign(
            c["adapters"], c["read"], c["mode"], c["e"],
            c["min_overlap"], c["rc"], c.get("read_wildcards", False))
        exp = c["expect"]
        assert (name, is_rc, trimmed) == (exp["adapter"], exp["rc"],
                                          exp["trimmed"]), (
            c["name"], (name, is_rc, trimmed), exp)
    for c in LINKED:
        # linked -g FWD...REV: FRONT-locate FWD, then BACK-locate REV in
        # the remainder; both required (reference 04_cleaning_primers.sh
        # round-1 semantics)
        f = mini_locate(c["fwd"], c["read"], c["e"], FRONT_FLAGS, 3)
        got_untrimmed, got = True, None
        if f is not None:
            rest = c["read"][f[3]:]
            r = mini_locate(c["rev"], rest, c["e"], BACK_FLAGS, 3)
            if r is not None:
                got_untrimmed, got = False, rest[:r[2]]
        exp = c["expect"]
        assert got_untrimmed == exp["untrimmed"], (c["name"], got)
        if not got_untrimmed:
            assert got == exp["trimmed"], (c["name"], got, exp)

    data = {
        "_comment": [
            "GENERATED by gen_cutadapt_grid.py — do not edit by hand.",
            "Expectations are derived from the CONSTRUCTION of each",
            "case (planted occurrence, planted G-mismatches, documented",
            "cutadapt acceptance/selection rules), never from this",
            "repo's aligners. See the generator docstring for the",
            "invariants that make each expectation forced.",
        ],
        "cases": CASES,
        "linked_cases": LINKED,
    }
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote {OUT}: {len(CASES)} cases + {len(LINKED)} linked")


if __name__ == "__main__":
    main()
