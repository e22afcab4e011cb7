"""Pychopper-equivalent reorientation tests against the real M13 profiles."""
import numpy as np
import pytest

from tpu_orc.demux.reorient import (Reorienter, ReorientConfig,
                                    parse_orientation_config)
from tpu_orc.io import encode
from tpu_orc.io.fastq import Record, read_fasta

REF = "/root/reference/adapters_primers"
PRIMERS = f"{REF}/M13_seqs_for_pychopper.fa"
CONFIG = "+:SP5,-SP27|-:SP27,-SP5"


@pytest.fixture(scope="module")
def reorienter():
    # insert-recovery tests use keep_primers=False; the default (True,
    # pychopper -p) is covered by test_keep_primers_preserves_indices.
    # q pinned (0.75 -> budget floor(0.25*58)=14) so single-read unit
    # tests don't depend on the autotune sample; autotune has its own
    # test below.
    return Reorienter(PRIMERS, CONFIG,
                      ReorientConfig(keep_primers=False, q=0.75))


@pytest.fixture(scope="module")
def profiles():
    recs = {r.id: r.seq for r in read_fasta(PRIMERS)}
    return recs["SP5"], recs["SP27"]


def concretize(rng, profile):
    """Replace the N17 variable segment with concrete bases."""
    return "".join(str(rng.choice(list("ACGT"))) if c == "N" else c
                   for c in profile)


def q(n, ch="I"):
    return ch * n


def test_config_parse():
    assert parse_orientation_config(CONFIG) == [
        ("+", ["SP5", "-SP27"]), ("-", ["SP27", "-SP5"])]


def test_forward_read_trimmed(reorienter, profiles, rng):
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=200))
    seq = concretize(rng, sp5) + insert + encode.revcomp(concretize(rng, sp27))
    res = reorienter.run([Record("f1", "f1", seq, q(len(seq)))])
    assert res.stats["pass"] == 1
    assert res.passed[0].seq == insert


def test_reverse_read_flipped(reorienter, profiles, rng):
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=180))
    fwd = concretize(rng, sp5) + insert + encode.revcomp(concretize(rng, sp27))
    seq = encode.revcomp(fwd)
    res = reorienter.run([Record("r1", "r1", seq, q(len(seq)))])
    assert res.stats["pass"] == 1
    assert res.passed[0].seq == insert  # re-oriented to + strand


def test_low_quality_to_unclass(reorienter, profiles, rng):
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=150))
    seq = concretize(rng, sp5) + insert + encode.revcomp(concretize(rng, sp27))
    res = reorienter.run([Record("lq", "lq", seq, q(len(seq), "$"))])  # Q3
    assert res.stats["low_q"] == 1 and not res.passed


def test_no_primers_unclass(reorienter, rng):
    seq = "".join(rng.choice(list("ACGT"), size=400))
    res = reorienter.run([Record("u1", "u1", seq, q(len(seq)))])
    assert res.stats["unclass"] == 1


def test_fused_read_rescue(reorienter, profiles, rng):
    """Pychopper -w semantics (reorient spec rule 7): a FUSED read (2+
    valid segments) contributes ALL its segments to the rescued file and
    NONE to pass — pass is reserved for reads classified as a single
    full-length segment."""
    sp5, sp27 = profiles
    ins1 = "".join(rng.choice(list("ACGT"), size=150))
    ins2 = "".join(rng.choice(list("ACGT"), size=170))
    unit1 = concretize(rng, sp5) + ins1 + encode.revcomp(concretize(rng, sp27))
    unit2 = concretize(rng, sp5) + ins2 + encode.revcomp(concretize(rng, sp27))
    seq = unit1 + unit2
    res = reorienter.run([Record("fu", "fu", seq, q(len(seq)))])
    assert res.stats["pass"] == 0
    assert res.stats["fused_reads"] == 1
    assert res.stats["rescued_segments"] == 2
    assert res.rescued[0].seq == ins1
    assert res.rescued[1].seq == ins2


def test_short_segment_binned(reorienter, profiles, rng):
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=20))  # < min_len 50
    seq = concretize(rng, sp5) + insert + encode.revcomp(concretize(rng, sp27))
    res = reorienter.run([Record("s1", "s1", seq, q(len(seq)))])
    assert res.stats["short"] == 1 and not res.passed


def test_noisy_primers_still_classified(reorienter, profiles, rng):
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=250))

    def mutate(s, k):
        s = list(s)
        for pos in rng.choice(len(s), k, replace=False):
            s[int(pos)] = str(rng.choice(list("ACGT")))
        return "".join(s)

    seq = (mutate(concretize(rng, sp5), 6) + insert
           + mutate(encode.revcomp(concretize(rng, sp27)), 5))
    res = reorienter.run([Record("n1", "n1", seq, q(len(seq)))])
    assert res.stats["pass"] == 1


def test_keep_primers_preserves_indices(profiles):
    """Default mode (-p): indices survive for stage-02 demux."""
    rng = np.random.default_rng(44)  # hermetic: independent of test order
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=120))
    c5 = concretize(rng, sp5)
    c27rc = encode.revcomp(concretize(rng, sp27))
    seq = "GGTTGG" + c5 + insert + c27rc + "CCAACC"
    r = Reorienter(PRIMERS, CONFIG, ReorientConfig(q=0.75))
    res = r.run([Record("k1", "k1", seq, "I" * len(seq))])
    assert res.stats["pass"] == 1
    out = res.passed[0].seq
    assert c5 in out and c27rc in out         # primers kept
    assert "GGTTGG" not in out and "CCAACC" not in out  # junk trimmed


def test_primers_out_of_order_unclassified(reorienter, profiles, rng):
    """3' primer located BEFORE the 5' primer (a chimera artifact):
    pychopper requires the configured primer order along the read, so
    the read is unclassified rather than trimmed to a negative span."""
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=120))
    # -SP27 region first, then +SP5: matches neither '+' nor '-' layout
    seq = encode.revcomp(concretize(rng, sp27)) + insert \
        + concretize(rng, sp5)
    res = reorienter.run([Record("x", "x", seq, q(len(seq)))])
    assert res.stats["unclass"] == 1 and res.stats["pass"] == 0


# ---------------------------------------------------------------------------
# Adversarial vector corpus (VERDICT r2 #6): expectations derived from
# the reorient spec rules (module docstring), constructed independently
# of the implementation — planted primers with KNOWN edit distances
# against the budget floor((1-q)*58).
# ---------------------------------------------------------------------------

def test_vector_truncated_primer_rejected(profiles, rng):
    """SP5 truncated to its last 30 bases: the INFIX scan must align the
    FULL 58nt primer, so 28 missing bases = 28 edits > budget 14
    (q=0.75) -> unclassified."""
    sp5, sp27 = profiles
    r = Reorienter(PRIMERS, CONFIG,
                   ReorientConfig(keep_primers=False, q=0.75))
    insert = "".join(rng.choice(list("ACGT"), size=150))
    seq = concretize(rng, sp5)[28:] + insert \
        + encode.revcomp(concretize(rng, sp27))
    res = r.run([Record("t", "t", seq, q(len(seq)))])
    assert res.stats["unclass"] == 1 and res.stats["pass"] == 0


def test_vector_truncated_primer_within_budget(profiles, rng):
    """SP5 truncated by 10 bases: 10 edits <= budget 14 -> classified;
    the emitted insert is exact."""
    sp5, sp27 = profiles
    r = Reorienter(PRIMERS, CONFIG,
                   ReorientConfig(keep_primers=False, q=0.75))
    insert = "".join(rng.choice(list("ACGT"), size=150))
    seq = concretize(rng, sp5)[10:] + insert \
        + encode.revcomp(concretize(rng, sp27))
    res = r.run([Record("t", "t", seq, q(len(seq)))])
    assert res.stats["pass"] == 1
    assert res.passed[0].seq == insert


def test_vector_mid_read_adapter_only_unclass(profiles, rng):
    """A single SP5 in the middle with no SP27 anywhere: no orientation
    config matches (both require a 5' AND a 3' primer) -> unclass."""
    sp5, _ = profiles
    r = Reorienter(PRIMERS, CONFIG,
                   ReorientConfig(keep_primers=False, q=0.75))
    left = "".join(rng.choice(list("ACGT"), size=120))
    right = "".join(rng.choice(list("ACGT"), size=130))
    seq = left + concretize(rng, sp5) + right
    res = r.run([Record("m", "m", seq, q(len(seq)))])
    assert res.stats["unclass"] == 1


def test_vector_q_boundary(profiles, rng):
    """Mean-Q exactly at the threshold passes (>= Q, spec rule 6);
    one point below fails. Phred '+' = Q10, '*' = Q9."""
    sp5, sp27 = profiles
    r = Reorienter(PRIMERS, CONFIG,
                   ReorientConfig(keep_primers=False, q=0.75, qmin=10.0))
    insert = "".join(rng.choice(list("ACGT"), size=120))
    seq = concretize(rng, sp5) + insert \
        + encode.revcomp(concretize(rng, sp27))
    at = Record("at", "at", seq, "+" * len(seq))      # mean Q = 10
    below = Record("below", "below", seq, "*" * len(seq))  # mean Q = 9
    res = r.run([at, below])
    assert res.stats["pass"] == 1
    assert res.stats["low_q"] == 1
    assert res.passed[0].id == "at"


def test_vector_triple_fused(profiles, rng):
    """Three concatenated full-length units: all three segments rescued,
    none passed (spec rule 7)."""
    sp5, sp27 = profiles
    r = Reorienter(PRIMERS, CONFIG,
                   ReorientConfig(keep_primers=False, q=0.75))
    ins = ["".join(rng.choice(list("ACGT"), size=100 + 10 * k))
           for k in range(3)]
    units = [concretize(rng, sp5) + i
             + encode.revcomp(concretize(rng, sp27)) for i in ins]
    seq = "".join(units)
    res = r.run([Record("f3", "f3", seq, q(len(seq)))])
    assert res.stats["pass"] == 0
    assert res.stats["fused_reads"] == 1
    assert res.stats["rescued_segments"] == 3
    assert [s.seq for s in res.rescued] == ins


def test_autotune_picks_lenient_q_on_noisy_reads(profiles, rng):
    """Autotune (spec rule 3): on reads whose primers carry ~8 edits,
    q=0.95 (budget 2) classifies nothing and q<=0.85 (budget >=8)
    classifies everything — the tuned q must come back lenient enough
    to classify the sample."""
    sp5, sp27 = profiles

    def mutate(s, k):
        s = list(s)
        for pos in rng.choice(len(s), k, replace=False):
            s[int(pos)] = "G" if s[int(pos)] != "G" else "A"
        return "".join(s)

    recs = []
    for i in range(20):
        insert = "".join(rng.choice(list("ACGT"), size=150))
        seq = (mutate(concretize(rng, sp5), 8) + insert
               + mutate(encode.revcomp(concretize(rng, sp27)), 8))
        recs.append(Record(f"n{i}", f"n{i}", seq, q(len(seq))))
    r = Reorienter(PRIMERS, CONFIG, ReorientConfig(keep_primers=False))
    res = r.run(recs)
    assert r.q is not None and r.q <= 0.87
    assert res.stats["pass"] == 20
    assert res.stats["autotuned_q_x100"] == int(round(r.q * 100))


def test_orientation_vote_both_strands(reorienter, profiles, rng):
    """A batch mixing + and - reads of the same insert comes out
    uniformly oriented: the - read's emitted segment equals the + read's
    (the pychopper contract the downstream demux depends on)."""
    sp5, sp27 = profiles
    insert = "".join(rng.choice(list("ACGT"), size=150))
    plus = concretize(rng, sp5) + insert + encode.revcomp(
        concretize(rng, sp27))
    minus = encode.revcomp(plus)
    res = reorienter.run([Record("p", "p", plus, q(len(plus))),
                          Record("m", "m", minus, q(len(minus)))])
    assert res.stats["pass"] == 2
    segs = {r.id: r.seq for r in res.passed}
    assert segs["p"] == segs["m"] == insert


def test_classify_batch_matches_per_read_reference(rng):
    """_classify_batch (vectorized config matching) against a plain
    per-read reference implementation of spec rule 4, on random hit
    tables with and without autotune budgets."""
    r = Reorienter(PRIMERS, CONFIG, ReorientConfig(q=0.75))
    A = len(r.names)
    B = 400
    hits = {
        "valid": rng.integers(0, 2, size=(B, A)).astype(np.int32),
        "errors": rng.integers(0, 15, size=(B, A)).astype(np.int32),
        "querystart": rng.integers(0, 200, size=(B, A)).astype(np.int32),
        "querystop": rng.integers(0, 200, size=(B, A)).astype(np.int32),
    }

    def ref_classify(b, budget=None):
        found = []
        for k, (sign, segs) in enumerate(r.configs):
            i5, i3 = r.name_idx[segs[0]], r.name_idx[segs[1]]
            if not (hits["valid"][b, i5] and hits["valid"][b, i3]):
                continue
            if budget is not None and (hits["errors"][b, i5] > budget[i5]
                                       or hits["errors"][b, i3] > budget[i3]):
                continue
            end5 = int(hits["querystop"][b, i5])
            start3 = int(hits["querystart"][b, i3])
            if end5 <= start3:
                if r.cfg.keep_primers:
                    found.append((k, int(hits["querystart"][b, i5]),
                                  int(hits["querystop"][b, i3]),
                                  int(hits["querystop"][b, i3])))
                else:
                    found.append((k, end5, start3,
                                  int(hits["querystop"][b, i3])))
        return (found[0] if found else None), len(found)

    for budget in (None, rng.integers(0, 12, size=A).astype(np.int64)):
        for keep in (True, False):
            r.cfg.keep_primers = keep
            cfg_idx, s0, s1, rest, ncfg = r._classify_batch(
                hits, budget=budget)
            for b in range(B):
                want, n_ok = ref_classify(b, budget)
                assert int(ncfg[b]) == n_ok, b
                if want is None:
                    assert cfg_idx[b] == -1, b
                else:
                    assert (int(cfg_idx[b]), int(s0[b]), int(s1[b]),
                            int(rest[b])) == want, b


# ---------------------------------------------------------------------------
# Spec rule 8 scheduler property tests (VERDICT r3 next#4): all-hits
# interval scheduling replacing the r3 best-hit + remainder re-scan.
# ---------------------------------------------------------------------------

def test_scheduler_equals_classify_on_single_segment_tables(rng):
    """EQUIVALENCE property behind the fast path: on hit tables with at
    most one hit per primer and exactly one matching config (the
    fast-path gate), the rule-8 scheduler selects exactly the segment
    the vectorized classify picks."""
    r = Reorienter(PRIMERS, CONFIG, ReorientConfig(q=0.75))
    A = len(r.names)
    B = 300
    hits = {
        "valid": rng.integers(0, 2, size=(B, A)).astype(np.int32),
        "errors": rng.integers(0, 15, size=(B, A)).astype(np.int32),
        "querystart": rng.integers(0, 300, size=(B, A)).astype(np.int32),
        "querystop": rng.integers(0, 300, size=(B, A)).astype(np.int32),
        "matches": rng.integers(30, 59, size=(B, A)).astype(np.int32),
    }
    hits["querystop"] = hits["querystart"] + 1 + hits["querystop"] % 60
    for keep in (True, False):
        r.cfg.keep_primers = keep
        cfg_idx, s0, s1, _, ncfg = r._classify_batch(hits)
        n_checked = 0
        for b in range(B):
            if int(ncfg[b]) != 1:
                continue  # fast path requires exactly one config match
            sched = r._schedule(r._hits_from_row(hits, b))
            assert len(sched) >= 1, b
            k, a0, a1 = sched[0]
            assert (k, a0, a1) == (int(cfg_idx[b]), int(s0[b]),
                                   int(s1[b])), b
            n_checked += 1
        assert n_checked > 20  # the property actually exercised


def test_run_fast_path_equals_forced_scheduler(profiles, rng):
    """End-to-end equivalence: the same clean batch routed through the
    fast path (default) and through the full enumerate+schedule path
    (FORCE_SCHEDULE routes every read with hits into the scheduler)
    produces identical outputs."""
    sp5, sp27 = profiles
    recs = []
    for i in range(40):
        insert = "".join(rng.choice(list("ACGT"), size=150 + 3 * i))
        seq = concretize(rng, sp5) + insert \
            + encode.revcomp(concretize(rng, sp27))
        if i % 3 == 0:
            seq = encode.revcomp(seq)
        recs.append(Record(f"c{i}", f"c{i}", seq, q(len(seq))))
    fast = Reorienter(PRIMERS, CONFIG,
                      ReorientConfig(keep_primers=False, q=0.75))
    res_fast = fast.run(recs)
    slow = Reorienter(PRIMERS, CONFIG,
                      ReorientConfig(keep_primers=False, q=0.75))
    slow.FORCE_SCHEDULE = True  # force full enumeration + scheduling
    res_slow = slow.run(recs)
    assert res_slow.stats["scheduled_reads"] == 40
    assert res_fast.stats["pass"] == res_slow.stats["pass"] == 40
    assert ([(x.id, x.seq, x.qual) for x in res_fast.passed]
            == [(x.id, x.seq, x.qual) for x in res_slow.passed])


def test_scheduler_recovers_out_of_order_fused(profiles):
    """The r3 deviation's failure case, now fixed: a fused read whose
    BEST hit per primer pairs out of order (best SP5 in unit 2, best
    -SP27 in unit 1). Best-hit classification alone finds no ordered
    pair and would drop the read as unclassified; all-hits scheduling
    recovers both segments."""
    # hermetic rng: the session rng's state depends on test order, and
    # a noisy primer's alignment boundary wobbles with the draw
    rng = np.random.default_rng(20260820)
    sp5, sp27 = profiles

    def mutate(s, k):
        s = list(s)
        for pos in rng.choice(len(s), k, replace=False):
            s[int(pos)] = "G" if s[int(pos)] != "G" else "A"
        return "".join(s)

    ins1 = "".join(rng.choice(list("ACGT"), size=150))
    ins2 = "".join(rng.choice(list("ACGT"), size=170))
    # unit 1: noisy SP5 (6 subs) + exact -SP27; unit 2: exact SP5 +
    # noisy -SP27 -> best-per-primer hits are (SP5 of unit 2, -SP27 of
    # unit 1), which are OUT OF ORDER along the read.
    unit1 = (mutate(concretize(rng, sp5), 6) + ins1
             + encode.revcomp(concretize(rng, sp27)))
    unit2 = (concretize(rng, sp5) + ins2
             + mutate(encode.revcomp(concretize(rng, sp27)), 6))
    seq = unit1 + unit2
    r = Reorienter(PRIMERS, CONFIG,
                   ReorientConfig(keep_primers=False, q=0.75))
    res = r.run([Record("oo", "oo", seq, q(len(seq)))])
    assert res.stats["scheduled_reads"] == 1
    assert res.stats["fused_reads"] == 1
    assert res.stats["rescued_segments"] == 2

    def matches_with_wobble(got, want):
        # a 6-sub primer's optimal alignment can shift the segment
        # boundary by a base or two — the property under test is the
        # SEGMENTATION, not base-exact trim points
        if abs(len(got) - len(want)) > 2:
            return False
        core = want[2:-2]
        return core in got or got[2:-2] in want

    assert matches_with_wobble(res.rescued[0].seq, ins1), \
        (res.rescued[0].seq, ins1)
    assert matches_with_wobble(res.rescued[1].seq, ins2), \
        (res.rescued[1].seq, ins2)


def test_interior_fused_not_emitted_as_chimera(profiles):
    """Code-review regression (r4): a fused read whose per-primer BEST
    hits are the two OUTER primers — unit 1 has exact SP5 + noisy
    -SP27, unit 2 noisy SP5 + exact -SP27 — pairs those outer hits
    into one tidy spanning segment that passes every best-hit gate.
    The pass-2 masked verification scan must surface the shadowed
    interior primers and route the read to the scheduler: the read is
    FUSED (both inserts rescued), never a single chimeric pass read."""
    rng = np.random.default_rng(77)
    sp5, sp27 = profiles

    def mutate(s, k):
        s = list(s)
        for pos in rng.choice(len(s), k, replace=False):
            s[int(pos)] = "G" if s[int(pos)] != "G" else "A"
        return "".join(s)

    for trial in range(4):
        ins1 = "".join(rng.choice(list("ACGT"), size=150))
        ins2 = "".join(rng.choice(list("ACGT"), size=170))
        unit1 = (concretize(rng, sp5) + ins1
                 + mutate(encode.revcomp(concretize(rng, sp27)), 6))
        unit2 = (mutate(concretize(rng, sp5), 6) + ins2
                 + encode.revcomp(concretize(rng, sp27)))
        seq = unit1 + unit2
        r = Reorienter(PRIMERS, CONFIG,
                       ReorientConfig(keep_primers=False, q=0.75))
        res = r.run([Record(f"if{trial}", f"if{trial}", seq,
                            q(len(seq)))])
        assert res.stats["pass"] == 0, f"trial {trial}: chimera passed"
        assert res.stats["fused_reads"] == 1, trial
        assert res.stats["rescued_segments"] == 2, trial

        def wobble(got, want):
            return (abs(len(got) - len(want)) <= 12
                    and (want[12:-12] in got or got[12:-12] in want))

        assert wobble(res.rescued[0].seq, ins1), trial
        assert wobble(res.rescued[1].seq, ins2), trial


def test_fast_path_equals_forced_scheduler_adversarial(profiles):
    """r5 property: the nloc/nacc-gated fast path must produce EXACTLY
    the forced-enumeration outputs on a messy batch — noisy primers,
    fused reads, truncated primers, primer-free junk, '-' strands —
    not just on clean single-segment reads (the existing test).

    Note FORCE_SCHEDULE re-enumerates with masked re-scans, which can
    find MORE acceptable locations than the complete-by-evidence seed
    sets prove exist only when evidence says 'incomplete' — on
    complete reads both paths see the same hit set by construction, so
    any output difference is a routing bug."""
    rng = np.random.default_rng(20260821)
    sp5, sp27 = profiles

    def mutate(s, k):
        s = list(s)
        for pos in rng.choice(len(s), min(k, len(s)), replace=False):
            s[int(pos)] = "G" if s[int(pos)] != "G" else "A"
        return "".join(s)

    recs = []
    for i in range(60):
        kind = i % 6
        ins = "".join(rng.choice(list("ACGT"),
                                 size=int(rng.integers(80, 300))))
        p5 = concretize(rng, sp5)
        p27r = encode.revcomp(concretize(rng, sp27))
        if kind == 0:        # clean
            s = p5 + ins + p27r
        elif kind == 1:      # noisy both primers
            s = mutate(p5, 6) + ins + mutate(p27r, 6)
        elif kind == 2:      # fused 2-unit
            ins2 = "".join(rng.choice(list("ACGT"), size=150))
            s = (p5 + ins + mutate(p27r, 5)
                 + mutate(concretize(rng, sp5), 5) + ins2
                 + encode.revcomp(concretize(rng, sp27)))
        elif kind == 3:      # truncated 5' primer (partial at start)
            s = p5[25:] + ins + p27r
        elif kind == 4:      # junk, no primers
            s = ins
        else:                # 5' only, no 3' primer
            s = p5 + ins
        if i % 4 == 1:
            s = encode.revcomp(s)
        recs.append(Record(f"a{i}", f"a{i}", s, q(len(s))))

    fast = Reorienter(PRIMERS, CONFIG, ReorientConfig(q=0.75))
    res_fast = fast.run(recs)
    forced = Reorienter(PRIMERS, CONFIG, ReorientConfig(q=0.75))
    forced.FORCE_SCHEDULE = True
    res_forced = forced.run(recs)

    def sig(res):
        return ([(x.id, x.seq, x.qual) for x in res.passed],
                [(x.id, x.seq, x.qual) for x in res.rescued],
                sorted(x.id for x in res.unclass),
                sorted(x.id for x in res.short))

    f, g = sig(res_fast), sig(res_forced)
    assert f[0] == g[0], "pass outputs diverge"
    assert f[1] == g[1], "rescued outputs diverge"
    assert f[2] == g[2], "unclass sets diverge"
    assert f[3] == g[3], "short sets diverge"
