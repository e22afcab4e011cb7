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
    # pychopper -p) is covered by test_keep_primers_preserves_indices
    return Reorienter(PRIMERS, CONFIG, ReorientConfig(keep_primers=False))


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
    sp5, sp27 = profiles
    ins1 = "".join(rng.choice(list("ACGT"), size=150))
    ins2 = "".join(rng.choice(list("ACGT"), size=170))
    unit1 = concretize(rng, sp5) + ins1 + encode.revcomp(concretize(rng, sp27))
    unit2 = concretize(rng, sp5) + ins2 + encode.revcomp(concretize(rng, sp27))
    seq = unit1 + unit2
    res = reorienter.run([Record("fu", "fu", seq, q(len(seq)))])
    assert res.stats["pass"] == 1
    assert res.stats["rescued_segments"] == 1
    assert res.passed[0].seq == ins1
    assert res.rescued[0].seq == ins2


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
    r = Reorienter(PRIMERS, CONFIG, ReorientConfig())
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
