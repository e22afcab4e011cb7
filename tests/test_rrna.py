"""rRNA extraction tests: profile build + Viterbi + exemplar interval
extraction on synthetic 'genes' planted in contigs."""
import numpy as np
import pytest

from tpu_orc.io import encode
from tpu_orc.io.fastq import Record
from tpu_orc.rrna.hmm import profile_from_seqs, viterbi_scan, parse_hmmer3
from tpu_orc.rrna.extract import (extract_rrna, find_gene_exemplar,
                                  find_gene_profile)


@pytest.fixture(scope="module")
def gene(rng=None):
    r = np.random.default_rng(11)
    return "".join(r.choice(list("ACGT"), size=400))


def mutated(rng, s, frac):
    s = list(s)
    for pos in rng.choice(len(s), int(frac * len(s)), replace=False):
        s[int(pos)] = str(rng.choice(list("ACGT")))
    return "".join(s)


def plant(rng, gene_seq, flank=150):
    left = "".join(rng.choice(list("ACGT"), size=flank))
    right = "".join(rng.choice(list("ACGT"), size=flank))
    return left + gene_seq + right, flank


def test_profile_from_seqs_scores_gene(rng, gene):
    examples = [encode.encode_codes(mutated(rng, gene, 0.03))
                for _ in range(6)]
    prof = profile_from_seqs(examples, "18S")
    contig, off = plant(rng, mutated(rng, gene, 0.05))
    junk = "".join(rng.choice(list("ACGT"), size=len(contig)))
    packed = np.full((2, 1024), 4, np.uint8)
    for i, s in enumerate((contig, junk)):
        c = encode.encode_codes(s)
        packed[i, :len(c)] = c
    lens = np.array([len(contig), len(junk)], np.int32)
    score, end, node = viterbi_scan(prof, packed, lens)
    assert score[0] > 2 * score[1], (score[0], score[1])
    assert abs(int(end[0]) - (off + 400)) < 25


def test_exemplar_extraction_interval(rng, gene):
    contig, off = plant(rng, mutated(rng, gene, 0.08))
    recs = [Record("c1", "c1", contig)]
    hits = find_gene_exemplar(recs, [gene], "18S", min_identity=0.7)
    assert len(hits) == 1
    h = hits[0]
    assert abs(h.start - off) < 20 and abs(h.end - (off + 400)) < 20
    assert h.strand == "+"


def test_exemplar_minus_strand(rng, gene):
    contig, off = plant(rng, mutated(rng, gene, 0.05))
    recs = [Record("c2", "c2", encode.revcomp(contig))]
    hits = find_gene_exemplar(recs, [gene], "18S", min_identity=0.7)
    assert len(hits) == 1 and hits[0].strand == "-"
    # extracted seq is + oriented: compare against the planted gene
    d = sum(a != b for a, b in zip(hits[0].seq, gene))
    assert len(hits[0].seq) > 300


def test_exemplar_no_hit(rng, gene):
    junk = "".join(rng.choice(list("ACGT"), size=700))
    hits = find_gene_exemplar([Record("j", "j", junk)], [gene], "18S",
                              min_identity=0.8)
    assert hits == []


def test_profile_mode_interval(rng, gene):
    examples = [encode.encode_codes(mutated(rng, gene, 0.03))
                for _ in range(6)]
    prof = profile_from_seqs(examples, "18S")
    contig, off = plant(rng, mutated(rng, gene, 0.05))
    hits = find_gene_profile([Record("c3", "c3", contig)], prof, "18S",
                             min_score=50.0)
    assert len(hits) == 1
    h = hits[0]
    assert abs(h.start - off) < 30 and abs(h.end - (off + 400)) < 30


def test_extract_rrna_layout(tmp_path, rng, gene):
    gene28 = "".join(np.random.default_rng(12).choice(list("ACGT"),
                                                      size=500))
    contig = ("".join(rng.choice(list("ACGT"), size=100))
              + mutated(rng, gene, 0.04)
              + "".join(rng.choice(list("ACGT"), size=80))
              + mutated(rng, gene28, 0.04)
              + "".join(rng.choice(list("ACGT"), size=60)))
    recs = [Record("ct", "ct", contig)]
    out = extract_rrna(recs, str(tmp_path), "BC01",
                       exemplars_18s=[gene], exemplars_28s=[gene28])
    assert len(out["18S"]) == 1 and len(out["28S"]) == 1
    assert (tmp_path / "BC01_18S.fa").exists()
    assert (tmp_path / "BC01_28S.fa").exists()
    txt = (tmp_path / "BC01_18S.fa").read_text()
    assert txt.startswith(">18S_rRNA::ct:")


def test_hmmer3_parser_roundtrip(tmp_path):
    """Minimal HMMER3/f DNA model parses into the right shapes."""
    hmm_text = """HMMER3/f [3.1b2 | February 2015]
NAME  test18S
LENG  3
ALPH  DNA
HMM          A        C        G        T
            m->m     m->i     m->d     i->m     i->i     d->m     d->d
  COMPO   1.38629  1.38629  1.38629  1.38629
          1.38629  1.38629  1.38629  1.38629
          0.01005  5.29832  5.29832  0.61958  0.77255  0.00000        *
      1   0.10536  3.21888  3.21888  3.21888      1 - - - -
          1.38629  1.38629  1.38629  1.38629
          0.01005  5.29832  5.29832  0.61958  0.77255  0.48121  0.95935
      2   3.21888  0.10536  3.21888  3.21888      2 - - - -
          1.38629  1.38629  1.38629  1.38629
          0.01005  5.29832  5.29832  0.61958  0.77255  0.48121  0.95935
      3   3.21888  3.21888  0.10536  3.21888      3 - - - -
          1.38629  1.38629  1.38629  1.38629
          0.01005  5.29832  5.29832  0.61958  0.77255  0.48121  0.95935
//
"""
    p = tmp_path / "t.hmm"
    p.write_text(hmm_text)
    models = parse_hmmer3(str(p))
    assert len(models) == 1
    m = models[0]
    assert m.name == "test18S" and m.K == 3
    # match state 1 strongly prefers A
    assert np.argmax(m.match_scores[0]) == 0
    assert np.argmax(m.match_scores[1]) == 1
