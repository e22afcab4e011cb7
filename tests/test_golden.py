"""Frozen golden-output regression: the demux bins and cluster result on
tests/fixtures/golden_reads.fastq must stay byte-stable across rounds.

Regenerate fixtures ONLY for an intentional behavior change (document it
in the commit): the generator script lives in the repo history (see the
commit adding this file).
"""
import json
import os

import pytest

from tpu_orc.cluster.engine import AmpliconSorter, SorterConfig
from tpu_orc.demux.adapters import AdapterBank
from tpu_orc.demux.demux import assign_reads, bin_reads, dual_round_demux
from tpu_orc.io.fastq import read_records

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
REF = "/root/reference/adapters_primers"


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(FIX, "golden_expected.json")) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def reads():
    return list(read_records(os.path.join(FIX, "golden_reads.fastq")))


def test_golden_demux_bins(golden, reads):
    sp5 = AdapterBank.from_fasta(f"{REF}/M13_amplicon_indices_forward.fa",
                                 0.1)
    sp27 = AdapterBank.from_fasta(
        f"{REF}/M13_amplicon_indices_reverse_rc.fa", 0.1)
    rep = dual_round_demux(reads, sp5, sp27, "fx", "/tmp/fx_regress",
                           write=False)
    assert rep["final_bins"] == golden["demux_bins"]


def test_golden_cluster(golden, reads):
    sp5 = AdapterBank.from_fasta(f"{REF}/M13_amplicon_indices_forward.fa",
                                 0.1)
    sp27 = AdapterBank.from_fasta(
        f"{REF}/M13_amplicon_indices_reverse_rc.fa", 0.1)
    r1 = assign_reads(reads, sp5, "front")
    b1 = bin_reads(r1)
    sp27_name, sp5_name = golden["cluster_bin"].rsplit("_SP5_", 1)
    sp5_name = "SP5_" + sp5_name
    r2 = assign_reads(b1[sp5_name], sp27, "back")
    b2 = bin_reads(r2)
    bin_recs = b2[sp27_name]
    res = AmpliconSorter(SorterConfig(min_length=300, seed=5)).sort_records(
        bin_recs)
    got = [{"members": s.members, "consensus": s.consensus}
           for g in res.species for s in g]
    assert got == golden["cluster_species"]


@pytest.mark.parametrize("name,amp,path", [
    ("coi", "COI", "golden_coi.fastq"),
    ("rrna", "RNA", "golden_rrna.fastq"),
])
def test_golden_run_all_e2e(tmp_path, name, amp, path):
    """Full-pipeline golden regression on BOTH amplicon shapes
    (VERDICT r1 next#10): 450 bp COI (two species) and ~3.7 kb rRNA.
    Byte-compares demux counts, species groups, the consensusfile,
    stage-04 cleaned contigs, and stage-05/05b gene outputs against
    frozen fixtures (generator: fixtures/gen_golden_e2e.py)."""
    from tpu_orc.pipeline.stages import PipelineConfig, run_all

    with open(os.path.join(FIX, "golden_e2e_expected.json")) as fh:
        exp = json.load(fh)[name]
    rep = run_all(os.path.join(FIX, path), str(tmp_path), name, amp,
                  cfg=PipelineConfig())
    assert rep["demux"] == exp["demux_bins"]
    assert rep["barcodes"] == exp["barcodes"]
    (bc,) = rep["barcodes"].keys()
    got = open(tmp_path / "sorted" / bc / "consensusfile.fasta").read()
    assert got == exp["consensusfile"]
    got = open(tmp_path / "primerless" / bc / f"cleaned_{bc}.fasta").read()
    assert got == exp["cleaned"]
    if amp == "COI":
        got = open(tmp_path / "COI_gene" / bc / f"{bc}_COI.fasta").read()
        assert got == exp["coi_gene"]
    else:
        for g in ("18S", "28S"):
            got = open(tmp_path / "rRNA_genes" / f"{bc}_{g}.fa").read()
            assert got == exp[f"rrna_{g}"]
