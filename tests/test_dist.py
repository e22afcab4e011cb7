"""Multi-chip sharded steps on the virtual 8-device CPU mesh.

Validates the dist layer (SURVEY.md §2.4 mapping: data parallelism over
reads, pair-stripe parallelism over the all-vs-all matrix, psum-merged
histograms) against the single-chip paths, which are themselves
oracle-parity-tested.
"""
import jax
import numpy as np
import pytest

from tpu_orc.demux.adapters import AdapterBank
from tpu_orc.demux.fused import FusedDemux
from tpu_orc.dist.sharded import (make_mesh, sharded_demux_step,
                                  sharded_dual_demux_step,
                                  sharded_pairwise_step)
from tpu_orc.io import encode

REF = "/root/reference/adapters_primers"


@pytest.fixture(scope="module")
def banks():
    sp5 = AdapterBank.from_fasta(f"{REF}/M13_amplicon_indices_forward.fa",
                                 0.1)
    sp27 = AdapterBank.from_fasta(
        f"{REF}/M13_amplicon_indices_reverse_rc.fa", 0.1)
    return sp5, sp27


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh((4, 2))


def _reads(rng, sp5, sp27, B=32, L=256):
    seqs = []
    for i in range(B):
        ins = "".join(rng.choice(list("ACGT"),
                                 size=int(rng.integers(60, 120))))
        s = sp5.seqs[i % 12] + ins + sp27.seqs[i % 8]
        if i % 2:
            s = encode.revcomp(s)
        if i % 7 == 0:
            s = ins  # adapterless -> unknown
        seqs.append(s)
    return encode.pack_batch(seqs, max_len=L, pad_multiple=1,
                             encoder=encode.encode_read_masks, pad_value=0)


def test_sharded_dual_demux_matches_single_chip(banks, mesh, rng):
    sp5, sp27 = banks
    masks, lens = _reads(rng, sp5, sp27)
    idx1, rc1, qe1, idx2, rc2, qs2, h1, h2 = sharded_dual_demux_step(
        mesh, sp5, sp27, masks, lens)
    want = FusedDemux(sp5, sp27).decide(masks, lens)
    np.testing.assert_array_equal(np.asarray(idx1), want.idx1)
    np.testing.assert_array_equal(np.asarray(rc1), want.rc1)
    np.testing.assert_array_equal(np.asarray(qe1), want.qe1)
    np.testing.assert_array_equal(np.asarray(idx2), want.idx2)
    np.testing.assert_array_equal(np.asarray(rc2), want.rc2)
    np.testing.assert_array_equal(np.asarray(qs2), want.qs2)
    # psum histograms cover every read exactly once
    assert int(np.asarray(h1).sum()) == masks.shape[0]
    assert int(np.asarray(h2).sum()) == masks.shape[0]
    assert int(np.asarray(h1)[0]) == int((want.idx1 < 0).sum())


def test_sharded_single_round_histogram(banks, mesh, rng):
    sp5, sp27 = banks
    masks, lens = _reads(rng, sp5, sp27)
    idx, m, qs, qe, hist = sharded_demux_step(mesh, sp5, masks, lens)
    assert int(np.asarray(hist).sum()) == masks.shape[0]
    # histogram agrees with the per-read assignments
    idx = np.asarray(idx)
    for a in range(-1, len(sp5)):
        assert int(np.asarray(hist)[a + 1]) == int((idx == a).sum())


def test_sharded_pairwise_matches_myers(banks, mesh, rng):
    from tpu_orc.align import myers
    seqs = []
    base = "".join(rng.choice(list("ACGT"), size=200))
    for _ in range(16):
        s = list(base)
        for _ in range(10):
            s[int(rng.integers(0, len(s)))] = str(rng.choice(list("ACGT")))
        seqs.append(encode.encode_codes("".join(s)))
    pat = np.full((16, 256), 4, np.uint8)
    lens = np.zeros(16, np.int32)
    for i, c in enumerate(seqs):
        pat[i, :len(c)] = c
        lens[i] = len(c)
    D = np.asarray(sharded_pairwise_step(mesh, pat, lens, pat, lens))
    want = np.asarray(myers.distances(pat, lens, pat, lens))
    np.testing.assert_array_equal(D, want)
