"""Pallas locate kernel bit-parity vs the Python oracle (interpret mode)."""
import numpy as np
import pytest

from tpu_orc.align import FRONT, BACK
from tpu_orc.align.pallas_locate import INFIX
from tpu_orc.align.oracle import locate
from tpu_orc.align.batched import make_k_table, make_n_prefix
from tpu_orc.align.pallas_locate import locate_pallas
from tpu_orc.io import encode


def run_both(refs, reads, e, flags, min_overlap=3):
    A = len(refs)
    M = max(len(r) for r in refs)
    ref_masks = np.zeros((A, M), dtype=np.uint8)
    ref_lens = np.zeros(A, dtype=np.int32)
    for i, r in enumerate(refs):
        m = encode.encode_ref_masks(r)
        ref_masks[i, :len(m)] = m
        ref_lens[i] = len(m)
    read_masks, read_lens = encode.pack_batch(
        reads, pad_multiple=16, encoder=encode.encode_read_masks,
        pad_value=0)
    res = locate_pallas(ref_masks, ref_lens,
                        make_k_table(e, ref_masks, ref_lens),
                        make_n_prefix(ref_masks),
                        read_masks, read_lens, int(flags), min_overlap,
                        interpret=True)
    mism = []
    for b, read in enumerate(reads):
        for a, ref in enumerate(refs):
            want = locate(ref, read, e, flags, min_overlap)
            got_valid = bool(res.valid[b, a])
            if want is None:
                if got_valid:
                    mism.append((b, a, "want None"))
                continue
            if not got_valid:
                mism.append((b, a, want.astuple(), "got None"))
                continue
            got = (int(res.refstart[b, a]), int(res.refstop[b, a]),
                   int(res.querystart[b, a]), int(res.querystop[b, a]),
                   int(res.matches[b, a]), int(res.errors[b, a]))
            if got != want.astuple():
                mism.append((b, a, want.astuple(), got))
    return mism


@pytest.mark.parametrize("flags", [FRONT, BACK, INFIX],
                         ids=["FRONT", "BACK", "INFIX"])
@pytest.mark.parametrize("e", [0.0, 0.1, 0.2])
def test_pallas_locate_random_parity(flags, e):
    rng = np.random.default_rng(9)
    refs = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(4, 14))))
            for _ in range(5)]
    reads = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(0, 40))))
             for _ in range(10)]
    mism = run_both(refs, reads, e, flags)
    assert not mism, mism[:5]


@pytest.mark.parametrize("flags", [FRONT, BACK], ids=["FRONT", "BACK"])
def test_pallas_locate_real_adapters(flags):
    rng = np.random.default_rng(10)
    from tpu_orc.io.fastq import read_fasta
    REF = "/root/reference/adapters_primers"
    path = (f"{REF}/M13_amplicon_indices_forward.fa" if flags is FRONT
            else f"{REF}/M13_amplicon_indices_reverse_rc.fa")
    refs = [r.seq for r in read_fasta(path)][:4]
    reads = []
    for i in range(8):
        ad = list(refs[i % 4])
        for _ in range(int(rng.integers(0, 5))):
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(0, len(ad)))
            if op == 0:
                ad[pos] = str(rng.choice(list("ACGT")))
            elif op == 1 and len(ad) > 1:
                del ad[pos]
            else:
                ad.insert(pos, str(rng.choice(list("ACGT"))))
        insert = "".join(rng.choice(list("ACGT"), size=80))
        if flags is FRONT:
            reads.append("".join(ad) + insert)
        else:
            reads.append(insert + "".join(ad))
    mism = run_both(refs, reads, 0.1, flags)
    assert not mism, mism[:5]


def test_pallas_locate_iupac_primers():
    rng = np.random.default_rng(11)
    refs = ["TNTCNACNAAYCAYAARGAYATTGG", "ACGTNNNNNACGT"]
    reads = ["".join(rng.choice(list("ACGTN"),
                                size=int(rng.integers(10, 60))))
             for _ in range(8)]
    for flags in (FRONT, BACK, INFIX):
        mism = run_both(refs, reads, 0.2, flags)
        assert not mism, (flags, mism[:5])


def _brute_nloc_nacc(ref, qry, e, min_overlap, flags):
    """Definitional per-column acceptability series (oracle DP, row m)
    -> (#runs of acceptable end columns, #acceptable columns)."""
    from tpu_orc.align.spec import Flag
    refm = encode.encode_ref_masks(ref)
    qm = encode.encode_read_masks(qry)
    m, n = len(refm), len(qm)
    is_n = (refm & 0b1111) == 0b1111
    npref = np.zeros(m + 1, np.int64)
    np.cumsum(is_n, out=npref[1:])
    start_in_ref = bool(flags & Flag.START_WITHIN_SEQ1)
    cost = np.zeros(m + 1, np.int64)
    orig = np.zeros(m + 1, np.int64)
    for i in range(1, m + 1):
        cost[i], orig[i] = (0, -i) if start_in_ref else (i, 0)

    def ok(c, og):
        rs = -og if og < 0 else 0
        ln = m - rs
        if ln < min_overlap:
            return False
        eff = ln - int(npref[m] - npref[rs])
        return c <= e * eff

    accs = [ok(int(cost[m]), int(orig[m]))]
    for j in range(1, n + 1):
        qc = int(qm[j - 1])
        dc, do = int(cost[0]), int(orig[0])
        cost[0], orig[0] = 0, j     # START_WITHIN_SEQ2 row-0 reset
        for i in range(1, m + 1):
            pc, po = int(cost[i]), int(orig[i])
            if refm[i - 1] & qc:
                nc, no = dc, do
            else:
                cd, ch, cv = dc + 1, pc + 1, int(cost[i - 1]) + 1
                if cd <= ch and cd <= cv:
                    nc, no = cd, do
                elif ch <= cv:
                    nc, no = ch, po
                else:
                    nc, no = cv, int(orig[i - 1])
            cost[i], orig[i] = nc, no
            dc, do = pc, po
        accs.append(ok(int(cost[m]), int(orig[m])))
    nacc = sum(accs)
    nloc = sum(1 for k, a in enumerate(accs)
               if a and (k == 0 or not accs[k - 1]))
    return nloc, nacc


@pytest.mark.parametrize("flags", [FRONT, INFIX], ids=["FRONT", "INFIX"])
def test_nloc_nacc_parity(flags):
    """LocateResult.nloc/nacc (hit-multiplicity evidence behind the
    reorient fast path) match a definitional per-column DP on both the
    XLA and Pallas backends, including planted multi-location reads."""
    from tpu_orc.align.batched import batched_locate
    rng = np.random.default_rng(17)

    def rs(n):
        return "".join(rng.choice(list("ACGT"), size=n))

    for trial in range(6):
        refs = [rs(int(rng.integers(8, 28))) for _ in range(3)]
        reads = []
        for b in range(6):
            r = rs(int(rng.integers(30, 140)))
            for _ in range(int(rng.integers(0, 3))):
                a = refs[int(rng.integers(len(refs)))]
                pos = int(rng.integers(0, max(1, len(r) - len(a))))
                r = r[:pos] + a + r[pos + len(a):]
            reads.append(r)
        e = float(rng.choice([0.1, 0.2]))
        A, M = len(refs), max(map(len, refs))
        ref_masks = np.zeros((A, M), np.uint8)
        ref_lens = np.zeros(A, np.int32)
        for i, r in enumerate(refs):
            m = encode.encode_ref_masks(r)
            ref_masks[i, :len(m)] = m
            ref_lens[i] = len(m)
        read_masks, read_lens = encode.pack_batch(
            reads, pad_multiple=16, encoder=encode.encode_read_masks,
            pad_value=0)
        kt = make_k_table(e, ref_masks, ref_lens)
        npx = make_n_prefix(ref_masks)
        xla = batched_locate(ref_masks, ref_lens, kt, npx,
                             read_masks, read_lens, int(flags), 3)
        pal = locate_pallas(ref_masks, ref_lens, kt, npx, read_masks,
                            read_lens, int(flags), 3, interpret=True)
        for b, read in enumerate(reads):
            for a, ref in enumerate(refs):
                want = _brute_nloc_nacc(ref, read, e, 3, flags)
                assert (int(np.asarray(xla.nloc)[b, a]),
                        int(np.asarray(xla.nacc)[b, a])) == want, \
                    ("xla", trial, b, a)
                assert (int(pal.nloc[b, a]),
                        int(pal.nacc[b, a])) == want, \
                    ("pallas", trial, b, a)
