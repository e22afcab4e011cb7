"""Pallas Myers kernel parity (interpret mode on CPU; the compiled path
runs on real TPU via bench.py)."""
import numpy as np
import pytest

from tpu_orc.align.pallas_myers import distances_pallas
from tpu_orc.align.oracle import edit_distance
from tpu_orc.io import encode


def pack(seqs):
    codes = [encode.encode_codes(s) for s in seqs]
    L = -(-max(len(c) for c in codes) // 32) * 32
    out = np.full((len(codes), L), 4, np.uint8)
    lens = np.zeros(len(codes), np.int32)
    for i, c in enumerate(codes):
        out[i, :len(c)] = c
        lens[i] = len(c)
    return out, lens


@pytest.mark.parametrize("mode", ["NW", "HW"])
def test_pallas_parity_small_tiles(mode, rng):
    pats = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(5, 60))))
            for _ in range(6)]
    txts = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(5, 90))))
            for _ in range(10)]
    pc, pl_ = pack(pats)
    tc, tl = pack(txts)
    d, pos = distances_pallas(pc, pl_, tc, tl, mode, TI=8, TJ=128,
                              interpret=True)
    for i, p in enumerate(pats):
        for j, t in enumerate(txts):
            want = edit_distance(p, t, mode)
            assert d[i, j] == want, (i, j, mode, int(d[i, j]), want)


def test_pallas_multiword(rng):
    base = "".join(rng.choice(list("ACGT"), size=200))
    muts = []
    for k in (0, 5, 40):
        s = list(base)
        for _ in range(k):
            s[int(rng.integers(0, len(s)))] = str(rng.choice(list("ACGT")))
        muts.append("".join(s))
    pc, pl_ = pack(muts)
    tc, tl = pack(muts)
    d, _ = distances_pallas(pc, pl_, tc, tl, "NW", TI=8, TJ=128,
                            interpret=True)
    assert (np.diag(d) == 0).all()
    for i in range(3):
        for j in range(3):
            want = edit_distance(muts[i], muts[j], "NW")
            assert d[i, j] == want


def test_pallas_hw_position(rng):
    pat = "ACGTACGTAC"
    txt = "TTTTT" + pat + "GGGGG"
    pc, pl_ = pack([pat])
    tc, tl = pack([txt])
    d, pos = distances_pallas(pc, pl_, tc, tl, "HW", TI=8, TJ=128,
                              interpret=True)
    assert d[0, 0] == 0
    assert pos[0, 0] == 15  # end of the exact infix occurrence
