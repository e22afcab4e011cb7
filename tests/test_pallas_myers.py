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


def test_chunked_text_streaming_matches_xla(rng):
    """Long-text path: texts streamed through [NC, TJ] VMEM blocks with
    DP state carried across the chunk grid axis (VERDICT r1 weak#8) —
    bit parity with the XLA scan for all three modes."""
    import jax.numpy as jnp
    from tpu_orc.align import myers
    from tpu_orc.align.pallas_myers import (build_peq_packed,
                                            myers_tile_pallas)
    P0, T0, M, N = 8, 16, 64, 512
    pats = np.full((P0, M), 4, np.uint8)
    plens = np.zeros(P0, np.int32)
    for i in range(P0):
        L = int(rng.integers(20, M))
        pats[i, :L] = rng.integers(0, 4, L)
        plens[i] = L
    txts = np.full((T0, N), 4, np.uint8)
    tlens = np.zeros(T0, np.int32)
    for i in range(T0):
        L = int(rng.integers(100, N))
        txts[i, :L] = rng.integers(0, 4, L)
        tlens[i] = L
    W = 2
    peq = build_peq_packed(pats, plens, W)
    tt = np.full((N, 16), 5, np.int32)
    tt[:, :T0] = txts.T
    nl = np.ones((1, 16), np.int32)
    nl[0, :T0] = tlens
    m = np.ones((8, 1), np.int32)
    m[:, 0] = plens
    for mode in ("NW", "HW", "SHW"):
        want_d, want_p = myers.distances_with_pos(pats, plens, txts,
                                                  tlens, mode)
        d, p = myers_tile_pallas(jnp.asarray(peq), jnp.asarray(m),
                                 jnp.asarray(tt), jnp.asarray(nl), mode,
                                 W, 8, 16, interpret=True, NC=128)
        np.testing.assert_array_equal(np.asarray(d)[:P0, :T0], want_d)
        np.testing.assert_array_equal(np.asarray(p)[:P0, :T0], want_p)


def test_pairs_kernel_chunked_interpret(rng):
    """Sparse tile-pair kernel with the chunked text axis (interpret
    mode): listed blocks match the XLA distances."""
    import jax.numpy as jnp
    from tpu_orc.align import myers
    from tpu_orc.align.pallas_myers import distances_pallas_pairs
    P0, T0, M, L = 8, 16, 64, 4096
    pats = np.full((P0, M), 4, np.uint8)
    plens = np.zeros(P0, np.int32)
    txts = np.full((T0, L), 4, np.uint8)
    tlens = np.zeros(T0, np.int32)
    for i in range(P0):
        n = int(rng.integers(30, M))
        pats[i, :n] = rng.integers(0, 4, n)
        plens[i] = n
    for i in range(T0):
        n = int(rng.integers(200, L))
        txts[i, :n] = rng.integers(0, 4, n)
        tlens[i] = n
    pairs = np.array([[0, 0]], np.int32)   # single (8, 16) tile
    d, _ = distances_pallas_pairs(pats, plens, txts, tlens, pairs, "NW",
                                  TI=8, TJ=16, interpret=True)
    want = np.asarray(myers.distances(pats, plens, txts, tlens, "NW"))
    np.testing.assert_array_equal(np.asarray(d)[:P0, :T0], want)
