"""Pallas TPU kernel: tiled all-vs-all Myers bit-parallel edit distance.

The lax.scan implementation in align/myers.py expresses the right
algorithm but leaves scheduling to XLA; this kernel pins the layout for
the VPU:

* a [TI, TJ] pair tile lives entirely in VMEM; patterns index sublanes,
  texts index lanes;
* the DP state (VP/VN per 32-bit word) is a [W, TI, TJ] uint32 scratch —
  each word step is ~20 bitwise VPU ops covering 32 DP cells per lane;
* Eq lookup is a 5-way select of per-pattern Peq columns against the
  per-lane text character (no gather);
* per-lane pattern lengths are handled by testing bit (m-1) of the
  pre-shift Ph/Mh in word (m-1)//32 (variable per-sublane shifts);
* the column loop is a fori_loop; the word loop is statically unrolled.

Grid: (pattern tiles x text tiles); Peq/lengths blocks are re-used along
the text axis, text blocks along the pattern axis.

Semantics identical to align/myers.py::myers_tile (NW/SHW/HW), which is
itself parity-tested against the Python and C++ oracles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORD = 32
NCHAN = 8  # channel stride in the packed Peq (0..4 used, 5..7 zero)


def build_peq_packed(codes: np.ndarray, m_lens: np.ndarray,
                     W: int) -> np.ndarray:
    """codes [P, M] uint8 -> packed Peq [P, W*NCHAN] uint32 (host side)."""
    P, M = codes.shape
    Mp = W * WORD
    c = np.full((P, Mp), 5, np.uint8)
    c[:, :M] = codes[:, :Mp]
    pos = np.arange(Mp)[None, :]
    c = np.where(pos < np.asarray(m_lens)[:, None], c, 5)
    out = np.zeros((P, W * NCHAN), np.uint32)
    weights = (np.uint32(1) << np.arange(WORD, dtype=np.uint32))
    for w in range(W):
        blk = c[:, w * WORD:(w + 1) * WORD]
        for ch in range(5):
            out[:, w * NCHAN + ch] = ((blk == ch) * weights).sum(
                axis=1, dtype=np.uint64).astype(np.uint32)
    return out


def _kernel(mode, W, TI, TJ, N, unroll,
            peq_ref, mlen_ref, texts_ref, nlen_ref,
            dist_ref, pos_ref, vp, vn, score, best, bpos,
            chunked: bool = False, chunk_dim: int = 2):
    """One (TI, TJ) pair tile. When ``chunked``, the text axis is split
    over a third (innermost, sequential) grid dimension: DP state in the
    VMEM scratch carries across the chunks of one tile (the standard
    TPU accumulation-over-grid pattern), so texts of any length stream
    through a bounded [NC, TJ] VMEM block."""
    hin0 = 0 if mode == "HW" else 1
    ones = jnp.full((TI, TJ), 0xFFFFFFFF, dtype=jnp.uint32)
    zeros32 = jnp.zeros((TI, TJ), jnp.uint32)
    ones1 = jnp.full((TI, TJ), 1, dtype=jnp.uint32)
    k = pl.program_id(chunk_dim) if chunked else 0
    base = k * N                                     # global text offset
    m = mlen_ref[:, 0][:, None]                      # [TI, 1] int32

    @pl.when(k == 0) if chunked else (lambda f: f())
    def _init():
        def init_w(w, _):
            vp[w] = ones
            vn[w] = zeros32
            return 0

        jax.lax.fori_loop(0, W, init_w, 0)
        score[:, :] = jnp.broadcast_to(m, (TI, TJ))
        best[:, :] = score[:, :]
        bpos[:, :] = jnp.zeros((TI, TJ), jnp.int32)

    w_idx = (m - 1) // WORD                          # [TI, 1]
    r_idx = ((m - 1) % WORD).astype(jnp.uint32)      # [TI, 1]
    nl = nlen_ref[0, :][None, :]                     # [1, TJ]

    def col(j, _):
        c = texts_ref[j, :][None, :]                 # [1, TJ] int32
        valid = (base + j + 1) <= nl                 # [1, TJ] bool
        # char-match masks are word-invariant: compare once per column
        cmps = [c == ch for ch in range(5)]

        def word(w, carry):
            # hp/hm carry the horizontal +1/-1 delta as uint32 bit
            # planes (Ph and Mh bits are mutually exclusive, so the
            # int32 hin of the textbook formulation is redundant);
            # phw/mhw collect the pre-shift Ph/Mh of the word holding
            # bit (m-1) so the variable-shift score update runs ONCE
            # per column after the loop instead of per word.
            hp, hm, phw, mhw = carry
            eq = zeros32
            for ch in range(5):
                colv = peq_ref[:, w * NCHAN + ch][:, None]   # [TI, 1]
                eq = jnp.where(cmps[ch], colv, eq)
            Pv = vp[w]
            Mv = vn[w]
            Xv = eq | Mv
            Eq_ = eq | hm
            Xh = (((Eq_ & Pv) + Pv) ^ Pv) | Eq_
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            at_m = w_idx == w
            phw = jnp.where(at_m, Ph, phw)
            mhw = jnp.where(at_m, Mh, mhw)
            hp_o = Ph >> 31                          # top bit, already 0/1
            hm_o = Mh >> 31
            Ph = (Ph << 1) | hp
            Mh = (Mh << 1) | hm
            vp[w] = Mh | ~(Xv | Ph)
            vn[w] = Ph & Xv
            return hp_o, hm_o, phw, mhw

        carry = (ones1 if hin0 else zeros32, zeros32, zeros32, zeros32)
        if unroll:
            # static word indices -> static scratch addressing, lets
            # Mosaic software-pipeline the hin carry chain
            for w in range(W):
                carry = word(w, carry)
        else:
            carry = jax.lax.fori_loop(0, W, word, carry)
        _, _, phw, mhw = carry
        d_at_m = (((phw >> r_idx) & 1).astype(jnp.int32)
                  - ((mhw >> r_idx) & 1).astype(jnp.int32))
        sc = score[:, :] + jnp.where(valid, d_at_m, 0)
        score[:, :] = sc
        if mode != "NW":
            improved = valid & (sc < best[:, :])
            best[:, :] = jnp.where(improved, sc, best[:, :])
            bpos[:, :] = jnp.where(improved, base + j + 1, bpos[:, :])
        return 0

    jax.lax.fori_loop(0, N, col, 0)
    if mode == "NW":
        dist_ref[:, :] = score[:, :]
        pos_ref[:, :] = jnp.broadcast_to(nl, (TI, TJ))
    else:
        dist_ref[:, :] = best[:, :]
        pos_ref[:, :] = bpos[:, :]


#: stream texts through [NC_MAX, TJ] VMEM blocks beyond this many rows;
#: bounds the text block so long-read buckets cannot blow VMEM. r4 sweep:
#: raising 2048 -> 4096 keeps 3.5 kb buckets UNSTREAMED (3,282 Gcells/s
#: at TI=16/TJ=256 vs 826 streamed) and is neutral at 8 kb (1,699 with
#: 2x4096 chunks vs 1,720 with 4x2048).
NC_MAX = 4096


@functools.partial(jax.jit,
                   static_argnames=("mode", "W", "TI", "TJ", "interpret",
                                    "unroll", "NC"))
def myers_tile_pallas(peq_packed, m_lens, texts_T, n_lens,
                      mode: str = "NW", W: int = 32, TI: int = 128,
                      TJ: int = 128, interpret: bool = False,
                      unroll: bool = True, NC: int | None = None):
    """peq_packed [P, W*NCHAN] uint32, m_lens [P,1] int32,
    texts_T [N, T] int32 (column-major texts), n_lens [1, T] int32.
    P % TI == 0, T % TJ == 0. Returns (dist [P,T] int32, pos [P,T] int32).

    When the text length N exceeds NC (default NC_MAX), the text axis
    is streamed through a third sequential grid dimension with the DP
    state carried in scratch (see _kernel) — the long-read path.
    """
    P = peq_packed.shape[0]
    T = texts_T.shape[1]
    N = texts_T.shape[0]
    NC = NC or NC_MAX
    if N > NC:
        if N % NC:
            raise ValueError(f"text rows {N} not a multiple of NC={NC}")
        K = N // NC
        grid = (P // TI, T // TJ, K)
        kernel = functools.partial(_kernel, mode, W, TI, TJ, NC, unroll,
                                   chunked=True)
        in_specs = [
            pl.BlockSpec((TI, W * NCHAN), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, TJ), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((TI, TJ), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TJ), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ]
    else:
        grid = (P // TI, T // TJ)
        kernel = functools.partial(_kernel, mode, W, TI, TJ, N, unroll)
        in_specs = [
            pl.BlockSpec((TI, W * NCHAN), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TJ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((TI, TJ), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TJ), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((P, T), jnp.int32),
            jax.ShapeDtypeStruct((P, T), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, TI, TJ), jnp.uint32),
            pltpu.VMEM((W, TI, TJ), jnp.uint32),
            pltpu.VMEM((TI, TJ), jnp.int32),
            pltpu.VMEM((TI, TJ), jnp.int32),
            pltpu.VMEM((TI, TJ), jnp.int32),
        ],
        interpret=interpret,
    )(peq_packed, m_lens, texts_T, n_lens)


def _kernel_pairs(mode, W, TI, TJ, N, unroll, chunked,
                  ti_ref, tj_ref, *rest):
    # scalar-prefetch refs select the blocks (used by the index_maps
    # only); the DP body is identical to the dense-grid kernel. In
    # chunked mode the text-chunk grid axis is dim 1 here (dim 2 in the
    # dense kernel), so remap program_id via the chunk_dim argument.
    del ti_ref, tj_ref
    _kernel(mode, W, TI, TJ, N, unroll, *rest, chunked=chunked,
            chunk_dim=1)


@functools.partial(jax.jit,
                   static_argnames=("mode", "W", "TI", "TJ", "interpret",
                                    "unroll"))
def myers_tile_pallas_pairs(tile_i, tile_j, peq_packed, m_lens, texts_T,
                            n_lens, mode: str = "NW", W: int = 32,
                            TI: int = 128, TJ: int = 128,
                            interpret: bool = False, unroll: bool = True):
    """Sparse-tile variant: one device program over an explicit list of
    (pattern-tile, text-tile) pairs instead of the dense 2-D grid.

    tile_i/tile_j [G] int32 are scalar-prefetched tile coordinates; the
    g-th program computes the [TI, TJ] block (tile_i[g], tile_j[g]) of
    the distance matrix. Blocks not listed are never computed (their
    output region is unspecified — callers must mask). This turns the
    gene-stage upper-triangle + length-band tile skipping into a single
    dispatch (the reference's .todo pair streaming, SURVEY.md §2.4,
    collapsed into one device program)."""
    P = peq_packed.shape[0]
    T = texts_T.shape[1]
    N = texts_T.shape[0]
    G = tile_i.shape[0]
    NC = min(N, NC_MAX)
    chunked = N > NC
    if chunked and N % NC:
        raise ValueError(f"text rows {N} not a multiple of NC={NC}")
    K = N // NC if chunked else 1
    kernel = functools.partial(_kernel_pairs, mode, W, TI, TJ, NC, unroll,
                               chunked)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, K),
        in_specs=[
            pl.BlockSpec((TI, W * NCHAN), lambda g, k, ti, tj: (ti[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 1), lambda g, k, ti, tj: (ti[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, TJ), lambda g, k, ti, tj: (k, tj[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ), lambda g, k, ti, tj: (0, tj[g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TI, TJ), lambda g, k, ti, tj: (ti[g], tj[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TJ), lambda g, k, ti, tj: (ti[g], tj[g]),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, TI, TJ), jnp.uint32),
            pltpu.VMEM((W, TI, TJ), jnp.uint32),
            pltpu.VMEM((TI, TJ), jnp.int32),
            pltpu.VMEM((TI, TJ), jnp.int32),
            pltpu.VMEM((TI, TJ), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, T), jnp.int32),
            jax.ShapeDtypeStruct((P, T), jnp.int32),
        ],
        interpret=interpret,
    )(tile_i, tile_j, peq_packed, m_lens, texts_T, n_lens)


def _put(device):
    """Array mover: committed device_put when a device is given (per-
    device multi-chip dispatch), plain asarray otherwise."""
    if device is None:
        return jnp.asarray
    return functools.partial(jax.device_put, device=device)


def distances_pallas_pairs(patterns_codes: np.ndarray, m_lens: np.ndarray,
                           texts_codes: np.ndarray, n_lens: np.ndarray,
                           tile_pairs: np.ndarray, mode: str = "NW",
                           TI: int | None = None, TJ: int | None = None,
                           interpret: bool = False, unroll: bool = True,
                           device=None):
    """Host wrapper for the sparse-tile kernel. ``tile_pairs`` is
    [G, 2] int32 of (pattern-tile, text-tile) indices at the (TI, TJ)
    granularity this function selects (returned alongside the result so
    callers can enumerate tiles consistently: call tile_shape() first).
    Returns lazy jax arrays (dist, pos) [P, T]; unlisted blocks hold
    unspecified values."""
    P0 = patterns_codes.shape[0]
    T0 = texts_codes.shape[0]
    W = max(1, -(-int(patterns_codes.shape[1]) // WORD))
    TI, TJ = tile_shape(W, TI, TJ)
    if texts_codes.shape[1] > NC_MAX:   # streamed long-text path: the
        TJ = min(TJ, 256)               # [NC, TJ] block double-buffers
    P = -(-P0 // TI) * TI
    T = -(-T0 // TJ) * TJ
    m = np.ones((P, 1), np.int32)
    m[:P0, 0] = np.asarray(m_lens, np.int32)
    peq = np.zeros((P, W * NCHAN), np.uint32)
    peq[:P0] = build_peq_packed(np.asarray(patterns_codes), m_lens, W)
    N = texts_codes.shape[1]
    tt = np.full((N, T), 5, np.int32)
    tt[:, :T0] = np.asarray(texts_codes, np.int32).T
    nl = np.ones((1, T), np.int32)
    nl[0, :T0] = np.asarray(n_lens, np.int32)
    # pad the pair list to a power-of-2 bucket (repeat the last tile:
    # grid programs run sequentially, so re-writing a block is just
    # wasted work, not a race) to bound the number of jit shapes
    G0 = tile_pairs.shape[0]
    G = 1
    while G < G0:
        G *= 2
    ti = np.empty(G, np.int32)
    tj = np.empty(G, np.int32)
    ti[:G0] = tile_pairs[:, 0]
    tj[:G0] = tile_pairs[:, 1]
    ti[G0:] = tile_pairs[-1, 0]
    tj[G0:] = tile_pairs[-1, 1]
    put = _put(device)
    d, p = myers_tile_pallas_pairs(put(ti), put(tj),
                                   put(peq), put(m),
                                   put(tt), put(nl),
                                   mode, W, TI, TJ, interpret, unroll)
    return d, p


def tile_shape(W: int, TI: int | None = None, TJ: int | None = None):
    """Measured-best tile per word count (v5e sweeps, BENCH.md).

    r2 sweep at W=16 (512 bp), 1024x1024 pairs: 32x512 = 969 Gcells/s,
    64x256 = 867, 64x512 = 860, 128x256 = 843, 32x256 = 715. Wider lanes
    win until the [2, W, TI, TJ] uint32 scratch presses VMEM; shrink TJ
    as W grows. r4 sweep at W=112 (3.5 kb), unstreamed: 16x256 = 3,282
    Gcells/s vs 16x128 = 826 and 32x128 = 738 — so the 56 < W <= 114
    band (1.8-3.6 kb, the rRNA amplicon range) keeps TJ=256 with TI=16
    (scratch 2*W*16*256*4 <= ~15 MB at the W=114 bound); beyond that
    the scratch forces TJ=128."""
    if TI is None:
        TI = 32 if W <= 56 else 16
    if TJ is None:
        TJ = 512 if W <= 24 else (256 if W <= 114 else 128)
    return TI, TJ


def distances_pallas(patterns_codes: np.ndarray, m_lens: np.ndarray,
                     texts_codes: np.ndarray, n_lens: np.ndarray,
                     mode: str = "NW", TI: int | None = None,
                     TJ: int | None = None,
                     interpret: bool = False, unroll: bool = True,
                     fetch_pos: bool = True, device=None,
                     lazy: bool = False):
    """Host wrapper mirroring align.myers.distances_with_pos, padding to
    tile multiples. TI/TJ default to the measured-best tile per word
    count (v5e sweep, BENCH.md): 64x256 for short reads (W<=24, i.e.
    <=768 bp), 32x128 for long ones (bounds the [2, W, TI, TJ] uint32
    scratch VMEM). fetch_pos=False skips the device->host transfer of
    the position matrix (NW callers never read it) and returns None."""
    P0 = patterns_codes.shape[0]
    T0 = texts_codes.shape[0]
    W = max(1, -(-int(patterns_codes.shape[1]) // WORD))
    TI, TJ = tile_shape(W, TI, TJ)
    if texts_codes.shape[1] > NC_MAX:   # streamed long-text path: the
        TJ = min(TJ, 256)               # [NC, TJ] block double-buffers
    P = -(-P0 // TI) * TI
    T = -(-T0 // TJ) * TJ
    m = np.ones((P, 1), np.int32)
    m[:P0, 0] = np.asarray(m_lens, np.int32)
    peq = np.zeros((P, W * NCHAN), np.uint32)
    peq[:P0] = build_peq_packed(np.asarray(patterns_codes), m_lens, W)
    N = texts_codes.shape[1]
    tt = np.full((N, T), 5, np.int32)
    tt[:, :T0] = np.asarray(texts_codes, np.int32).T
    nl = np.ones((1, T), np.int32)
    nl[0, :T0] = np.asarray(n_lens, np.int32)
    put = _put(device)
    d, p = myers_tile_pallas(put(peq), put(m), put(tt), put(nl),
                             mode, W, TI, TJ, interpret, unroll)
    if lazy:  # padded [P, T] jax arrays, dispatch not yet fetched (the
        return d, p  # per-device multi-chip path overlaps device work)
    return (np.asarray(d)[:P0, :T0],
            np.asarray(p)[:P0, :T0] if fetch_pos else None)
