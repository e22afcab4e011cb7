"""Pallas TPU kernel: star-alignment path bits for the consensus pileup.

The consensus builder needs the NW alignment PATH of every group read
against the draft (amplicon_sorter.py:324-356 create_alignment). The
edit-distance DP is the O(len^2) part; the path itself is O(len). This
kernel runs the Myers bit-parallel forward pass on device with
pattern = DRAFT (bit planes span the draft words) and texts = reads
(lanes), storing per read position the four delta bit-planes

    plane 0/1: VP/VN (post-update vertical deltas over the draft)
    plane 2/3: PH/MH (pre-shift horizontal deltas)

to HBM, streamed through [NC, 4, W, TJ] VMEM blocks over a sequential
chunk grid axis. The O(m+n) traceback + pileup accumulation then run in
native C++ (orc_pileup_from_bits), emitting ops bit-identical to the
host myers_nw_path (same score-consistent walk, transposed tie-break
order — see oracle.cpp traceback_from_bits).

Deployment note: the planes are 16*W bytes per read base. On a
co-located host (PCIe/DMA) that transfer is microseconds; behind this
build's tunneled TPU the host C++ pileup (native.pileup_batch) is
faster end-to-end, so consensus.PILEUP_BACKEND defaults to 'native'
with 'device' as the TPU-resident option (ORC_PILEUP_BACKEND=device).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_myers import NCHAN, WORD, build_peq_packed


def _kernel(W, NC, TJ, peq_ref, texts_ref, planes_ref, vp, vn):
    k = pl.program_id(1)
    ones = jnp.full((8, TJ), 0xFFFFFFFF, dtype=jnp.uint32)
    zeros32 = jnp.zeros((8, TJ), jnp.uint32)

    @pl.when(k == 0)
    def _init():
        def init_w(w, _):
            vp[w] = ones
            vn[w] = zeros32
            return 0

        jax.lax.fori_loop(0, W, init_w, 0)

    def col(j, _):
        c = texts_ref[j, :][None, :]                  # [1, TJ]
        hin = jnp.full((8, TJ), 1, jnp.int32)
        for w in range(W):
            eq = zeros32
            for ch in range(5):
                colv = peq_ref[:, w * NCHAN + ch][:, None]   # [8, 1]
                eq = jnp.where(c == ch, colv, eq)
            hin_neg = (hin < 0).astype(jnp.uint32)
            hin_pos = (hin > 0).astype(jnp.uint32)
            Pv = vp[w]
            Mv = vn[w]
            Xv = eq | Mv
            Eq_ = eq | hin_neg
            Xh = (((Eq_ & Pv) + Pv) ^ Pv) | Eq_
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            planes_ref[j, 2, w, :] = Ph[0, :]         # pre-shift H deltas
            planes_ref[j, 3, w, :] = Mh[0, :]
            hout = (((Ph >> 31) & 1).astype(jnp.int32)
                    - ((Mh >> 31) & 1).astype(jnp.int32))
            Ph = (Ph << 1) | hin_pos
            Mh = (Mh << 1) | hin_neg
            vp[w] = Mh | ~(Xv | Ph)
            vn[w] = Ph & Xv
            planes_ref[j, 0, w, :] = vp[w][0, :]      # post-update V
            planes_ref[j, 1, w, :] = vn[w][0, :]
            hin = hout
        return 0

    jax.lax.fori_loop(0, NC, col, 0)


@functools.partial(jax.jit,
                   static_argnames=("W", "NC", "TJ", "interpret"))
def _path_bits_call(peq8, texts_T, W: int, NC: int, TJ: int,
                    interpret: bool = False):
    N, T = texts_T.shape
    K = N // NC
    kernel = functools.partial(_kernel, W, NC, TJ)
    return pl.pallas_call(
        kernel,
        grid=(T // TJ, K),
        in_specs=[
            pl.BlockSpec((8, W * NCHAN), lambda g, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, TJ), lambda g, k: (k, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NC, 4, W, TJ), lambda g, k: (k, 0, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 4, W, T), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((W, 8, TJ), jnp.uint32),
            pltpu.VMEM((W, 8, TJ), jnp.uint32),
        ],
        interpret=interpret,
    )(peq8, texts_T)


def _bucket(n: int, caps=(128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    for c in caps:
        if n <= c:
            return c
    return -(-n // 8192) * 8192


def _pick_nc(N: int, W: int, TJ: int) -> int:
    """Chunk rows per planes block: largest power of two within the
    ~4 MB VMEM budget, >= 8 (Mosaic sublane floor) and dividing the
    pow2-multiple bucket N. (A non-pow2 budget halved until N % NC == 0
    could land below 8 — real-TPU lowering rejects that block shape.)"""
    budget = max(8, (1 << 22) // (16 * W * TJ))
    NC = 1 << (budget.bit_length() - 1)
    NC = max(8, min(N, NC))
    while N % NC:
        NC //= 2
    return max(8, NC)


def _kernel_multi(W, NC, TJ, gid_ref, peq_ref, texts_ref, planes_ref,
                  vp, vn):
    """Multi-group variant of _kernel: the tile's draft bit-planes are
    selected by the scalar-prefetched group id (peq_ref block is
    [1, 8, W*NCHAN] = this tile's group). Body otherwise identical."""
    del gid_ref  # consumed by the BlockSpec index maps
    k = pl.program_id(1)
    ones = jnp.full((8, TJ), 0xFFFFFFFF, dtype=jnp.uint32)
    zeros32 = jnp.zeros((8, TJ), jnp.uint32)

    @pl.when(k == 0)
    def _init():
        def init_w(w, _):
            vp[w] = ones
            vn[w] = zeros32
            return 0

        jax.lax.fori_loop(0, W, init_w, 0)

    def col(j, _):
        c = texts_ref[j, :][None, :]                  # [1, TJ]
        hin = jnp.full((8, TJ), 1, jnp.int32)
        for w in range(W):
            eq = zeros32
            for ch in range(5):
                colv = peq_ref[0, :, w * NCHAN + ch][:, None]   # [8, 1]
                eq = jnp.where(c == ch, colv, eq)
            hin_neg = (hin < 0).astype(jnp.uint32)
            hin_pos = (hin > 0).astype(jnp.uint32)
            Pv = vp[w]
            Mv = vn[w]
            Xv = eq | Mv
            Eq_ = eq | hin_neg
            Xh = (((Eq_ & Pv) + Pv) ^ Pv) | Eq_
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            planes_ref[j, 2, w, :] = Ph[0, :]
            planes_ref[j, 3, w, :] = Mh[0, :]
            hout = (((Ph >> 31) & 1).astype(jnp.int32)
                    - ((Mh >> 31) & 1).astype(jnp.int32))
            Ph = (Ph << 1) | hin_pos
            Mh = (Mh << 1) | hin_neg
            vp[w] = Mh | ~(Xv | Ph)
            vn[w] = Ph & Xv
            planes_ref[j, 0, w, :] = vp[w][0, :]
            planes_ref[j, 1, w, :] = vn[w][0, :]
            hin = hout
        return 0

    jax.lax.fori_loop(0, NC, col, 0)


@functools.partial(jax.jit,
                   static_argnames=("W", "NC", "TJ", "interpret"))
def _path_bits_multi_call(gid, peqs, texts_T, W: int, NC: int, TJ: int,
                          interpret: bool = False):
    N, T = texts_T.shape
    K = N // NC
    kernel = functools.partial(_kernel_multi, W, NC, TJ)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // TJ, K),
        in_specs=[
            pl.BlockSpec((1, 8, W * NCHAN),
                         lambda g, k, gid: (gid[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, TJ), lambda g, k, gid: (k, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NC, 4, W, TJ),
                               lambda g, k, gid: (k, 0, 0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, 8, TJ), jnp.uint32),
            pltpu.VMEM((W, 8, TJ), jnp.uint32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 4, W, T), jnp.uint32),
        interpret=interpret,
    )(gid, peqs, texts_T)


def path_bits_groups(drafts_codes, groups_reads, TJ: int = 128,
                     interpret: bool = False):
    """Device forward pass for MANY groups in ONE dispatch (the ROADMAP
    'batched multi-group device consensus' debt; VERDICT r2 weak #7).

    drafts_codes: [G] draft code arrays; groups_reads: [G] lists of read
    code arrays. Each TJ-wide text tile holds reads of one group (groups
    are padded up to a TJ multiple) and the scalar-prefetched tile->group
    map selects that group's draft bit-planes, so the whole ladder
    step's dirty-group rebuild costs one kernel launch instead of G.
    Returns a list of per-group planes [Rg, ncols, 4, Wmax] uint32 ready
    for native.pileup_from_bits (the traceback only reads words below
    ceil(len(draft)/32), so the Wmax padding is inert)."""
    G = len(drafts_codes)
    assert G == len(groups_reads) and G > 0
    drafts = [np.asarray(d, np.uint8) for d in drafts_codes]
    W = max(1, max(-(-len(d) // WORD) for d in drafts))
    peqs = np.stack([
        np.repeat(build_peq_packed(d[None, :], np.array([len(d)],
                                                        np.int32), W),
                  8, axis=0)
        for d in drafts])                              # [G, 8, W*NCHAN]
    ntiles = [max(1, -(-len(rs) // TJ)) for rs in groups_reads]
    gid = np.repeat(np.arange(G, dtype=np.int32),
                    np.asarray(ntiles, np.int64))
    T = int(gid.size) * TJ
    N = _bucket(max((len(r) for rs in groups_reads for r in rs),
                    default=1))
    NC = _pick_nc(N, W, TJ)
    tt = np.full((N, T), 5, np.int32)
    col = 0
    starts = []
    for rs, nt in zip(groups_reads, ntiles):
        starts.append(col)
        for i, r in enumerate(rs):
            tt[:len(r), col + i] = np.asarray(r, np.int32)
        col += nt * TJ
    planes = np.asarray(_path_bits_multi_call(
        jnp.asarray(gid), jnp.asarray(peqs), jnp.asarray(tt), W, NC, TJ,
        interpret))                                    # [N, 4, W, T]
    out = []
    for rs, s in zip(groups_reads, starts):
        blk = planes[:, :, :, s:s + len(rs)]
        out.append(np.ascontiguousarray(
            np.transpose(blk, (3, 0, 1, 2))))
    return out


def path_bits(draft_codes: np.ndarray, read_codes_list,
              TJ: int = 128, interpret: bool = False) -> np.ndarray:
    """Device forward pass for all reads of one group vs its draft.

    Returns planes [R, ncols, 4, W] uint32 (per read, per read position)
    ready for native.pileup_from_bits. ncols >= every read length.
    """
    draft = np.asarray(draft_codes, np.uint8)
    lc = len(draft)
    W = max(1, -(-lc // WORD))
    peq = build_peq_packed(draft[None, :], np.array([lc], np.int32), W)
    peq8 = np.repeat(peq, 8, axis=0)                  # [8, W*NCHAN]
    R = len(read_codes_list)
    T = max(TJ, -(-R // TJ) * TJ)
    N = _bucket(max((len(r) for r in read_codes_list), default=1))
    # planes block NC*4*W*TJ*4 bytes; target <= ~4 MB of VMEM
    NC = _pick_nc(N, W, TJ)
    tt = np.full((N, T), 5, np.int32)
    for i, r in enumerate(read_codes_list):
        tt[:len(r), i] = np.asarray(r, np.int32)
    planes = _path_bits_call(jnp.asarray(peq8), jnp.asarray(tt), W, NC,
                             TJ, interpret)
    # [N, 4, W, T] -> per-read-contiguous [R, N, 4, W]
    return np.ascontiguousarray(
        np.transpose(np.asarray(planes), (3, 0, 1, 2))[:R])
