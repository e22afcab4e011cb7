"""Fused dual-round demux: both cutadapt rounds in ONE device program.

Replaces the host round-trip of the unfused path (demux.py), which for
each batch did: upload round-1 masks -> download trim points -> slice
strings on host -> re-encode -> upload round-2 masks. Over the tunneled
TPU link that second upload + host repack dominates wall time.

Here a single uint8 [B, L] batch is uploaded once; on device we
  1. reverse-complement (log-step shift, no gathers) and score round 1
     (FRONT, 12 SP5 adapters, fwd+rc) with the Pallas locate kernel,
  2. pick the best (adapter, orientation) per read exactly like
     cutadapt --rc (max matches; forward wins ties; across adapters
     first-in-file wins ties),
  3. trim on device by left-shifting each read past its round-1
     querystop,
  4. score round 2 (BACK, 12 SP27-rc adapters, fwd+rc of the *trimmed*
     read) and pick again.
Only eight [B] int32 vectors return to host; host does string slicing
and file IO. Semantics are identical to running demux.assign_reads
twice (asserted by tests/test_fused.py against the unfused path, which
is itself oracle-parity-tested).

Reference behavior replaced: /root/reference/scripts/02_cutadapt_loop.sh
round 1 (:64-72) + round 2 (:91-103), both `--rc -e 0.1 --action=trim`.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..align.pallas_locate import BankTables, locate_tiles, TB
from ..align.spec import DEFAULT_MIN_OVERLAP
from ..io import encode
from ..io.fastq import Record
from .adapters import AdapterBank


class FusedDecision(NamedTuple):
    """Per-read demux decisions, all [B] int32 numpy."""
    idx1: np.ndarray     # round-1 adapter index (-1 = unknown)
    rc1: np.ndarray      # 1 if round 1 chose the reverse complement
    qe1: np.ndarray      # round-1 trim point (keep seq[qe1:]) in oriented coords
    idx2: np.ndarray     # round-2 adapter index (-1 = unknown)
    rc2: np.ndarray      # 1 if round 2 chose the rc of the trimmed read
    qs2: np.ndarray      # round-2 trim point (keep trimmed[:qs2])
    err1: np.ndarray     # round-1 match error count (cutadapt JSON report)
    err2: np.ndarray     # round-2 match error count


def _shift_left(x, s):
    """Left-shift each row of x [B, L] by s [B] (log-step rolls; values
    wrapped into the tail are garbage the locate kernel never reads
    because every acceptance test is gated on j <= len)."""
    L = x.shape[1]
    k = 0
    while (1 << k) < L:
        x = jnp.where(((s >> k) & 1)[:, None] != 0,
                      jnp.roll(x, -(1 << k), axis=1), x)
        k += 1
    return x


def _revcomp_rows(m, lens):
    """Reverse-complement mask rows [B, L] int32 on device (flip +
    variable left-shift; complement permutes the ACGT mask bits)."""
    comp = (((m & 1) << 3) | ((m & 8) >> 3) | ((m & 2) << 1)
            | ((m & 4) >> 1) | (m & 16))
    L = m.shape[1]
    return _shift_left(jnp.flip(comp, axis=1), L - lens)


def _best(m, q, o, A, c=None):
    """Across-adapter selection on [Ap, B] kernel outputs: max matches,
    first adapter in file order wins ties. Returns (idx [B] with -1 for
    none, matches, querystop, origin[, errors])."""
    mm = jnp.where(m[:A] >= 0, m[:A], -1)
    idx = jnp.argmax(mm, axis=0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
    oh = iota == idx[None, :]
    pick = lambda x: jnp.sum(jnp.where(oh, x[:A], 0), axis=0)
    best_m = jnp.max(mm, axis=0)
    none = best_m < 0
    out = (jnp.where(none, -1, idx), best_m, pick(q), pick(o))
    if c is not None:
        out = out + (pick(c),)
    return out


def _unpack_to_masks(packed2, other, L: int):
    """Device unpack of the 2-bit wire format (io/encode.pack_codes_2bit):
    packed2 [B, L//4] uint8 (4 bases/byte), other [B, L//8] uint8 (the
    'non-ACGT' bitplane) -> read match masks [B, L] int32 (1,2,4,8,16).
    0.375 bytes/base over the tunnel instead of 1 (BENCH.md debt)."""
    B = packed2.shape[0]
    p = packed2.astype(jnp.int32)
    two = jnp.stack([(p >> 0) & 3, (p >> 2) & 3, (p >> 4) & 3,
                     (p >> 6) & 3], axis=-1).reshape(B, L)
    o = other.astype(jnp.int32)
    obits = jnp.stack([(o >> k) & 1 for k in range(8)],
                      axis=-1).reshape(B, L)
    code = jnp.where(obits != 0, 4, two)
    return jnp.left_shift(1, code)


@functools.partial(jax.jit,
                   static_argnames=("Ap5", "Ap27", "L", "interpret"))
def _fused_core_packed(t5, t27, packed2, other, lens, Ap5: int, L: int,
                      Ap27: int, interpret: bool = False):
    """Packed-upload variant: unpacks the 2-bit wire format on device,
    then the identical fused dual-round program."""
    m32 = _unpack_to_masks(packed2, other, L)
    return _fused_body(t5, t27, m32, lens, Ap5, L, Ap27, interpret)


@functools.partial(jax.jit,
                   static_argnames=("Ap5", "Ap27", "L", "interpret"))
def _fused_core(t5, t27, masks, lens, Ap5: int, L: int, Ap27: int,
                interpret: bool = False):
    """masks [B, L] uint8 (B % TB == 0), lens [B] int32."""
    return _fused_body(t5, t27, masks.astype(jnp.int32), lens, Ap5, L,
                       Ap27, interpret)


def _fused_body(t5, t27, m32, lens, Ap5: int, L: int, Ap27: int,
                interpret: bool = False):
    B = m32.shape[0]
    lens = lens.astype(jnp.int32)
    rc = _revcomp_rows(m32, lens)
    both = jnp.concatenate([m32, rc], axis=0)
    lens2 = jnp.concatenate([lens, lens])

    # round 1: FRONT over SP5, fwd + rc in one kernel launch
    m, c, o, q, v, r, _nl, _na = locate_tiles(
        *t5, both.T, lens2[None, :], True, Ap5, L, interpret)
    A5 = Ap5  # padded rows never validate (threshold tables are -1)
    idx_b, m_b, qe_b, _, e_b = _best(jnp.where(v > 0, m, -1), q, o, A5, c)
    f_idx, r_idx = idx_b[:B], idx_b[B:]
    f_m, r_m = m_b[:B], m_b[B:]
    f_qe, r_qe = qe_b[:B], qe_b[B:]
    f_e, r_e = e_b[:B], e_b[B:]
    use_rc1 = (r_m >= 0) & ((f_m < 0) | (r_m > f_m))
    idx1 = jnp.where(use_rc1, r_idx, f_idx)
    qe1 = jnp.where(idx1 >= 0, jnp.where(use_rc1, r_qe, f_qe), 0)
    err1 = jnp.where(use_rc1, r_e, f_e)

    # device trim: keep oriented[qe1:]
    oriented = jnp.where(use_rc1[:, None], rc, m32)
    trimmed = _shift_left(oriented, qe1)
    lens_t = lens - qe1

    # round 2: BACK over SP27-rc, fwd + rc of the trimmed read
    rc_t = _revcomp_rows(trimmed, lens_t)
    both2 = jnp.concatenate([trimmed, rc_t], axis=0)
    lens2t = jnp.concatenate([lens_t, lens_t])
    m, c, o, q, v, r, _nl2, _na2 = locate_tiles(
        *t27, both2.T, lens2t[None, :], False, Ap27, L, interpret)
    idx_b, m_b, _, qs_b, e_b = _best(jnp.where(v > 0, m, -1), q, o,
                                     Ap27, c)
    f_idx, r_idx = idx_b[:B], idx_b[B:]
    f_m, r_m = m_b[:B], m_b[B:]
    f_qs, r_qs = qs_b[:B], qs_b[B:]
    f_e2, r_e2 = e_b[:B], e_b[B:]
    use_rc2 = (r_m >= 0) & ((f_m < 0) | (r_m > f_m))
    idx2 = jnp.where(use_rc2, r_idx, f_idx)
    qs2 = jnp.where(idx2 >= 0,
                    jnp.maximum(jnp.where(use_rc2, r_qs, f_qs), 0), 0)
    err2 = jnp.where(use_rc2, r_e2, f_e2)
    # ONE stacked [8, B] output -> one device->host transfer (each
    # separate fetch pays full relay latency over the tunneled link)
    return jnp.stack([idx1, use_rc1.astype(jnp.int32), qe1,
                      idx2, use_rc2.astype(jnp.int32), qs2, err1, err2])


class FusedDemux:
    """Reusable fused dual-round demuxer for one (SP5, SP27-rc) bank pair.

    Precomputes threshold tables once; each __call__ uploads one uint8
    batch and downloads six [B] vectors.
    """

    def __init__(self, sp5: AdapterBank, sp27rc: AdapterBank,
                 min_overlap: int = DEFAULT_MIN_OVERLAP,
                 interpret: bool | None = None):
        if interpret is None:  # Pallas-TPU kernels need interpret on CPU
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self.sp5, self.sp27 = sp5, sp27rc
        self.t5 = BankTables(sp5.masks, sp5.lens, sp5.k_table,
                             sp5.n_prefix, True, min_overlap)
        self.t27 = BankTables(sp27rc.masks, sp27rc.lens, sp27rc.k_table,
                              sp27rc.n_prefix, False, min_overlap)
        self._a5 = self.t5.arrays()
        self._a27 = self.t27.arrays()
        self._per_dev = {}  # device -> (a5, a27) replicated bank tables

    def _bank_on(self, dev):
        """Bank threshold tables committed to one device (cached — the
        bank replicates per chip, SURVEY.md §2.4)."""
        if dev not in self._per_dev:
            import jax
            put = lambda x: jax.device_put(x, dev)
            self._per_dev[dev] = (tuple(put(a) for a in self._a5),
                                  tuple(put(a) for a in self._a27))
        return self._per_dev[dev]

    def decide(self, masks: np.ndarray, lens: np.ndarray) -> FusedDecision:
        """masks [B0, L] uint8, lens [B0] -> FusedDecision (numpy)."""
        B0 = masks.shape[0]
        out = np.asarray(self._dispatch(masks, lens))
        return FusedDecision(*(out[k, :B0] for k in range(8)))

    def decide_packed(self, codes: np.ndarray, lens: np.ndarray
                      ) -> FusedDecision:
        """codes [B0, L] uint8 {0..4}, lens [B0] -> FusedDecision, via the
        2-bit packed wire format (0.375 B/base uploaded instead of 1)."""
        B0 = codes.shape[0]
        out = np.asarray(self._dispatch_packed(codes, lens))
        return FusedDecision(*(out[k, :B0] for k in range(8)))

    def decide_multi(self, masks: np.ndarray, lens: np.ndarray,
                     devices) -> FusedDecision:
        """Production multi-chip demux decisions: batch rows striped over
        explicit devices, each stripe running the SAME fused Pallas
        program as single-chip ``decide`` committed to its device; all
        stripes dispatch before any fetch, so chips compute
        concurrently; host concatenates (VERDICT r2 next#1 — the mesh
        demux path now runs the Pallas kernels)."""
        devices = list(devices)
        ndev = len(devices)
        B0, L = masks.shape
        stripe = -(-(-(-B0 // ndev)) // TB) * TB  # per-device, TB-padded
        lazies = []
        for k, dev in enumerate(devices):
            r0 = k * stripe
            if r0 >= B0:
                break
            r1 = min(r0 + stripe, B0)
            c = masks[r0:r1]
            ln = lens[r0:r1]
            if r1 - r0 < stripe:
                c = np.concatenate(
                    [c, np.zeros((stripe - (r1 - r0), L), c.dtype)])
                ln = np.concatenate(
                    [ln, np.zeros(stripe - (r1 - r0), ln.dtype)])
            a5, a27 = self._bank_on(dev)
            put = lambda x: jax.device_put(x, dev)
            out = _fused_core(
                a5, a27, put(c), put(ln.astype(np.int32)),
                self.t5.Ap, L, self.t27.Ap, self.interpret)
            lazies.append((r0, r1, out))
        parts = [np.asarray(o)[:, :r1 - r0] for r0, r1, o in lazies]
        full = np.concatenate(parts, axis=1)
        return FusedDecision(*(full[k] for k in range(8)))

    def assign(self, records: Sequence[Record], batch_size: int = 2048,
               max_len: int = 256):
        """Yield (rec_index, sp5_name|None, trimmed1 Record, sp27_name|None,
        final Record) per read — the exact per-read decisions of running
        demux.assign_reads for round 1 then round 2. Host work is fully
        vectorized: one ascii gather per chunk in, 2-bit packed upload,
        one vectorized materialization out."""
        import os
        from .demux import materialize_batch
        recs = list(records)
        out = []
        # 2-bit packed upload is opt-in: measured on the tunneled v5e it
        # saves 2.6x upload bytes but ZERO wall time (the link is
        # dispatch/compute-bound, not upload-bound — BENCH.md r3), while
        # adding a large one-time compile; parity is tested either way.
        packed = bool(os.environ.get("ORC_PACKED_UPLOAD"))
        # Pipelined two-phase structure: chunks pack + DISPATCH ahead of
        # the fetches through a bounded window (lazy device arrays, the
        # device queue runs ahead), so host materialization for chunk k
        # overlaps device compute for chunks k+1... (BENCH.md r3 demux
        # host-overlap). The window bounds in-flight uploads: a
        # million-read file must not stage ~500 x 4 MB read matrices on
        # device at once; 8 outstanding chunks keep the overlap.
        from collections import deque
        MAX_INFLIGHT = 8
        pending = deque()

        def _drain_one():
            s, chunk, lazy, B0, amat, lens = pending.popleft()
            full = np.asarray(lazy)
            d = FusedDecision(*(full[k, :B0] for k in range(8)))
            mat = materialize_batch(chunk, self.sp5.names,
                                    self.sp27.names, d.idx1, d.rc1,
                                    d.qe1, d.idx2, d.rc2, d.qs2,
                                    amat=amat, lens=lens)
            for i, dec in enumerate(mat):
                out.append((s + i,) + dec
                           + (bool(d.rc1[i]) and int(d.idx1[i]) >= 0,
                              int(d.err1[i]),
                              bool(d.rc2[i]) and int(d.idx2[i]) >= 0,
                              int(d.err2[i])))

        for s in range(0, len(recs), batch_size):
            chunk = recs[s:s + batch_size]
            amat, lens = encode.ascii_matrix(
                [r.seq for r in chunk],
                max_len=_pick_len(max((len(r.seq) for r in chunk),
                                      default=1), max_len))
            if packed:
                lazy = self._dispatch_packed(
                    encode.codes_matrix(amat, lens), lens)
            else:
                lazy = self._dispatch(
                    encode.read_masks_matrix(amat, lens), lens)
            try:
                # stream the (tiny [8, B]) result to host as soon as the
                # kernel finishes: the later np.asarray is then a local
                # read instead of a full relay round-trip (~29 ms/chunk
                # of pure latency measured r5)
                lazy.copy_to_host_async()
            except Exception:
                pass
            pending.append((s, chunk, lazy, len(chunk), amat, lens))
            if len(pending) >= MAX_INFLIGHT:
                _drain_one()
        while pending:
            _drain_one()
        return out

    def _dispatch(self, masks: np.ndarray, lens: np.ndarray):
        """Upload + launch the fused program; returns the lazy [8, B]
        device array (no fetch)."""
        B0, L = masks.shape
        B = -(-B0 // TB) * TB
        if B != B0:
            masks = np.concatenate(
                [masks, np.zeros((B - B0, L), masks.dtype)])
            lens = np.concatenate([lens, np.zeros(B - B0, lens.dtype)])
        return _fused_core(self._a5, self._a27, jnp.asarray(masks),
                           jnp.asarray(lens), self.t5.Ap, L, self.t27.Ap,
                           self.interpret)

    def _dispatch_packed(self, codes: np.ndarray, lens: np.ndarray):
        B0, L = codes.shape
        B = -(-B0 // TB) * TB
        if B != B0:
            codes = np.concatenate(
                [codes, np.full((B - B0, L), 4, codes.dtype)])
            lens = np.concatenate([lens, np.zeros(B - B0, lens.dtype)])
        p2, oth = encode.pack_codes_2bit(codes, lens)
        return _fused_core_packed(self._a5, self._a27, jnp.asarray(p2),
                                  jnp.asarray(oth), jnp.asarray(lens),
                                  self.t5.Ap, L, self.t27.Ap,
                                  self.interpret)

    def _materialize(self, ridx, rec, d: FusedDecision, i: int):
        from .demux import materialize_decision
        dec = materialize_decision(
            rec, self.sp5.names, self.sp27.names, int(d.idx1[i]),
            bool(d.rc1[i]), int(d.qe1[i]), int(d.idx2[i]), bool(d.rc2[i]),
            int(d.qs2[i]))
        return (ridx,) + dec + (bool(d.rc1[i]), int(d.err1[i]),
                                bool(d.rc2[i]), int(d.err2[i]))


def _pick_len(n: int, default_cap: int) -> int:
    """Bucket the padded length to bound device recompiles. The kernel
    column loop is O(L), so finer buckets around the COI amplicon range
    (300-900 bp + adapters) directly cut scan columns (384 saves 25% of
    the columns a 512 pad wastes on ~380 bp reads)."""
    for cap in (128, 256, 384, 512, 640, 768, 1024, 1536, 2048, 4096,
                8192):
        if n <= cap:
            return max(cap, default_cap) if cap <= default_cap else cap
    return encode.pad_to(n, 8192)
