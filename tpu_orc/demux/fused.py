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


@functools.partial(jax.jit,
                   static_argnames=("Ap5", "Ap27", "L", "interpret"))
def _fused_core(t5, t27, masks, lens, Ap5: int, L: int, Ap27: int,
                interpret: bool = False):
    """masks [B, L] uint8 (B % TB == 0), lens [B] int32."""
    B = masks.shape[0]
    m32 = masks.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    rc = _revcomp_rows(m32, lens)
    both = jnp.concatenate([m32, rc], axis=0)
    lens2 = jnp.concatenate([lens, lens])

    # round 1: FRONT over SP5, fwd + rc in one kernel launch
    m, c, o, q, v, r = locate_tiles(
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
    m, c, o, q, v, r = locate_tiles(
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

    def decide(self, masks: np.ndarray, lens: np.ndarray) -> FusedDecision:
        """masks [B0, L] uint8, lens [B0] -> FusedDecision (numpy)."""
        B0, L = masks.shape
        B = -(-B0 // TB) * TB
        if B != B0:
            masks = np.concatenate(
                [masks, np.zeros((B - B0, L), masks.dtype)])
            lens = np.concatenate([lens, np.zeros(B - B0, lens.dtype)])
        out = np.asarray(_fused_core(
            self._a5, self._a27, jnp.asarray(masks), jnp.asarray(lens),
            self.t5.Ap, L, self.t27.Ap, self.interpret))
        return FusedDecision(*(out[k, :B0] for k in range(8)))

    def assign(self, records: Sequence[Record], batch_size: int = 2048,
               max_len: int = 512):
        """Yield (rec_index, sp5_name|None, trimmed1 Record, sp27_name|None,
        final Record) per read — the exact per-read decisions of running
        demux.assign_reads for round 1 then round 2."""
        recs = list(records)
        out = []
        for s in range(0, len(recs), batch_size):
            chunk = recs[s:s + batch_size]
            seqs = [r.seq.upper() for r in chunk]
            Lc = max((len(x) for x in seqs), default=1)
            L = _pick_len(max(Lc, 1), max_len)
            masks, lens = encode.pack_batch(
                seqs, max_len=L, pad_multiple=1,
                encoder=encode.encode_read_masks, pad_value=0)
            d = self.decide(masks, lens)
            for i, rec in enumerate(chunk):
                out.append(self._materialize(s + i, rec, d, i))
        return out

    def _materialize(self, ridx, rec, d: FusedDecision, i: int):
        from .demux import materialize_decision
        dec = materialize_decision(
            rec, self.sp5.names, self.sp27.names, int(d.idx1[i]),
            bool(d.rc1[i]), int(d.qe1[i]), int(d.idx2[i]), bool(d.rc2[i]),
            int(d.qs2[i]))
        return (ridx,) + dec + (bool(d.rc1[i]), int(d.err1[i]),
                                bool(d.rc2[i]), int(d.err2[i]))


def _pick_len(n: int, default_cap: int) -> int:
    """Bucket the padded length to bound device recompiles."""
    for cap in (128, 256, 512, 1024, 2048, 4096, 8192):
        if n <= cap:
            return max(cap, default_cap) if cap <= default_cap else cap
    return encode.pad_to(n, 8192)
