"""Read reorientation + quality filter (pychopper-equivalent).

Replaces /root/reference/scripts/01_pychopper.sh:45-57:
    pychopper -b M13_seqs_for_pychopper.fa -c M13_config_for_pychopper.txt
              -k LSK114 -Q 10 -m edlib -p -t 24
with outputs pass / rescued / unclass / short + stats.

Behavior implemented:
  * primer profiles from the -b FASTA (SP5/SP27 with N17 variable segments,
    adapters_primers/M13_seqs_for_pychopper.fa:1-4); N wildcards match any
    base and are excluded from the error budget;
  * orientation configs parsed from the -c file format
    ``+:SP5,-SP27|-:SP27,-SP5`` (M13_config_for_pychopper.txt:1): a valid
    + read carries SP5 then revcomp(SP27); a valid - read the mirror, and
    is reverse-complemented to + on output;
  * mean-Q >= Q filter (reads below go to unclass);
  * primer-to-primer trimming (-p): output = segment between the two
    primer hits, + oriented;
  * fused-read rescue (-w): after a valid segment is cut, the remainder of
    the read is re-scanned (up to ``max_segments``); extra segments go to
    the rescued bin;
  * segments shorter than ``min_len`` go to the short bin.

Primer hits are scored on device with the batched locate kernel in INFIX
mode (full primer aligned, free read prefix/suffix) — pychopper's edlib
(HW) backend semantics. The hit threshold is errors <= max_error_rate *
effective primer length (Ns excluded), default 0.25 mirroring pychopper's
lenient per-primer cutoff.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..align.spec import Flag
from ..io import encode
from ..io.fastq import Record, write_records
from .adapters import AdapterBank
from .demux import locate_batch

INFIX = Flag.START_WITHIN_SEQ2 | Flag.STOP_WITHIN_SEQ2


@dataclass
class ReorientConfig:
    qmin: float = 10.0            # -Q
    max_error_rate: float = 0.25  # per-primer hit threshold (edlib backend)
    min_len: int = 50             # -z minimum segment length
    max_segments: int = 4         # fused-read rescue bound
    min_primer_overlap: int = 3
    # pychopper -p "keep primers, trim the rest" (01_pychopper.sh:54):
    # the segment spans [primer5.start, primer3.end] so the dual-index
    # adapters survive for stage-02 demultiplexing. False trims to the
    # insert between the primers.
    keep_primers: bool = True


@dataclass
class ReorientResult:
    passed: List[Record] = field(default_factory=list)
    rescued: List[Record] = field(default_factory=list)
    unclass: List[Record] = field(default_factory=list)
    short: List[Record] = field(default_factory=list)
    stats: Dict[str, int] = field(default_factory=dict)


def parse_orientation_config(text: str) -> List[Tuple[str, List[str]]]:
    """'+:SP5,-SP27|-:SP27,-SP5' -> [('+', ['SP5','-SP27']), ...]"""
    out = []
    for part in text.strip().split("|"):
        sign, seglist = part.split(":")
        out.append((sign.strip(), [s.strip() for s in seglist.split(",")]))
    return out


def build_primer_bank(primer_fasta: str, e: float) -> Tuple[AdapterBank, List[str]]:
    """Bank of each primer and its reverse complement ('-NAME')."""
    from ..io.fastq import read_fasta
    pairs = []
    for rec in read_fasta(primer_fasta):
        pairs.append((rec.id, rec.seq.upper()))
        pairs.append(("-" + rec.id, encode.revcomp(rec.seq.upper())))
    bank = AdapterBank.from_pairs(pairs, e)
    return bank, [p[0] for p in pairs]


class Reorienter:
    def __init__(self, primer_fasta: str, config_text: str,
                 cfg: ReorientConfig = ReorientConfig()):
        self.cfg = cfg
        self.bank, self.names = build_primer_bank(primer_fasta,
                                                  cfg.max_error_rate)
        self.configs = parse_orientation_config(config_text)
        self.name_idx = {n: i for i, n in enumerate(self.names)}

    # ------------------------------------------------------------------
    def _locate_all(self, seqs: Sequence[str]):
        """Best infix hit of every primer/strand in every sequence."""
        res = locate_batch(self.bank, list(seqs), INFIX,
                           self.cfg.min_primer_overlap)
        return {k: np.asarray(v) for k, v in res._asdict().items()}

    def _classify(self, seq: str, hits, b: int) -> Optional[Tuple[str, int, int]]:
        """Match hit layout against the orientation configs.

        Returns (sign, seg_start, seg_end) on the *input* sequence
        coordinates, where the segment excludes both primers."""
        for sign, segs in self.configs:
            if len(segs) != 2:
                continue
            i5 = self.name_idx[segs[0]]
            i3 = self.name_idx[segs[1]]
            if not (hits["valid"][b, i5] and hits["valid"][b, i3]):
                continue
            end5 = int(hits["querystop"][b, i5])
            start3 = int(hits["querystart"][b, i3])
            if end5 <= start3:
                if self.cfg.keep_primers:
                    return (sign, int(hits["querystart"][b, i5]),
                            int(hits["querystop"][b, i3]))
                return sign, end5, start3
        return None

    # ------------------------------------------------------------------
    def run(self, records: Sequence[Record], batch_size: int = 256
            ) -> ReorientResult:
        cfg = self.cfg
        out = ReorientResult()
        stats = {"total": 0, "pass": 0, "rescued_segments": 0,
                 "unclass": 0, "short": 0, "low_q": 0}
        for start in range(0, len(records), batch_size):
            chunk = records[start:start + batch_size]
            q_ok = [r.mean_q() >= cfg.qmin or r.qual is None for r in chunk]
            work = [(r, r.seq.upper(), r.qual, 0) for r, ok in
                    zip(chunk, q_ok) if ok]
            for r, ok in zip(chunk, q_ok):
                stats["total"] += 1
                if not ok:
                    stats["low_q"] += 1
                    stats["unclass"] += 1
                    out.unclass.append(r)
            # iterative segmentation for fused reads
            depth = 0
            while work and depth < cfg.max_segments:
                hits = self._locate_all([w[1] for w in work])
                nxt = []
                for b, (rec, seq, qual, seg_no) in enumerate(work):
                    cls = self._classify(seq, hits, b)
                    if cls is None:
                        if seg_no == 0:
                            stats["unclass"] += 1
                            out.unclass.append(rec)
                        continue
                    sign, s0, s1 = cls
                    seg = seq[s0:s1]
                    segq = qual[s0:s1] if qual else None
                    if sign == "-":
                        seg = encode.revcomp(seg)
                        segq = segq[::-1] if segq else None
                    name = rec.id if seg_no == 0 else f"{rec.id}|seg{seg_no}"
                    nr = Record(name, name, seg, segq)
                    if len(seg) < cfg.min_len:
                        stats["short"] += 1
                        out.short.append(nr)
                    elif seg_no == 0:
                        stats["pass"] += 1
                        out.passed.append(nr)
                    else:
                        stats["rescued_segments"] += 1
                        out.rescued.append(nr)
                    # remainder after the 3' primer hit for fused reads
                    i3 = self.name_idx[
                        [c for c in self.configs if c[0] == sign][0][1][1]]
                    rest_start = int(hits["querystop"][b, i3])
                    rest = seq[rest_start:]
                    restq = qual[rest_start:] if qual else None
                    if len(rest) >= cfg.min_len + 10:
                        nxt.append((rec, rest, restq, seg_no + 1))
                work = nxt
                depth += 1
        out.stats = stats
        return out


def reorient_file(in_path: str, primer_fasta: str, config_path: str,
                  outdir: str, name: str,
                  cfg: ReorientConfig = ReorientConfig()) -> ReorientResult:
    """File-level wrapper reproducing the 01_pychopper.sh output layout."""
    from ..io.fastq import read_records
    with open(config_path) as fh:
        config_text = fh.read()
    r = Reorienter(primer_fasta, config_text, cfg)
    res = r.run(list(read_records(in_path)))
    os.makedirs(outdir, exist_ok=True)
    write_records(os.path.join(outdir, f"{name}_pass.fastq"), res.passed,
                  fmt="fastq")
    write_records(os.path.join(outdir, f"{name}_rescued.fastq"), res.rescued,
                  fmt="fastq")
    write_records(os.path.join(outdir, f"{name}_unclass.fastq"), res.unclass,
                  fmt="fastq")
    write_records(os.path.join(outdir, f"{name}_short.fastq"), res.short,
                  fmt="fastq")
    with open(os.path.join(outdir, f"{name}_stats.out"), "w") as fh:
        for k, v in res.stats.items():
            fh.write(f"{k}\t{v}\n")
    return res
