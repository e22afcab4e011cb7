"""tpu_orc — TPU-native nanopore amplicon barcoding engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
srisarya/nanopore-barcoding-ORC pipeline (reference mounted read-only at
/root/reference): read reorientation (pychopper-equivalent), dual-index
demultiplexing with cutadapt-equivalent semantics, all-vs-all edit-distance
clustering + consensus (amplicon_sorter-equivalent), linked-primer cleanup,
and 18S/28S rRNA extraction — batched on TPU, data-parallel over device
meshes.

Layering (see SURVEY.md §7):
    io/       FASTQ/FASTA parsing, base encoding, batching
    align/    alignment semantics: CPU oracle + batched JAX + Pallas kernels
    native/   C++ CPU oracle (parity + host-side consensus hot paths)
    demux/    reorientation, dual-round demux, primer cleanup
    cluster/  all-vs-all clustering + consensus ladder
    rrna/     profile-HMM 18S/28S extraction
    dist/     mesh setup + shard_map data parallelism
    pipeline/ stage graph + reports
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the Myers/locate scan kernels are
# compile-heavy (unrolled word loops); caching makes reruns and tests fast.
# Must be set before the JAX backend initializes; harmless if jax was
# imported first (best effort).
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
