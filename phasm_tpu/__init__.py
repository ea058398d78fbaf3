"""phasm_tpu — a TPU-native haplotype-aware de novo assembly engine.

A from-scratch rebuild of the capabilities of AbeelLab/phasm (haplotype-aware
assembly of aneuploid/polyploid organisms from noisy long reads), designed
TPU-first:

* all-vs-all long-read overlap detection as batched seed-extend alignment
  kernels (Pallas) — replacing the external DAZZ_DB/DALIGNER C stack the
  reference shells out to,
* string-graph construction and cleaning (transitive reduction, tip removal,
  unambiguous-path merging) as vectorized JAX ops over flat edge tensors —
  replacing the reference's networkx object graph,
* superbubble-chain phasing re-expressed as a masked dynamic program over
  padded candidate/path tensors — replacing the reference's per-object
  branch/score/prune loop,
* data-parallel sharding of reads and candidate pairs over a
  `jax.sharding.Mesh` with `shard_map` + lax collectives for multi-host
  scale-out (the reference is single-process Python).

Layer map (mirrors SURVEY.md §2):

  io/         FASTA, GFA2, DALIGNER-dump interop         (ref: phasm/io/*)
  reads       packed read tensors, oriented-read ids      (ref: phasm/alignments.py :: Read, OrientedRead)
  alignments  alignment table + classification            (ref: phasm/alignments.py :: LocalAlignment, AlignmentType)
  filter      alignment stream filters                    (ref: phasm/filter.py)
  overlap/    seeding + banded extension (Pallas)         (ref: external DALIGNER)
  graph/      string graph build + cleaning passes        (ref: phasm/assembly_graph.py)
  bubbles     superbubble detection + chains              (ref: phasm/bubbles.py)
  phasing     bubble-chain phasing DP                     (ref: phasm/phasing.py)
  parallel/   mesh / sharding / collective merge          (no reference counterpart)
  cli         pipeline subcommands                        (ref: phasm CLI)

Reference citations use module::symbol form; the reference mount was empty
during the survey (SURVEY.md §0), so no file:line anchors exist yet.
"""

__version__ = "0.1.0"

from phasm_tpu.reads import ReadSet  # noqa: F401
from phasm_tpu.alignments import AlignmentTable, AlignmentType  # noqa: F401
