"""Overlap detection engine (replaces the reference's external DAZZ_DB +
DALIGNER C stack — SURVEY.md §3.2).

  seeding.py   minimizer extraction + sort-based k-mer matching -> candidate
               pairs with diagonal estimates (DALIGNER's k-mer sort/merge)
  extend.py    banded overlap alignment: numpy oracle, batched jnp (scan) and
               the Pallas TPU kernel (DALIGNER's wave extension)
  engine.py    end-to-end: ReadSet -> AlignmentTable
"""

from phasm_tpu.overlap.engine import OverlapConfig, overlap_reads  # noqa: F401,E402
