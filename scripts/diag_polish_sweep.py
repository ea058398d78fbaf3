"""Sweep polish config variants on the failing-test scenario."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

from phasm_tpu.eval import evaluate_assembly
from phasm_tpu.overlap import OverlapConfig, overlap_reads
from phasm_tpu.pipeline import PipelineConfig, assemble
from phasm_tpu.sim import simulate_reads

rs, truth = simulate_reads(
    seed=7, genome_len=30_000, ploidy=1, coverage=16,
    mean_read_len=3000, error_rate=0.06, read_len_spread=0.3,
)
t = overlap_reads(rs, OverlapConfig(min_overlap=700, backend="jnp"))

variants = {
    "base(iters2)": {},
    "iters3": {"polish_iters": 3},
    "iters4": {"polish_iters": 4},
    "mincov2": {"polish_min_cov": 2},
    "iters3+mincov2": {"polish_iters": 3, "polish_min_cov": 2},
    "trim1": {"round2_trim_cov": 1},
    "iters3+trim1+mincov2": {
        "polish_iters": 3, "round2_trim_cov": 1, "polish_min_cov": 2,
    },
}
for name, kw in variants.items():
    cfg = PipelineConfig(
        min_overlap_length=700, max_error_rate=0.16, length_fuzz=700,
        polish=True, round2_chunk=8192, **kw,
    )
    res = assemble(rs, t, cfg)
    qc = evaluate_assembly(res, truth)
    print(f"{name:24s} kmer_id={qc['kmer_identity']['weighted_mean']:.4f} "
          f"completeness={qc['completeness']:.4f} "
          f"len={sum(len(s) for _, s in res.contigs)}")
    sys.stdout.flush()
