"""Allele-purity regression: the VERDICT r1 #5 target (purity >= 0.99).

Dense clustered-het diploid (3 hotspots at 10% over 1.5 kb), noisy reads,
with inter-hotspot gaps LONGER than any read: no read can link adjacent
bubbles, so the information-theoretically correct output is one pure
haplotig pair per PHASE BLOCK (hifiasm/verkko-style), not a fabricated
genome-spanning pair.  Guards the round-2 purity stack end to end:

  * marginal-edge veto in transitive reduction (cross-hap zipper edges must
    not eliminate clean parallel arms: transitive.reduce_mask_np),
  * dirty-chord cutting after reduction (pop.cut_dirty_chords),
  * honest linkage bookkeeping (a read only links bubbles it CONSTRAINS:
    phasing.phase_chain `acted`) -> phase breaks at evidence-free gaps,
  * anchor-midpoint trimming of phase blocks (pipeline haplotig emission),
  * haplotype-pure polish + draft-guided round 2 (pipeline._polish_round2).

Reference: BASELINE.md bit-identical haplotig row (purity 1.0 is the
necessary condition for it).  The reference (phasm/phasing.py) emits one
haplotig set per bubble chain and has no explicit phase-block machinery;
splitting at evidence-free gaps is the stricter, honest contract.
"""
import numpy as np

from phasm_tpu import dna
from phasm_tpu.overlap import OverlapConfig, overlap_reads
from phasm_tpu.phasing import PhaseConfig
from phasm_tpu.pipeline import PipelineConfig, assemble
from phasm_tpu.sim import simulate_reads


def test_diploid_hotspot_allele_purity_and_identity():
    rs, truth = simulate_reads(
        seed=2, genome_len=36_000, ploidy=2, coverage=16, mean_read_len=4200,
        error_rate=0.04, indel_rate=0.0, snv_rate=0.0,
        hotspots=3, hotspot_rate=0.10, hotspot_width=1500,
        read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=800, backend="jnp"))
    cfg = PipelineConfig(
        min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
        evidence_max_error=0.5, phase=PhaseConfig(ploidy=2), polish=True,
    )
    res = assemble(rs, t, cfg)
    # 3 unlinkable hotspot gaps -> 3 phase blocks x 2 haplotypes
    assert res.stats["n_haplotigs"] == 6, res.stats

    h0g, h1g = truth.haplotypes
    diff_sites = np.nonzero(h0g != h1g)[0]
    purities = []
    majors: dict[str, int] = {}
    total_len = 0
    for name, h in res.haplotigs:
        total_len += len(h)
        best = None
        for seq in (h, dna.revcomp(h)):
            hs = dna.decode(seq)
            hits = sum(
                1 for c in range(1000, 30000, 3000)
                if dna.decode(h0g[c:c + 32]) in hs
            )
            if best is None or hits > best[0]:
                best = (hits, hs)
        hs = best[1]
        wrong = []
        for site in diff_sites[::5]:
            lo = max(int(site) - 8, 0)
            p0 = dna.decode(h0g[lo:lo + 17])
            p1 = dna.decode(h1g[lo:lo + 17])
            in0 = p0 in hs
            in1 = p1 in hs
            if in0 != in1:
                wrong.append(0 if in0 else 1)
        a = np.array(wrong)
        assert a.shape[0] >= 15, (name, "too few measurable het sites")
        maj = int(np.bincount(a).argmax())
        purity = 1.0 - float((a != maj).mean())
        purities.append(purity)
        majors[name] = maj
        # every phase block must be (near-)pure; most must be perfect
        assert purity >= 0.94, (name, purity)
    assert float(np.mean(purities)) >= 0.98, purities
    assert sum(p >= 0.99 for p in purities) >= 5, purities
    # within each block, the two haplotigs carry the two DIFFERENT haplotypes
    for b in range(3):
        pair = sorted(
            maj for name, maj in majors.items() if name.endswith(f"_b{b}")
        )
        assert pair == [0, 1], (b, majors)
    # blocks tile the genome: midpoint-trimmed, so each haplotype's blocks
    # sum to ~genome_len (anchors split, not duplicated)
    assert total_len >= 2 * 0.90 * 36_000, total_len


def test_read_grouped_round2_matches_single_group():
    """Device-budget read grouping in _polish_round2 (the c6 HBM-OOM fix):
    forcing multi-group execution via a tiny round2_device_budget must
    reach the same quality as the single-group path (placements are
    per-read independent; only the within-group max_occ filter differs, a
    candidate superset) and stay deterministic."""
    import numpy as np

    from phasm_tpu.eval import evaluate_assembly

    rs, truth = simulate_reads(
        seed=7, genome_len=30_000, ploidy=1, coverage=16,
        mean_read_len=3000, error_rate=0.06, read_len_spread=0.3,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=700, backend="jnp"))
    base = PipelineConfig(
        min_overlap_length=700, max_error_rate=0.16, length_fuzz=700,
        polish=True, round2_chunk=8192,
    )
    import dataclasses

    grouped_cfg = dataclasses.replace(base, round2_device_budget=1.0)
    res1 = assemble(rs, t, base)
    res2 = assemble(rs, t, grouped_cfg)
    q1 = evaluate_assembly(res1, truth)["kmer_identity"]["weighted_mean"]
    q2 = evaluate_assembly(res2, truth)["kmer_identity"]["weighted_mean"]
    assert abs(q1 - q2) < 0.02, (q1, q2)
    # deterministic under grouping
    res3 = assemble(rs, t, grouped_cfg)
    assert [(n, s.tobytes()) for n, s in res2.contigs] == [
        (n, s.tobytes()) for n, s in res3.contigs
    ]


def test_chunked_round2_polish_haploid_contig():
    """Haploid assemblies emit only contigs, which now get the draft-guided
    round-2 polish too (round-1 pileup votes with unitig members alone —
    contained reads never vote — leaving a ~1% error floor on
    indel-dominated reads, the c3/c6 ladder identity gap).  round2_chunk is
    forced below the contig length so the draft-chunking path (megabase
    drafts at c6 scale) is exercised: placements from overlapping chunks
    must dedup to one vote per (draft, read)."""
    from phasm_tpu.eval import evaluate_assembly

    rs, truth = simulate_reads(
        seed=7, genome_len=30_000, ploidy=1, coverage=16,
        mean_read_len=3000, error_rate=0.06, read_len_spread=0.3,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=700, backend="jnp"))
    cfg = PipelineConfig(
        min_overlap_length=700, max_error_rate=0.16, length_fuzz=700,
        polish=True, round2_chunk=8192,
    )
    res = assemble(rs, t, cfg)
    assert res.stats["n_contigs"] >= 1
    qc = evaluate_assembly(res, truth)
    assert qc["kmer_identity"]["weighted_mean"] >= 0.85, qc
    # deterministic (chunked placement dedup is order-stable)
    res2 = assemble(rs, t, cfg)
    assert [(n, s.tobytes()) for n, s in res.contigs] == [
        (n, s.tobytes()) for n, s in res2.contigs
    ]
