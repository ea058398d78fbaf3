"""Allele-purity regression: the VERDICT r1 #5 target (purity >= 0.99).

Clustered-het diploid (4 hotspots at 10%), noisy reads: every het site
carried by a haplotig must come from ONE haplotype.  Guards the round-2
mechanism stack: maximal-intersection path consistency + window-sharpened
touch evidence (phasing.consistent_paths / read_touch_errs), anchor-read
assignment refinement, haplotype-pure polish, and the draft-guided
placement polish round (pipeline._polish_round2).

Reference: BASELINE.md bit-identical haplotig row (purity 1.0 is the
necessary condition for it).
"""
import numpy as np

from phasm_tpu import dna
from phasm_tpu.overlap import OverlapConfig, overlap_reads
from phasm_tpu.phasing import PhaseConfig
from phasm_tpu.pipeline import PipelineConfig, assemble
from phasm_tpu.sim import simulate_reads


def test_diploid_hotspot_allele_purity_and_identity():
    rs, truth = simulate_reads(
        seed=2, genome_len=60_000, ploidy=2, coverage=18, mean_read_len=5000,
        error_rate=0.04, indel_rate=0.0, snv_rate=0.0,
        hotspots=4, hotspot_rate=0.10, hotspot_width=2000,
        read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=800, backend="jnp"))
    cfg = PipelineConfig(
        min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
        evidence_max_error=0.5, phase=PhaseConfig(ploidy=2), polish=True,
    )
    res = assemble(rs, t, cfg)
    assert res.stats["n_haplotigs"] == 2

    h0g, h1g = truth.haplotypes
    diff_sites = np.nonzero(h0g != h1g)[0]
    majors = []
    for name, h in res.haplotigs:
        # haplotigs span (nearly) the whole genome
        assert len(h) > 0.95 * 60_000, (name, len(h))
        best = None
        for seq in (h, dna.revcomp(h)):
            hs = dna.decode(seq)
            hits = sum(
                1 for c in range(1000, 40000, 3000)
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
        assert a.shape[0] >= 100, "too few measurable het sites"
        maj = int(np.bincount(a).argmax())
        purity = 1.0 - float((a != maj).mean())
        majors.append(maj)
        assert purity >= 0.99, (name, purity)
    # the two haplotigs carry the two DIFFERENT haplotypes
    assert sorted(majors) == [0, 1]
