"""Evaluator correctness: the ladder's accuracy columns must themselves be
trustworthy (they are the evidence artifact for BASELINE.md parity)."""
import numpy as np

from phasm_tpu import dna
from phasm_tpu.eval import allele_purity, kmer_identity, kmer_pack


def test_kmer_pack_matches_bruteforce():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 4, 50).astype(np.uint8)
    k = 5
    got = kmer_pack(c, k)
    assert got.shape[0] == 50 - k + 1
    for i in range(got.shape[0]):
        val = 0
        for j in range(k):
            val = (val << 2) | int(c[i + j])
        assert int(got[i]) == val


def test_kmer_identity_exact_and_revcomp():
    rng = np.random.default_rng(1)
    h = rng.integers(0, 4, 2000).astype(np.uint8)
    out = kmer_identity([("a", h.copy()), ("b", dna.revcomp(h))], [h])
    assert out["kmer_identity"]["per_output"]["a"] == 1.0
    assert out["kmer_identity"]["per_output"]["b"] == 1.0
    assert out["completeness"] == 1.0


def test_kmer_identity_detects_errors_and_missing_genome():
    rng = np.random.default_rng(2)
    h = rng.integers(0, 4, 4000).astype(np.uint8)
    bad = h.copy()
    bad[::100] = (bad[::100] + 1) % 4  # 1% error
    out = kmer_identity([("bad", bad)], [h])
    frac = out["kmer_identity"]["per_output"]["bad"]
    # one error kills up to 32 consecutive k-mers: expect ~(1-0.01)^32
    assert 0.5 < frac < 0.85
    # half the genome missing -> completeness ~0.5
    out2 = kmer_identity([("half", h[:2000])], [h])
    assert 0.4 < out2["completeness"] < 0.6
    assert out2["kmer_identity"]["per_output"]["half"] == 1.0


def test_allele_purity_pure_and_chimeric():
    rng = np.random.default_rng(3)
    h0 = rng.integers(0, 4, 6000).astype(np.uint8)
    h1 = h0.copy()
    sites = np.arange(100, 5900, 40)
    h1[sites] = (h1[sites] + 1 + rng.integers(0, 3, sites.shape[0])) % 4
    pure = h0[50:5950]
    chim = np.concatenate([h0[50:3000], h1[3000:5950]])
    out = allele_purity(
        [("pure", pure), ("chim", chim), ("rc", dna.revcomp(h1))],
        [h0, h1],
        site_stride=1,
    )["allele_purity"]
    assert out["per_haplotig"]["pure"] == 1.0
    assert out["per_haplotig"]["rc"] == 1.0
    assert 0.4 < out["per_haplotig"]["chim"] < 0.62
    assert out["n_measured"] == 3


def test_allele_purity_ploidy1_is_none():
    h = np.zeros(1000, dtype=np.uint8)
    assert allele_purity([("x", h)], [h])["allele_purity"] is None


def test_run_rung_smallest_carries_qc_columns():
    """c1 end-to-end on CPU: the ladder line must contain the accuracy
    columns and they must clear the quality bar the purity suite guards."""
    from phasm_tpu.configs import ladder, run_rung

    c1 = ladder()[0]
    stats = run_rung(c1, backend="jnp")
    # completeness ~0.91 is structural on c1: anchor-midpoint trims at the
    # two interior phase-block boundaries plus low-coverage genome ends
    # (honest trimming, not missing assembly)
    assert stats["qc_completeness"] > 0.85, stats
    assert stats["qc_kmer_identity"] > 0.85, stats
    # the phase-gap corroboration rule (PhaseConfig.min_link_reads) is what
    # holds this at 1.0 — a single noisy linking read once welded two
    # 10-kb-separated bubbles into a 0.51-purity chimera on exactly this rung
    assert stats["qc_allele_purity"] is not None and stats[
        "qc_allele_purity"
    ] >= 0.99, stats
