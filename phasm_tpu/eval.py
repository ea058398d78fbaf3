"""Assembly quality evaluators vs simulated truth.

The BASELINE.md acceptance row is *bit-identical haplotigs vs the
reference* — unmeasurable while `/root/reference/` is empty (SURVEY.md §0),
so the ladder artifact records the necessary conditions instead
(VERDICT r3 weak #6: the artifact that proves reference-capability parity
must carry quality columns, not just topology/wall time):

  * k-mer identity   — fraction of each output's 32-mers present in the
                       simulated truth haplotypes (strand-aware; one base
                       error kills 32 consecutive k-mers, so this is a
                       sharp proxy: identity e maps to ~(1-e)^32);
  * completeness     — fraction of truth 32-mers covered by the union of
                       outputs (missing genome shows here, not in identity);
  * allele purity    — at simulated het sites, the majority-haplotype
                       fraction of each haplotig's discriminating probes
                       (tests/test_purity.py semantics, generalized to any
                       ploidy and vectorized for 10^7-base outputs).

All k-mers are packed 2-bit codes in uint64 (k <= 32), so a 10 Mb rung
evaluates in seconds via searchsorted membership against the sorted truth
set — no Python string sets, no per-call re-sorts.

Reference: phasm has no in-repo evaluator; thesis validation measured
haplotype reconstruction accuracy on simulated aneuploid yeast
(SURVEY.md §5 "Phasing" row) — these are the same quantities, made
reproducible.
"""
from __future__ import annotations

import numpy as np

from phasm_tpu import dna


def kmer_pack(codes: np.ndarray, k: int = 32) -> np.ndarray:
    """All k-mers of a base-code array as uint64 (2 bits/base, k <= 32)."""
    assert k <= 32
    c = codes.astype(np.uint64)
    n = c.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        out = (out << np.uint64(2)) | c[j : j + n]
    return out


def _both_strand_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    return np.concatenate(
        [kmer_pack(codes, k), kmer_pack(dna.revcomp(codes), k)]
    )


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership of values in an ALREADY-SORTED unique array.

    np.isin re-sorts its larger operand on every call — against a 10 Mb
    genome's ~2x10^7-kmer truth set, per-output calls took ~1 s EACH
    (measured 1780 s for the c6 rung's eval).  searchsorted is |values|
    x log|truth| per call."""
    if sorted_arr.shape[0] == 0 or values.shape[0] == 0:
        return np.zeros(values.shape, dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos = np.minimum(pos, sorted_arr.shape[0] - 1)
    return sorted_arr[pos] == values


def kmer_identity(
    outputs: list[tuple[str, np.ndarray]],
    haplotypes: list[np.ndarray],
    k: int = 32,
) -> dict:
    """Per-output and length-weighted identity/completeness vs truth."""
    truth = np.unique(
        np.concatenate(
            [_both_strand_kmers(h, k) for h in haplotypes]
            or [np.empty(0, np.uint64)]
        )
    )
    per_output = {}
    covered_parts = []
    wsum = 0.0
    wtot = 0
    for name, seq in outputs:
        km = kmer_pack(np.asarray(seq, dtype=np.uint8), k)
        if km.shape[0] == 0:
            per_output[name] = 0.0
            continue
        hit = _in_sorted(km, truth)
        frac = float(hit.mean())
        per_output[name] = round(frac, 4)
        wsum += frac * km.shape[0]
        wtot += km.shape[0]
        covered_parts.append(
            _both_strand_kmers(np.asarray(seq, dtype=np.uint8), k)
        )
    covered = (
        np.unique(np.concatenate(covered_parts))
        if covered_parts
        else np.empty(0, np.uint64)
    )
    completeness = (
        float(_in_sorted(truth, covered).mean()) if truth.shape[0] else 0.0
    )
    return {
        "kmer_identity": {
            "per_output": per_output,
            "weighted_mean": round(wsum / wtot, 4) if wtot else 0.0,
            "min": round(min(per_output.values()), 4) if per_output else 0.0,
        },
        "completeness": round(completeness, 4),
    }


def allele_purity(
    haplotigs: list[tuple[str, np.ndarray]],
    haplotypes: list[np.ndarray],
    probe: int = 17,
    site_stride: int = 5,
    min_sites: int = 8,
) -> dict:
    """Majority-haplotype fraction at discriminating het-site probes.

    Sites where the (equal-length, indel-free) truth haplotypes differ are
    probed with a `probe`-mer centered on the site; a haplotig votes for
    haplotype m at a site iff exactly m's probe occurs in it (either
    strand).  Purity of a haplotig = majority vote fraction; haplotigs with
    fewer than `min_sites` discriminating probes are reported as None
    (anchors / short phase blocks carry no het signal).  Semantics match
    tests/test_purity.py, vectorized and ploidy-general.
    """
    if len(haplotypes) < 2 or len(
        {h.shape[0] for h in haplotypes}
    ) != 1:
        return {"allele_purity": None}
    H = np.stack(haplotypes)  # [k, G]
    diff = np.nonzero((H != H[0:1]).any(axis=0))[0]
    diff = diff[(diff >= probe) & (diff < H.shape[1] - probe)][::site_stride]
    if diff.shape[0] == 0:
        return {"allele_purity": None}
    half = probe // 2
    # probe k-mers per (hap, site)
    probes = np.stack(
        [
            kmer_pack(h, probe)[diff - half]
            for h in haplotypes
        ]
    )  # [k, S]
    per_output = {}
    vals = []
    for name, seq in haplotigs:
        codes = np.asarray(seq, dtype=np.uint8)
        if codes.shape[0] < probe:
            per_output[name] = None
            continue
        own = np.unique(_both_strand_kmers(codes, probe))
        present = _in_sorted(probes.ravel(), own).reshape(probes.shape)  # [k, S]
        discrim = present.sum(axis=0) == 1
        n_sites = int(discrim.sum())
        if n_sites < min_sites:
            per_output[name] = None
            continue
        votes = present[:, discrim].sum(axis=1)
        purity = float(votes.max() / n_sites)
        per_output[name] = round(purity, 4)
        vals.append(purity)
    return {
        "allele_purity": {
            "per_haplotig": per_output,
            "min": round(min(vals), 4) if vals else None,
            "mean": round(float(np.mean(vals)), 4) if vals else None,
            "n_measured": len(vals),
        }
    }


def evaluate_assembly(result, truth, k: int = 32) -> dict:
    """All quality columns for one ladder rung (AssemblyResult + SimTruth)."""
    outputs = list(result.haplotigs) + list(result.contigs)
    out = kmer_identity(outputs, truth.haplotypes, k=k)
    out.update(allele_purity(result.haplotigs, truth.haplotypes))
    return out
