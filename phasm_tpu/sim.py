"""Polyploid genome + noisy long-read simulator (test/bench substrate).

The reference validated phasing on simulated aneuploid yeast reads
(SURVEY.md §5); it has no in-repo simulator.  This module provides a
deterministic one so every config of the BASELINE.md ladder has a
CPU-runnable ground-truth instance (config 1: synthetic diploid 50 kb,
~500 simulated CLR reads).

All randomness flows through one ``np.random.Generator`` seeded by the
caller, so datasets are bit-reproducible.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from phasm_tpu import dna
from phasm_tpu.reads import ReadSet


@dataclasses.dataclass
class SimTruth:
    """Ground truth for simulated reads."""

    haplotypes: list[np.ndarray]  # per-haplotype base-code arrays
    read_hap: np.ndarray  # [N] haplotype index of each read
    read_pos: np.ndarray  # [N] start position on its haplotype
    read_strand: np.ndarray  # [N] 0 fwd / 1 rc


def simulate_haplotypes(
    rng: np.random.Generator,
    genome_len: int = 50_000,
    ploidy: int = 2,
    snv_rate: float = 0.01,
    indel_rate: float = 0.001,
    hotspots: int = 0,
    hotspot_width: int = 1500,
    hotspot_rate: float = 0.05,
) -> list[np.ndarray]:
    """Random base haplotype + `ploidy-1` divergent copies (SNVs + short indels).

    With ``hotspots > 0``, divergence is *clustered*: `hotspots` evenly-spaced
    windows of `hotspot_width` bp carry dense SNVs at `hotspot_rate`, and the
    background carries `snv_rate`.  Clustered divergence is what produces
    superbubble structure in the string graph (cross-haplotype overlaps
    spanning a hotspot exceed the error-rate filter and break, while the
    identical background keeps haplotypes merged between bubbles).
    """
    base = rng.integers(0, 4, size=genome_len).astype(np.uint8)
    rate = np.full(genome_len, snv_rate)
    if hotspots > 0:
        span = genome_len // (hotspots + 1)
        for i in range(1, hotspots + 1):
            c = i * span
            rate[max(0, c - hotspot_width // 2) : c + hotspot_width // 2] = hotspot_rate
    haps = [base]
    for _ in range(ploidy - 1):
        h = base.copy()
        snv_mask = rng.random(genome_len) < rate
        pos = np.nonzero(snv_mask)[0]
        h[pos] = (h[pos] + rng.integers(1, 4, size=pos.shape[0])) % 4
        # short indels
        n_ind = rng.poisson(indel_rate * genome_len)
        parts, cur = [], 0
        cuts = np.sort(rng.choice(genome_len, size=min(n_ind, genome_len // 10), replace=False))
        for c in cuts:
            parts.append(h[cur:c])
            if rng.random() < 0.5:  # insertion
                parts.append(rng.integers(0, 4, size=int(rng.integers(1, 4))).astype(np.uint8))
                cur = c
            else:  # deletion
                cur = min(genome_len, c + int(rng.integers(1, 4)))
        parts.append(h[cur:])
        haps.append(np.concatenate(parts))
    return haps


def mutate_read(rng: np.random.Generator, seq: np.ndarray, error_rate: float) -> np.ndarray:
    """Apply CLR-style errors: ~50% ins, 30% del, 20% sub of the error budget.

    Fully vectorized (megabase read sets are generated in tests and benches).
    """
    if error_rate <= 0:
        return seq
    n = seq.shape[0]
    r = rng.random(n)
    p_ins, p_del, p_sub = 0.5 * error_rate, 0.3 * error_rate, 0.2 * error_rate
    ins = r < p_ins
    dele = (r >= p_ins) & (r < p_ins + p_del)
    sub = (r >= p_ins + p_del) & (r < p_ins + p_del + p_sub)

    out = seq.copy()
    out[sub] = (out[sub] + rng.integers(1, 4, int(sub.sum()))) % 4
    # each position expands to 2 codes (inserted random + original), 1, or 0
    reps = np.where(ins, 2, np.where(dele, 0, 1))
    res = np.repeat(out, reps)
    starts = np.cumsum(reps) - reps  # output offset of each input position
    ins_pos = starts[ins]
    res[ins_pos] = rng.integers(0, 4, ins_pos.shape[0])
    return res.astype(np.uint8)


def simulate_reads(
    seed: int = 0,
    genome_len: int = 50_000,
    ploidy: int = 2,
    coverage: float = 25.0,
    mean_read_len: int = 5_000,
    min_read_len: int = 1_000,
    error_rate: float = 0.05,
    snv_rate: float = 0.01,
    indel_rate: float = 0.0005,
    hotspots: int = 0,
    hotspot_width: int = 1500,
    hotspot_rate: float = 0.05,
    read_len_spread: float | None = None,
    circular: bool = False,
) -> tuple[ReadSet, SimTruth]:
    """Simulate a polyploid read set with ground truth.

    Read lengths ~ clipped exponential around mean (CLR-like) by default;
    with ``read_len_spread`` set, uniform in mean*(1±spread) instead (narrow
    distributions keep containment low, which bubble-structure tests want).
    Positions uniform; strand uniform; per-base errors in :func:`mutate_read`.
    """
    rng = np.random.default_rng(seed)
    haps = simulate_haplotypes(
        rng, genome_len, ploidy, snv_rate, indel_rate,
        hotspots=hotspots, hotspot_width=hotspot_width, hotspot_rate=hotspot_rate,
    )
    # `coverage` is per-haplotype depth; total sequenced bases scale with ploidy
    n_reads = int(coverage * genome_len * ploidy / mean_read_len)
    n_reads = max(n_reads, 10)

    seqs, read_hap, read_pos, read_strand = [], [], [], []
    for _ in range(n_reads):
        h = int(rng.integers(0, ploidy))
        hap = haps[h]
        if read_len_spread is not None:
            lo = mean_read_len * (1.0 - read_len_spread)
            hi = mean_read_len * (1.0 + read_len_spread)
            ln = int(rng.uniform(lo, hi))
        else:
            ln = int(np.clip(rng.exponential(mean_read_len * 0.4) + mean_read_len * 0.6,
                             min_read_len, mean_read_len * 3))
        ln = min(ln, hap.shape[0])
        pos = int(rng.integers(0, hap.shape[0] - ln + 1))
        raw = hap[pos : pos + ln]
        raw = mutate_read(rng, raw, error_rate)
        strand = int(rng.integers(0, 2))
        if strand:
            raw = dna.revcomp(raw)
        seqs.append(dna.decode(raw))
        read_hap.append(h)
        read_pos.append(pos)
        read_strand.append(strand)

    names = [f"sim_h{read_hap[i]}_p{read_pos[i]}_s{read_strand[i]}_{i}" for i in range(n_reads)]
    rs = ReadSet.from_sequences(seqs, names=names)
    truth = SimTruth(
        haplotypes=haps,
        read_hap=np.array(read_hap, dtype=np.int32),
        read_pos=np.array(read_pos, dtype=np.int32),
        read_strand=np.array(read_strand, dtype=np.int32),
    )
    return rs, truth


def truth_alignments(
    rs: "ReadSet",
    truth: SimTruth,
    min_overlap: int = 500,
    cross_hap: bool = False,
):
    """Exact alignment table derived from simulation ground truth.

    Only valid for error-free, indel-free simulations (error_rate=0,
    indel_rate=0): read intervals on the haplotype give exact alignment
    coordinates.  This is the stage-0 *oracle overlapper* used to test
    stages 1-3 independently of the real seed-extend engine, and later to
    diff the engine's output against truth.

    cross_hap=True also emits alignments between reads of different
    haplotypes at homologous positions (valid when haplotypes differ only by
    SNVs, so coordinates line up); `diffs` is then the SNV count in the
    overlap window.
    """
    from phasm_tpu.alignments import AlignmentTable

    n = rs.n_reads
    pos = truth.read_pos.astype(np.int64)
    hap = truth.read_hap.astype(np.int64)
    strand = truth.read_strand.astype(np.int64)
    length = rs.lengths.astype(np.int64)
    end = pos + length

    # pairwise SNV-difference prefix sums between haplotype pairs
    diff_prefix = {}
    if cross_hap:
        for h1 in range(len(truth.haplotypes)):
            for h2 in range(h1 + 1, len(truth.haplotypes)):
                a, b = truth.haplotypes[h1], truth.haplotypes[h2]
                m = min(a.shape[0], b.shape[0])
                d = (a[:m] != b[:m]).astype(np.int64)
                diff_prefix[(h1, h2)] = np.concatenate([[0], np.cumsum(d)])

    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            if hap[i] != hap[j] and not cross_hap:
                continue
            o1 = max(pos[i], pos[j])
            o2 = min(end[i], end[j])
            if o2 - o1 < min_overlap:
                continue
            if hap[i] == hap[j]:
                diffs = 0
            else:
                key = (min(hap[i], hap[j]), max(hap[i], hap[j]))
                pre = diff_prefix[key]
                hi = min(int(o2), pre.shape[0] - 1)
                lo = min(int(o1), hi)
                diffs = int(pre[hi] - pre[lo])
            sa, sb = int(strand[i]), int(strand[j])
            st = sa ^ sb
            if sa == 0:
                a_start, a_end = o1 - pos[i], o2 - pos[i]
                b_start, b_end = o1 - pos[j], o2 - pos[j]
            else:
                a_start, a_end = end[i] - o2, end[i] - o1
                b_start, b_end = end[j] - o2, end[j] - o1
            rows.append(
                (i, j, st, int(a_start), int(a_end), int(b_start), int(b_end), diffs)
            )
    return AlignmentTable.from_rows(rows)
