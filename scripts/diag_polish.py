"""Diagnose the residual consensus error on the chunked-round2 test scenario.

Classifies remaining edits (ins/del/sub, homopolymer context, position) by
aligning the final contig to truth, and measures whether extra polish
iterations at FIXED placements (no re-seeding) converge identity upward.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from phasm_tpu import dna, native
from phasm_tpu.eval import evaluate_assembly
from phasm_tpu.overlap import OverlapConfig, overlap_reads
from phasm_tpu.pipeline import PipelineConfig, assemble
from phasm_tpu.sim import simulate_reads


def edit_classify(truth_seq: np.ndarray, asm: np.ndarray):
    """Global banded alignment truth vs asm; classify edits."""
    t, a = truth_seq, asm
    n, m = len(t), len(a)
    band = 2 * abs(n - m) + 400
    INF = 1 << 28
    # DP over (i in t, j in a), band around diagonal scaled
    prev = {0: (0, None)}
    # too slow in python for 30k; use native polish_accumulate-style? Use
    # a simple O(n*band) numpy DP instead.
    W = band
    centers = (np.arange(n + 1) * m) // max(n, 1)
    cost = np.full((n + 1, W), INF, dtype=np.int32)
    move = np.full((n + 1, W), -1, dtype=np.int8)

    def jlo(i):
        return max(0, centers[i] - W // 2)

    j0 = jlo(0)
    for j in range(j0, min(m, j0 + W - 1) + 1):
        cost[0, j - j0] = j
        move[0, j - j0] = 2  # ins in asm
    for i in range(1, n + 1):
        lo = jlo(i)
        hi = min(m, lo + W - 1)
        plo = jlo(i - 1)
        js = np.arange(lo, hi + 1)
        row = np.full(js.shape[0], INF, dtype=np.int64)
        mv = np.full(js.shape[0], -1, dtype=np.int8)
        # diag
        dj = js - 1 - plo
        okd = (dj >= 0) & (dj < W) & (js >= 1)
        sub = np.ones(js.shape[0], dtype=np.int64)
        aidx = np.clip(js - 1, 0, m - 1)
        sub[okd] = (t[i - 1] != a[aidx[okd]]).astype(np.int64)
        cd = np.where(okd, cost[i - 1, np.clip(dj, 0, W - 1)] + sub, INF)
        up = js - plo
        oku = (up >= 0) & (up < W)
        cu = np.where(oku, cost[i - 1, np.clip(up, 0, W - 1)] + 1, INF)
        better = cd < row
        row[better] = cd[better]
        mv[better] = 0
        better = cu < row
        row[better] = cu[better]
        mv[better] = 1  # del (t base missing in asm)
        # left (ins in asm): sequential scan within row
        for k in range(js.shape[0]):
            if k > 0 and row[k - 1] + 1 < row[k]:
                row[k] = row[k - 1] + 1
                mv[k] = 2
        cost[i, : js.shape[0]] = np.minimum(row, INF)
        move[i, : js.shape[0]] = mv
    lo = jlo(n)
    best_j = lo + int(np.argmin(cost[n, : min(m, lo + W - 1) + 1 - lo]))
    i, j = n, best_j
    edits = []  # (type, truth_pos)
    while i > 0 or j > 0:
        k = j - jlo(i)
        mvv = move[i, k] if 0 <= k < W else -1
        if mvv == 0:
            if t[i - 1] != a[j - 1]:
                edits.append(("sub", i - 1))
            i, j = i - 1, j - 1
        elif mvv == 1:
            edits.append(("del", i - 1))
            i -= 1
        elif mvv == 2:
            edits.append(("ins", i - 1))
            j -= 1
        else:
            break
    return edits[::-1], int(cost[n, best_j - jlo(n)])


def main():
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
    qc = evaluate_assembly(res, truth)
    print("kmer_identity:", qc["kmer_identity"]["weighted_mean"])
    print("stats:", {k: v for k, v in res.stats.items() if "n_" in k})
    h0 = truth.haplotypes[0]
    for name, seq in res.contigs:
        # orient
        fwd_hits = sum(
            1 for c in range(1000, 28000, 3000)
            if dna.decode(h0[c:c+32]) in dna.decode(seq)
        )
        rc = dna.revcomp(seq)
        rc_hits = sum(
            1 for c in range(1000, 28000, 3000)
            if dna.decode(h0[c:c+32]) in dna.decode(rc)
        )
        s = seq if fwd_hits >= rc_hits else rc
        edits, dist = edit_classify(h0, np.asarray(s))
        print(f"{name}: len={len(s)} truth={len(h0)} edits={dist} "
              f"rate={dist/max(len(h0),1):.5f}")
        from collections import Counter
        c = Counter(e[0] for e in edits)
        print("  by type:", dict(c))
        # positional histogram (10 bins)
        pos = np.array([e[1] for e in edits])
        hist, _ = np.histogram(pos, bins=10, range=(0, len(h0)))
        print("  pos hist:", hist.tolist())
        # homopolymer context: truth[p-1]==truth[p] or truth[p]==truth[p+1]
        hp = 0
        for typ, p in edits:
            if 0 < p < len(h0) - 1 and (h0[p-1] == h0[p] or h0[p] == h0[p+1]):
                hp += 1
        print(f"  homopolymer-adjacent: {hp}/{len(edits)}")
        # leading/trailing truncation runs vs interior errors
        lead = 0
        while lead < len(edits) and edits[lead] == ("del", lead):
            lead += 1
        trail = 0
        while (trail < len(edits)
               and edits[-1 - trail] == ("del", len(h0) - 1 - trail)):
            trail += 1
        interior = edits[lead:len(edits) - trail if trail else None]
        span = len(h0) - lead - trail
        print(f"  lead_trunc={lead} trail_trunc={trail} "
              f"interior_edits={len(interior)} interior_rate="
              f"{len(interior)/max(span,1):.5f}")
        # cluster runs: consecutive edits within 3bp of each other
        runs = []
        cur = 1
        for k in range(1, len(interior)):
            if interior[k][1] - interior[k - 1][1] <= 3:
                cur += 1
            else:
                if cur >= 4:
                    runs.append((interior[k - cur][1], cur))
                cur = 1
        if cur >= 4:
            runs.append((interior[-cur][1], cur))
        print(f"  clusters(>=4 edits within 3bp): {len(runs)} "
              f"covering {sum(r[1] for r in runs)} edits: {runs[:15]}")
        if "--dump" in sys.argv:
            print("  interior first 40:", interior[:40])
    sys.stdout.flush()


if __name__ == "__main__":
    main()
