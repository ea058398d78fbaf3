"""Profile the host seeding path at c6 geometry (no jax; pure numpy + C++).

Breaks seed_match_host into: simulate, minimizer extraction, global repeat
filter, per-tile match_seeds (36 tiles at 8 blocks), and the candidate
normalization — the 144 s round-4 term (VERDICT r5 target: find the wall).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phasm_tpu.overlap import seeding
from phasm_tpu.sim import simulate_reads


def main():
    t0 = time.time()
    rs, _ = simulate_reads(
        seed=6, genome_len=10_000_000, ploidy=1, coverage=20,
        mean_read_len=8000, error_rate=0.06, read_len_spread=0.3,
    )
    print(f"sim: {time.time()-t0:.1f}s  reads={rs.n_reads} "
          f"bases={int(rs.lengths.sum())/1e6:.0f}Mb")

    cfg = seeding.SeedConfig()
    lengths = rs.lengths.astype(np.int32)
    t0 = time.time()
    seeds = seeding.extract_minimizers(rs.codes, lengths, cfg)
    print(f"extract_minimizers: {time.time()-t0:.1f}s  "
          f"n_seeds={seeds.read_id.shape[0]}")

    t0 = time.time()
    uniq, inv, cnt = np.unique(
        seeds.canon, return_inverse=True, return_counts=True
    )
    keep = cnt[inv] <= cfg.max_occ
    seeds2 = seeding.Seeds(
        read_id=seeds.read_id[keep], pos=seeds.pos[keep],
        canon=seeds.canon[keep], orient=seeds.orient[keep],
    )
    print(f"global repeat filter: {time.time()-t0:.1f}s  "
          f"dropped={int((~keep).sum())}")

    n = rs.n_reads
    n_blocks = 8
    bounds = [(n * i) // n_blocks for i in range(n_blocks + 1)]
    blk_of = np.searchsorted(bounds, seeds2.read_id, side="right") - 1
    t_sub = t_match = 0.0
    n_cand = 0
    for bi in range(n_blocks):
        for bj in range(bi, n_blocks):
            t0 = time.time()
            in_tile = (
                (blk_of == bi) if bi == bj
                else (blk_of == bi) | (blk_of == bj)
            )
            sub = seeding.Seeds(
                read_id=seeds2.read_id[in_tile], pos=seeds2.pos[in_tile],
                canon=seeds2.canon[in_tile], orient=seeds2.orient[in_tile],
            )
            t_sub += time.time() - t0
            split = -1 if bi == bj else bounds[bi + 1]
            t0 = time.time()
            cands = seeding.match_seeds(
                sub, lengths, cfg, cross_split=split
            )
            t_match += time.time() - t0
            n_cand += len(cands)
    print(f"tile subset build: {t_sub:.1f}s  tile match_seeds: {t_match:.1f}s  "
          f"candidates={n_cand}")

    # unblocked comparison
    t0 = time.time()
    cands = seeding.match_seeds(seeds, lengths, cfg)
    print(f"unblocked match_seeds: {time.time()-t0:.1f}s  cands={len(cands)}")

    # NEW production path: sort once + presorted match
    t0 = time.time()
    ss = seeding.sort_seeds(seeds)
    t_sort = time.time() - t0
    t0 = time.time()
    rep_mask = seeding.repeat_run_mask(ss.canon, cfg.max_occ)
    t_rep = time.time() - t0
    t0 = time.time()
    cands2 = seeding.match_seeds(ss, lengths, cfg, presorted=True)
    t_match2 = time.time() - t0
    print(f"NEW: sort_seeds {t_sort:.1f}s  repeat_run_mask {t_rep:.1f}s "
          f"(dropped={int((~rep_mask).sum())})  presorted match {t_match2:.1f}s "
          f"cands={len(cands2)}")
    same = (
        np.array_equal(np.sort(cands.a_id * 1 << 40), np.sort(cands2.a_id * 1 << 40))
        and len(cands) == len(cands2)
    )
    k1 = np.lexsort((cands.diag, cands.strand, cands.b_id, cands.a_id))
    k2 = np.lexsort((cands2.diag, cands2.strand, cands2.b_id, cands2.a_id))
    same = all(
        np.array_equal(getattr(cands, f)[k1], getattr(cands2, f)[k2])
        for f in ("a_id", "b_id", "strand", "diag", "n_seeds")
    )
    print("candidate sets identical:", same)


if __name__ == "__main__":
    main()
