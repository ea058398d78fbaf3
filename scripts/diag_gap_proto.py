"""Prototype: restore a multi-base draft gap via insertion-segment evidence.

Synthetic: truth 3 kb, draft = truth with an 80-base deletion (+ scattered
1% errors), reads = 6%-error copies of truth spanning the gap.  Measures how
insertion evidence distributes over (position, length) and what consensus
rule recovers the gap.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phasm_tpu.polish_oracle import _align_accumulate
from phasm_tpu.sim import mutate_read


def edit_dist(a, b, band=64):
    n, m = len(a), len(b)
    INF = 1 << 28
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        cur[0] = i
        sub = prev[:-1] + (a[i - 1] != b)
        cur[1:] = np.minimum(sub, prev[1:] + 1)
        np.minimum.accumulate(cur, out=cur)  # not exact for ins chains; ok
        for j in range(1, m + 1):
            cur[j] = min(cur[j], cur[j - 1] + 1)
        prev = cur
    return int(prev[m])


def main():
    rng = np.random.default_rng(11)
    truth = rng.integers(0, 4, 3000).astype(np.uint8)
    gap0, gapL = 1500, 80
    draft = np.concatenate([truth[:gap0], truth[gap0 + gapL:]])
    # scattered draft errors at 1%
    derr = rng.random(len(draft)) < 0.01
    draft = draft.copy()
    draft[derr] = (draft[derr] + rng.integers(1, 4, int(derr.sum()))) % 4

    # reads: 16x coverage, 1 kb, 6% error
    reads, offs = [], []
    for _ in range(48):
        p = int(rng.integers(0, 2000))
        r = mutate_read(rng, truth[p : p + 1000], 0.06)
        reads.append(r)
        # draft offset: account for the gap
        dp = p if p < gap0 else p - gapL
        offs.append(dp)

    n = len(draft)
    votes = [[0] * 5 for _ in range(n)]
    ins_obs: dict[int, dict[tuple, int]] = {}
    band = 128
    for r, off in zip(reads, offs):
        w0 = max(off - band // 2, 0)
        w1 = min(off + len(r) + band // 2, n)
        _align_accumulate(draft, r, w0, w1, band, votes, ins_obs)

    # how does insertion evidence distribute near the gap?
    print("gap at draft pos", gap0, "length", gapL)
    for p in sorted(ins_obs):
        segs = ins_obs[p]
        tot = sum(segs.values())
        lens = sorted({len(s) for s in segs})
        cov = sum(votes[p]) if p < n else 0
        if tot >= 2 or (abs(p - gap0) < 10):
            print(f"  pos {p}: {tot} obs, cov {cov}, seg lens {lens[:10]}")

    # candidate rule: group insertion obs by position where total obs with
    # len>=4 wins majority; medoid of long segments
    for p in sorted(ins_obs):
        segs = ins_obs[p]
        long = {s: c for s, c in segs.items() if len(s) >= 4}
        tot_long = sum(long.values())
        cov = sum(votes[p]) if p < n else 0
        if tot_long * 2 > cov and cov >= 3:
            cands = [np.array(s, dtype=np.uint8) for s, c in long.items() for _ in range(c)]
            # medoid by pairwise edit distance
            D = np.zeros((len(cands), len(cands)))
            for i in range(len(cands)):
                for j in range(i + 1, len(cands)):
                    d = edit_dist(cands[i], cands[j])
                    D[i, j] = D[j, i] = d
            med = int(np.argmin(D.sum(1)))
            seg = cands[med]
            true_seg = truth[gap0 : gap0 + gapL]
            print(f"MEDOID at pos {p}: len {len(seg)} vs true {gapL}, "
                  f"dist to truth {edit_dist(seg, true_seg)}")


if __name__ == "__main__":
    main()
