"""Debug: why doesn't the 80-base gap splice?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phasm_tpu.polish_oracle import _align_accumulate, _kmer_index
from phasm_tpu.sim import mutate_read

rng = np.random.default_rng(11)
n_truth, gapL, read_len, err, cov = 2500, 80, 700, 0.06, 16
truth = rng.integers(0, 4, n_truth).astype(np.uint8)
gap0 = n_truth // 2
draft = np.concatenate([truth[:gap0], truth[gap0 + gapL:]])
derr = rng.random(len(draft)) < 0.01
draft = draft.copy()
draft[derr] = (draft[derr] + rng.integers(1, 4, int(derr.sum()))) % 4
reads, offs = [], []
n_reads = int(cov * n_truth / read_len)
for _ in range(n_reads):
    p = int(rng.integers(0, n_truth - read_len))
    r = mutate_read(rng, truth[p : p + read_len], err)
    reads.append(r)
    offs.append(p if p < gap0 else p - gapL)

n = len(draft)
kidx = _kmer_index(draft)
votes = [[0] * 5 for _ in range(n)]
ins_obs: dict[int, dict[tuple, int]] = {}
band = 128
spanning = 0
for r, off in zip(reads, offs):
    w0 = max(off - band, 0)
    w1 = min(off + len(r) + band, n)
    _align_accumulate(draft, r, w0, w1, band, votes, ins_obs, kidx)
    if off + 50 < gap0 and off + len(r) - gapL - 50 > gap0:
        spanning += 1
print(f"reads spanning gap with 50bp margin: {spanning}, cov at gap:",
      sum(votes[gap0]))
for p in sorted(ins_obs):
    if abs(p - gap0) <= 12:
        segs = ins_obs[p]
        print(f"pos {p}: " + ", ".join(
            f"len{len(s)}x{c}" for s, c in sorted(segs.items(), key=lambda kv: -kv[1])
        ))
