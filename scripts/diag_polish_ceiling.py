"""Consensus machinery ceiling: perfect placements, controlled draft error.

Isolates polish_native quality from pipeline placement: draft = truth + e_d
errors, reads at TRUE offsets (cov c, err 6%).  The residual after
iterations is the machinery floor at that coverage.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phasm_tpu.native import polish_native
from phasm_tpu.sim import mutate_read


def edit_dist(a, b):
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[:-1] + (a[i - 1] != b), prev[1:] + 1)
        for j in range(1, m + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[m])


def run(seed=5, n_truth=20000, cov=16, read_len=3000, err=0.06, derr=0.015,
        iters_list=(1, 2, 3, 4)):
    rng = np.random.default_rng(seed)
    truth = rng.integers(0, 4, n_truth).astype(np.uint8)
    draft = mutate_read(rng, truth, derr)
    # offsets on truth ~ offsets on draft (small drift, anchors handle it)
    reads, offs = [], []
    for _ in range(int(cov * n_truth / read_len)):
        p = int(rng.integers(0, n_truth - read_len))
        reads.append(mutate_read(rng, truth[p : p + read_len], err))
        offs.append(p)
    d0 = edit_dist(truth, draft)
    mid0, mid1 = read_len, n_truth - read_len  # full-coverage interior
    for iters in iters_list:
        out = polish_native(draft, reads, offs, band=128, min_cov=3,
                            iters=iters)
        d = edit_dist(truth, out)
        # interior-only: ends have ramping coverage.  Align interior by
        # slicing both at the same truth window (out drift is few bases).
        di = edit_dist(truth[mid0:mid1], out[mid0 - 50:mid1 + 50]) - 100
        di_rate = max(di, 0) / (mid1 - mid0)
        print(f"cov={cov} derr={derr}: draft {d0} ({d0/n_truth:.4%}) -> "
              f"iters={iters} {d} ({d/n_truth:.4%}) "
              f"interior~{di_rate:.4%} len {len(out)}")
        sys.stdout.flush()


if __name__ == "__main__":
    run()
    run(derr=0.06)  # raw spelled draft quality
