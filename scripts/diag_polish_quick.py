"""Quick checks of the new polish: oracle equality + gap restoration."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phasm_tpu.native import polish_native
from phasm_tpu.polish_oracle import polish_oracle
from phasm_tpu.sim import mutate_read


def case(seed, gapL, n_truth=2500, read_len=700, err=0.06, cov=16):
    rng = np.random.default_rng(seed)
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
    return truth, draft, reads, offs


def edit_dist(a, b):
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[:-1] + (a[i - 1] != b), prev[1:] + 1)
        np.minimum.accumulate(cur, out=cur)
        for j in range(1, m + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[m])


def main():
    # oracle equality on a small noisy case (1 round)
    truth, draft, reads, offs = case(3, gapL=30, n_truth=900, read_len=300,
                                     err=0.05, cov=12)
    nat = polish_native(draft, reads, offs, band=64, min_cov=3, iters=1)
    ora = polish_oracle(draft, reads, offs, band=64, min_cov=3)
    eq = nat is not None and len(nat) == len(ora) and np.array_equal(nat, ora)
    print("oracle equality (gap case):", eq,
          f"native len {None if nat is None else len(nat)} oracle len {len(ora)}")
    if not eq and nat is not None:
        # locate first divergence
        k = 0
        while k < min(len(nat), len(ora)) and nat[k] == ora[k]:
            k += 1
        print("  first divergence at", k, nat[max(0,k-5):k+5], ora[max(0,k-5):k+5])

    # gap restoration across sizes and iterations
    for gapL in (8, 30, 80):
        truth, draft, reads, offs = case(11, gapL=gapL)
        d0 = edit_dist(truth, draft)
        for iters in (1, 2, 3):
            out = polish_native(draft, reads, offs, band=128, min_cov=3,
                                iters=iters)
            d = edit_dist(truth, out)
            print(f"gap {gapL}: draft dist {d0} -> iters={iters} dist {d} "
                  f"(len {len(out)} vs {len(truth)})")


if __name__ == "__main__":
    main()
