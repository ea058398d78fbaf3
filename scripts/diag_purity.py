"""Diagnose allele-purity loss on the many-hotspot ladder rungs (c4/c5).

Runs the rung's sim + overlap ONCE (cached to /tmp), then iterates on
assemble() fast, dumping per-haplotig purity, per-chain phase structure,
and which truth haplotype each haplotig's discriminating sites vote for —
site by site, so within-block mixing is visible as vote runs.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from phasm_tpu.configs import ladder  # noqa: E402
from phasm_tpu.eval import (  # noqa: E402
    _both_strand_kmers,
    _in_sorted,
    kmer_pack,
)
from phasm_tpu.io.daligner import load_table_npz, save_table_npz  # noqa: E402
from phasm_tpu.overlap import overlap_reads  # noqa: E402
from phasm_tpu.pipeline import assemble  # noqa: E402
from phasm_tpu.sim import simulate_reads  # noqa: E402


def site_votes(seq, haplotypes, probe=17, site_stride=5):
    """Per-site haplotype votes for one output: array [S] of hap idx or -1."""
    H = np.stack(haplotypes)
    diff = np.nonzero((H != H[0:1]).any(axis=0))[0]
    diff = diff[(diff >= probe) & (diff < H.shape[1] - probe)][::site_stride]
    half = probe // 2
    probes = np.stack([kmer_pack(h, probe)[diff - half] for h in haplotypes])
    codes = np.asarray(seq, dtype=np.uint8)
    own = np.unique(_both_strand_kmers(codes, probe))
    present = _in_sorted(probes.ravel(), own).reshape(probes.shape)
    discrim = present.sum(axis=0) == 1
    votes = np.full(diff.shape[0], -1, dtype=np.int64)
    votes[discrim] = np.argmax(present[:, discrim], axis=0)
    return diff, votes, discrim


def main():
    rung_name = sys.argv[1] if len(sys.argv) > 1 else "c4"
    cfg = next(c for c in ladder() if c.name.startswith(rung_name))
    cache = f"/tmp/{cfg.name}_table.npz"
    t0 = time.time()
    rs, truth = simulate_reads(**cfg.sim)
    print(f"sim: {rs.n_reads} reads {time.time()-t0:.1f}s", flush=True)
    if os.path.exists(cache):
        table = load_table_npz(cache)
        print(f"table loaded from {cache}: {len(table)} rows", flush=True)
    else:
        t0 = time.time()
        table = overlap_reads(rs, cfg.overlap)
        save_table_npz(cache, table)
        print(f"overlap: {len(table)} rows {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    res = assemble(rs, table, cfg.pipeline)
    print(f"assemble: {time.time()-t0:.1f}s", flush=True)
    print("stats:", {k: v for k, v in res.stats.items()
                     if not k.startswith("n_align")})

    # per-chain phase structure
    for ci, r in enumerate(res.phase_results):
        print(f"chain {ci}: {len(r.chain.bubbles)} bubbles, "
              f"breaks={r.phase_breaks}, score={r.score:.1f}, "
              f"choices={r.haplotype_choices}")

    # per-haplotig site votes
    for name, seq in res.haplotigs:
        diff, votes, discrim = site_votes(seq, truth.haplotypes)
        v = votes[votes >= 0]
        if v.shape[0] == 0:
            print(f"{name}: len={len(seq)} no discriminating sites")
            continue
        # run-length encode votes to show mixing structure
        runs = []
        cur, cnt = v[0], 0
        for x in v:
            if x == cur:
                cnt += 1
            else:
                runs.append((int(cur), cnt))
                cur, cnt = x, 1
        runs.append((int(cur), cnt))
        counts = np.bincount(v, minlength=len(truth.haplotypes))
        purity = counts.max() / v.shape[0]
        # positions of discriminating sites (genome coords) for first/last
        dpos = diff[discrim]
        print(f"{name}: len={len(seq)} sites={v.shape[0]} "
              f"purity={purity:.3f} counts={counts.tolist()} "
              f"span={dpos.min()}-{dpos.max()}")
        if purity < 0.99:
            print(f"   runs: {runs}")


if __name__ == "__main__":
    main()
