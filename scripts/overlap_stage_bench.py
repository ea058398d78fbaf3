"""Whole-stage overlap throughput at c6 scale on TPU (VERDICT r3 #3).

Runs the FULL production ``overlap_reads`` (blocked engine auto-dispatch:
host minimizer seeding, per-tile matching pipelined behind async device
extension, band escalation, canonical dedup) on the c6 ladder rung's read
set (10 Mb haploid, ~25k reads, ~10^6 candidate pairs) and commits the
stage breakdown from the metrics registry — showing how much host time is
genuinely hidden behind device extension.

    python scripts/overlap_stage_bench.py [--out OVERLAP_STAGE_r4.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--rung", default="c6_scale_10mb")
    args = ap.parse_args()

    import jax

    from phasm_tpu import metrics
    from phasm_tpu.configs import ladder
    from phasm_tpu.overlap import overlap_reads
    from phasm_tpu.overlap.extend import _enable_compilation_cache
    from phasm_tpu.sim import simulate_reads

    _enable_compilation_cache()
    cfg = next(c for c in ladder() if c.name == args.rung)
    t0 = time.time()
    rs, _ = simulate_reads(**cfg.sim)
    sim_s = time.time() - t0

    metrics.reset()
    t0 = time.time()
    table = overlap_reads(rs, cfg.overlap)
    wall = time.time() - t0
    rep = metrics.report()

    sec = rep["seconds"]
    seed_s = sum(v for k, v in sec.items() if k.startswith("overlap.seed"))
    disp_s = sum(v for k, v in sec.items() if k.startswith("overlap.dispatch"))
    ext_s = sum(v for k, v in sec.items() if k.startswith("overlap.extend"))
    n_cand = int(rep["counters"].get("overlap.candidates", 0))
    retries = {
        k.split(".")[-1]: int(v)
        for k, v in rep["counters"].items()
        if k.startswith("overlap.wide_band_retries")
    }
    out = {
        "backend": jax.default_backend(),
        "rung": cfg.name,
        "n_reads": rs.n_reads,
        "genome_mb": cfg.sim["genome_len"] / 1e6,
        "sim_s": round(sim_s, 1),
        "overlap_wall_s": round(wall, 1),
        "candidate_pairs": n_cand,
        "alignments_kept": len(table),
        "candidates_per_sec_end_to_end": round(n_cand / wall),
        "stage_seconds": {
            "seed_match_host": round(seed_s, 1),
            "dispatch_async": round(disp_s, 1),
            "extend_materialize": round(ext_s, 1),
            "other (escalate+dedup+build)": round(
                wall - seed_s - disp_s - ext_s, 1
            ),
        },
        "wide_band_retries": retries,
        "host_hidden_note": (
            "dispatch_async returns immediately (device work continues); "
            "extend_materialize is the fetch barrier, so host seeding of "
            "later tiles overlaps device extension of earlier ones in the "
            "blocked engine — host-overhead < device time iff "
            "seed_match_host < extend_materialize"
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
