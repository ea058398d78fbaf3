"""Whole-stage overlap throughput at c6 scale on TPU (VERDICT r3 #3, r4 #3).

Runs the FULL production ``overlap_reads`` (auto dispatch: parallel C++
minimizer extraction, one radix seed sort, presorted pair emission + radix
candidate histogram, bucketed async device extension, band escalation,
canonical dedup) on the c6 ladder rung's read set (10 Mb haploid, ~25k
reads, ~10^6 candidate pairs) and commits the stage breakdown from the
metrics registry, including per-jmax-bucket dispatch/extend seconds, the
kernel family each bucket routed to, and per-run walls (--repeat 2
separates compile/cache effects from steady state).

    python scripts/overlap_stage_bench.py [--repeat 2] [--out OVERLAP_STAGE_r5.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _per_bucket(rep):
    """Aggregate per-(jmax bucket) dispatch/extend seconds + pair counts from
    the metrics registry (keys like overlap.dispatch.t0_1.j4096 /
    overlap.extend.j4096 / overlap.dispatch.retry256.j8448)."""
    import re

    out = {}
    for kind in ("dispatch", "extend"):
        for k, v in rep["seconds"].items():
            m = re.match(rf"overlap\.{kind}(?:\..*)?\.j(\d+)$", k)
            if not m:
                continue
            b = out.setdefault(m.group(1), {})
            b[f"{kind}_s"] = round(b.get(f"{kind}_s", 0.0) + v, 2)
            calls = rep["calls"].get(k)
            if calls:
                b[f"{kind}_calls"] = b.get(f"{kind}_calls", 0) + int(calls)
    for k, v in rep["counters"].items():
        m = re.match(r"overlap\.extend\.j(\d+)\.pairs$", k)
        if m:
            b = out.setdefault(m.group(1), {})
            b["pairs"] = b.get("pairs", 0) + int(v)
        m = re.match(r"overlap\.dispatch(?:\..*)?\.j(\d+)\.pairs$", k)
        if m:
            b = out.setdefault(m.group(1), {})
            b["dispatch_pairs"] = b.get("dispatch_pairs", 0) + int(v)
    return dict(sorted(out.items(), key=lambda kv: int(kv[0])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--rung", default="c6_scale_10mb")
    ap.add_argument(
        "--repeat", type=int, default=1,
        help="run overlap_reads N times; per-run walls separate compile/"
        "cache effects (run 1) from steady state (run N)",
    )
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

    run_walls = []
    run_stages = []
    rep = None
    for r in range(max(args.repeat, 1)):
        metrics.reset()
        t0 = time.time()
        table = overlap_reads(rs, cfg.overlap)
        wall = time.time() - t0
        run_walls.append(round(wall, 1))
        rr = metrics.report()
        run_stages.append({
            "seed_s": round(sum(
                v for k, v in rr["seconds"].items()
                if k.startswith("overlap.seed")
            ), 1),
            "dispatch_s": round(sum(
                v for k, v in rr["seconds"].items()
                if k.startswith("overlap.dispatch")
            ), 1),
            "extend_s": round(sum(
                v for k, v in rr["seconds"].items()
                if k.startswith("overlap.extend")
            ), 1),
        })
        if rep is None:
            rep = rr  # detailed breakdown of the FIRST (cold) run

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
        "overlap_wall_s": run_walls[0],
        "run_walls_s": run_walls,
        "run_stage_seconds": run_stages,
        "candidate_pairs": n_cand,
        "alignments_kept": len(table),
        "candidates_per_sec_end_to_end": round(n_cand / run_walls[0]),
        "stage_seconds": {
            "seed_match_host": round(seed_s, 1),
            "dispatch_async": round(disp_s, 1),
            "extend_materialize": round(ext_s, 1),
            "other (escalate+dedup+build)": round(
                run_walls[0] - seed_s - disp_s - ext_s, 1
            ),
        },
        "wide_band_retries": retries,
        # per-column-bucket roofline terms (VERDICT r4 #3): seconds and pair
        # counts per jmax bucket, dispatch vs materialize, summed over tiles
        "per_bucket": _per_bucket(rep),
        "table_build_s": {
            k.split(".")[-1]: round(v, 2)
            for k, v in sec.items()
            if k.startswith("overlap.table_build")
        },
        "kernel_family_calls": {
            k[len("overlap.family."):]: int(v)
            for k, v in rep["counters"].items()
            if k.startswith("overlap.family.")
        },
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
