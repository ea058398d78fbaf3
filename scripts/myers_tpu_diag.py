"""Bisect the TPU-only myers_pallas divergence (LADDER r3: c2 produced
54,579 alignments on TPU vs 118,748 via the bit-identical-on-CPU jnp/myers
paths).  Runs the SAME c2-derived pair batches through:

  jnp      — backend="myers" (XLA-lowered jnp core)
  gather   — myers_pallas_compute (Pallas kernels, per-pair gather prep)
  tab      — myers_pallas_compute_tab (Pallas kernels, table prep)

on the current default device and diffs per-pair outputs.  CPU runs of all
three agree bit-exactly (test suite); a TPU-only mismatch isolates which
layer diverges on real hardware.

    python scripts/myers_tpu_diag.py [--bucket 4096] [--n 4096] [--band 64]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--band", type=int, default=64)
    ap.add_argument("--seed-cfg", default="c2")
    args = ap.parse_args()

    import jax

    from phasm_tpu.overlap import OverlapConfig, seeding
    from phasm_tpu.overlap.engine import _normalize_candidates
    from phasm_tpu.overlap.extend import (
        DeviceExtender,
        _enable_compilation_cache,
    )
    from phasm_tpu.sim import simulate_reads

    _enable_compilation_cache()
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    rs, _ = simulate_reads(
        seed=2, genome_len=48_500, ploidy=2, coverage=40,
        mean_read_len=2000, error_rate=0.03, indel_rate=0.0, snv_rate=0.0,
        hotspots=4, hotspot_rate=0.12, hotspot_width=1200,
        read_len_spread=0.25,
    )
    cfg = OverlapConfig(min_overlap=500)
    lengths = rs.lengths.astype(np.int32)
    seeds = seeding.extract_minimizers(rs.codes, lengths, cfg.seed)
    cands = seeding.match_seeds(seeds, lengths, cfg.seed)
    oriented = rs.oriented_codes_matrix()
    _, _, _, _, ka, kb, kd, la_k, lb_k, need = _normalize_candidates(
        cands, lengths, cfg.band
    )
    # pairs that fall in the requested bucket (as the engine would route)
    prev = 1024 if args.bucket > 1024 else 0
    sel = np.nonzero((need > prev) & (need <= args.bucket))[0][: args.n]
    ka, kb, kd = ka[sel], kb[sel], kd[sel]
    print(f"# {sel.shape[0]} pairs in bucket J={args.bucket}", file=sys.stderr)

    outs = {}
    for be in ("myers", "myers_pallas"):
        ext = DeviceExtender(oriented, lengths, band=args.band, backend=be)
        res = ext.extend(ka, kb, kd, args.bucket)
        outs[be] = np.stack(
            [res.diffs, res.a_start, res.a_end, res.b_end, res.win_cost]
        )
        del ext

    # gather-prep pallas path (bypasses the tab prep)
    from functools import partial

    from phasm_tpu.overlap.myers_pallas import myers_pallas_compute

    B = ka.shape[0]
    Bp = -(-B // 1024) * 1024
    kap = np.pad(ka, (0, Bp - B)).astype(np.int32)
    kbp = np.pad(kb, (0, Bp - B)).astype(np.int32)
    kdp = np.pad(kd, (0, Bp - B)).astype(np.int32)
    run = jax.jit(
        partial(myers_pallas_compute, W=args.band, J=args.bucket)
    )
    o = run(
        jax.device_put(oriented), jax.device_put(lengths),
        jax.device_put(kap), jax.device_put(kbp), jax.device_put(kdp),
    )
    outs["gather"] = np.stack([np.asarray(x)[:B] for x in o])[[0, 1, 2, 3, 4]]

    names = ["diffs", "a_start", "a_end", "b_end", "win"]
    ref = outs["myers"]
    report = {"backend": jax.default_backend(), "bucket": args.bucket,
              "band": args.band, "n_pairs": int(B)}
    for key in ("myers_pallas", "gather"):
        neq = outs[key] != ref
        report[key] = {
            "mismatched_pairs": int(np.any(neq, axis=0).sum()),
            **{n: int(neq[i].sum()) for i, n in enumerate(names)},
        }
        if np.any(neq):
            bad = np.nonzero(np.any(neq, axis=0))[0][:8]
            report[key]["examples"] = [
                {
                    "i": int(i), "ka": int(ka[i]), "kb": int(kb[i]),
                    "d0": int(kd[i]),
                    "la": int(lengths[ka[i] >> 1]),
                    "lb": int(lengths[kb[i] >> 1]),
                    "ref": [int(v) for v in ref[:, i]],
                    "got": [int(v) for v in outs[key][:, i]],
                }
                for i in bad
            ]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
