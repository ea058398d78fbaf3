"""Measure overlap-extension backends on TPU through the PRODUCTION path
(DeviceExtender.extend_async + materialize, exactly what overlap_reads
runs), plus the Myers kernel-only rate for roofline tracking.

Same workload as bench.py (completing dovetail pairs, ~5% error, jmax 2048,
M=16384), fetch-barrier timing (block_until_ready does not synchronize
through the axon tunnel).  Prints one JSON line; the driver artifact for
round N is MYERS_TPU_r{N}.json.

    python scripts/myers_tpu_bench.py [--iters 20] [--m 16384]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _myers_kernel_only, _production_throughput, make_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--jmax", type=int, default=2048)
    ap.add_argument("--band", type=int, default=64)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated backend list (overrides default)")
    ap.add_argument("--skip-kernel-only", action="store_true")
    args = ap.parse_args()

    import jax

    from phasm_tpu.overlap.extend import (
        DeviceExtender,
        _enable_compilation_cache,
    )

    _enable_compilation_cache()
    backend = jax.default_backend()
    W, JMAX, M, iters = args.band, args.jmax, args.m, args.iters
    READ_LEN, N_READS = 4096, 512

    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(
        rng, N_READS, READ_LEN, M, JMAX
    )
    d0 = d0.astype(np.int32)

    results = {"backend": backend, "band": W, "jmax": JMAX, "m": M,
               "iters": iters, "path": "production(DeviceExtender)"}

    names = ("pallas", "myers_pallas")
    if args.only:
        names = tuple(args.only.split(","))
    for name in names:
        ext = DeviceExtender(oriented, lengths, band=W, backend=name)
        dt = _production_throughput(ext, a_oid, b_oid, d0, JMAX, M, iters)
        aps = M / dt
        results[name] = {
            "seconds_per_batch": round(dt, 4),
            "alignments_per_sec": round(aps, 1),
        }
        print(f"# {name} (production): {aps:,.0f} aligns/s", file=sys.stderr)

    if not args.skip_kernel_only:
        dtk = _myers_kernel_only(
            oriented, lengths, a_oid, b_oid, d0, W, JMAX, iters
        )
        results["myers_kernel_only"] = {
            "seconds_per_batch": round(dtk, 4),
            "alignments_per_sec": round(M / dtk, 1),
        }
        print(f"# myers fwd+rev kernel-only: {M / dtk:,.0f} aligns/s",
              file=sys.stderr)

    if "pallas" in results and "myers_pallas" in results:
        results["myers_pallas_speedup"] = round(
            results["myers_pallas"]["alignments_per_sec"]
            / results["pallas"]["alignments_per_sec"], 2,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
