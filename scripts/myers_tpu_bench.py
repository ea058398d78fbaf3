"""Measure the Myers bit-vector backend vs the round-1 Pallas kernel on TPU.

Same workload as bench.py (completing dovetail pairs, ~5% error, jmax 2048,
M=16384), device-resident operands, fetch-barrier timing (block_until_ready
does not synchronize through the axon tunnel).  Prints one JSON line with
both throughputs so ROOFLINE.md can record the measured Myers number
(VERDICT r1 #3: ">=2x Gcells/s measured").

    python scripts/myers_tpu_bench.py [--iters 20] [--m 16384]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_batch, put_chunked, robust


def _timed(run, args, iters):
    out = robust(lambda: run(*args), "compile+warm", delays=(10, 30, 60))
    warm = robust(lambda: np.asarray(out[0]), "warm sync")

    def loop():
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = run(*args)
        np.asarray(o[0])  # fetch barrier (tunnel: only a fetch synchronizes)
        return (time.time() - t0) / iters

    return robust(loop, "timed loop"), warm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--jmax", type=int, default=2048)
    ap.add_argument("--band", type=int, default=64)
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated backend list (overrides default)")
    args = ap.parse_args()

    import jax

    from phasm_tpu.overlap.extend import DeviceExtender, _enable_compilation_cache

    _enable_compilation_cache()
    backend = jax.default_backend()
    W, JMAX, M, iters = args.band, args.jmax, args.m, args.iters
    READ_LEN, N_READS = 4096, 512

    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(rng, N_READS, READ_LEN, M, JMAX)

    # device-resident operands, uploaded once (uint8, chunked through tunnel)
    dev_oriented = put_chunked(oriented)
    dev = {}
    for name, x in (
        ("lengths", lengths.astype(np.int32)),
        ("a_oid", a_oid.astype(np.int32)),
        ("b_oid", b_oid.astype(np.int32)),
        ("d0", d0.astype(np.int32)),
    ):
        dev[name] = robust(lambda x=x: jax.device_put(x), f"upload {name}")
    call_args = (dev_oriented, dev["lengths"], dev["a_oid"], dev["b_oid"], dev["d0"])

    results = {"backend": backend, "band": W, "jmax": JMAX, "m": M, "iters": iters}

    names = ("myers", "myers_pallas") if args.skip_pallas else (
        "pallas", "myers", "myers_pallas"
    )
    if args.only:
        names = tuple(args.only.split(","))
    for name in names:
        ext = DeviceExtender.__new__(DeviceExtender)
        ext.band = W
        ext.backend = name
        ext._mesh = None
        ext._axis = "dp"
        ext._runs = {}
        ext._use_pallas = name == "pallas" and backend == "tpu"
        ext._oriented = dev_oriented
        ext._lengths = dev["lengths"]
        run = ext._get_run(JMAX)
        dt, warm_cost = _timed(run, call_args, iters)
        found = int((warm_cost < (1 << 15)).sum())
        aps = M / dt
        # cells: Pallas computes W cells/column over JMAX columns; Myers
        # computes 32*K(W) cells/column (block-band window incl. margin)
        results[name] = {
            "seconds_per_batch": round(dt, 4),
            "alignments_per_sec": round(aps, 1),
            "found": found,
        }
        print(f"# {name}: {aps:,.0f} aligns/s ({found}/{M} found)",
              file=sys.stderr)

    for other in ("myers", "myers_pallas"):
        if "pallas" in results and other in results:
            results[f"{other}_speedup"] = round(
                results[other]["alignments_per_sec"]
                / results["pallas"]["alignments_per_sec"], 2,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
