"""Run the BASELINE config ladder; one JSON line per rung.

    python scripts/run_ladder.py [--backend jnp|pallas] [--rungs c1,c3]

CPU rungs run everywhere; c3+ are sized for the TPU path.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default=None, choices=[None, "jnp", "pallas"])
    p.add_argument("--rungs", default=None, help="comma-separated rung name prefixes")
    args = p.parse_args()

    from phasm_tpu.configs import ladder, run_rung

    want = args.rungs.split(",") if args.rungs else None
    for cfg in ladder():
        if want and not any(cfg.name.startswith(w) for w in want):
            continue
        try:
            stats = run_rung(cfg, backend=args.backend)
            print(json.dumps(stats), flush=True)
        except Exception as e:  # keep the ladder going
            print(json.dumps({"name": cfg.name, "error": repr(e)}), flush=True)
            if "--strict" in sys.argv:
                raise


if __name__ == "__main__":
    main()
