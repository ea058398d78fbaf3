"""Inspect cross-bubble linkage evidence on a ladder rung: for each gap,
which reads act on both sides, what their touch errors are, and whether
their implied phase constraint agrees with the simulated truth."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from phasm_tpu.configs import ladder  # noqa: E402
from phasm_tpu.io.daligner import load_table_npz  # noqa: E402
from phasm_tpu.sim import simulate_reads  # noqa: E402
from phasm_tpu.pipeline import PipelineConfig, assemble  # noqa: E402
from phasm_tpu.phasing import (  # noqa: E402
    _ChainDP, read_touch_errs, consistent_paths, canonical_pair,
)


def main():
    rung_name = sys.argv[1] if len(sys.argv) > 1 else "c4"
    cfg = next(c for c in ladder() if c.name.startswith(rung_name))
    cache = f"/tmp/{cfg.name}_table.npz"
    rs, truth = simulate_reads(**cfg.sim)
    table = load_table_npz(cache)
    res = assemble(rs, table, cfg.pipeline)
    ug = res.unitigs
    r0 = res.phase_results[0]
    chain = r0.chain
    pcfg = cfg.pipeline.phase

    ev_keep = table.diffs <= cfg.pipeline.evidence_max_error * np.maximum(
        table.overlap_length(), 1
    )
    evidence = table.take(ev_keep)
    touch = read_touch_errs(ug, rs.n_reads, evidence)
    dp = _ChainDP(ug, rs, evidence, chain, pcfg, touch)

    # truth-side: which haplotype path at each bubble matches each truth hap?
    # approximate via member reads of each path's interior unitigs
    print(f"bubbles: {dp.n_b}; breaks chosen: {r0.phase_breaks}")
    print(f"choices: {r0.haplotype_choices}")

    # replicate acted bookkeeping
    acted: dict[int, list[int]] = {}
    rows_by_read_bubble = {}
    for i in range(dp.n_b):
        for r, ts in touch.items():
            rel = {u: e for u, e in ts.items() if u in dp.interiors[i]}
            if not rel:
                continue
            row = consistent_paths(rel, dp.pairsets[i],
                                   pcfg.margin_abs, pcfg.margin_rel)
            if not row.all():
                acted.setdefault(r, []).append(i)
                rows_by_read_bubble[(r, i)] = (row, rel)

    for i in range(1, dp.n_b):
        linkers = [r for r, bs in acted.items()
                   if bs and bs[0] <= i - 1 and bs[-1] >= i]
        status = "BREAK" if i in r0.phase_breaks else "JOIN"
        print(f"\ngap {i-1}->{i}: {status}, {len(linkers)} linkers")
        for r in linkers:
            bs = acted[r]
            hap = int(truth.read_hap[r])
            pos = int(truth.read_pos[r])
            ln = int(rs.lengths[r])
            info = []
            for bi in bs:
                row, rel = rows_by_read_bubble[(r, bi)]
                # does the row keep the truth-hap path chosen by best hist?
                info.append(
                    f"b{bi}: row={row.astype(int).tolist()} "
                    f"errs={ {u: round(e,4) for u,e in rel.items()} }"
                )
            # adjacent-pair check: does this read actually act on
            # both sides of THIS gap?
            direct = any(b <= i - 1 for b in bs) and any(b >= i for b in bs)
            print(f"  read {r} hap={hap} pos={pos} len={ln} acted={bs} "
                  f"direct={direct}")
            for s in info:
                print(f"    {s}")


if __name__ == "__main__":
    main()
