"""Graph-stage device timing at scale (VERDICT r3 #4).

Times ``reduce_mask_jax`` (the jit edge-tensor transitive-reduction pass)
against ``reduce_mask_np`` on a >= 10^6-edge synthetic overlap-shaped graph
(nodes on a line, edges to the next k nodes — every (i, i+j), j >= 2 is
transitive via i+1, the dense-reduction regime), plus ``remove_tips`` on
the reduced graph.  Writes one JSON line (--out GRAPH_TPU_r4.json).

The round-4 int32 pair-key node cap (46,340) is GONE: the jit pass now
bisects CSR rows directly (transitive.py), so device runs take any node
count.  Default geometry is therefore a 250k-node, degree-8 graph (2M
edges) — string-graph-realistic — plus ``--nodes/--degree`` overrides.

    python scripts/graph_scale_bench.py [--out GRAPH_TPU_r5.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def line_overlap_graph(n_nodes: int, k: int, seed: int = 0):
    """String-graph-shaped DAG: node i -> i+j (1 <= j <= k), elen additive
    along the line (elen(i, i+j) = pos[i+j] - pos[i]), so every j >= 2 edge
    is transitive under any fuzz >= 0 — maximal reduction work."""
    from phasm_tpu.graph.structure import StringGraph

    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.integers(50, 500, n_nodes + k))
    src, dst, elen = [], [], []
    for j in range(1, k + 1):
        s = np.arange(n_nodes, dtype=np.int64)
        d = s + j
        src.append(s)
        dst.append(d)
        elen.append(pos[d] - pos[s])
    src = np.concatenate(src)
    dst = np.concatenate(dst)
    elen = np.concatenate(elen).astype(np.int64)
    order = np.lexsort((dst, src))
    n_total = n_nodes + k
    g = StringGraph(
        n_nodes=n_total,
        src=src[order].astype(np.int32),
        dst=dst[order].astype(np.int32),
        elen=elen[order].astype(np.int32),
        ovl=np.ones(src.shape[0], dtype=np.int32),
        node_len=np.full(n_total, 1000, dtype=np.int32),
    )
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--nodes", type=int, default=250_000)
    ap.add_argument("--degree", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from phasm_tpu.graph.tips import remove_tips
    from phasm_tpu.graph.transitive import (
        _pow2,
        reduce_mask_jax,
        reduce_mask_np,
    )
    from phasm_tpu.overlap.extend import _enable_compilation_cache

    _enable_compilation_cache()
    backend = jax.default_backend()
    g = line_overlap_graph(args.nodes, args.degree)
    fuzz = 10

    t0 = time.time()
    m_np = reduce_mask_np(g, fuzz)
    t_np_cold = time.time() - t0
    t0 = time.time()
    for _ in range(args.reps):
        m_np = reduce_mask_np(g, fuzz)
    t_np = (time.time() - t0) / args.reps

    m_jax = reduce_mask_jax(g, fuzz)  # compile + warm
    assert np.array_equal(m_np, np.asarray(m_jax)), "np vs jax mask differs!"
    t0 = time.time()
    for _ in range(args.reps):
        m_jax = reduce_mask_jax(g, fuzz)
    t_jax = (time.time() - t0) / args.reps

    red = g.take_edges(~m_np)
    t0 = time.time()
    red2, removed = remove_tips(red, max_tip_len=4)
    t_tips = time.time() - t0

    out = {
        "backend": backend,
        "n_nodes": int(g.n_nodes),
        "n_edges": int(g.n_edges),
        "transitive_edges": int(m_np.sum()),
        "edges_after": int(red.n_edges),
        "fuzz": fuzz,
        "reduce_np_s": round(t_np, 3),
        "reduce_jax_s": round(t_jax, 3),
        "jax_speedup_vs_np": round(t_np / t_jax, 2),
        "tips_np_s": round(t_tips, 3),
        "masks_bit_identical": True,
        "jax_node_cap": None,
        "auto_routing": (
            "impl='auto' uses jax for n_edges >= 4096 at ANY node count "
            "(CSR-row bisection replaced the int32 pair key; this graph "
            f"pads to {_pow2(g.n_nodes, 256)} nodes on device)"
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
