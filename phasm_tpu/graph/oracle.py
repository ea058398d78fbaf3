"""Slow, obviously-correct oracle implementations for property testing.

Mirrors the *reference's* per-object style (phasm/assembly_graph.py iterates
networkx adjacency dicts) without importing networkx: plain dict-of-dicts.
Every vectorized pass in this package is tested against these
(SURVEY.md §5 'unit-test each vectorized graph pass against a slow oracle').
"""
from __future__ import annotations

from phasm_tpu.graph.structure import StringGraph


def to_adj(g: StringGraph) -> dict[int, dict[int, int]]:
    adj: dict[int, dict[int, int]] = {}
    for s, d, e in zip(g.src.tolist(), g.dst.tolist(), g.elen.tolist()):
        adj.setdefault(int(s), {})[int(d)] = int(e)
    return adj


def transitive_edges_oracle(
    g: StringGraph, fuzz: int, dirty=None
) -> set[tuple[int, int]]:
    """Declarative fuzz rule, nested loops (same rule as transitive.py).

    ``dirty``: optional [E] bool aligned with g's edges — marginal-edge veto
    (a witness path containing a dirty edge cannot eliminate a clean edge).
    """
    adj = to_adj(g)
    dset: set[tuple[int, int]] = set()
    if dirty is not None:
        for s, d, f in zip(g.src.tolist(), g.dst.tolist(), dirty.tolist()):
            if f:
                dset.add((int(s), int(d)))
    out = set()
    for v, nbrs in adj.items():
        for x, vx in nbrs.items():
            for w, vw in nbrs.items():
                if w == x or w == v:
                    continue
                wx = adj.get(w, {}).get(x)
                if wx is None or vw + wx > vx + fuzz:
                    continue
                witness_dirty = (v, w) in dset or (w, x) in dset
                if witness_dirty and (v, x) not in dset:
                    continue  # veto: dirty witness cannot kill a clean edge
                out.add((v, x))
                break
    return out


def tip_chain_oracle(adj, indeg, s, max_tip_len: int) -> list[int] | None:
    """Walk the dangling chain from in-degree-0 node `s` (see tips.py).

    Returns the list of tip nodes to delete, or None if `s` heads an isolated
    path (no junction) and is therefore not a tip.  Semantics:

      * follow unique successors while each next node has in-degree 1;
      * if the walk reaches a node with out-degree > 1 (a branch point), the
        tip is the chain *before* that node;
      * if it reaches a node whose successor has in-degree > 1 (merges into a
        junction), the tip is the chain up to and including the current node;
      * if it dead-ends (out-degree 0), the component is an isolated path,
        not a tip.

    Only chains of 1..max_tip_len nodes are tips (max_tip_len counts reads,
    mirroring the reference's bounded-length dead-end rule —
    phasm/assembly_graph.py :: remove_tips).
    """
    chain: list[int] = []
    cur = s
    while len(chain) < max_tip_len + 1:
        succ = list(adj.get(cur, {}).keys())
        if len(succ) == 0:
            return None  # isolated path
        if len(succ) > 1:
            return chain if 1 <= len(chain) <= max_tip_len else None
        chain.append(cur)
        nxt = succ[0]
        if indeg.get(nxt, 0) > 1:
            return chain if len(chain) <= max_tip_len else None
        cur = nxt
    return None  # too long


def tips_oracle(g: StringGraph, max_tip_len: int) -> set[int]:
    """Read ids deleted by ONE tip-removal round (callers iterate)."""
    adj = to_adj(g)
    indeg: dict[int, int] = {}
    for v, nbrs in adj.items():
        for x in nbrs:
            indeg[x] = indeg.get(x, 0) + 1
    nodes = set(adj) | set(indeg)

    dead: set[int] = set()
    for s in sorted(nodes):
        if indeg.get(s, 0) != 0:
            continue
        chain = tip_chain_oracle(adj, indeg, s, max_tip_len)
        if chain:
            dead.update(n >> 1 for n in chain)
    return dead
