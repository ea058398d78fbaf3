"""Superbubble detection + bubble-chain construction.

Ref: phasm/bubbles.py :: find_superbubbles (SURVEY.md §2 L4).  The reference
implements the Brankovic et al. 2016 linear-time algorithm; we use the
equivalent Onodera et al. 2013 per-entrance search, which reports the same
minimal superbubbles: it runs on the *unitig graph* (small after merging —
SURVEY.md §8.3 item 5 explicitly allows host-side bubble detection since it
is tiny next to alignment cost).

A superbubble <s, t> is a maximal set U of vertices with single entrance s
and single exit t such that:
  * every u in U \\ {s, t} is reachable only through s and reaches t,
  * the induced subgraph is acyclic,
  * no edge t -> s.

Bubble chains (ref: phasm/phasing.py bubble-chain walk) link consecutive
superbubbles sharing exit == next entrance.
"""
from __future__ import annotations

import dataclasses

from phasm_tpu.graph.unitigs import UnitigGraph


@dataclasses.dataclass(frozen=True)
class SuperBubble:
    """<entrance, exit> plus interior vertex set (exclusive of s, t)."""

    entrance: int
    exit: int
    interior: frozenset[int]


def _adjacency(g: UnitigGraph):
    """Successor/predecessor lists, cached per graph instance.

    Graph passes produce NEW UnitigGraph instances (dataclasses.replace) —
    src/dst are never mutated in place — so the cache cannot go stale.
    Without it, per-bubble callers (enumerate_paths) rebuilt the WHOLE
    graph's adjacency for every bubble: O(edges x bubbles), the dominant
    cost of phasing 1000-chain graphs."""
    cached = getattr(g, "_adj_cache", None)
    if cached is not None:
        return cached
    succ: dict[int, list[int]] = {}
    pred: dict[int, list[int]] = {}
    for s, d in zip(g.src.tolist(), g.dst.tolist()):
        succ.setdefault(int(s), []).append(int(d))
        pred.setdefault(int(d), []).append(int(s))
    try:
        object.__setattr__(g, "_adj_cache", (succ, pred))
    except Exception:  # frozen/slotted variants: just skip caching
        pass
    return succ, pred


def superbubble_from(succ, pred, s: int) -> SuperBubble | None:
    """Onodera-style search for the minimal superbubble with entrance s.

    Returns None if no superbubble starts at s.
    """
    seen: set[int] = set()
    visited: set[int] = set()
    stack = [s]
    seen.add(s)
    while stack:
        v = stack.pop()
        visited.add(v)
        seen.discard(v)
        children = succ.get(v, [])
        if not children:
            return None  # tip inside the would-be bubble: abort
        for c in children:
            if c == s:
                return None  # cycle back to entrance
            seen.add(c)
        # push children whose every parent is already visited
        for c in set(children):
            if c in visited:
                return None  # cyclic
            if all(p in visited for p in pred.get(c, [])) and c not in stack:
                stack.append(c)
        if len(stack) == 1 and len(seen) == 1 and stack[0] in seen:
            t = stack[0]
            if t == s:
                return None
            if s in succ.get(t, []):
                return None  # edge t -> s forbidden
            interior = visited - {s}
            return SuperBubble(entrance=s, exit=t, interior=frozenset(interior))
    return None  # frontier starved: some interior vertex has an outside parent


def find_superbubbles(g: UnitigGraph) -> list[SuperBubble]:
    """All minimal superbubbles, from every branching entrance.

    Deterministic order: sorted by entrance id.  Each bubble's reverse
    complement <rc(t), rc(s)> is also a superbubble by symmetry and is
    reported too (deduplication happens in chain building, which keeps one
    orientation per chain).
    """
    succ, pred = _adjacency(g)
    out = []
    for s in sorted(succ):
        if len(succ.get(s, [])) < 2:
            continue
        b = superbubble_from(succ, pred, s)
        if b is not None:
            out.append(b)
    return out


@dataclasses.dataclass
class BubbleChain:
    """Maximal run of superbubbles with exit_i == entrance_{i+1}."""

    bubbles: list[SuperBubble]

    @property
    def entrance(self) -> int:
        return self.bubbles[0].entrance

    @property
    def exit(self) -> int:
        return self.bubbles[-1].exit

    def nodes(self) -> list[int]:
        """entrance, interiors and anchors in order (for reporting)."""
        out = [self.bubbles[0].entrance]
        for b in self.bubbles:
            out.extend(sorted(b.interior))
            out.append(b.exit)
        return out


def build_chains(g: UnitigGraph, bubbles: list[SuperBubble]) -> list[BubbleChain]:
    """Link bubbles into maximal chains; keep one orientation per dual pair.

    The RC dual of a chain (over rc-unitigs, reversed) describes the same
    genomic region; we keep the orientation whose entrance unitig id is
    smaller (deterministic tie-break).

    Nested superbubbles are dropped first: a bubble lying entirely inside
    another bubble's interior (e.g. threshold-fragmentation of one arm
    creating a micro-bubble within a het bubble) duplicates a region the
    outer bubble's path enumeration already covers — phasing it separately
    emitted the same locus twice (round-2 36 kb fixture: a 2-singleton
    sub-bubble became its own chain with ~0.8-purity duplicate haplotigs).
    Ref: phasm/bubbles.py chains MINIMAL superbubbles; our path enumeration
    is over the full outer interior, so outermost-only is the consistent
    choice here.
    """
    outer: list[SuperBubble] = []
    for b in bubbles:
        nested = any(
            o is not b
            and b.entrance in o.interior
            and b.exit in o.interior
            and set(b.interior) <= set(o.interior)
            for o in bubbles
        )
        if not nested:
            outer.append(b)
    bubbles = outer
    by_entrance = {b.entrance: b for b in bubbles}
    is_exit = {b.exit for b in bubbles}

    chains = []
    for b in bubbles:
        if b.entrance in is_exit:
            continue  # not a chain head
        chain = [b]
        while chain[-1].exit in by_entrance:
            nxt = by_entrance[chain[-1].exit]
            if nxt is chain[0]:
                break  # circular chain guard
            chain.append(nxt)
        chains.append(BubbleChain(chain))

    # drop RC duals: a chain's dual has entrance rc(exit)
    kept = []
    seen_keys = set()
    for c in chains:
        key = (c.entrance, c.exit)
        dual_key = (int(g.rc[c.exit]), int(g.rc[c.entrance]))
        if dual_key in seen_keys:
            continue
        seen_keys.add(key)
        kept.append(c)
    return kept


def enumerate_paths(
    g: UnitigGraph, bubble: SuperBubble, max_paths: int = 64
) -> list[tuple[int, ...]]:
    """All simple entrance->exit paths through the bubble interior.

    Ref: phasm/phasing.py enumerates bubble-internal simple paths for the
    branch step.  Paths are returned as tuples of *interior* unitig ids (a
    direct entrance->exit edge yields the empty tuple).  Deterministic
    (DFS in sorted-successor order); capped at max_paths.

    When the cap bites (a bubble with more entrance->exit paths than
    max_paths — e.g. a 17-arm bubble at the default 16), the truncation is
    COUNTED (`phasing.paths_truncated` metric) and logged loudly: a silently
    dropped arm could lose a haplotype (SURVEY.md §8.3 item 2 demands the
    frontier provably contain everything the reference's prune keeps).
    """
    import logging

    from phasm_tpu import metrics

    succ, _ = _adjacency(g)
    s, t = bubble.entrance, bubble.exit
    paths: list[tuple[int, ...]] = []
    stack: list[tuple[int, tuple[int, ...]]] = [(s, ())]
    while stack and len(paths) < max_paths:
        v, path = stack.pop()
        for c in sorted(succ.get(v, []), reverse=True):
            if c == t:
                paths.append(path)
            elif c in bubble.interior and c not in path:
                stack.append((c, path + (c,)))
    if stack:
        metrics.incr("phasing.paths_truncated")
        logging.getLogger("phasm_tpu.bubbles").warning(
            "bubble <%d,%d> path enumeration truncated at max_paths=%d "
            "(interior size %d) — raise PhaseConfig.max_paths to guarantee "
            "no haplotype is dropped",
            s, t, max_paths, len(bubble.interior),
        )
    return sorted(paths)
