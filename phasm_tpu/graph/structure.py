"""Edge-tensor string graph container.

Ref: phasm/assembly_graph.py :: AssemblyGraph (networkx DiGraph in the
reference).  Nodes are oriented-read ids (``2*read + strand``; reverse
complement = ``id ^ 1``), so the graph over ``N`` reads has ``2N`` node slots
and needs no node objects at all.

Edge semantics (Myers 2005 string graph):
  * edge ``u -> v`` exists when a suffix of ``u`` overlaps a prefix of ``v``;
  * ``elen(u,v)`` = number of bases *appended* when extending a walk from u
    by v, i.e. the genomic distance between the ends of u and v.  This
    convention composes additively along two-hop paths
    (``elen(u,w)+elen(w,x) == elen(u,x)`` for consistent placements), which
    is what fuzz-transitive reduction relies on;
  * ``ovl(u,v)`` = aligned overlap length (mean of the two aligned spans);
  * symmetry: edge ``u -> v`` always coexists with its dual
    ``rc(v) -> rc(u)`` (ref: phasm/assembly_graph.py :: make_symmetric).

Spelling a walk ``n0, n1, ..., nk`` produces
``seq(n0) + seq(n1)[len(n1)-elen_1:] + ... + seq(nk)[len(nk)-elen_k:]``.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class StringGraph:
    """Flat string graph over oriented-read nodes.

    Invariant: edges are stored canonically sorted by (src, dst) and unique.
    """

    n_nodes: int  # 2 * n_reads
    src: np.ndarray  # [E] int32 oriented node id
    dst: np.ndarray  # [E] int32 oriented node id
    elen: np.ndarray  # [E] int32 appended-length (> 0)
    ovl: np.ndarray  # [E] int32 overlap length
    node_len: np.ndarray  # [n_nodes] int32 sequence length per oriented node

    def __post_init__(self):
        self.src = np.asarray(self.src, dtype=np.int32)
        self.dst = np.asarray(self.dst, dtype=np.int32)
        self.elen = np.asarray(self.elen, dtype=np.int32)
        self.ovl = np.asarray(self.ovl, dtype=np.int32)
        self.node_len = np.asarray(self.node_len, dtype=np.int32)

    @property
    def n_edges(self) -> int:
        return int(self.src.shape[0])

    def canonicalize(self) -> "StringGraph":
        """Sort edges by (src, dst, elen, ovl) and drop duplicates."""
        order = np.lexsort((self.ovl, self.elen, self.dst, self.src))
        s, d, e, o = (a[order] for a in (self.src, self.dst, self.elen, self.ovl))
        if s.shape[0]:
            keep = np.ones(s.shape[0], dtype=bool)
            keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
            s, d, e, o = s[keep], d[keep], e[keep], o[keep]
        return StringGraph(self.n_nodes, s, d, e, o, self.node_len)

    def take_edges(self, mask: np.ndarray) -> "StringGraph":
        return StringGraph(
            self.n_nodes,
            self.src[mask],
            self.dst[mask],
            self.elen[mask],
            self.ovl[mask],
            self.node_len,
        )

    # --- degree / adjacency -------------------------------------------------

    def out_degree(self) -> np.ndarray:
        return np.bincount(self.src, minlength=self.n_nodes).astype(np.int32)

    def in_degree(self) -> np.ndarray:
        return np.bincount(self.dst, minlength=self.n_nodes).astype(np.int32)

    def csr(self):
        """(offsets[n_nodes+1], order-preserved edge arrays) — edges must be canonical."""
        counts = self.out_degree()
        offsets = np.zeros(self.n_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return offsets

    def out_edges(self, u: int):
        """Host-side convenience: indices of edges leaving u (canonical order)."""
        lo = np.searchsorted(self.src, u, side="left")
        hi = np.searchsorted(self.src, u, side="right")
        return np.arange(lo, hi)

    def successors(self, u: int) -> np.ndarray:
        return self.dst[self.out_edges(u)]

    def predecessors(self, u: int) -> np.ndarray:
        return self.src[self.dst == u]

    def edge_key(self) -> np.ndarray:
        """int64 sortable key src * n_nodes + dst (canonical edges => sorted)."""
        return self.src.astype(np.int64) * self.n_nodes + self.dst.astype(np.int64)

    def has_edges(self, u: np.ndarray, v: np.ndarray):
        """Vectorized membership + elen lookup for query edge pairs.

        Returns (exists_mask, elen_or_0). Requires canonical edge order.
        """
        keys = self.edge_key()
        q = np.asarray(u, dtype=np.int64) * self.n_nodes + np.asarray(v, dtype=np.int64)
        pos = np.searchsorted(keys, q)
        pos_c = np.minimum(pos, max(keys.shape[0] - 1, 0))
        if keys.shape[0] == 0:
            return np.zeros(q.shape, dtype=bool), np.zeros(q.shape, dtype=np.int32)
        exists = keys[pos_c] == q
        return exists, np.where(exists, self.elen[pos_c], 0).astype(np.int32)

    # --- symmetry -----------------------------------------------------------

    def check_symmetric(self) -> bool:
        """Every edge u->v must have dual rc(v)->rc(u)."""
        ex, _ = self.has_edges(self.dst ^ 1, self.src ^ 1)
        return bool(np.all(ex))

    def to_edge_set(self) -> set[tuple[int, int]]:
        return set(zip(self.src.tolist(), self.dst.tolist()))
