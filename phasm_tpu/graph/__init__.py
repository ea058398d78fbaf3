"""String-graph layer (ref: phasm/assembly_graph.py — SURVEY.md §2 L3).

The reference models the Myers string graph as a networkx DiGraph subclass
with per-object nodes/edges; every cleaning pass is a Python loop.  Here the
graph is a flat edge tensor (`src`, `dst`, `elen`, `ovl` int32 arrays over
oriented-read ids) and the cleaning passes are vectorized array programs,
with pure-Python oracles for property testing (SURVEY.md §8.1 E2).
"""

from phasm_tpu.graph.structure import StringGraph  # noqa: F401
from phasm_tpu.graph.build import build_string_graph  # noqa: F401
from phasm_tpu.graph.transitive import remove_transitive_edges  # noqa: F401
from phasm_tpu.graph.tips import remove_tips  # noqa: F401
from phasm_tpu.graph.pop import pop_error_bubbles  # noqa: F401
from phasm_tpu.graph.unitigs import UnitigGraph, merge_unambiguous_paths  # noqa: F401
