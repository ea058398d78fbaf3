"""Bit-exact differ against the reference PHASM pipeline outputs.

SURVEY.md §8.4 / BASELINE.md north star: "phased haplotig FASTA bit-identical
to reference PHASM output; overlap sets + reduced assembly-graph topology
identical".  The reference mount (/root/reference) has been EMPTY every round
so far — this tool exists so the comparison can run the DAY it populates,
with zero new code:

    python scripts/diff_vs_reference.py overlaps  ours.npz  theirs.las.txt
    python scripts/diff_vs_reference.py graph     ours.gfa2 theirs.gfa2
    python scripts/diff_vs_reference.py fasta     ours.fa   theirs.fa

Exit code 0 = identical (per the mode's definition below), 1 = differences
(printed), 2 = usage/parse error.

Modes:
  overlaps  -- compare alignment SETS: canonical (a, b, strand) pair sets,
               then coordinate/diff agreement on the intersection.  Accepts
               .npz (ours), LAdump text, or PAF on either side.
  graph     -- compare reduced string-graph TOPOLOGY: canonical edge sets
               (src read, src orient, dst read, dst orient) with segment
               names normalized, plus overlap-length agreement.
  fasta     -- sequence-content identity: sorted multiset of sequences
               (name-independent), reporting per-record SHA256; --strict
               also requires identical names/order; reverse-complement
               equivalence is tried before declaring a mismatch.
"""
from __future__ import annotations

import hashlib
import sys

import numpy as np

sys.path.insert(0, ".")  # repo root


def _load_overlaps(path: str):
    """-> set[(a,b,strand)], dict[(a,b,strand)] -> (coords..., diffs)."""
    from phasm_tpu.io import daligner

    if path.endswith(".npz"):
        t = daligner.load_table_npz(path)
    elif path.endswith(".paf"):
        t = daligner.read_paf(path) if hasattr(daligner, "read_paf") else None
        if t is None:
            print(f"PAF reading not available for {path}", file=sys.stderr)
            sys.exit(2)
    else:
        with open(path) as fh:
            t = daligner.parse_local_alignments(fh)
    pairs = {}
    m = t.as_matrix()
    for row in m.tolist():
        a, b, st, as_, ae, bs, be, d = row
        key = (min(a, b), max(a, b), st)
        pairs.setdefault(key, []).append((as_, ae, bs, be, d))
    return pairs


def cmd_overlaps(ours: str, theirs: str) -> int:
    po, pt = _load_overlaps(ours), _load_overlaps(theirs)
    ko, kt = set(po), set(pt)
    only_o, only_t = sorted(ko - kt), sorted(kt - ko)
    both = ko & kt
    coord_diff = []
    for k in sorted(both):
        if sorted(po[k]) != sorted(pt[k]):
            coord_diff.append((k, po[k], pt[k]))
    print(f"pairs: ours={len(ko)} theirs={len(kt)} common={len(both)}")
    print(f"only-ours={len(only_o)} only-theirs={len(only_t)} "
          f"coord-mismatch={len(coord_diff)}")
    for k in only_o[:20]:
        print(f"  only-ours: {k}")
    for k in only_t[:20]:
        print(f"  only-theirs: {k}")
    for k, a, b in coord_diff[:20]:
        print(f"  coords {k}: ours={a} theirs={b}")
    return 0 if not (only_o or only_t or coord_diff) else 1


def _canon_edges(path: str):
    """GFA2 -> canonical frozenset of (src_name, src_or, dst_name, dst_or),
    each edge represented by the lexicographically smaller of (edge, rc-dual)."""
    edges = set()
    ovls = {}
    with open(path) as fh:
        for line in fh:
            p = line.rstrip("\n").split("\t")
            if not p or p[0] != "E":
                continue
            u, v = p[2], p[3]
            su, ou = u[:-1], u[-1]
            sv, ov_ = v[:-1], v[-1]
            flip = {"+": "-", "-": "+"}
            fwd = (su, ou, sv, ov_)
            rc = (sv, flip[ov_], su, flip[ou])
            key = min(fwd, rc)
            edges.add(key)
            b1, e1 = int(p[4].rstrip("$")), int(p[5].rstrip("$"))
            ovls[key] = e1 - b1
    return edges, ovls


def cmd_graph(ours: str, theirs: str) -> int:
    eo, oo = _canon_edges(ours)
    et, ot = _canon_edges(theirs)
    only_o, only_t = sorted(eo - et), sorted(et - eo)
    both = eo & et
    ovl_diff = [(k, oo[k], ot[k]) for k in sorted(both) if oo[k] != ot[k]]
    print(f"edges (canonical): ours={len(eo)} theirs={len(et)} common={len(both)}")
    print(f"only-ours={len(only_o)} only-theirs={len(only_t)} "
          f"ovl-mismatch={len(ovl_diff)}")
    for k in only_o[:20]:
        print(f"  only-ours: {k}")
    for k in only_t[:20]:
        print(f"  only-theirs: {k}")
    for k, a, b in ovl_diff[:20]:
        print(f"  ovl {k}: ours={a} theirs={b}")
    return 0 if not (only_o or only_t or ovl_diff) else 1


_RC = str.maketrans("ACGT", "TGCA")


def _rc(s: str) -> str:
    return s.translate(_RC)[::-1]


def cmd_fasta(ours: str, theirs: str, strict: bool = False) -> int:
    from phasm_tpu.io.fasta import iter_fasta

    ro = list(iter_fasta(ours))
    rt = list(iter_fasta(theirs))
    print(f"records: ours={len(ro)} theirs={len(rt)}")
    if strict:
        ok = ro == rt
        if not ok:
            for i, ((na, sa), (nb, sb)) in enumerate(zip(ro, rt)):
                if (na, sa) != (nb, sb):
                    why = "name" if na != nb else f"seq (len {len(sa)} vs {len(sb)})"
                    print(f"  record {i}: {why} mismatch ({na} vs {nb})")
        return 0 if ok and len(ro) == len(rt) else 1
    # name-independent: canonical (min(seq, rc(seq))) multiset
    def canon(seq: str) -> str:
        return min(seq, _rc(seq))

    ho = sorted(hashlib.sha256(canon(s).encode()).hexdigest() for _, s in ro)
    ht = sorted(hashlib.sha256(canon(s).encode()).hexdigest() for _, s in rt)
    if ho == ht:
        print("IDENTICAL (canonical sequence multiset)")
        return 0
    from collections import Counter

    co, ct = Counter(ho), Counter(ht)
    for h in (co - ct):
        print(f"  only-ours: {h[:16]}")
    for h in (ct - co):
        print(f"  only-theirs: {h[:16]}")
    lens_o = sorted(len(s) for _, s in ro)
    lens_t = sorted(len(s) for _, s in rt)
    print(f"  length multisets: ours={lens_o} theirs={lens_t}")
    return 1


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    mode, a, b = argv[0], argv[1], argv[2]
    strict = "--strict" in argv[3:]
    if mode == "overlaps":
        return cmd_overlaps(a, b)
    if mode == "graph":
        return cmd_graph(a, b)
    if mode == "fasta":
        return cmd_fasta(a, b, strict=strict)
    print(f"unknown mode {mode!r}")
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
