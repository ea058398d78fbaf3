"""GFA2 round-trip, DALIGNER-dump interop, CLI smoke tests."""
import io

import numpy as np

from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.graph import build_string_graph
from phasm_tpu.io import daligner, gfa
from phasm_tpu.sim import simulate_reads, truth_alignments


def small_graph():
    rs, truth = simulate_reads(
        seed=3, genome_len=10_000, ploidy=1, coverage=10, mean_read_len=2500,
        error_rate=0.0, indel_rate=0.0,
    )
    t = truth_alignments(rs, truth, min_overlap=400)
    types = t.classify(rs.lengths)
    g = build_string_graph(t, types, rs.lengths)
    return g, rs


def test_gfa2_roundtrip(tmp_path):
    g, rs = small_graph()
    path = str(tmp_path / "g.gfa2")
    gfa.write_gfa2(path, g, rs)
    g2, rs2 = gfa.read_gfa2(path)
    # node ids shift (only used reads are serialized) -> compare canonical
    # edge multiset via (src_len, dst_len, elen, ovl) + counts
    assert g2.n_edges == g.n_edges
    key1 = sorted(zip(g.elen.tolist(), g.ovl.tolist()))
    key2 = sorted(zip(g2.elen.tolist(), g2.ovl.tolist()))
    assert key1 == key2
    assert g2.check_symmetric()


def test_gfa2_full_fidelity_when_all_reads_used(tmp_path):
    g, rs = small_graph()
    used = np.zeros(g.n_nodes // 2, dtype=bool)
    used[np.concatenate([g.src, g.dst]) >> 1] = True
    if not used.all():
        # restrict readset to used reads for an id-stable round-trip
        import pytest

        pytest.skip("fixture has unused reads")
    path = str(tmp_path / "g.gfa2")
    gfa.write_gfa2(path, g, rs)
    g2, _ = gfa.read_gfa2(path)
    assert np.array_equal(g.src, g2.src)
    assert np.array_equal(g.dst, g2.dst)
    assert np.array_equal(g.elen, g2.elen)


def test_ladump_roundtrip(tmp_path):
    t = AlignmentTable.from_rows(
        [
            (0, 1, 0, 600, 995, 5, 400, 12),
            (1, 2, 1, 5, 400, 100, 495, 3),
        ]
    )
    path = str(tmp_path / "aln.las.txt")
    daligner.write_ladump(path, t)
    with open(path) as fh:
        t2 = daligner.parse_local_alignments(fh)
    assert np.array_equal(t.as_matrix(), t2.as_matrix())


def test_ladump_parses_reference_style_stream():
    stream = io.StringIO(
        """+ P 2
% P 2
P 1 2 n
C 100 200 0 100
D 7
P 3 4 c
C 0 50 10 60
D 2
"""
    )
    t = daligner.parse_local_alignments(stream)
    assert len(t) == 2
    assert t.a_id.tolist() == [0, 2]  # 1-based -> 0-based
    assert t.strand.tolist() == [0, 1]
    assert t.diffs.tolist() == [7, 2]


def test_dbdump_parse():
    stream = io.StringIO(
        """R 1
L 0 0 8
S 8 ACGTACGT
R 2
S 4 TTGG
"""
    )
    rs = daligner.parse_reads(stream)
    assert rs.n_reads == 2
    assert rs.oriented_str(0) == "ACGTACGT"
    assert rs.oriented_str(2) == "TTGG"


def test_npz_roundtrip(tmp_path):
    t = AlignmentTable.from_rows([(0, 1, 0, 1, 2, 3, 4, 5)])
    p = str(tmp_path / "t.npz")
    daligner.save_table_npz(p, t)
    t2 = daligner.load_table_npz(p)
    assert np.array_equal(t.as_matrix(), t2.as_matrix())


def test_cli_stage_pipeline(tmp_path):
    """simulate -> overlap -> filter -> layout -> phase -> pipeline."""
    from phasm_tpu import cli

    d = str(tmp_path)
    cli.main(
        f"simulate --out {d}/r.fa --seed 3 --genome-len 8000 --ploidy 1 "
        f"--coverage 10 --read-len 2000 --error-rate 0.04".split()
    )
    cli.main(f"overlap {d}/r.fa --out {d}/a.npz --backend jnp".split())
    cli.main(
        f"filter {d}/r.fa {d}/a.npz --out {d}/f.npz "
        f"--min-read-length 500 --min-overlap-length 400 --max-error-rate 0.15".split()
    )
    cli.main(f"layout {d}/r.fa {d}/f.npz --out {d}/g.gfa2 --length-fuzz 400".split())
    cli.main(f"phase {d}/r.fa {d}/g.gfa2 {d}/a.npz --out {d}/h.fa".split())
    import os

    for f in ("r.fa", "a.npz", "f.npz", "g.gfa2", "h.fa"):
        assert os.path.exists(f"{d}/{f}")
    g, rs = gfa.read_gfa2(f"{d}/g.gfa2")
    assert g.n_edges > 0


def test_cli_phase_content_matches_in_memory(tmp_path):
    """Staged phase (through the GFA2 file) must produce the SAME haplotigs
    as the identical calls run in memory.  Regression for ADVICE r1 high:
    read_gfa2 node ids are file positions (only edge-bearing reads
    serialize), and cmd_phase paired them with original-id evidence — wrong
    whenever layout dropped a read (contained reads, i.e. nearly always)."""
    from phasm_tpu import cli, dna
    from phasm_tpu.bubbles import build_chains, find_superbubbles
    from phasm_tpu.filter import (
        FilterChain, MaxErrorRate, MinOverlapLength, MinReadLength,
        ProperOverlapsOnly,
    )
    from phasm_tpu.graph import (
        build_string_graph, merge_unambiguous_paths, remove_tips,
        remove_transitive_edges,
    )
    from phasm_tpu.io import fasta
    from phasm_tpu.phasing import PhaseConfig, phase_all

    d = str(tmp_path)
    cli.main(
        f"simulate --out {d}/r.fa --seed 9 --genome-len 20000 --ploidy 2 "
        f"--coverage 14 --read-len 2500 --error-rate 0.03 --hotspots 2 "
        f"--hotspot-rate 0.15 --hotspot-width 2000 --read-len-spread 0.2".split()
    )
    cli.main(f"overlap {d}/r.fa --out {d}/a.npz --backend jnp".split())
    cli.main(
        f"filter {d}/r.fa {d}/a.npz --out {d}/f.npz "
        f"--min-read-length 500 --min-overlap-length 400 --max-error-rate 0.10".split()
    )
    cli.main(f"layout {d}/r.fa {d}/f.npz --out {d}/g.gfa2 --length-fuzz 400".split())
    cli.main(f"phase {d}/r.fa {d}/g.gfa2 {d}/a.npz --out {d}/h.fa".split())

    # in-memory replica of the same stages
    rs = fasta.read_fasta(f"{d}/r.fa")
    t = daligner.load_table_npz(f"{d}/a.npz")
    chain = FilterChain(
        [MinReadLength(500), MinOverlapLength(400), MaxErrorRate(0.10),
         ProperOverlapsOnly()],
        max_overhang_abs=1000, max_overhang_ratio=0.8,
    )
    ft, _, _ = chain.apply(t, rs.lengths)
    types = ft.classify(rs.lengths)
    g_mem = build_string_graph(ft, types, rs.lengths)
    g_mem = remove_transitive_edges(g_mem, fuzz=400)
    g_mem, _ = remove_tips(g_mem, max_tip_len=4)

    # the fixture must exercise compaction: some read must carry no edge
    used = np.zeros(rs.n_reads, dtype=bool)
    used[np.concatenate([g_mem.src, g_mem.dst]) >> 1] = True
    assert not used.all(), "fixture too easy: every read kept an edge"

    # staged graph, remapped, must equal the in-memory graph exactly
    g_file, gfa_reads = gfa.read_gfa2(f"{d}/g.gfa2")
    g_remap = gfa.remap_node_ids(g_file, gfa_reads.names, rs)
    assert np.array_equal(g_remap.src, g_mem.src)
    assert np.array_equal(g_remap.dst, g_mem.dst)
    assert np.array_equal(g_remap.elen, g_mem.elen)
    assert np.array_equal(g_remap.ovl, g_mem.ovl)

    # staged haplotigs must equal in-memory haplotigs
    ug = merge_unambiguous_paths(g_mem)
    chains = build_chains(ug, find_superbubbles(ug))
    results = phase_all(ug, rs, t, chains, PhaseConfig(ploidy=2, prune_factor=0.01))
    want = [dna.decode(seq) for r in results for seq in r.haplotigs]
    got = [s for _, s in fasta.iter_fasta(f"{d}/h.fa")]
    assert got == want
    assert len(want) >= 2, "diploid fixture should yield >= 2 haplotigs"


def test_write_paf(tmp_path):
    t = AlignmentTable.from_rows(
        [
            (0, 1, 0, 600, 995, 5, 400, 12),
            (0, 1, 1, 600, 995, 5, 400, 12),
        ]
    )
    lengths = np.array([1000, 800], dtype=np.int32)
    p = str(tmp_path / "o.paf")
    daligner.write_paf(p, t, lengths, names=["ra", "rb"])
    lines = [l.split("\t") for l in open(p).read().splitlines()]
    assert len(lines) == 2
    assert lines[0][:9] == ["ra", "1000", "600", "995", "+", "rb", "800", "5", "400"]
    # reverse strand converts oriented-b to forward-b coordinates
    assert lines[1][4] == "-"
    assert lines[1][7:9] == ["400", "795"]


def test_gfa2_unitig_writer(tmp_path):
    from phasm_tpu.graph import (
        build_string_graph, merge_unambiguous_paths, remove_transitive_edges,
    )
    from phasm_tpu.sim import simulate_reads, truth_alignments

    rs, truth = simulate_reads(
        seed=3, genome_len=10_000, ploidy=1, coverage=10, mean_read_len=2500,
        error_rate=0.0, indel_rate=0.0,
    )
    t = truth_alignments(rs, truth, min_overlap=400)
    types = t.classify(rs.lengths)
    g = build_string_graph(t, types, rs.lengths)
    g = remove_transitive_edges(g, fuzz=100)
    ug = merge_unambiguous_paths(g)
    path = str(tmp_path / "u.gfa2")
    gfa.write_gfa2_unitigs(path, ug, rs)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("H\t")
    s_lines = [l for l in lines if l.startswith("S\t")]
    assert len(s_lines) == ug.n_nodes
    # spelled sequence length matches the S-line declared length
    parts = s_lines[0].split("\t")
    assert len(parts[3]) == int(parts[2])


def test_paf_round_trip(tmp_path):
    """read_paf is the exact inverse of write_paf (both strands; oriented-b
    coordinate convention restored; diffs = span - matches)."""
    t = AlignmentTable.from_rows(
        [
            (0, 1, 0, 600, 995, 5, 400, 12),
            (0, 1, 1, 600, 995, 5, 400, 12),
            (2, 3, 1, 0, 350, 100, 455, 0),
        ]
    )
    lengths = np.array([1000, 800, 400, 500], dtype=np.int32)
    p = str(tmp_path / "o.paf")
    daligner.write_paf(p, t, lengths)
    t2 = daligner.read_paf(p)
    assert np.array_equal(t.as_matrix(), t2.as_matrix())


def test_diff_vs_reference_self_smoke(tmp_path):
    """The reference differ must be RUNNABLE end to end: ours-vs-ours through
    npz, LAdump text, PAF, GFA2, and FASTA all exit 0 (VERDICT r2 weak #3:
    the PAF ingestion path was dead code)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "diff_vs_reference",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "diff_vs_reference.py"),
    )
    dv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dv)

    t = AlignmentTable.from_rows(
        [
            (0, 1, 0, 600, 995, 5, 400, 12),
            (0, 1, 1, 600, 995, 5, 400, 12),
            (2, 3, 1, 0, 350, 100, 455, 7),
        ]
    )
    lengths = np.array([1000, 800, 400, 500], dtype=np.int32)
    npz = str(tmp_path / "t.npz")
    paf = str(tmp_path / "t.paf")
    lad = str(tmp_path / "t.las.txt")
    daligner.save_table_npz(npz, t)
    daligner.write_paf(paf, t, lengths)
    daligner.write_ladump(lad, t)
    assert dv.cmd_overlaps(npz, paf) == 0
    assert dv.cmd_overlaps(npz, lad) == 0
    assert dv.cmd_overlaps(paf, lad) == 0

    # graph + fasta self-diffs (exercise the parsers, exit 0)
    rs, truth = simulate_reads(
        seed=3, genome_len=6_000, ploidy=1, coverage=8, mean_read_len=1500,
        error_rate=0.0, indel_rate=0.0,
    )
    ta = truth_alignments(rs, truth, min_overlap=400)
    g = build_string_graph(ta, ta.classify(rs.lengths), rs.lengths)
    gp = str(tmp_path / "g.gfa2")
    gfa.write_gfa2(gp, g, rs)
    assert dv.cmd_graph(gp, gp) == 0

    from phasm_tpu.io import fasta as fa

    fp = str(tmp_path / "r.fa")
    fa.write_fasta(
        fp, [(rs.names[i], rs.oriented_str(2 * i)) for i in range(rs.n_reads)]
    )
    assert dv.cmd_fasta(fp, fp) == 0
    assert dv.cmd_fasta(fp, fp, strict=True) == 0
