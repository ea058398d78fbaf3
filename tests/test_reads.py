"""Data-layer tests: encoding, reverse complement, oriented ids, packing."""
import numpy as np
import pytest

from phasm_tpu import dna
from phasm_tpu.reads import ReadSet, rc_oid, oid_read, oid_strand, orient_fwd, orient_rev


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGGCCA"
    assert dna.decode(dna.encode(s)) == s


def test_revcomp():
    codes = dna.encode("AACGT")
    assert dna.decode(dna.revcomp(codes)) == "ACGTT"
    # involution
    assert np.array_equal(dna.revcomp(dna.revcomp(codes)), codes)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=64).astype(np.uint8)
    assert np.array_equal(dna.unpack_2bit(dna.pack_2bit(codes)), codes)


def test_oriented_ids():
    assert rc_oid(orient_fwd(5)) == orient_rev(5)
    assert rc_oid(rc_oid(10)) == 10
    assert oid_read(orient_rev(7)) == 7
    assert oid_strand(orient_rev(7)) == 1
    assert oid_strand(orient_fwd(7)) == 0


def test_readset_oriented_matrix():
    rs = ReadSet.from_sequences(["ACGT", "GGTTC"])
    m = rs.oriented_codes_matrix()
    assert m.shape[0] == 4
    assert dna.decode(m[0, :4]) == "ACGT"
    assert dna.decode(m[1, :4]) == "ACGT"  # revcomp of ACGT is ACGT
    assert dna.decode(m[2, :5]) == "GGTTC"
    assert dna.decode(m[3, :5]) == "GAACC"
    assert rs.oriented_str(3) == "GAACC"


def test_readset_packed():
    rs = ReadSet.from_sequences(["ACGTACGT" * 16])
    p = rs.packed_2bit()
    assert p.shape[1] == rs.lpad // 4
    assert np.array_equal(dna.unpack_2bit(p)[0, : rs.lengths[0]], rs.seq(0))


def test_fasta_roundtrip(tmp_path):
    from phasm_tpu.io import fasta

    path = str(tmp_path / "x.fa")
    recs = [("r1", "ACGT" * 50), ("r2", "TTTTGGGG")]
    fasta.write_fasta(path, recs)
    rs = fasta.read_fasta(path)
    assert rs.names == ["r1", "r2"]
    assert rs.oriented_str(0) == recs[0][1]
    assert rs.oriented_str(2) == recs[1][1]


def test_simulator_deterministic():
    from phasm_tpu.sim import simulate_reads

    rs1, t1 = simulate_reads(seed=42, genome_len=5000, coverage=10)
    rs2, t2 = simulate_reads(seed=42, genome_len=5000, coverage=10)
    assert np.array_equal(rs1.codes, rs2.codes)
    assert np.array_equal(t1.read_pos, t2.read_pos)
    assert rs1.n_reads > 10
    # reads drawn from both haplotypes, both strands
    assert set(np.unique(t1.read_hap)) == {0, 1}
    assert set(np.unique(t1.read_strand)) == {0, 1}
