"""Alignment classification + filter tests (table-driven, as in reference).

Ref test model: phasm tests classify contained vs proper overlaps on both
strands (SURVEY.md §5 'Alignment classification').
"""
import numpy as np

from phasm_tpu.alignments import AlignmentTable, AlignmentType
from phasm_tpu.filter import (
    FilterChain,
    MinOverlapLength,
    MinReadLength,
    ProperOverlapsOnly,
    contained_read_ids,
)

# two reads, lengths 1000 and 800
LENGTHS = np.array([1000, 800, 500], dtype=np.int32)


def mk(a_id, b_id, strand, a_start, a_end, b_start, b_end, diffs=10):
    return AlignmentTable.from_rows([(a_id, b_id, strand, a_start, a_end, b_start, b_end, diffs)])


def classify_one(t):
    return AlignmentType(int(t.classify(LENGTHS)[0]))


def test_overlap_ab():
    # suffix of a (600..1000) matches prefix of b (0..400)
    t = mk(0, 1, 0, 600, 995, 5, 400)
    assert classify_one(t) == AlignmentType.OVERLAP_AB


def test_overlap_ba():
    # prefix of a matches suffix of b
    t = mk(0, 1, 0, 5, 400, 410, 795)
    assert classify_one(t) == AlignmentType.OVERLAP_BA


def test_a_contained():
    # read 2 (len 500) fully inside read 0
    t = mk(2, 0, 0, 2, 498, 200, 700)
    assert classify_one(t) == AlignmentType.A_CONTAINED


def test_b_contained():
    t = mk(0, 2, 0, 200, 700, 2, 498)
    assert classify_one(t) == AlignmentType.B_CONTAINED


def test_internal_rejected():
    # big overhangs on both sides -> INTERNAL
    t = mk(0, 1, 0, 300, 500, 300, 500)
    assert classify_one(t) == AlignmentType.INTERNAL


def test_strand_irrelevant_to_classification():
    t0 = mk(0, 1, 0, 600, 995, 5, 400)
    t1 = mk(0, 1, 1, 600, 995, 5, 400)
    assert classify_one(t0) == classify_one(t1) == AlignmentType.OVERLAP_AB


def test_contained_read_collection_and_chain():
    t = AlignmentTable.from_rows(
        [
            (0, 1, 0, 600, 995, 5, 400, 10),  # proper ab
            (2, 0, 0, 2, 498, 200, 700, 10),  # read 2 contained in 0
            (2, 1, 0, 2, 490, 100, 600, 10),  # also contained-ish in 1
        ]
    )
    types = t.classify(LENGTHS)
    contained = contained_read_ids(t, types, 3)
    assert contained.tolist() == [False, False, True]

    chain = FilterChain([MinReadLength(100), MinOverlapLength(200), ProperOverlapsOnly()])
    ft, ftypes, cont = chain.apply(t, LENGTHS)
    # only the proper 0-1 overlap survives; alignments touching read 2 dropped
    assert len(ft) == 1
    assert ft.a_id[0] == 0 and ft.b_id[0] == 1
    assert cont.tolist() == [False, False, True]


def test_dedup_and_canonical_sort():
    rows = [
        (0, 1, 0, 600, 995, 5, 400, 10),
        (0, 1, 0, 600, 995, 5, 400, 10),
        (1, 2, 0, 5, 400, 100, 495, 3),
    ]
    t = AlignmentTable.from_rows(rows)
    d = t.dedup()
    assert len(d) == 2
    assert d.a_id.tolist() == [0, 1]
