"""Work set split/merge tests (reference analog: test/src/Work.cpp and the
set_manipulators split/merge coverage)."""

import numpy as np

from epa_ng_tpu.core.work import Work, merge, split


def test_from_ranges():
    w = Work.from_ranges((0, 3), (0, 4))
    assert len(w) == 12
    e, q = w.pairs()
    assert (np.unique(e) == [0, 1, 2]).all()
    assert (np.unique(q) == [0, 1, 2, 3]).all()


def test_split_preserves_and_covers():
    w = Work.from_ranges((0, 5), (0, 7))
    parts = split(w, 4)
    assert len(parts) == 4
    assert sum(len(p) for p in parts) == len(w)
    combined = Work()
    for p in parts:
        merge(combined, p)
    assert sorted(combined) == sorted(w)


def test_split_more_parts_than_items():
    w = Work.from_pairs([1, 2], [10, 20])
    parts = split(w, 5)
    assert len(parts) == 5  # empty parts exist (null-message semantics)
    assert sum(len(p) for p in parts) == 2


def test_edge_major_iteration():
    w = Work.from_pairs([3, 1, 3, 1], [0, 1, 2, 3])
    e, q = w.pairs()
    # grouped by first-seen branch bins
    assert list(e) == [3, 3, 1, 1]
    assert list(q) == [0, 2, 1, 3]
