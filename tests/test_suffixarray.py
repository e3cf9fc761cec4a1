"""Suffix-array kernel unit tests (partition-local pass semantics)."""

import numpy as np

from deduplication_challenge_spark.operators.suffixarray import (
    build_suffix_array,
    substring_pairs_partition,
)


def _pairs(doc_ids, texts, min_len):
    out = substring_pairs_partition(np.array(doc_ids, dtype=np.int64), texts, min_len)
    return set(zip(out["src"].tolist(), out["dst"].tolist()))


class TestBuildSuffixArray:
    def test_banana(self):
        codes = np.frombuffer("banana".encode("utf-32-le"), dtype=np.uint32)
        assert build_suffix_array(codes).tolist() == [5, 3, 1, 0, 4, 2]

    def test_empty(self):
        assert build_suffix_array(np.empty(0, dtype=np.uint32)).size == 0

    def test_all_equal(self):
        codes = np.zeros(5, dtype=np.uint32) + 7
        assert build_suffix_array(codes).tolist() == [4, 3, 2, 1, 0]


class TestSubstringPairs:
    def test_containment_detected(self):
        long = "x" * 10 + "the shared core sentence that is long enough to matter here" + "y" * 10
        short = "the shared core sentence that is long enough to matter here"
        assert _pairs([1, 2], [long, short], 48) == {(1, 2)}

    def test_unrelated_no_pairs(self):
        a = "completely unrelated first document with its own words " * 3
        b = "another entirely different text talking about other things " * 3
        assert _pairs([1, 2], [a, b], 48) == set()

    def test_min_len_boundary(self):
        # adjacent chars differ so the shared run is exactly len(shared)
        shared = "S" * 47
        a, b = "aa" + shared + "bb", "cc" + shared + "dd"
        assert _pairs([1, 2], [a, b], 48) == set()
        shared = "S" * 48
        a, b = "aa" + shared + "bb", "cc" + shared + "dd"
        assert _pairs([1, 2], [a, b], 48) == {(1, 2)}

    def test_identical_docs(self):
        t = "identical document body that is comfortably longer than the threshold"
        assert _pairs([5, 3], [t, t], 48) == {(3, 5)}

    def test_short_tails_do_not_fabricate(self):
        # shared suffix shorter than min_len must NOT pair (padding safety)
        a = "distinct prefix one two three four five " + "tail" * 5
        b = "other start something else entirely here " + "tail" * 5
        assert _pairs([1, 2], [a, b], 48) == set()

    def test_star_edges_for_runs(self):
        shared = "the common boilerplate paragraph shared by every single document here"
        docs = [f"doc{i} " + shared + f" end{i}" for i in range(4)]
        got = _pairs([10, 20, 30, 40], docs, 48)
        assert got == {(10, 20), (10, 30), (10, 40)}

    def test_single_doc_no_pairs(self):
        assert _pairs([1], ["anything at all"], 8) == set()
