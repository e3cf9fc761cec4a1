"""Consolidation kernel goldens — the analog of the reference's per-policy
merge tests (/root/reference/src/tests/test_integration.py:65-524), with the
north_star's page-field policies."""

import datetime as dt
import json

import pandas as pd
import pytest

from deduplication_challenge_spark.operators.consolidate import (
    CANONICAL_SCHEMA,
    attach_clusters,
    consolidate,
    consolidate_cluster_pdf,
)

TS = dt.datetime(2025, 1, 1)


def _cluster_pdf(rows):
    return pd.DataFrame(rows)


GOLDEN_CLUSTER = [
    # doc_id, url, warc_ts, text, lang — cluster 100
    {"cluster_id": 100, "doc_id": 300, "url": "https://c.example/3",
     "warc_ts": TS + dt.timedelta(days=2), "text": "short", "lang": "de"},
    {"cluster_id": 100, "doc_id": 100, "url": "https://a.example/1",
     "warc_ts": TS + dt.timedelta(days=1), "text": "the longest text of all members",
     "lang": "en"},
    {"cluster_id": 100, "doc_id": 200, "url": "https://b.example/2",
     "warc_ts": TS, "text": "middle length text", "lang": "en"},
]


class TestKernel:
    def test_elections(self):
        out = consolidate_cluster_pdf(_cluster_pdf(GOLDEN_CLUSTER)).iloc[0]
        assert out["cluster_id"] == 100
        assert out["doc_id"] == 100                      # min id survives
        assert out["text"] == "the longest text of all members"
        assert out["url"] == "https://a.example/1"       # url follows text winner
        assert out["warc_ts"] == TS                      # earliest
        assert out["lang"] == "en"                       # most frequent
        assert list(out["langs"]) == ["de", "en"]
        assert list(out["member_urls"]) == [
            "https://a.example/1", "https://b.example/2", "https://c.example/3"
        ]
        assert out["n_members"] == 3
        details = json.loads(out["details"])
        assert details["lang"]["en"] == ["https://a.example/1", "https://b.example/2"]
        assert details["lang"]["de"] == ["https://c.example/3"]

    def test_text_tie_breaks_to_min_doc_id(self):
        rows = [
            {"cluster_id": 1, "doc_id": 2, "url": "u2", "warc_ts": TS, "text": "same!", "lang": "en"},
            {"cluster_id": 1, "doc_id": 1, "url": "u1", "warc_ts": TS, "text": "same.", "lang": "en"},
        ]
        out = consolidate_cluster_pdf(_cluster_pdf(rows)).iloc[0]
        assert out["text"] == "same." and out["url"] == "u1"

    def test_lang_tie_breaks_lexicographic(self):
        rows = [
            {"cluster_id": 1, "doc_id": 1, "url": "u1", "warc_ts": TS, "text": "a", "lang": "fr"},
            {"cluster_id": 1, "doc_id": 2, "url": "u2", "warc_ts": TS, "text": "b", "lang": "de"},
        ]
        assert consolidate_cluster_pdf(_cluster_pdf(rows)).iloc[0]["lang"] == "de"

    def test_deterministic_under_input_order(self):
        a = consolidate_cluster_pdf(_cluster_pdf(GOLDEN_CLUSTER))
        b = consolidate_cluster_pdf(_cluster_pdf(GOLDEN_CLUSTER[::-1]))
        pd.testing.assert_frame_equal(a, b)


class TestSparkConsolidate:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (100, "https://a.example/1", TS, "long text aaaa bbbb cccc", "en"),
            (200, "https://b.example/2", TS + dt.timedelta(days=1), "long text aaaa bbbb cccc", "en"),
            (300, "https://c.example/3", TS, "a singleton document", "ro"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, url string, warc_ts timestamp, text string, lang string"
        )

    def test_union_of_paths_matches_kernel(self, spark, docs):
        assignments = spark.createDataFrame(
            [(100, 100), (200, 100)], "doc_id long, cluster_id long"
        )
        out = {r["cluster_id"]: r for r in consolidate(attach_clusters(docs, assignments)).collect()}
        assert set(out) == {100, 300}
        merged = out[100]
        assert merged["doc_id"] == 100 and merged["n_members"] == 2
        assert merged["warc_ts"] == TS
        single = out[300]
        assert single["n_members"] == 1
        assert single["text"] == "a singleton document"
        # singleton JVM projection emits the same details JSON as the kernel
        kernel = consolidate_cluster_pdf(
            _cluster_pdf([{"cluster_id": 300, "doc_id": 300, "url": "https://c.example/3",
                           "warc_ts": TS, "text": "a singleton document", "lang": "ro"}])
        ).iloc[0]
        assert single["details"] == kernel["details"]
        assert list(single["langs"]) == list(kernel["langs"])
        assert list(single["member_urls"]) == list(kernel["member_urls"])


def test_null_lang_and_url_normalized_both_paths(spark):
    """Review finding: a singleton with null lang crashed the passthrough's
    create_map (NULL_MAP_KEY) and a null url crashed the kernel's sorted();
    consolidate pins the null policy at entry — both paths emit '' like the
    pipeline's own ingest coalesce."""
    import datetime as dt

    from deduplication_challenge_spark.operators.consolidate import (
        attach_clusters,
        consolidate,
    )

    rows = [
        # singleton with null lang + null url
        (1, None, dt.datetime(2025, 1, 1), "solo text", None, 1),
        # two-member cluster with one null lang and one null url member
        (2, "https://c/2", dt.datetime(2025, 1, 1), "pair text longer", None, 9),
        (3, None, dt.datetime(2025, 1, 2), "pair", "en", 9),
    ]
    dc = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp, text string, lang string, cluster_id long"
    )
    out = {r["cluster_id"]: r for r in consolidate(dc).collect()}
    assert out[1]["lang"] == "" and out[1]["details"] == '{"lang":{"":[""]}}'
    assert out[9]["n_members"] == 2
    assert "" in out[9]["member_urls"]  # null url normalized, not dropped


def test_full_kernel_column_order_matches_schema(spark):
    """Review finding: consolidate_cluster_pdf must emit columns in
    CANONICAL_SCHEMA order so positional consumers don't map text into the
    warc_ts slot."""
    import datetime as dt

    import pandas as pd

    from deduplication_challenge_spark.operators.consolidate import (
        CANONICAL_SCHEMA,
        consolidate_cluster_pdf,
    )

    pdf = pd.DataFrame(
        {
            "cluster_id": [5, 5],
            "doc_id": [1, 2],
            "url": ["https://k/1", "https://k/2"],
            "warc_ts": [dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 2)],
            "text": ["short", "the longer text wins"],
            "lang": ["en", "en"],
        }
    )
    out = consolidate_cluster_pdf(pdf)
    declared = [f.split()[0] for f in CANONICAL_SCHEMA.split(", ")]
    assert list(out.columns) == declared
    # and createDataFrame by POSITION works (it would throw on a swap)
    df = spark.createDataFrame(out, CANONICAL_SCHEMA)
    assert df.first()["text"] == "the longer text wins"
