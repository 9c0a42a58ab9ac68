"""URL canonicalization edge cases (functions/web.py)."""

from pyspark.sql import functions as F

from extract_permits_spark.functions.web import canonicalize_url, url_dedup


CASES = [
    # (raw, canonical)
    ("https://www.Example.com/a/b", "example.com/a/b"),
    ("HTTP://EXAMPLE.COM/a/b", "example.com/a/b"),
    ("https://example.com/a/b/", "example.com/a/b"),
    ("https://example.com/a/b///", "example.com/a/b"),
    ("https://example.com/a/b#section-2", "example.com/a/b"),
    ("https://example.com/a/b?utm_source=x&utm_medium=y", "example.com/a/b"),
    ("https://example.com/a/b?b=2&a=1", "example.com/a/b?a=1&b=2"),
    ("https://example.com/a/b?a=1&ref=tw&fbclid=xyz", "example.com/a/b?a=1"),
    # path case is preserved, host case is not
    ("https://WWW.Example.com/CaseSensitive/Path", "example.com/CaseSensitive/Path"),
    # bare host; root slash strips
    ("https://example.com/", "example.com"),
    ("example.com/no-scheme?utm_campaign=z", "example.com/no-scheme"),
    ("", None),
    (None, None),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id int, url string"
    )
    got = {
        r["id"]: r["canon"]
        for r in df.select("id", canonicalize_url("url").alias("canon")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_url_dedup_keeps_best(spark):
    rows = [
        (1, "https://www.site.com/p?utm_source=a", 100),
        (2, "http://site.com/p/", 300),       # best quality in the group
        (3, "https://site.com/p#frag", 200),
        (4, "https://other.com/q", 50),       # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, n_chars int")
    out = url_dedup(df, "doc_id", "url", "n_chars").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["canonical_url"] == by_id[2]["canonical_url"] == by_id[3]["canonical_url"]
    assert [by_id[i]["n_dups"] for i in (1, 2, 3)] == [3, 3, 3]
    assert [by_id[i]["is_canonical"] for i in (1, 2, 3)] == [False, True, False]
    assert by_id[4]["n_dups"] == 1 and by_id[4]["is_canonical"]


def test_url_dedup_single_shuffle(spark):
    """The dedup plan contains exactly one Exchange (hash on the canonical
    key) — the regexp canonicalization must not introduce extra shuffles."""
    df = spark.createDataFrame(
        [(1, "https://a.com/x", 10)], "doc_id int, url string, n_chars int"
    )
    plan = url_dedup(df, "doc_id", "url", "n_chars")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # hashpartitioning + AQE read, no join shuffles
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
