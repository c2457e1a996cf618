"""Domain-keyed curation: host normalization edge cases, cap
semantics, and share-report invariants (operators/web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators import web


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    return [r["d"] for r in
            df.select(web.normalized_host("url").alias("d"))
            .orderBy("i").collect()]


def test_normalized_host_strips_everything_but_the_domain(spark):
    assert _norm(spark, [
        "http://example.com/p/1",
        "HTTPS://Example.COM/p/2",
        "https://user:pw@example.com:8443/x?q=1#f",
        "http://WWW.Example.com/",
        "http://www.example.com",
        "ftp://sub.example.org:21/file",
    ]) == [
        "example.com",
        "example.com",
        "example.com",
        "example.com",
        "example.com",
        "sub.example.org",
    ]


def test_normalized_host_only_leading_www_is_stripped(spark):
    # www in the middle of the host is a real label, not decoration
    assert _norm(spark, [
        "http://www.www2.example.com/",
        "http://wwwx.example.com/",
    ]) == ["www2.example.com", "wwwx.example.com"]


def test_domain_caps_keeps_at_most_k_per_domain(spark):
    rows = [(i, f"http://dom{i % 3}.example.com/p/{i}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = web.domain_caps(df, url_col="url", k=5, id_col="doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r["domain"], []).append(r)
    assert set(per) == {f"dom{j}.example.com" for j in range(3)}
    for members in per.values():
        assert len(members) == 5
        assert sorted(r["rk"] for r in members) == [1, 2, 3, 4, 5]
    # deterministic: a second run picks the same survivors
    again = {r["doc_id"] for r in
             web.domain_caps(df, url_col="url", k=5).collect()}
    assert again == {r["doc_id"] for r in out}


def test_domain_share_sums_to_one(spark):
    rows = [(i, f"http://dom{i % 4}.example.com/") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = web.domain_share(df, url_col="url").collect()
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-9
    assert all(r["n_docs"] == 25 and r["share"] == 0.25 for r in out)
