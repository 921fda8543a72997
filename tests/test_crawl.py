"""URL canonicalization + crawl-revisit dedup (pipelines/crawl.py)."""

import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_canonical_url_cases():
    from ner_pytorch_ray.pipelines.crawl import canonical_url

    cases = {
        # fragment stripped
        "https://a.test/p#frag": "https://a.test/p",
        # tracking params dropped, real param kept
        "https://a.test/p?utm_source=x&q=1": "https://a.test/p?q=1",
        "https://a.test/p?q=1&utm_medium=y": "https://a.test/p?q=1",
        "https://a.test/p?utm_source=x&ref=rss": "https://a.test/p",
        # host case folded, path case preserved
        "HTTPS://A.Test/Path": "https://a.test/Path",
        # one trailing slash stripped off a non-root path
        "https://a.test/p/": "https://a.test/p",
        # root slash kept
        "https://a.test/": "https://a.test/",
        # everything at once
        "HTTPS://A.TEST/p/?utm_source=x#f": "https://a.test/p",
    }
    got = canonical_url(pa.array(list(cases), type=pa.string())).to_pylist()
    assert got == list(cases.values())


def test_crawl_url_dedup_counts_and_latest(ray_session):
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.crawl import crawl_url_dedup
    from ner_pytorch_ray.sources.pages import EPOCH_US, doc_url

    rows = {
        r["canonical_url"]: (r["n_crawls"], r["latest_ts_us"])
        for r in crawl_url_dedup(SF).take_all()
    }
    ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    assert len(rows) == len(ids)
    day = 86_400_000_000
    for d in ids[:50]:
        n = 1 + d % 3
        assert rows[doc_url(d)] == (n, EPOCH_US + d + (n - 1) * day)
