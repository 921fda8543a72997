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
        # tracked param MID-query: both neighbors kept, one "?" only
        "https://a.test/p?x=1&utm_s=2&q=3": "https://a.test/p?x=1&q=3",
        # query that starts with a tracked param, real param after
        "https://a.test/p?utm_s=2&q=3": "https://a.test/p?q=3",
        # consecutive tracked params mid-query
        "https://a.test/p?x=1&utm_a=2&utm_b=3&q=4": (
            "https://a.test/p?x=1&q=4"
        ),
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


def test_crawl_incremental_equals_batch_and_is_exactly_once(
    ray_session, tmp_path
):
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.crawl import crawl_url_dedup
    from ner_pytorch_ray.pipelines.incremental import (
        crawl_incremental_from_documents,
        final_crawl,
        ingest_crawl_delta,
        read_state,
    )
    from ner_pytorch_ray.pipelines.incremental import (
        crawl_records_from,
    )
    import ray.data

    got = crawl_incremental_from_documents(SF, n_deltas=3).to_pandas()
    exp = crawl_url_dedup(SF).to_pandas()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))

    # exactly-once: re-ingesting the same delta id+fingerprint is a no-op
    state_dir = str(tmp_path / "state")
    docs = ray.data.from_arrow(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).slice(
            0, 10
        )
    )
    recs = crawl_records_from(docs)
    v1 = ingest_crawl_delta(recs, state_dir, "d0", fingerprint="fp0")
    v2 = ingest_crawl_delta(recs, state_dir, "d0", fingerprint="fp0")
    assert v1 == v2 == 1
    st = read_state(state_dir)
    assert st["version"] == 1
    n = final_crawl(state_dir).count()
    assert n == 10
