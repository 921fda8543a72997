"""KG pipeline: vectorized tagger/spans unit tests + driver-style DuckDB
oracle comparison at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

SF = "/root/testdata/sf0.001"
TYPES = ["PER", "LOC", "ORG", "MISC"]


# ----------------------------------------------------- vectorized span parity
@given(
    st.lists(
        st.lists(
            st.sampled_from(["O"] + [f"{p}-{t}" for p in "BIES" for t in TYPES]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_vectorized_spans_match_pure(sent_tags):
    from ner_pytorch_ray.functions import extract_spans
    from ner_pytorch_ray.stages.mentions import vectorized_spans

    lens = np.array([len(s) for s in sent_tags], dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = pa.array([t for s in sent_tags for t in s], type=pa.string())

    begin, end, sent_of, start_tags = vectorized_spans(flat, offsets)

    got = {}
    for b, e, s in zip(begin, end, sent_of):
        got.setdefault(int(s), []).append((int(b - offsets[s]), int(e - offsets[s])))
    for i, tags in enumerate(sent_tags):
        expected = [(sp.begin, sp.end) for sp in extract_spans(tags)]
        assert got.get(i, []) == expected, (tags, got.get(i))


def test_gazetteer_tags_match_rowwise_oracle(ray_session):
    """Vectorized gazetteer tags == simple per-row dictionary tagging."""
    import ray.data
    from ner_pytorch_ray.stages.gazetteer import (
        gazetteer_tag_stage,
        GAZETTEER,
        BIGRAMS,
    )

    sents = [
        ["spark", "join", "hash", "join", "table"],
        ["hash", "join", "hash", "hash", "join"],
        ["customer", "vector", "stream"],
        ["the", "a", "big"],
        ["hash"],
        ["spark"],
        ["table", "hash"],  # bigram start at sentence end -> no match
    ]
    t = pa.Table.from_pydict(
        {
            "url": [f"u{i}" for i in range(len(sents))],
            "sent_id": list(range(len(sents))),
            "tokens": sents,
        }
    )
    out = gazetteer_tag_stage(ray.data.from_arrow(t)).take_all()
    by_url = {r["url"]: r["tags"] for r in out}

    def oracle(toks):
        tags = ["O"] * len(toks)
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) in BIGRAMS:
                typ = BIGRAMS[(toks[i], toks[i + 1])][0]
                tags[i], tags[i + 1] = f"B-{typ}", f"E-{typ}"
                i += 2
                continue
            if toks[i] in GAZETTEER:
                tags[i] = f"S-{GAZETTEER[toks[i]][0]}"
            i += 1
        return tags

    for i, toks in enumerate(sents):
        assert by_url[f"u{i}"] == oracle(toks), (toks, by_url[f"u{i}"])


def test_mentions_surfaces(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.mentions import mentions_stage

    t = pa.Table.from_pydict(
        {
            "url": ["u0", "u1"],
            "sent_id": [0, 0],
            "tokens": [
                ["spark", "the", "hash", "join"],
                ["customer", "customer"],
            ],
        }
    )
    men = mentions_stage(gazetteer_tag_stage(ray.data.from_arrow(t))).take_all()
    rows = sorted(
        (m["url"], m["mention_id"], m["begin"], m["end"], m["tag_type"], m["surface"])
        for m in men
    )
    assert rows == [
        ("u0", 0, 0, 1, "ORG", "spark"),
        ("u0", 1, 2, 4, "ORG", "hash join"),
        ("u1", 0, 0, 1, "PER", "customer"),
        ("u1", 1, 1, 2, "PER", "customer"),
    ]


def test_linker_exact_and_cosine(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.linker import link_stage

    alias = pa.Table.from_pylist(
        [
            {"entity_id": "Q1", "tag_type": "PER", "surface": "alice", "vec": [1.0, 0.0]},
            {"entity_id": "Q2", "tag_type": "PER", "surface": "bob", "vec": [0.0, 1.0]},
            {"entity_id": "Q3", "tag_type": "LOC", "surface": "paris", "vec": [1.0, 1.0]},
        ]
    )
    mentions = pa.Table.from_pydict(
        {
            "url": ["u"] * 4,
            "sent_id": [0] * 4,
            "tag_type": ["PER", "PER", "LOC", "PER"],
            "surface": ["Alice", "allice", "paris", "zzz"],
            "vec": [[1.0, 0.1], [0.9, 0.1], [1.0, 0.9], [-1.0, -1.0]],
        }
    )
    out = link_stage(ray.data.from_arrow(mentions), alias, concurrency=1).take_all()
    by_surface = {r["surface"]: r for r in out}
    assert by_surface["Alice"]["link_method"] == "exact"
    assert by_surface["Alice"]["entity_id"] == "Q1"
    assert by_surface["allice"]["link_method"] == "cosine"
    assert by_surface["allice"]["entity_id"] == "Q1"
    assert by_surface["paris"]["link_method"] == "exact"
    assert by_surface["zzz"]["link_method"] == "none"
    assert by_surface["zzz"]["entity_id"] == ""


# ----------------------------------------------------- driver-style gate
def _duckdb_with_views(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _oracle_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    # expected-parquet oracles are frozen at sf0.01 (the driver's gate
    # scale) — they cannot be compared at this test's sf0.001; those paths
    # are covered by dedicated tests (test_neural_e2e, test_adversarial).
    return sorted(
        n
        for n, sql in entrymod.oracle_sql().items()
        if "tests/expected" not in sql
    )


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    res = q(SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    con = _duckdb_with_views(SF)
    exp = con.execute(sql).df()

    got_n, exp_n = _normalize(got), _normalize(exp)
    assert list(got_n.columns) == list(exp_n.columns), (got_n.columns, exp_n.columns)
    assert len(got_n) == len(exp_n), (name, len(got_n), len(exp_n))
    pd.testing.assert_frame_equal(got_n, exp_n, check_dtype=False)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    ds = entrymod.entry()
    df = ds.to_pandas()
    assert len(df) >= 0
    assert list(df.columns) == ["subj", "pred", "obj", "weight", "sample_url"]
    # sorted output contract
    assert df[["subj", "pred", "obj"]].apply(tuple, axis=1).is_monotonic_increasing


def test_linked_mentions_cached_memoizes(ray_session):
    """Second call returns the same materialized dataset object (shared
    scan for the graph-analytics layer); results equal the uncached path."""
    from ner_pytorch_ray.pipelines.kg import (
        linked_mentions,
        linked_mentions_cached,
    )
    from ner_pytorch_ray.sources.pages import pages_from_documents

    sf = "/root/testdata/sf0.001"
    a = linked_mentions_cached(sf)
    b = linked_mentions_cached(sf)
    assert a is b
    fresh = linked_mentions(pages_from_documents(sf)).to_pandas()
    cached = a.to_pandas()
    cols = list(fresh.columns)
    assert (
        cached[cols].sort_values(cols).reset_index(drop=True)
        .equals(fresh.sort_values(cols).reset_index(drop=True))
    )


class TestCrawlDiff:
    def test_diff_aligns_with_per_side_edges(self):
        """The edge computation per side is already oracled (kg_edges);
        what's new is the full-outer alignment + classification — verify
        it against a pandas merge of the two sides' edge tables."""
        import pandas as pd

        from ner_pytorch_ray.pipelines.incremental import _delta_pages
        from ner_pytorch_ray.pipelines.kg import kg_crawl_diff, linked_mentions
        from ner_pytorch_ray.stages.graph import edge_partials_merged

        sf = "/root/testdata/sf0.001"

        def side(crawls):
            pages = _delta_pages(sf, 3, crawls[0])
            for c in crawls[1:]:
                pages = pages.union(_delta_pages(sf, 3, c))
            df = edge_partials_merged(linked_mentions(pages)).to_pandas()
            return df[["subj", "pred", "obj", "weight"]]

        old, new = side((0, 1)), side((1, 2))
        exp = old.merge(
            new, on=["subj", "pred", "obj"], how="outer",
            suffixes=("_old", "_new"),
        ).fillna(0)
        exp["w_old"] = exp.weight_old.astype(int)
        exp["w_new"] = exp.weight_new.astype(int)

        def status(r):
            if r.w_old == 0:
                return "added"
            if r.w_new == 0:
                return "removed"
            return "stable" if r.w_old == r.w_new else "changed"

        exp["status"] = exp.apply(status, axis=1)
        exp = exp.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
        got = kg_crawl_diff(sf).to_pandas()
        cols = ["subj", "pred", "obj", "w_old", "w_new", "status"]
        pd.testing.assert_frame_equal(got[cols], exp[cols])
        # weights must actually move between the crawl sets (a diff of
        # identical sides would vacuously pass the alignment)
        assert "changed" in set(got.status)
        assert (got.w_old != got.w_new).any()
