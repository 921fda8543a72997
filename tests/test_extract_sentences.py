"""Extract (byte-identity invariant) + sentence-split stages over real data."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from ner_pytorch_ray.functions.html import page_html, extract_text

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- pure html
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n"),
            max_size=40,
        ),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_html_roundtrip_property(lines):
    text = "\n".join(lines)
    assert extract_text(page_html("t", text)) == text


def test_html_escaping():
    text = "a < b & c > d\n<p>not a tag</p>"
    html = page_html("x & y", text)
    assert extract_text(html) == text


# ---------------------------------------------------------------- ray stages
@pytest.fixture(scope="module")
def pages_ds(ray_session):
    from ner_pytorch_ray.sources.pages import pages_from_documents

    return pages_from_documents(SF)


def test_pages_shape(pages_ds):
    t = pages_ds.take_batch(10, batch_format="pyarrow")
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert pa.types.is_timestamp(t.schema.field("warc_ts").type)
    assert pa.types.is_binary(t.schema.field("html").type)
    # invariant holds by construction on synthesized pages
    for i in range(len(t)):
        assert extract_text(t.column("html")[i].as_py()) == t.column("text")[i].as_py()


def test_extract_stage_invariant_and_drops_html(pages_ds):
    from ner_pytorch_ray.stages.extract import extract_stage

    out = extract_stage(pages_ds)
    b = out.take_batch(20, batch_format="pyarrow")
    assert "html" not in b.column_names
    assert b.num_rows == 20


def test_extract_stage_raises_on_corruption(ray_session):
    import ray.data
    from ner_pytorch_ray.stages.extract import extract_stage, ExtractError

    t = pa.Table.from_pydict(
        {
            "url": ["u1"],
            "html": [page_html("t", "real text")],
            "text": ["tampered text"],
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception):  # ray wraps ExtractError in UserCodeException
        extract_stage(ds, on_mismatch="raise").materialize()
    # drop mode filters instead
    out = extract_stage(ds, on_mismatch="drop").take_all()
    assert out == []


def test_sentences_stage_counts_match_duckdb(pages_ds):
    """Sentence counts per url == ceil(n_tokens/12) computed by DuckDB."""
    import duckdb
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage

    sent = sentences_stage(extract_stage(pages_ds), zeros=True)
    df = (
        sent.groupby("url")
        .count()
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    oracle = duckdb.sql(
        f"""
        select 'https://doc-' || lpad(cast(doc_id as varchar), 8, '0')
                 || '.example.test/page' as url,
               cast(ceil(len(string_split(text, ' ')) / 12.0) as bigint) as n
        from read_parquet('{SF}/documents.parquet')
        order by url
        """
    ).df()
    assert list(df["url"]) == list(oracle["url"])
    assert list(df["count()"]) == list(oracle["n"])


def test_sentences_tokens_and_ids(pages_ds):
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage

    sent = sentences_stage(extract_stage(pages_ds), zeros=True)
    b = sent.take_batch(50, batch_format="pyarrow")
    assert set(b.column_names) == {"url", "sent_id", "tokens", "lang"}
    toks = b.column("tokens").to_pylist()
    sids = b.column("sent_id").to_pylist()
    urls = b.column("url").to_pylist()
    # all sentences except possibly the last of a page have exactly 12 tokens
    from collections import defaultdict

    per_url = defaultdict(list)
    for u, s, t in zip(urls, sids, toks):
        per_url[u].append((s, t))
        assert len(t) >= 1
    for u, lst in per_url.items():
        lst.sort()
        assert [s for s, _ in lst] == list(range(len(lst)))
