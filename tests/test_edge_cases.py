"""Degenerate-input robustness: single-doc, empty-text, and tiny corpora
must flow through the pipelines without crashing (block shapes at real
scale include empty/degenerate partitions after filters)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    """A minimal sf-dir: 3 documents (one empty text, one single token),
    tiny embeddings and events tables."""
    d = tmp_path_factory.mktemp("tiny_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    ["", "spark", "the customer saw the hash join table"],
                    type=pa.string(),
                ),
                "lang": pa.array(["en"] * 3, type=pa.string()),
                "source": pa.array(["t"] * 3, type=pa.string()),
                "n_chars": pa.array([0, 5, 37], type=pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], type=pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0, 0.0], [0.9, 0.1, 0.0]],
                    type=pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1], type=pa.int64()),
                "ts": pa.array([1_600_000_000_000_000, 1_600_000_030_000_000],
                               type=pa.timestamp("us")),
                "user_id": pa.array([7, 7], type=pa.int64()),
                "event_type": pa.array(["click", "error"], type=pa.string()),
                "value": pa.array([1.0, 2.0], type=pa.float64()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return str(d)


def test_kg_on_tiny_corpus(ray_session, tiny_sf):
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    edges, nodes = kg_from_documents(tiny_sf)
    n_nodes = {r["entity_id"] for r in nodes.take_all()}
    assert "org:spark" in n_nodes and "org:hash_join" in n_nodes
    assert edges.count() >= 1  # co-sentence pair in doc 2


def test_quality_and_dedup_on_tiny_corpus(ray_session, tiny_sf):
    from ner_pytorch_ray.pipelines.dedup import exact_dedup, minhash_lsh_pairs
    from ner_pytorch_ray.pipelines.quality import (
        hash_sample,
        quality_stats,
        repetition_stats,
        winnow_fingerprints,
    )

    assert quality_stats(tiny_sf).count() == 3
    assert repetition_stats(tiny_sf).count() == 3
    assert exact_dedup(tiny_sf).count() == 3
    assert minhash_lsh_pairs(tiny_sf).count() == 0  # no near-dups
    assert winnow_fingerprints(tiny_sf).count() >= 1
    assert hash_sample(tiny_sf, rate_pct=100).count() == 3


def test_similarity_on_two_vectors(ray_session, tiny_sf):
    from ner_pytorch_ray.pipelines.similarity import ann_lsh_topk, knn_topk

    knn = knn_topk(tiny_sf, n_queries=2, k=5).take_all()
    assert {(r["query_id"], r["neighbor_id"]) for r in knn} == {(0, 1), (1, 0)}
    ann = ann_lsh_topk(tiny_sf, n_queries=2, k=5).take_all()
    # the two vectors are ~6 degrees apart: same LSH signature w.h.p., and
    # the banded path must at minimum not crash on a 2-row corpus
    assert len(ann) <= 2


def test_windows_on_two_events(ray_session, tiny_sf):
    from ner_pytorch_ray.pipelines.windows import (
        asof_error_attribution,
        range_join_events,
        user_sessions,
    )

    s = user_sessions(tiny_sf).take_all()
    assert len(s) == 1 and s[0]["n_events"] == 2
    a = asof_error_attribution(tiny_sf).take_all()
    assert len(a) == 1 and a[0]["click_id"] == 0 and a[0]["gap_us"] == 30_000_000
    r = range_join_events(tiny_sf, window_seconds=60).take_all()
    assert len(r) == 1 and r[0]["gap_us"] == 30_000_000


def test_neural_on_tiny_corpus(ray_session, tiny_sf):
    from ner_pytorch_ray.pipelines.neural import neural_mentions

    men, vocab, _ = neural_mentions(tiny_sf)
    assert men.count() >= 0  # flows end-to-end (tiny vocab, short docs)
    assert "<UNK>" in vocab["word_to_id"]


def test_adv_on_tiny_corpus(ray_session, tiny_sf):
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline

    out = adv_pipeline(tiny_sf, order="rep", n_variants=2).take_all()
    # doc 2 has entities with >= 2 same-type bank entries -> variants exist
    assert all(len(r["tokens"]) == len(r["tags"]) for r in out)


def test_no_per_batch_ray_get_in_package():
    """Broadcast-consumption hygiene (VERDICT r2 #3): `ray.get` of a
    broadcast ref must happen once per worker (constructor / driver), never
    per batch. AST-scan every package module: no `ray.get(...)` call may
    appear inside a `__call__` method or inside any function taking a
    `batch` parameter."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "ner_pytorch_ray"
    offenders = []

    def has_ray_get(node):
        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Attribute)
                and sub.func.attr == "get"
                and isinstance(sub.func.value, ast.Name)
                and sub.func.value.id in ("ray", "_ray", "_r")
            ):
                return True
        return False

    for path in sorted(pkg.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            is_call = node.name == "__call__"
            takes_batch = any(
                a.arg == "batch" for a in node.args.args + node.args.kwonlyargs
            )
            if (is_call or takes_batch) and has_ray_get(node):
                offenders.append(f"{path.name}:{node.lineno}:{node.name}")
    assert offenders == [], offenders
