"""Incremental KG ingestion (pipelines/incremental.py): chunked delta
ingestion must equal the batch build exactly (distributive aggregates),
re-ingestion must be a no-op, and a crashed version write must be
recovered. The sf0.01 oracle comparison (same SQL as kg_edges) runs via
tools/check_oracles.py / the driver gate."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def _pd(ds):
    return ds.to_pandas().reset_index(drop=True)


def test_incremental_equals_batch(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.incremental import (
        kg_incremental_from_documents,
    )
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    e_i, n_i = kg_incremental_from_documents(
        SF, n_deltas=3, state_dir=str(tmp_path / "state")
    )
    e_b, n_b = kg_from_documents(SF)
    assert _pd(e_i).equals(_pd(e_b))
    assert _pd(n_i).equals(_pd(n_b))


def test_reingest_is_noop_and_state_versioned(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        final_edges,
        ingest_pages_delta,
        read_state,
    )

    state = str(tmp_path / "state")
    v1 = ingest_pages_delta(_delta_pages(SF, 2, 0), state, "d0", "fp0")
    assert v1 == 1
    before = _pd(final_edges(state))
    # same delta id + fingerprint -> no-op, version pointer unchanged
    v_again = ingest_pages_delta(_delta_pages(SF, 2, 0), state, "d0", "fp0")
    assert v_again == 1
    assert _pd(final_edges(state)).equals(before)
    # second delta advances the version; superseded dir is retired
    v2 = ingest_pages_delta(_delta_pages(SF, 2, 1), state, "d1", "fp1")
    assert v2 == 2
    assert not os.path.exists(os.path.join(state, "v1"))
    deltas = read_state(state)["deltas"]
    assert {k: v["fingerprint"] for k, v in deltas.items()} == {
        "d0": "fp0",
        "d1": "fp1",
    }
    # lineage metrics recorded per delta (mention volume + state sizes)
    assert deltas["d1"]["mentions"] > 0
    assert deltas["d1"]["state_edge_rows"] > 0
    assert deltas["d1"]["version"] == 2


def test_crashed_version_dir_is_recovered(ray_session, tmp_path):
    """A dangling v{k} directory (crash after parquet write, before the
    STATE.json pointer swap) must not poison the retry."""
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        final_edges,
        ingest_pages_delta,
    )

    state = str(tmp_path / "state")
    ingest_pages_delta(_delta_pages(SF, 2, 0), state, "d0", "fp0")
    # simulate a crashed ingest of d1: garbage v2 exists, pointer still v1
    bad = os.path.join(state, "v2", "edges")
    os.makedirs(bad)
    with open(os.path.join(bad, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    v2 = ingest_pages_delta(_delta_pages(SF, 2, 1), state, "d1", "fp1")
    assert v2 == 2
    # retried write replaced the garbage and the final table is readable
    assert len(_pd(final_edges(state))) > 0


def test_delta_order_independence(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        final_edges,
        final_nodes,
        ingest_pages_delta,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for order, state in (((0, 1, 2), a), ((2, 0, 1), b)):
        for d in order:
            ingest_pages_delta(_delta_pages(SF, 3, d), state, f"d{d}", f"fp{d}")
    assert _pd(final_edges(a)).equals(_pd(final_edges(b)))
    assert _pd(final_nodes(a)).equals(_pd(final_nodes(b)))


def test_incr_cli_roundtrip(ray_session, tmp_path, capsys):
    """CLI drive: 3 ingests + finalize == batch build; re-ingest no-op."""
    import pyarrow.parquet as pq
    from ner_pytorch_ray.incr_cli import main
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    state, out = str(tmp_path / "state"), str(tmp_path / "graph")
    for d in range(3):
        assert main(["ingest", "--sf_dir", SF, "--state", state,
                     "--delta", str(d), "--n_deltas", "3"]) == 0
    assert "ingested" in capsys.readouterr().out
    assert main(["ingest", "--sf_dir", SF, "--state", state,
                 "--delta", "1", "--n_deltas", "3"]) == 0
    assert "already ingested" in capsys.readouterr().out
    assert main(["finalize", "--state", state, "--out", out]) == 0
    got = (
        pq.read_table(f"{out}/edges")
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = _pd(kg_from_documents(SF)[0])
    assert got.equals(want)
    assert main(["status", "--state", state]) == 0


def test_empty_delta_is_legal(ray_session, tmp_path):
    """An empty first crawl still writes a readable (schema-pinned) state
    version; later deltas merge on top and equal the batch build."""
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        final_edges,
        ingest_pages_delta,
    )
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    state = str(tmp_path / "state")
    v = ingest_pages_delta(
        _delta_pages(SF, 9999, 9998), state, "empty", "fp-e"
    )
    assert v == 1 and final_edges(state).count() == 0
    for d in range(3):
        ingest_pages_delta(_delta_pages(SF, 3, d), state, f"d{d}", f"fp{d}")
    assert _pd(final_edges(state)).equals(_pd(kg_from_documents(SF)[0]))


def test_state_node_metrics_equals_batch_dashboard(ray_session, tmp_path):
    """After full ingestion, the dashboard computed FROM state (no corpus
    re-read) equals kg_node_metrics over the same corpus; the CLI
    --analytics flag writes it."""
    import pyarrow.parquet as pq
    from ner_pytorch_ray.incr_cli import main
    from ner_pytorch_ray.pipelines.graph_ops import kg_node_metrics
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        ingest_pages_delta,
        state_node_metrics,
    )

    state, out = str(tmp_path / "state"), str(tmp_path / "graph")
    for d in range(3):
        ingest_pages_delta(_delta_pages(SF, 3, d), state, f"d{d}", f"fp{d}")
    got = (
        state_node_metrics(state)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        kg_node_metrics(SF)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert main(["finalize", "--state", state, "--out", out,
                 "--analytics"]) == 0
    disk = (
        pq.read_table(f"{out}/node_metrics")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert disk.equals(want)


def test_changed_fingerprint_refuses(ray_session, tmp_path):
    """Re-ingesting a recorded delta_id with a DIFFERENT fingerprint must
    raise (its old contribution is already merged — silently merging again
    would double-count), and the state must stay usable."""
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        final_edges,
        ingest_pages_delta,
    )

    state = str(tmp_path / "state")
    ingest_pages_delta(_delta_pages(SF, 2, 0), state, "d0", "fp0")
    before = _pd(final_edges(state))
    with pytest.raises(ValueError, match="fingerprint"):
        ingest_pages_delta(_delta_pages(SF, 2, 0), state, "d0", "fp-CHANGED")
    assert _pd(final_edges(state)).equals(before)


def test_finalize_errors_and_rerun_cleanliness(ray_session, tmp_path):
    """finalize on a never-ingested state raises a clear error; a re-run
    of finalize after another ingest REPLACES the output (no stale
    fragments mixed in)."""
    import pyarrow.parquet as pq
    from ner_pytorch_ray.incr_cli import main
    from ner_pytorch_ray.pipelines.incremental import (
        _delta_pages,
        final_edges,
        ingest_pages_delta,
    )

    state, out = str(tmp_path / "state"), str(tmp_path / "graph")
    with pytest.raises(ValueError, match="no ingested deltas"):
        main(["finalize", "--state", state, "--out", out])
    ingest_pages_delta(_delta_pages(SF, 2, 0), state, "d0", "fp0")
    assert main(["finalize", "--state", state, "--out", out]) == 0
    ingest_pages_delta(_delta_pages(SF, 2, 1), state, "d1", "fp1")
    assert main(["finalize", "--state", state, "--out", out]) == 0
    disk = (
        pq.read_table(f"{out}/edges")
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert disk.equals(_pd(final_edges(state)))


# ---------------------------------------------------- incremental dedup state
def test_dedup_incremental_equals_batch(ray_session, tmp_path):
    """3-delta dedup ingestion reproduces batch exact_dedup bit-for-bit,
    and re-ingesting a recorded delta is a no-op."""
    import pandas as pd

    from ner_pytorch_ray.pipelines.dedup import exact_dedup
    from ner_pytorch_ray.pipelines.incremental import (
        dedup_incremental_from_documents,
        read_state,
    )

    state_dir = str(tmp_path / "dstate")
    inc = (
        dedup_incremental_from_documents(SF, n_deltas=3, state_dir=state_dir)
        .to_pandas()
        .sort_values(["keeper", "n_copies"])
        .reset_index(drop=True)
    )
    batch = (
        exact_dedup(SF)
        .to_pandas()
        .sort_values(["keeper", "n_copies"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, batch, check_dtype=False)

    st = read_state(state_dir)
    assert st["version"] == 3
    # second full pass over the same deltas: all no-ops, version unchanged
    inc2 = dedup_incremental_from_documents(SF, n_deltas=3, state_dir=state_dir)
    assert read_state(state_dir)["version"] == 3
    pd.testing.assert_frame_equal(
        inc2.to_pandas().sort_values(["keeper", "n_copies"]).reset_index(drop=True),
        batch,
        check_dtype=False,
    )


def test_dedup_incremental_order_independence(ray_session, tmp_path):
    """Deltas ingested in reverse order produce the identical state table
    (distributive min/sum)."""
    import pandas as pd
    import ray.data

    from ner_pytorch_ray.pipelines.incremental import (
        final_dedup,
        ingest_dedup_delta,
    )
    from ner_pytorch_ray.state import manifests as mf

    def run(order, sd):
        for d in order:
            docs = ray.data.read_parquet(
                f"{SF}/documents.parquet", columns=["doc_id", "text"]
            )
            ingest_dedup_delta(
                mf.filter_shard(docs, 3, d), sd, delta_id=f"d{d}"
            )
        df = final_dedup(sd).to_pandas()
        return df.sort_values(["fp"]).reset_index(drop=True)

    a = run([0, 1, 2], str(tmp_path / "fwd"))
    b = run([2, 0, 1], str(tmp_path / "rev"))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------- incremental windows
def test_windows_incremental_equals_batch_with_late_data(ray_session, tmp_path):
    """Event-id-split deltas mean every ingest carries events for windows
    other deltas already opened (late data); the final state must equal
    the batch tumbling windows exactly, in any delta order."""
    import pandas as pd

    from ner_pytorch_ray.pipelines.incremental import (
        windows_incremental_from_events,
    )
    from ner_pytorch_ray.pipelines.windows import tumbling_window_counts

    inc = _pd(
        windows_incremental_from_events(
            SF, n_deltas=3, state_dir=str(tmp_path / "w")
        )
    )
    batch = _pd(tumbling_window_counts(SF, window_minutes=60))
    pd.testing.assert_frame_equal(inc, batch, check_dtype=False)
    # the split is genuinely late-data-bearing: more windows than deltas
    assert len(batch) > 3


def test_sliding_incremental_equals_batch_with_late_data(
    ray_session, tmp_path
):
    """Sliding sibling of the tumbling test: event-id-split deltas hit
    already-open (overlapping) windows; the final state must equal the
    batch sliding windows exactly."""
    import pandas as pd

    from ner_pytorch_ray.pipelines.incremental import (
        sliding_incremental_from_events,
    )
    from ner_pytorch_ray.pipelines.windows import sliding_window_counts

    inc = _pd(
        sliding_incremental_from_events(
            SF, n_deltas=3, state_dir=str(tmp_path / "s")
        )
    )
    batch = _pd(
        sliding_window_counts(SF, window_minutes=60, slide_minutes=15)
    )
    pd.testing.assert_frame_equal(inc, batch, check_dtype=False)


def test_sliding_param_change_refused(ray_session, tmp_path):
    """The (window, slide) parameterization is part of the state identity:
    window keys are functions of it, so a re-ingest with different params
    must fail loudly rather than corrupt the accumulated windows."""
    import ray
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.incremental import ingest_sliding_delta

    sd = str(tmp_path / "state")
    events = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "ts": pa.array([0, 60_000_000], type=pa.timestamp("us")),
                "event_type": ["click", "click"],
                "value": [1.0, 2.0],
            }
        )
    )
    ingest_sliding_delta(events, sd, delta_id="d0", slide_minutes=15)
    with pytest.raises(ValueError, match="param"):
        ingest_sliding_delta(events, sd, delta_id="d1", slide_minutes=30)


# --------------------------------------------------- state-kind guard
def test_mixed_ingest_kinds_refused(ray_session, tmp_path):
    """One state_dir holds ONE ingest kind; a second kind must fail loudly
    (not read a missing prior subdir or fork history)."""
    import ray
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.incremental import (
        ingest_dedup_delta,
        ingest_window_delta,
    )

    sd = str(tmp_path / "state")
    docs = ray.data.from_arrow(
        pa.Table.from_pydict({"doc_id": [1, 2], "text": ["a", "a"]})
    )
    ingest_dedup_delta(docs, sd, delta_id="d0")
    events = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "ts": pa.array([0, 60_000_000], type=pa.timestamp("us")),
                "event_type": ["click", "click"],
                "value": [1.0, 2.0],
            }
        )
    )
    with pytest.raises(ValueError, match="dedup.*ingest state"):
        ingest_window_delta(events, sd, delta_id="d0")


def test_demo_wrappers_clean_their_temp_state(ray_session):
    """state_dir=None demo mode must not leak /tmp state directories."""
    import glob

    from ner_pytorch_ray.pipelines.incremental import (
        dedup_incremental_from_documents,
    )

    before = set(glob.glob("/tmp/dedup_incremental_*"))
    out = dedup_incremental_from_documents(SF, n_deltas=2)
    assert out.count() > 0  # result survives the cleanup (materialized)
    after = set(glob.glob("/tmp/dedup_incremental_*"))
    assert after - before == set()


# --------------------------------------------------- incremental minhash
def test_minhash_incremental_equals_batch(ray_session, tmp_path):
    import pandas as pd

    from ner_pytorch_ray.pipelines.dedup import minhash_lsh_pairs
    from ner_pytorch_ray.pipelines.incremental import (
        minhash_incremental_from_documents,
    )

    inc = (
        minhash_incremental_from_documents(
            SF, n_deltas=3, state_dir=str(tmp_path / "mh")
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    bat = (
        minhash_lsh_pairs(SF)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(bat) > 0
    pd.testing.assert_frame_equal(inc, bat)


def test_minhash_incremental_order_independent(ray_session, tmp_path):
    import pandas as pd
    import ray
    import pyarrow.parquet as pq
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.incremental import (
        final_minhash_pairs,
        ingest_minhash_delta,
    )
    from ner_pytorch_ray.state import manifests as mf

    def run(order, sd):
        for d in order:
            docs = ray.data.read_parquet(
                f"{SF}/documents.parquet", columns=["doc_id", "text"]
            )
            ingest_minhash_delta(
                mf.filter_shard(docs, 3, d), sd, delta_id=f"d{d}"
            )
        return (
            final_minhash_pairs(sd)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    a = run([0, 1, 2], str(tmp_path / "fwd"))
    b = run([2, 0, 1], str(tmp_path / "rev"))
    pd.testing.assert_frame_equal(a, b)


def test_minhash_incremental_bucket_overflow_retracts(ray_session, tmp_path):
    """A bucket that exceeds max_bucket only after LATER crawls must
    retract the pairs it emitted earlier — final state equals the batch
    run over the union (which drops the oversized bucket entirely)."""
    import ray
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.incremental import (
        final_minhash_pairs,
        ingest_minhash_delta,
    )

    text = " ".join(f"tok{i}" for i in range(30))  # identical docs

    def docs_ds(ids):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array([text] * len(ids), type=pa.string()),
                }
            )
        )

    sd = str(tmp_path / "mh")
    # delta 0: 2 identical docs -> bucket size 2 <= cap -> 1 pair emitted
    ingest_minhash_delta(docs_ds([1, 2]), sd, delta_id="d0", max_bucket=3)
    assert final_minhash_pairs(sd).count() == 1
    # delta 1: 2 more copies -> bucket size 4 > cap -> pairs retracted
    ingest_minhash_delta(docs_ds([3, 4]), sd, delta_id="d1", max_bucket=3)
    assert final_minhash_pairs(sd).count() == 0


def test_minhash_incremental_param_mismatch_refused(ray_session, tmp_path):
    import ray
    import pyarrow as pa

    from ner_pytorch_ray.pipelines.incremental import ingest_minhash_delta

    docs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": [1], "text": ["a b c d e f g h i j"]}
        )
    )
    sd = str(tmp_path / "mh")
    ingest_minhash_delta(docs, sd, delta_id="d0", tau=0.5)
    with pytest.raises(ValueError, match="params"):
        ingest_minhash_delta(docs, sd, delta_id="d1", tau=0.4)


# ----------------------------------------------- incremental entity resolution
def _er_records_ds(rows):
    import pyarrow as pa

    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array([r[0] for r in rows], type=pa.int64()),
                "name": pa.array([r[1] for r in rows], type=pa.string()),
                "grp": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    ).repartition(2)


_ER_ROWS = [
    (1, "small ring", 0),
    (2, "small bolt", 0),
    (3, "red bolt", 0),
    (4, "red bolt", 1),
    (5, "blue gear", 0),
    (6, "blue gear", 1),
    (7, "gear blue", 1),
    (8, "lone widget", 2),
]


class TestIncrementalEntityResolution:
    def _batch(self):
        from ner_pytorch_ray.pipelines.entity_resolution import resolve_records

        return sorted(
            (r["rid"], r["entity_id"])
            for r in resolve_records(
                _er_records_ds(_ER_ROWS), "rid", "name", attr_cols=["grp"]
            ).take_all()
        )

    def _ingest(self, sd, order):
        from ner_pytorch_ray.pipelines.incremental import ingest_er_delta

        for i, shard in enumerate(order):
            rows = [r for r in _ER_ROWS if r[0] % 3 == shard]
            ingest_er_delta(
                _er_records_ds(rows),
                sd,
                delta_id=f"d{shard}",
                id_col="rid",
                name_col="name",
                attr_cols=["grp"],
            )

    def test_deltas_equal_batch_any_order(self, ray_session, tmp_path):
        from ner_pytorch_ray.pipelines.incremental import final_entities

        for order in ([0, 1, 2], [2, 0, 1]):
            sd = str(tmp_path / f"er_{'_'.join(map(str, order))}")
            self._ingest(sd, order)
            got = sorted(
                (r["rid"], r["entity_id"])
                for r in final_entities(sd).take_all()
            )
            assert got == self._batch()

    def test_reingest_same_delta_is_noop(self, ray_session, tmp_path):
        from ner_pytorch_ray.pipelines.incremental import (
            final_entities,
            ingest_er_delta,
        )

        sd = str(tmp_path / "er_noop")
        self._ingest(sd, [0, 1, 2])
        before = sorted(
            (r["rid"], r["entity_id"]) for r in final_entities(sd).take_all()
        )
        ver = ingest_er_delta(
            _er_records_ds([r for r in _ER_ROWS if r[0] % 3 == 1]),
            sd,
            delta_id="d1",
            id_col="rid",
            name_col="name",
            attr_cols=["grp"],
        )
        assert ver == 3  # unchanged version, exactly-once
        after = sorted(
            (r["rid"], r["entity_id"]) for r in final_entities(sd).take_all()
        )
        assert after == before

    def test_cross_crawl_overflow_raises(self, ray_session, tmp_path):
        import pytest

        from ner_pytorch_ray.pipelines.incremental import ingest_er_delta

        sd = str(tmp_path / "er_overflow")
        ingest_er_delta(
            _er_records_ds([(i, "hot x%d" % i, 0) for i in range(3)]),
            sd,
            delta_id="d0",
            id_col="rid",
            name_col="name",
            attr_cols=["grp"],
            max_block=4,
        )
        # the 'hot' block reaches 6 members across crawls -> must raise,
        # exactly like the batch path on the union corpus
        with pytest.raises(Exception, match="max_block"):
            ingest_er_delta(
                _er_records_ds([(10 + i, "hot y%d" % i, 0) for i in range(3)]),
                sd,
                delta_id="d1",
                id_col="rid",
                name_col="name",
                attr_cols=["grp"],
                max_block=4,
            )

    def test_param_guard(self, ray_session, tmp_path):
        import pytest

        from ner_pytorch_ray.pipelines.incremental import ingest_er_delta

        sd = str(tmp_path / "er_params")
        self._ingest(sd, [0])
        with pytest.raises(ValueError):
            ingest_er_delta(
                _er_records_ds([r for r in _ER_ROWS if r[0] % 3 == 1]),
                sd,
                delta_id="d1",
                id_col="rid",
                name_col="name",
                attr_cols=[],  # different blocking params than the state
            )


class TestPcaIncremental:
    SF = "/root/testdata/sf0.001"

    def _batch(self):
        from ner_pytorch_ray.pipelines.similarity import pca_components

        return [
            (r["component"], r["dim_idx"], r["value_tm"], r["eigval_tm"])
            for r in pca_components(self.SF, k=2).take_all()
        ]

    def _rows(self, ds):
        return [
            (r["component"], r["dim_idx"], r["value_tm"], r["eigval_tm"])
            for r in ds.take_all()
        ]

    def test_incremental_equals_batch_any_delta_order(self, tmp_path):
        import ray

        from ner_pytorch_ray.pipelines.incremental import (
            final_pca_components,
            ingest_pca_delta,
        )

        batch = self._batch()
        vecs = ray.data.read_parquet(
            f"{self.SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).materialize()
        for name, order in (("fwd", (0, 1, 2)), ("rev", (2, 1, 0))):
            sd = str(tmp_path / name)
            for d in order:

                def keep(b, _d=d):
                    import numpy as np
                    import pyarrow as pa

                    mask = (b.column("vec_id").to_numpy() % 3) == _d
                    return b.filter(pa.array(mask))

                ingest_pca_delta(
                    vecs.map_batches(keep, batch_format="pyarrow"),
                    sd,
                    delta_id=f"d{d}",
                )
            assert self._rows(final_pca_components(sd, k=2)) == batch, name

    def test_reingesting_same_delta_is_noop(self, tmp_path):
        import ray

        from ner_pytorch_ray.pipelines.incremental import (
            final_pca_components,
            ingest_pca_delta,
        )

        vecs = ray.data.read_parquet(
            f"{self.SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).materialize()
        sd = str(tmp_path / "s")
        v1 = ingest_pca_delta(vecs, sd, delta_id="all")
        before = self._rows(final_pca_components(sd, k=2))
        v2 = ingest_pca_delta(vecs, sd, delta_id="all")
        assert v2 == v1  # exactly-once: same delta id + fingerprint
        assert self._rows(final_pca_components(sd, k=2)) == before
