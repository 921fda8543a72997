"""Incremental KG ingestion: merge delta crawls into persisted aggregate
state, without ever re-reading previously ingested documents.

``pipelines/resumable.py`` resumes a *single* batch run at shard
granularity but re-aggregates the graph from all materialized mention
shards. This module is the *streaming-crawl* path: each arriving delta
(today's crawl) runs the expensive DAG prefix (extract -> sentences -> tag
-> mentions -> link) over the delta only, reduces it to merged aggregate
partials, and folds those into the persisted state with ONE groupby over
``|state| + |delta partials|`` rows. Per-ingest cost is O(delta + state),
independent of total corpus history.

Exactness: the graph aggregates are distributive — edge weight is a sum,
sample_url a min, node n_mentions a sum (stages/graph.py) — and co-sentence
pairs never cross documents, so any partition of the corpus into document
deltas re-aggregates to EXACTLY the batch answer. The driver oracle for
``kg_edges_incremental`` is therefore the *same SQL* as ``kg_edges``: a
three-delta incremental build must hash-match the one-shot batch build.

Durability: each ingest writes a new immutable state version directory
``{state}/v{k}/edges|nodes`` and only then atomically replaces
``STATE.json`` (version pointer + ingested-delta fingerprints). A crash
mid-write leaves a dangling ``v{k}`` directory that the retry overwrites;
re-ingesting an already-recorded delta is a no-op (exactly-once per delta,
keyed by the same mtime-aware fingerprints as state/manifests.py).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data

from ner_pytorch_ray.state import manifests as mf

EDGE_COLS = ["subj", "pred", "obj", "weight", "sample_url"]
NODE_COLS = ["entity_id", "tag_type", "surface", "n_mentions"]

_EDGE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),
        ("sample_url", pa.string()),
    ]
)
_NODE_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("tag_type", pa.string()),
        ("surface", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)


def _cast_to(schema: pa.Schema):
    def cast(batch: pa.Table) -> pa.Table:
        return batch.select(schema.names).cast(schema)

    return cast


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "STATE.json")


def read_state(state_dir: str) -> dict:
    path = _state_path(state_dir)
    if not os.path.exists(path):
        return {"version": 0, "deltas": {}}
    with open(path) as f:
        return json.load(f)


def _write_state(state_dir: str, state: dict) -> None:
    tmp = _state_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(state_dir))  # atomic pointer swap


def _merge_and_write(
    prior_dir: str | None,
    delta: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str],
    schema: pa.Schema,
    out_dir: str,
) -> None:
    """state (parquet) union delta partials -> one groupby -> new version."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    delta = delta.map_batches(_cast_to(schema), batch_format="pyarrow")
    if prior_dir is not None:
        prior = ray.data.read_parquet(prior_dir).map_batches(
            _cast_to(schema), batch_format="pyarrow"
        )
        merged = grouped_sum(
            prior.union(delta), keys, sum_cols=sum_cols, min_cols=min_cols
        )
    else:
        merged = delta  # already merged within the delta
    _write_versioned(merged, schema, out_dir)


def _write_versioned(
    ds: ray.data.Dataset, schema: pa.Schema, out_dir: str
) -> None:
    """Write one immutable state-version table with a pinned schema."""
    ds = ds.map_batches(_cast_to(schema), batch_format="pyarrow")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)  # dangling dir from a crashed attempt
    ds.write_parquet(out_dir)
    # an all-empty dataset writes no fragment files; pin the schema with an
    # explicit empty parquet so the next version's read still works (an
    # empty first crawl is a legal delta)
    if not os.path.isdir(out_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        import pyarrow.parquet as _pq

        os.makedirs(out_dir, exist_ok=True)
        _pq.write_table(
            schema.empty_table(), os.path.join(out_dir, "empty.parquet")
        )


def _check_delta(state: dict, delta_id: str, fingerprint: str) -> bool:
    """True if the delta is already ingested with this exact fingerprint
    (no-op retry); raises if it was ingested with a DIFFERENT one."""
    prev_entry = state["deltas"].get(delta_id)
    prev_fp = (
        prev_entry.get("fingerprint")
        if isinstance(prev_entry, dict)
        else prev_entry
    )
    if prev_fp == fingerprint:
        return True
    if prev_fp is not None:
        raise ValueError(
            f"delta {delta_id!r} was already ingested with fingerprint "
            f"{prev_fp!r} but the input now fingerprints {fingerprint!r}; "
            "its contribution is already merged into the state and cannot "
            "be replaced in place — rebuild the state directory (or ingest "
            "under a new delta_id if this is genuinely new data)"
        )
    return False


def _check_kind(state: dict, kind: str, state_dir: str) -> None:
    """Each state_dir holds ONE ingest kind (kg / dedup / windows) — the
    version counter and v{N}/<kind> layout are per-kind. Pointing a second
    ingest kind at an existing dir would read a missing prior subdir (or
    silently fork history), so record the kind on first ingest and refuse
    mismatches loudly."""
    prev = state.get("kind")
    if prev is not None and prev != kind:
        raise ValueError(
            f"state dir {state_dir!r} holds {prev!r} ingest state; refusing "
            f"a {kind!r} ingest into it — use a separate state_dir per kind"
        )
    state["kind"] = kind


def _retire_versions(state_dir: str, new: int) -> None:
    """Remove ALL superseded v{j} dirs (each version is a full copy of the
    small aggregate state, not of the corpus); sweeping below ``new`` also
    collects a dir leaked by a crash between a previous pointer swap and
    its cleanup."""
    for entry in os.listdir(state_dir):
        if entry.startswith("v") and entry[1:].isdigit():
            if int(entry[1:]) < new:
                shutil.rmtree(os.path.join(state_dir, entry))


class _TouchedFilter:
    """Actor-pool filter of prior minhash state rows by the delta's touched
    (band, key) bucket set. The broadcast set is fetched ONCE per actor in
    ``__init__``; ``__call__`` runs a vectorized coarse pass on the 63-bit
    key (the untouched bulk of the prior state short-circuits there) with
    an exact (band, key) tuple check only on the few key-hits.
    ``keep=True`` keeps touched rows, ``keep=False`` keeps untouched."""

    def __init__(self, touched_ref, keep: bool):
        tset = (
            ray.get(touched_ref)
            if isinstance(touched_ref, ray.ObjectRef)
            else touched_ref
        )
        self.tset: set[tuple[int, int]] = tset
        self.tkeys = np.fromiter(
            (k for _, k in tset), dtype=np.int64, count=len(tset)
        )
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(
            batch.column("key").to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        bands_col = np.asarray(
            batch.column("band").to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        cand = np.isin(keys, self.tkeys)
        hit = cand.copy()
        for i in np.nonzero(cand)[0]:
            hit[i] = (int(bands_col[i]), int(keys[i])) in self.tset
        mask = hit if self.keep else ~hit
        return batch.filter(pa.array(mask))


def ingest_pages_delta(
    pages: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
    tagger: str = "gazetteer",
) -> int:
    """Fold one delta of pages into the persisted KG state; returns the
    state version holding the result. No-op (returns current version) if
    ``delta_id`` was already ingested with the same ``fingerprint``."""
    from ner_pytorch_ray.pipelines.kg import linked_mentions
    from ner_pytorch_ray.stages.graph import (
        edge_partials_merged,
        node_partials_merged,
    )

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "kg", state_dir)
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    linked = linked_mentions(pages, tagger=tagger)
    # the DAG prefix runs ONCE for both aggregates: mention rows are tiny
    # relative to pages, so materializing them here is the delta-sized
    # intermediate (never the corpus)
    linked = linked.materialize()

    ver = state["version"]
    new = ver + 1
    prior_e = os.path.join(state_dir, f"v{ver}", "edges") if ver else None
    prior_n = os.path.join(state_dir, f"v{ver}", "nodes") if ver else None
    _merge_and_write(
        prior_e,
        edge_partials_merged(linked),
        ["subj", "pred", "obj"],
        ["weight"],
        ["sample_url"],
        _EDGE_SCHEMA,
        os.path.join(state_dir, f"v{new}", "edges"),
    )
    _merge_and_write(
        prior_n,
        node_partials_merged(linked),
        ["entity_id", "tag_type", "surface"],
        ["n_mentions"],
        [],
        _NODE_SCHEMA,
        os.path.join(state_dir, f"v{new}", "nodes"),
    )
    def _nrows(path: str) -> int:
        import pyarrow.dataset as pads

        return pads.dataset(path, format="parquet").count_rows()

    state["version"] = new
    # lineage METRICS per delta (north_rule: per-partition lineage +
    # counters): mention volume of the delta and the merged state sizes
    # it produced — a divergence between runs shows up here first
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "mentions": linked.count(),
        "state_edge_rows": _nrows(os.path.join(state_dir, f"v{new}", "edges")),
        "state_node_rows": _nrows(os.path.join(state_dir, f"v{new}", "nodes")),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def _current_version(state_dir: str) -> int:
    ver = read_state(state_dir)["version"]
    if ver == 0:
        raise ValueError(
            f"state {state_dir!r} has no ingested deltas yet (version 0); "
            "run ingest before finalize/analytics"
        )
    return ver


def final_edges(state_dir: str) -> ray.data.Dataset:
    ver = _current_version(state_dir)
    ds = ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "edges"))
    return ds.map_batches(_cast_to(_EDGE_SCHEMA), batch_format="pyarrow").sort(
        ["subj", "pred", "obj"]
    )


def final_nodes(state_dir: str) -> ray.data.Dataset:
    ver = _current_version(state_dir)
    ds = ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "nodes"))
    return ds.map_batches(_cast_to(_NODE_SCHEMA), batch_format="pyarrow").sort(
        ["entity_id", "tag_type", "surface"]
    )


def _delta_pages(
    sf_dir: str, n_deltas: int, delta: int
) -> ray.data.Dataset:
    """Deterministic document-delta split (doc_id % n_deltas). At real
    scale a delta IS a set of new input files (a crawl dump); the modulo
    filter only simulates that arrival order on the fixed test tables."""
    from ner_pytorch_ray.sources.pages import _documents_to_pages

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def keep(b: pa.Table) -> pa.Table:
        mask = (b.column("doc_id").to_numpy() % n_deltas) == delta
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow").map_batches(
        _documents_to_pages, batch_format="pyarrow"
    )


def kg_incremental_from_documents(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Ingest ``sf_dir``'s documents as ``n_deltas`` successive crawls and
    return the final (edges, nodes) — bit-identical to the batch
    ``kg_from_documents`` build (same oracle SQL)."""
    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="kg_incremental_", dir="/tmp")
    for d in range(n_deltas):
        fp = mf.chained_fingerprint(
            mf.input_fingerprint(sf_dir, "kg_incremental", n_deltas, d)
        )
        ingest_pages_delta(
            _delta_pages(sf_dir, n_deltas, d),
            state_dir,
            delta_id=f"delta={d}/{n_deltas}",
            fingerprint=fp,
        )
    edges, nodes = final_edges(state_dir), final_nodes(state_dir)
    if owns_state:
        # demo mode (no caller-owned state): pin the small result tables in
        # the object store and reclaim the /tmp state dir — repeated oracle
        # or bench invocations must not leak directories
        edges, nodes = edges.materialize(), nodes.materialize()
        shutil.rmtree(state_dir, ignore_errors=True)
    return edges, nodes


def state_node_metrics(
    state_dir: str, pagerank_iters: int = 3
) -> ray.data.Dataset:
    """Entity dashboard computed FROM the persisted incremental state —
    no re-read of any ingested document. Edges/weights come from the
    merged edge partials, mention stats from the merged node partials, so
    after full ingestion this equals kg_node_metrics over the same corpus
    (tested); after a partial ingestion it is the dashboard of the graph
    built SO FAR."""
    from ner_pytorch_ray.pipelines.graph_ops import node_metrics_over_graph
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ver = _current_version(state_dir)
    edges = ray.data.read_parquet(
        os.path.join(state_dir, f"v{ver}", "edges"),
        columns=["subj", "obj", "weight"],
    )
    nodes = ray.data.read_parquet(
        os.path.join(state_dir, f"v{ver}", "nodes"),
        columns=["entity_id", "n_mentions"],
    )

    def ew_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("subj").cast(pa.string()),
                "b": batch.column("obj").cast(pa.string()),
                "w": batch.column("weight").cast(pa.int64()),
            }
        )

    def stat_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "node": batch.column("entity_id").cast(pa.string()),
                "n_mentions": batch.column("n_mentions").cast(pa.int64()),
                "one": pa.array([1] * n, type=pa.int64()),
            }
        )

    stats = grouped_sum(
        nodes.map_batches(stat_rows, batch_format="pyarrow"),
        keys=["node"],
        sum_cols=["n_mentions", "one"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "n_mentions", "n_surfaces"])

    return node_metrics_over_graph(
        edges.map_batches(ew_rows, batch_format="pyarrow"),
        stats.map_batches(rename, batch_format="pyarrow"),
        pagerank_iters=pagerank_iters,
    )


# ------------------------------------------------------- incremental dedup
_DEDUP_SCHEMA = pa.schema(
    [
        ("fp", pa.string()),
        ("keeper", pa.int64()),
        ("n_copies", pa.int64()),
    ]
)


def ingest_dedup_delta(
    docs: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
) -> int:
    """Fold one delta of (doc_id, text) documents into persisted
    EXACT-DEDUP state: per content fingerprint (md5 of text, the
    `doc_fingerprint` key) the minimum doc_id seen so far and the total
    copy count. Both aggregates are distributive (min, sum), so any
    arrival order of deltas reproduces the batch `exact_dedup` answer
    bit-for-bit — new crawls are checked against all history at
    O(delta + |distinct texts|) cost, never by re-reading old crawls.
    Same durability contract as `ingest_pages_delta` (versioned immutable
    dirs, atomic STATE.json swap, exactly-once per delta)."""
    import hashlib

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "dedup", state_dir)
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        acc: dict[str, list[int]] = {}
        for d, t in zip(ids, batch.column("text").to_pylist()):
            h = hashlib.md5(t.encode()).hexdigest()
            cur = acc.get(h)
            if cur is None:
                acc[h] = [int(d), 1]
            else:
                cur[1] += 1
                if d < cur[0]:
                    cur[0] = int(d)
        ks = sorted(acc)
        return pa.Table.from_pydict(
            {
                "fp": pa.array(ks, type=pa.string()),
                "keeper": pa.array([acc[k][0] for k in ks], type=pa.int64()),
                "n_copies": pa.array([acc[k][1] for k in ks], type=pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    # materialize the (delta-sized) aggregate ONCE: the merge below and the
    # n_docs manifest counter both consume it without re-reading the crawl
    delta = grouped_sum(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["fp"],
        sum_cols=["n_copies"],
        min_cols=["keeper"],
    ).materialize()
    n_docs = int(delta.sum("n_copies") or 0)

    ver = state["version"]
    new = ver + 1
    prior = os.path.join(state_dir, f"v{ver}", "dedup") if ver else None
    out = os.path.join(state_dir, f"v{new}", "dedup")
    _merge_and_write(
        prior, delta, ["fp"], ["n_copies"], ["keeper"], _DEDUP_SCHEMA, out
    )

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_docs": n_docs,
        "state_distinct_texts": pads.dataset(out, format="parquet").count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_dedup(state_dir: str) -> ray.data.Dataset:
    """The accumulated keeper table: one row per distinct text seen across
    every ingested crawl."""
    ver = _current_version(state_dir)
    return ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "dedup"))


def dedup_incremental_from_documents(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s documents as ``n_deltas`` successive crawls and
    return (keeper, n_copies) — bit-identical to the batch ``exact_dedup``
    (it shares exact_dedup's SQL oracle)."""
    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="dedup_incremental_", dir="/tmp")
    for d in range(n_deltas):
        fp = mf.chained_fingerprint(
            mf.input_fingerprint(sf_dir, "dedup_incremental", n_deltas, d)
        )
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        ingest_dedup_delta(
            mf.filter_shard(docs, n_deltas, d),
            state_dir,
            delta_id=f"delta={d}/{n_deltas}",
            fingerprint=fp,
        )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["keeper", "n_copies"])

    out = final_dedup(state_dir).map_batches(project, batch_format="pyarrow")
    if owns_state:
        out = out.materialize()
        shutil.rmtree(state_dir, ignore_errors=True)
    return out


# --------------------------------------------------- incremental windows
_WINDOW_SCHEMA = pa.schema(
    [
        ("window_start_us", pa.int64()),
        ("event_type", pa.string()),
        ("n_events", pa.int64()),
        ("sum_value_cents", pa.int64()),
    ]
)


def ingest_window_delta(
    events: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
    window_minutes: int = 60,
) -> int:
    """Fold one delta of (ts, event_type, value) events into persisted
    TUMBLING-WINDOW state — the streaming-aggregation path: counts and
    value sums per (window, type) are distributive, so LATE DATA is free
    by construction (an event for an old window arriving in a later delta
    just adds into that window's row; no watermark, no window close).
    Per-ingest cost is O(delta + |open windows|). Same durability contract
    as the KG/dedup ingests (versioned dirs, atomic STATE.json,
    exactly-once per delta)."""
    from ner_pytorch_ray.pipelines.windows import US_PER_MIN, tumbling_partials

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "windows", state_dir)
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    width = window_minutes * US_PER_MIN
    # materialized once: the merge and the n_events manifest counter both
    # consume the (delta-sized) partials without re-reading the delta
    delta = tumbling_partials(events, width).materialize()
    n_events = int(delta.sum("n_events") or 0)

    ver = state["version"]
    new = ver + 1
    prior = os.path.join(state_dir, f"v{ver}", "windows") if ver else None
    out = os.path.join(state_dir, f"v{new}", "windows")
    _merge_and_write(
        prior,
        delta,
        ["window_start_us", "event_type"],
        ["n_events", "sum_value_cents"],
        [],
        _WINDOW_SCHEMA,
        out,
    )

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_events": n_events,
        "state_window_rows": pads.dataset(out, format="parquet").count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_windows(state_dir: str) -> ray.data.Dataset:
    ver = _current_version(state_dir)
    return ray.data.read_parquet(
        os.path.join(state_dir, f"v{ver}", "windows")
    ).sort(["window_start_us", "event_type"])


def windows_incremental_from_events(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
    window_minutes: int = 60,
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s events as ``n_deltas`` arrival batches (split by
    event_id, NOT by time — so every delta carries events for already-open
    windows, exercising the late-data path) and return the final window
    table — bit-identical to the batch ``tumbling_window_counts`` (shares
    its SQL oracle)."""
    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="win_incremental_", dir="/tmp")
    from ner_pytorch_ray.pipelines.windows import read_events

    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    for d in range(n_deltas):
        # fingerprint the EVENTS file (input_fingerprint tracks
        # documents.parquet): a regenerated events table must invalidate
        fp = mf.chained_fingerprint(
            f"win_incremental:{n_deltas}:{d}",
            f"{ev_path}:{st.st_size}:{st.st_mtime_ns}",
        )
        ev = read_events(sf_dir, ["event_id", "ts", "event_type", "value"])

        def keep(b: pa.Table, d=d) -> pa.Table:
            mask = (b.column("event_id").to_numpy() % n_deltas) == d
            return b.filter(pa.array(mask))

        ingest_window_delta(
            ev.map_batches(keep, batch_format="pyarrow"),
            state_dir,
            delta_id=f"delta={d}/{n_deltas}",
            fingerprint=fp,
            window_minutes=window_minutes,
        )
    out = final_windows(state_dir)
    if owns_state:
        out = out.materialize()
        shutil.rmtree(state_dir, ignore_errors=True)
    return out


def ingest_sliding_delta(
    events: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> int:
    """Fold one delta of (ts, event_type, value) events into persisted
    SLIDING-WINDOW state — the overlapping-window sibling of
    :func:`ingest_window_delta`.  Each event's replication into its
    ``window/slide`` covering windows happens inside the delta's
    vectorized partial, so the persisted state stays one row per
    (window, type) and late data is free exactly as in the tumbling
    case.  The (window, slide) parameterization is part of the state's
    identity (window keys are functions of it) and guarded like the
    minhash sketch params."""
    from ner_pytorch_ray.pipelines.windows import US_PER_MIN, sliding_partials

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "sliding_windows", state_dir)
    _check_params(
        state,
        {"window_minutes": window_minutes, "slide_minutes": slide_minutes},
        state_dir,
    )
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    width = window_minutes * US_PER_MIN
    slide = slide_minutes * US_PER_MIN
    delta = sliding_partials(events, width, slide).materialize()
    # delta-local manifest counter: window rows count events once per
    # covering window — divide the replication back out
    n_events = int(delta.sum("n_events") or 0) // (width // slide)

    ver = state["version"]
    new = ver + 1
    prior = os.path.join(state_dir, f"v{ver}", "windows") if ver else None
    out = os.path.join(state_dir, f"v{new}", "windows")
    _merge_and_write(
        prior,
        delta,
        ["window_start_us", "event_type"],
        ["n_events", "sum_value_cents"],
        [],
        _WINDOW_SCHEMA,
        out,
    )

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_events": n_events,
        "state_window_rows": pads.dataset(out, format="parquet").count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_sliding(state_dir: str) -> ray.data.Dataset:
    ver = _current_version(state_dir)
    return ray.data.read_parquet(
        os.path.join(state_dir, f"v{ver}", "windows")
    ).sort(["window_start_us", "event_type"])


def sliding_incremental_from_events(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s events as ``n_deltas`` arrival batches (split
    by event_id, NOT by time, so every delta hits already-open windows)
    and return the final sliding-window table — bit-identical to the
    batch ``sliding_window_counts`` (shares its SQL oracle)."""
    import shutil

    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="slide_incremental_", dir="/tmp")
    from ner_pytorch_ray.pipelines.windows import read_events

    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    for d in range(n_deltas):
        fp = f"{ev_path}:{st.st_mtime_ns}:delta={d}/{n_deltas}"
        ev = read_events(sf_dir, ["event_id", "ts", "event_type", "value"])

        def keep(b: pa.Table, d=d) -> pa.Table:
            mask = (b.column("event_id").to_numpy() % n_deltas) == d
            return b.filter(pa.array(mask))

        ingest_sliding_delta(
            ev.map_batches(keep, batch_format="pyarrow"),
            state_dir,
            delta_id=f"delta={d}/{n_deltas}",
            fingerprint=fp,
            window_minutes=window_minutes,
            slide_minutes=slide_minutes,
        )
    out = final_sliding(state_dir)
    if owns_state:
        out = out.materialize()
        shutil.rmtree(state_dir, ignore_errors=True)
    return out


# --------------------------------------------------- incremental minhash
_MH_BANDS_SCHEMA = pa.schema(
    [
        ("band", pa.int32()),
        ("key", pa.int64()),
        ("doc_id", pa.int64()),
        ("sig", pa.binary()),
    ]
)
_MH_PAIRS_SCHEMA = pa.schema(
    [
        ("band", pa.int32()),
        ("key", pa.int64()),
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
    ]
)


def _check_params(state: dict, params: dict, state_dir: str) -> None:
    """Sketch parameters (tau, n_perm, bands, caps) are part of the state's
    identity: band keys and pair decisions are functions of them, so mixing
    parameterizations silently corrupts the accumulated tables."""
    prev = state.get("params")
    if prev is not None and prev != params:
        raise ValueError(
            f"state dir {state_dir!r} was built with params {prev}; "
            f"refusing an ingest with {params} — rebuild or match params"
        )
    state["params"] = params


def ingest_minhash_delta(
    docs: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
    tau: float = 0.5,
    n_perm: int = 64,
    n_bands: int = 16,
    max_bucket: int = 200,
) -> int:
    """Fold one delta of (doc_id, text) documents into persisted banded
    MINHASH near-dup state — new crawls are checked against ALL history
    without recomputing old signatures or old pairs.

    State per version:
      * ``bands``: (band, key, doc_id, sig) rows — a pure per-document
        function, so deltas UNION to exactly the batch band table;
      * ``pairs``: qualifying pairs WITH (band, key) provenance.

    Ingest recomputes pairs ONLY for buckets the delta touches: prior band
    rows of touched buckets + delta band rows re-run the bucket kernel, and
    the new pairs table is (prior pairs from untouched buckets) UNION
    (recomputed pairs). Untouched buckets cannot change, and a bucket that
    OVERFLOWS ``max_bucket`` across crawls retracts exactly its own prior
    pairs — so the final distinct-pair set equals the batch
    ``minhash_lsh_pairs`` over the union corpus bit-for-bit, in any delta
    order (tested, including the overflow case). Per-ingest cost is
    O(delta + touched-bucket membership), never O(corpus).
    """
    from ner_pytorch_ray.pipelines.dedup import (
        minhash_band_rows_fn,
        minhash_bucket_pairs_fn,
    )
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "minhash", state_dir)
    _check_params(
        state,
        {
            "tau": tau,
            "n_perm": n_perm,
            "n_bands": n_bands,
            "max_bucket": max_bucket,
        },
        state_dir,
    )
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    delta_bands = docs.map_batches(
        minhash_band_rows_fn(n_perm, n_bands), batch_format="pyarrow"
    ).materialize()

    # the delta's touched buckets — O(delta x n_bands) keys, broadcast once
    touched: set[tuple[int, int]] = set()
    for b in delta_bands.select_columns(["band", "key"]).iter_batches(
        batch_format="pyarrow"
    ):
        touched.update(
            zip(b.column("band").to_pylist(), b.column("key").to_pylist())
        )
    touched_ref = ray.put(touched)

    ver = state["version"]
    prior_bands = (
        ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "bands"))
        if ver
        else None
    )
    if prior_bands is not None:
        bucket_input = prior_bands.map_batches(
            _TouchedFilter,
            fn_constructor_args=(touched_ref, True),
            concurrency=(1, 4),
            batch_format="pyarrow",
        ).union(delta_bands)
    else:
        bucket_input = delta_bands
    collected = collect_tuples(
        bucket_input, ["band", "key"], ["doc_id", "sig"], shuffle_blocks="auto"
    )
    new_pairs = flat_map_groups(
        collected,
        minhash_bucket_pairs_fn(tau, max_bucket, provenance=True),
        ["band", "key"],
    )

    new = ver + 1
    bands_out = os.path.join(state_dir, f"v{new}", "bands")
    pairs_out = os.path.join(state_dir, f"v{new}", "pairs")
    all_bands = (
        prior_bands.union(delta_bands) if prior_bands is not None else delta_bands
    )
    _write_versioned(all_bands, _MH_BANDS_SCHEMA, bands_out)
    if ver:
        prior_pairs = ray.data.read_parquet(
            os.path.join(state_dir, f"v{ver}", "pairs")
        )
        pairs_state = prior_pairs.map_batches(
            _TouchedFilter,
            fn_constructor_args=(touched_ref, False),
            concurrency=(1, 4),
            batch_format="pyarrow",
        ).union(new_pairs)
    else:
        pairs_state = new_pairs
    _write_versioned(pairs_state, _MH_PAIRS_SCHEMA, pairs_out)

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_band_rows": delta_bands.count(),
        "n_touched_buckets": len(touched),
        "state_band_rows": pads.dataset(bands_out, format="parquet").count_rows(),
        "state_pair_rows": pads.dataset(pairs_out, format="parquet").count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_minhash_pairs(state_dir: str) -> ray.data.Dataset:
    """Distinct qualifying (doc_a, doc_b) across all ingested crawls —
    identical to the batch minhash_lsh_pairs output on the union corpus."""
    from ray.data.aggregate import Count

    ver = _current_version(state_dir)
    pairs = ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "pairs"))
    distinct = (
        pairs.repartition(8).groupby(["doc_a", "doc_b"]).aggregate(Count())
    )
    return distinct.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )


def minhash_incremental_from_documents(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
    tau: float = 0.5,
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s documents as ``n_deltas`` successive crawls and
    return the accumulated near-dup pairs — bit-identical to the batch
    ``minhash_lsh_pairs`` (shares its SQL oracle)."""
    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="minhash_incremental_", dir="/tmp")
    for d in range(n_deltas):
        fp = mf.chained_fingerprint(
            mf.input_fingerprint(sf_dir, "minhash_incremental", n_deltas, d)
        )
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        ingest_minhash_delta(
            mf.filter_shard(docs, n_deltas, d),
            state_dir,
            delta_id=f"delta={d}/{n_deltas}",
            fingerprint=fp,
            tau=tau,
        )
    out = final_minhash_pairs(state_dir)
    if owns_state:
        out = out.materialize()
        shutil.rmtree(state_dir, ignore_errors=True)
    return out


# --------------------------------------------- incremental entity resolution
_ER_BLOCKS_SCHEMA = pa.schema([("bkey", pa.string()), ("rid", pa.int64())])
_ER_PAIRS_SCHEMA = pa.schema(
    [("bkey", pa.string()), ("a", pa.int64()), ("b", pa.int64())]
)


class _TouchedKeyFilter:
    """Actor-pool filter of prior ER state rows by the delta's touched
    STRING block keys — the string-key sibling of ``_TouchedFilter``
    (broadcast fetched once per actor in ``__init__``; ``__call__`` is one
    vectorized ``pc.is_in`` against the sorted key set)."""

    def __init__(self, touched_ref, keep: bool):
        import pyarrow.compute as pc  # noqa: F401  (imported for workers)

        ks = (
            ray.get(touched_ref)
            if isinstance(touched_ref, ray.ObjectRef)
            else touched_ref
        )
        self.vs = pa.array(sorted(ks), type=pa.string())
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = pc.is_in(batch.column("bkey"), value_set=self.vs)
        mask = hit if self.keep else pc.invert(hit)
        return batch.filter(mask)


def _er_block_rows_fn(id_col: str, name_col: str, attrs: list[str]):
    """Per-batch (bkey, rid) blocking rows: token explode -> bijective
    string key tok\\x1fattr1\\x1f... -> per-batch distinct (a record's rows
    all come from its own batch, so batch-local dedupe is global)."""

    def rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ner_pytorch_ray.pipelines.entity_resolution import (
            token_block_rows,
        )

        t = token_block_rows(batch, id_col, name_col, attrs)
        key = t.column("tok").cast(pa.string())
        for a in attrs:
            key = pc.binary_join_element_wise(
                key, t.column(a).cast(pa.string()), "\x1f"
            )
        out = pa.table(
            {"bkey": key, "rid": t.column(id_col).cast(pa.int64())}
        )
        return out.group_by(["bkey", "rid"]).aggregate([])

    return rows


def _er_block_pairs_fn(max_block: int):
    """Bucket kernel: all candidate pairs of one block WITH block-key
    provenance (one evidence row per (bkey, pair)); overflowing blocks
    RAISE — identical stance to the batch ``blocked_match_pairs``."""

    def gen(key, items) -> pa.Table:
        if items is None:
            return _ER_PAIRS_SCHEMA.empty_table()
        uniq = {i for (i,) in items}
        if len(uniq) < 2:
            return _ER_PAIRS_SCHEMA.empty_table()
        if len(uniq) > max_block:
            raise ValueError(
                f"blocking key {key!r} has {len(uniq)} records across "
                f"crawls (max_block={max_block}); add an exact attribute "
                "to the blocking key"
            )
        ids = np.sort(np.fromiter(uniq, dtype=np.int64, count=len(uniq)))
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.Table.from_arrays(
            [
                pa.array([key[0]] * len(ai), type=pa.string()),
                pa.array(ids[ai]),
                pa.array(ids[bi]),
            ],
            schema=_ER_PAIRS_SCHEMA,
        )

    return gen


def ingest_er_delta(
    records: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
    id_col: str = "rid",
    name_col: str = "name",
    attr_cols: list[str] | None = None,
    max_block: int = 10_000,
) -> int:
    """Fold one delta of records into persisted ENTITY-RESOLUTION state —
    new records are matched against ALL history without regenerating old
    blocks' pairs.

    State per version (the minhash-incremental design, applied to token
    blocking):
      * ``blocks``: distinct (bkey, rid) rows — a pure per-record
        function, so deltas UNION to exactly the batch blocking table;
      * ``pairs``: candidate pairs WITH block-key provenance (one row per
        (bkey, pair) = one unit of shared-token evidence).

    Ingest recomputes pairs ONLY for blocks the delta touches (prior rows
    of touched blocks + delta rows re-run the block kernel; prior pairs of
    touched blocks are retracted and replaced), so the final evidence
    table equals the batch ``blocked_match_pairs`` over the union corpus
    bit-for-bit in any delta order. A block that overflows ``max_block``
    across crawls raises exactly like the batch path. Per-ingest cost is
    O(delta + touched-block membership), never O(corpus)."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    attrs = list(attr_cols or [])
    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "entity_resolution", state_dir)
    _check_params(
        state,
        {"id_col": id_col, "name_col": name_col, "attrs": attrs,
         "max_block": max_block},
        state_dir,
    )
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    delta_blocks = records.map_batches(
        _er_block_rows_fn(id_col, name_col, attrs), batch_format="pyarrow"
    ).materialize()

    touched: set[str] = set()
    for b in delta_blocks.select_columns(["bkey"]).iter_batches(
        batch_format="pyarrow"
    ):
        touched.update(b.column("bkey").to_pylist())
    touched_ref = ray.put(touched)

    ver = state["version"]
    prior_blocks = (
        ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "blocks"))
        if ver
        else None
    )
    if prior_blocks is not None:
        block_input = prior_blocks.map_batches(
            _TouchedKeyFilter,
            fn_constructor_args=(touched_ref, True),
            concurrency=(1, 4),
            batch_format="pyarrow",
        ).union(delta_blocks)
    else:
        block_input = delta_blocks
    collected = collect_tuples(
        block_input, ["bkey"], ["rid"], shuffle_blocks="auto"
    )
    new_pairs = flat_map_groups(
        collected, _er_block_pairs_fn(max_block), ["bkey"]
    )

    new = ver + 1
    blocks_out = os.path.join(state_dir, f"v{new}", "blocks")
    pairs_out = os.path.join(state_dir, f"v{new}", "pairs")
    all_blocks = (
        prior_blocks.union(delta_blocks)
        if prior_blocks is not None
        else delta_blocks
    )
    _write_versioned(all_blocks, _ER_BLOCKS_SCHEMA, blocks_out)
    if ver:
        prior_pairs = ray.data.read_parquet(
            os.path.join(state_dir, f"v{ver}", "pairs")
        )
        pairs_state = prior_pairs.map_batches(
            _TouchedKeyFilter,
            fn_constructor_args=(touched_ref, False),
            concurrency=(1, 4),
            batch_format="pyarrow",
        ).union(new_pairs)
    else:
        pairs_state = new_pairs
    _write_versioned(pairs_state, _ER_PAIRS_SCHEMA, pairs_out)

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_block_rows": delta_blocks.count(),
        "n_touched_blocks": len(touched),
        "state_block_rows": pads.dataset(
            blocks_out, format="parquet"
        ).count_rows(),
        "state_pair_rows": pads.dataset(
            pairs_out, format="parquet"
        ).count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_entities(state_dir: str, min_shared: int = 1) -> ray.data.Dataset:
    """Canonical (rid, entity_id) over every record ingested so far —
    identical to the batch ``resolve_records`` on the union corpus:
    evidence grouped-sum -> min_shared verify -> hash-min components ->
    singleton fill from the blocks table's distinct rids."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    from ner_pytorch_ray.pipelines.entity_resolution import resolve_entities

    ver = _current_version(state_dir)
    pairs = ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "pairs"))
    evidence = (
        pairs.repartition(8).groupby(["a", "b"]).aggregate(Count())
    )

    def verify(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["a", "b", "n_shared"])
        return t.filter(
            pc.greater_equal(t.column("n_shared"), pa.scalar(min_shared))
        )

    verified = evidence.map_batches(verify, batch_format="pyarrow")
    blocks = ray.data.read_parquet(
        os.path.join(state_dir, f"v{ver}", "blocks")
    )
    rids = (
        blocks.select_columns(["rid"])
        .repartition(8)
        .groupby(["rid"])
        .aggregate(Count())
    ).map_batches(lambda t: t.select(["rid"]), batch_format="pyarrow")
    return resolve_entities(rids, verified.materialize(), "rid")


def er_incremental_from_parts(
    sf_dir: str, n_deltas: int = 3, state_dir: str | None = None
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s part catalog as ``n_deltas`` successive deltas
    (p_partkey % n_deltas) and return the resolved (p_partkey, entity_id)
    — bit-identical to the batch ``part_entity_resolution`` (it shares
    that query's SQL oracle)."""
    import hashlib

    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="er_incremental_", dir="/tmp")
    path = f"{sf_dir}/part.parquet"
    st = os.stat(path)
    for d in range(n_deltas):
        h = hashlib.blake2b(digest_size=16)
        h.update(
            f"er_incremental:{n_deltas}:{d}:{path}:{st.st_size}:"
            f"{st.st_mtime_ns}".encode()
        )
        parts = ray.data.read_parquet(
            path, columns=["p_partkey", "p_name", "p_size"]
        )

        def keep(b: pa.Table, d=d) -> pa.Table:
            mask = (b.column("p_partkey").to_numpy() % n_deltas) == d
            return b.filter(pa.array(mask))

        ingest_er_delta(
            parts.map_batches(keep, batch_format="pyarrow"),
            state_dir,
            delta_id=f"delta={d}/{n_deltas}",
            fingerprint=h.hexdigest(),
            id_col="p_partkey",
            name_col="p_name",
            attr_cols=["p_size"],
        )
    out = final_entities(state_dir)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["p_partkey", "entity_id"])

    out = out.map_batches(rename, batch_format="pyarrow").sort("p_partkey")
    if owns_state:
        out = out.materialize()
        shutil.rmtree(state_dir, ignore_errors=True)
    return out


# --------------------------------------------------- incremental PCA state
import hashlib as _hashlib

import pyarrow.parquet as pq

_PCA_STATE_SCHEMA = pa.schema(
    [("n", pa.int64()), ("s", pa.binary()), ("m", pa.binary())]
)


def ingest_pca_delta(
    vectors: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
    col: str = "embedding",
) -> int:
    """Fold one delta of embedding rows into persisted PCA-moment state:
    (n, Σ round(x·1e9), Σ per-row round(x xᵀ·1e6)) — the uncentered
    integer moments :func:`similarity.pca_moments` computes. All three
    are plain sums, so any delta arrival order reproduces the batch
    covariance (and therefore the batch components) BIT-FOR-BIT; each
    new crawl's embeddings cost O(delta), never a recompute over
    history. Same durability contract as every other ingest here
    (versioned immutable dirs, atomic STATE.json swap, exactly-once per
    delta, kind guard)."""
    import numpy as np

    from ner_pytorch_ray.pipelines.similarity import pca_moments

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "pca", state_dir)
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    n, s, m = pca_moments(vectors, col=col)

    ver = state["version"]
    if ver:
        prior = pq.read_table(
            os.path.join(state_dir, f"v{ver}", "pca", "state.parquet")
        )
        n += int(prior.column("n")[0].as_py())
        s = s + np.frombuffer(prior.column("s")[0].as_py(), dtype=np.int64)
        m = m + np.frombuffer(prior.column("m")[0].as_py(), dtype=np.int64)
    new = ver + 1
    out_dir = os.path.join(state_dir, f"v{new}", "pca")
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "n": pa.array([int(n)], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "m": pa.array([m.tobytes()], pa.binary()),
            },
            schema=_PCA_STATE_SCHEMA,
        ),
        os.path.join(out_dir, "state.parquet"),
    )
    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_vectors_total": int(n),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_pca_components(state_dir: str, k: int = 2) -> ray.data.Dataset:
    """Finalize the accumulated moments into the component table —
    identical output to the batch :func:`similarity.pca_components`."""
    import numpy as np

    from ner_pytorch_ray.pipelines.similarity import (
        pca_cov_from_moments,
        pca_table_from_cov,
    )

    ver = _current_version(state_dir)
    t = pq.read_table(
        os.path.join(state_dir, f"v{ver}", "pca", "state.parquet")
    )
    cov = pca_cov_from_moments(
        int(t.column("n")[0].as_py()),
        np.frombuffer(t.column("s")[0].as_py(), dtype=np.int64),
        np.frombuffer(t.column("m")[0].as_py(), dtype=np.int64),
    )
    return pca_table_from_cov(cov, k)


def pca_incremental_from_embeddings(
    sf_dir: str,
    n_deltas: int = 3,
    k: int = 2,
    state_dir: str | None = None,
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s embeddings as ``n_deltas`` deltas
    (vec_id % n_deltas, deliberately interleaved rather than contiguous)
    and finalize — shares the frozen pca_components oracle (incremental
    == batch)."""
    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="pca_incremental_", dir="/tmp")
    try:
        for d in range(n_deltas):
            h = _hashlib.blake2b(digest_size=16)
            st = os.stat(f"{sf_dir}/embeddings.parquet")
            h.update(
                f"pca:{n_deltas}:{d}:{st.st_size}:{st.st_mtime_ns}".encode()
            )
            vecs = ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
            )

            def keep(b: pa.Table, _d=d) -> pa.Table:
                mask = (b.column("vec_id").to_numpy() % n_deltas) == _d
                return b.filter(pa.array(mask))

            ingest_pca_delta(
                vecs.map_batches(keep, batch_format="pyarrow"),
                state_dir,
                delta_id=f"delta={d}/{n_deltas}",
                fingerprint=h.hexdigest(),
            )
        return final_pca_components(state_dir, k=k)
    finally:
        if owns_state:
            shutil.rmtree(state_dir, ignore_errors=True)


# --------------------------------------------------- incremental crawl dedup
_CRAWL_SCHEMA = pa.schema(
    [
        ("canonical_url", pa.string()),
        ("n_crawls", pa.int64()),
        ("neg_latest_ts_us", pa.int64()),
    ]
)


def ingest_crawl_delta(
    records: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
) -> int:
    """Fold one delta of raw crawl records (raw_url, ts_us) into persisted
    CANONICAL-URL state: per canonical url the crawl count and the latest
    capture timestamp. Count is a sum and latest-ts is a max — both
    distributive — so any arrival order of crawl snapshots reproduces the
    batch ``crawl_url_dedup`` answer bit-for-bit; the max rides the
    shared min-merge machinery as a NEGATED min. Same durability contract
    as the other ingests (versioned immutable dirs, atomic STATE.json
    swap, kind guard, exactly-once per delta)."""
    from ner_pytorch_ray.pipelines.crawl import canonical_url
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "crawl", state_dir)
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "canonical_url": canonical_url(batch.column("raw_url")),
                "n_crawls": pa.array(
                    np.ones(len(batch), dtype=np.int64)
                ),
                "neg_latest_ts_us": pc.negate_checked(
                    batch.column("ts_us").cast(pa.int64())
                ),
            }
        )

    delta = grouped_sum(
        records.map_batches(partials, batch_format="pyarrow"),
        ["canonical_url"],
        sum_cols=["n_crawls"],
        min_cols=["neg_latest_ts_us"],
    ).materialize()
    n_records = int(delta.sum("n_crawls") or 0)

    ver = state["version"]
    new = ver + 1
    prior = os.path.join(state_dir, f"v{ver}", "crawl") if ver else None
    out = os.path.join(state_dir, f"v{new}", "crawl")
    _merge_and_write(
        prior,
        delta,
        ["canonical_url"],
        ["n_crawls"],
        ["neg_latest_ts_us"],
        _CRAWL_SCHEMA,
        out,
    )

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "n_records": n_records,
        "state_distinct_urls": pads.dataset(
            out, format="parquet"
        ).count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_crawl(state_dir: str) -> ray.data.Dataset:
    """The accumulated canonical-url table as the BATCH shape:
    (canonical_url, n_crawls, latest_ts_us)."""
    ver = _current_version(state_dir)
    ds = ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "crawl"))

    def unneg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "canonical_url": batch.column("canonical_url"),
                "n_crawls": batch.column("n_crawls"),
                "latest_ts_us": pc.negate_checked(
                    batch.column("neg_latest_ts_us")
                ),
            }
        )

    return ds.map_batches(unneg, batch_format="pyarrow")


def crawl_incremental_from_documents(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
) -> ray.data.Dataset:
    """Ingest the synthetic crawl log as ``n_deltas`` doc-sharded crawl
    snapshots and return the accumulated canonical-url table —
    bit-identical to the batch ``crawl_url_dedup`` (it shares its SQL
    oracle)."""
    from ner_pytorch_ray.pipelines.crawl import crawl_records

    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="crawl_incremental_", dir="/tmp")
    try:
        for d in range(n_deltas):
            fp = mf.chained_fingerprint(
                mf.input_fingerprint(sf_dir, "crawl_incremental", n_deltas, d)
            )
            docs = ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id"]
            )
            shard_records = crawl_records_from(
                mf.filter_shard(docs, n_deltas, d)
            )
            ingest_crawl_delta(
                shard_records,
                state_dir,
                delta_id=f"delta={d}/{n_deltas}",
                fingerprint=fp,
            )
        out = final_crawl(state_dir).sort("canonical_url")
        if owns_state:
            out = out.materialize()
        return out
    finally:
        if owns_state:
            shutil.rmtree(state_dir, ignore_errors=True)


def crawl_records_from(docs: ray.data.Dataset) -> ray.data.Dataset:
    """The ``crawl.crawl_records`` expansion over an arbitrary doc-id
    dataset (the shard path of the incremental ingest)."""
    from ner_pytorch_ray.pipelines.crawl import _records_batch

    return docs.map_batches(_records_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental web link graph (weblinks.web_link_edges, delta crawls)
# ---------------------------------------------------------------------------

_WEBEDGE_SCHEMA = pa.schema(
    [
        ("src_host", pa.string()),
        ("dst_host", pa.string()),
        ("n_links", pa.int64()),
    ]
)


def ingest_weblinks_delta(
    pages: ray.data.Dataset,
    state_dir: str,
    delta_id: str,
    fingerprint: str | None = None,
) -> int:
    """Fold one crawl delta of linked pages into the persisted host-level
    link-graph state. Link counts are distributive, so each delta merges
    as one grouped sum over state ∪ delta partials (the (src_host,
    dst_host) keyspace is <= N_HOSTS² by construction — the state table
    never grows past it). Exactly-once per ``delta_id``/``fingerprint``,
    versioned immutable tables, atomic pointer swap — identical contract
    to ``ingest_pages_delta``."""
    from ner_pytorch_ray.pipelines.weblinks import _edge_partials
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    os.makedirs(state_dir, exist_ok=True)
    state = read_state(state_dir)
    _check_kind(state, "weblinks", state_dir)
    fingerprint = fingerprint or delta_id
    if _check_delta(state, delta_id, fingerprint):
        return state["version"]

    # fully merge WITHIN the delta first: _merge_and_write treats a
    # first-version delta as already combined
    delta_edges = grouped_sum(
        pages.select_columns(["url", "html"]).map_batches(
            _edge_partials, batch_format="pyarrow"
        ),
        keys=["src_host", "dst_host"],
        sum_cols=["n_links"],
    ).materialize()

    ver = state["version"]
    new = ver + 1
    prior = os.path.join(state_dir, f"v{ver}", "edges") if ver else None
    out_dir = os.path.join(state_dir, f"v{new}", "edges")
    _merge_and_write(
        prior,
        delta_edges,
        ["src_host", "dst_host"],
        ["n_links"],
        [],
        _WEBEDGE_SCHEMA,
        out_dir,
    )

    import pyarrow.dataset as pads

    state["version"] = new
    state["deltas"][delta_id] = {
        "fingerprint": fingerprint,
        "delta_edge_rows": delta_edges.count(),
        "delta_links": int(delta_edges.sum("n_links") or 0),
        "state_edge_rows": pads.dataset(
            out_dir, format="parquet"
        ).count_rows(),
        "version": new,
    }
    _write_state(state_dir, state)
    _retire_versions(state_dir, new)
    return new


def final_web_edges(state_dir: str) -> ray.data.Dataset:
    ver = _current_version(state_dir)
    ds = ray.data.read_parquet(os.path.join(state_dir, f"v{ver}", "edges"))
    return ds.map_batches(
        _cast_to(_WEBEDGE_SCHEMA), batch_format="pyarrow"
    ).sort(["src_host", "dst_host"])


def weblinks_incremental_from_documents(
    sf_dir: str,
    n_deltas: int = 3,
    state_dir: str | None = None,
) -> ray.data.Dataset:
    """Ingest ``sf_dir``'s linked pages as ``n_deltas`` successive crawls
    and return the final host edge table — bit-identical to the batch
    ``weblinks.web_link_edges`` (same oracle SQL). Link targets use the
    FULL corpus size at every delta (the html generator's frozen
    contract), matching the batch render byte-for-byte."""
    from ner_pytorch_ray.pipelines.weblinks import (
        _documents_to_linked_pages,
        corpus_size,
    )

    owns_state = state_dir is None
    if owns_state:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="weblinks_incremental_", dir="/tmp")
    try:
        n_docs = corpus_size(sf_dir)
        for d in range(n_deltas):
            fp = mf.chained_fingerprint(
                mf.input_fingerprint(sf_dir, "weblinks_incremental", n_deltas, d)
            )
            docs = ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "lang"],
            )
            pages = mf.filter_shard(docs, n_deltas, d).map_batches(
                lambda b: _documents_to_linked_pages(b, n_docs),
                batch_format="pyarrow",
            )
            ingest_weblinks_delta(
                pages,
                state_dir,
                delta_id=f"delta={d}/{n_deltas}",
                fingerprint=fp,
            )
        out = final_web_edges(state_dir)
        if owns_state:
            out = out.materialize()
        return out
    finally:
        if owns_state:
            shutil.rmtree(state_dir, ignore_errors=True)
