"""Windowed aggregates + sessionization over the events table, and a
large-x-large hash join — the 'custom operator' set a training-data engine
needs beyond the reference's batch transforms (the reference has no
streaming features, SURVEY.md §2.10; these are the Ray-Data-native
equivalents of the windowed/join operators in its extension surface).

Scale design:
  * tumbling windows are embarrassingly parallel: the window key is a pure
    function of the timestamp, so per-block partial aggregation collapses
    each block to (window, type) rows before the tiny shuffle;
  * sessionization is a per-user gaps-and-islands pass: events group by
    user (bounded per-user volume), gap-split inside the aggregate — the
    only shuffle is the user-key groupby;
  * the join is Ray Data's hash join (Dataset.join), partitioned on the
    key — both sides stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

US_PER_MIN = 60_000_000


def read_events(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    """events.parquet read with a metadata-sized block count.

    Ray's default read fan-out (~2x CPUs) turns a small file into dozens of
    near-empty blocks whose per-task dispatch dominates wall time (measured
    ~2.6 s for a trivial map over 64 tiny blocks at 32 CPUs). For small
    inputs, cap the fan-out by row count; for large inputs leave Ray's
    byte-targeted default alone (the scale path is unchanged)."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    kwargs = {}
    if n_rows < 500_000:
        kwargs["override_num_blocks"] = max(1, n_rows // 50_000)
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=columns, **kwargs
    )


def tumbling_partials(
    ds: ray.data.Dataset, width: int
) -> ray.data.Dataset:
    """Block-local tumbling-window partials over (ts, event_type, value)
    rows: one pre-summed row per (window, type) per block. Shared by the
    batch query and the incremental window-state ingestion — integer
    arithmetic end to end so both hash identically to the SQL oracle."""

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow combiner (no pandas round-trip): integer window floor +
        # integer cents, then one hash group_by
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        win = (us // width) * width
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(
            np.int64
        )
        t = pa.table(
            {
                "window_start_us": pa.array(win, type=pa.int64()),
                "event_type": batch.column("event_type").combine_chunks(),
                "sum_value_cents": pa.array(cents, type=pa.int64()),
            }
        )
        g = t.group_by(["window_start_us", "event_type"]).aggregate(
            [("sum_value_cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "window_start_us": g.column("window_start_us"),
                "event_type": g.column("event_type"),
                "n_events": g.column("count_all").cast(pa.int64()),
                "sum_value_cents": g.column("sum_value_cents_sum").cast(
                    pa.int64()
                ),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def tumbling_window_counts(
    sf_dir: str, window_minutes: int = 60
) -> ray.data.Dataset:
    """Tumbling-window event counts + value cents per (window, event_type).

    Window start is epoch-microseconds floored to the window width —
    integer arithmetic end to end so the DuckDB oracle hashes identically.
    """
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    width = window_minutes * US_PER_MIN
    ds = read_events(sf_dir, ["ts", "event_type", "value"])
    merged = grouped_sum(
        tumbling_partials(ds, width),
        ["window_start_us", "event_type"],
        sum_cols=["n_events", "sum_value_cents"],
    )
    return merged.sort(["window_start_us", "event_type"])


def _merge_islands(islands: list[tuple[int, int, int]], gap_us: int):
    """Merge session islands [(start, end, n), ...] under the gap rule.

    An island is a set of events whose consecutive gaps are all <= gap_us.
    Merging islands sorted by start whenever ``next.start <= cur.end +
    gap_us`` is EXACTLY event-level sessionization of the union: if b.start
    falls inside [a.start, a.end], it lies between two consecutive events of
    a that are <= gap_us apart, so b connects to a; if b.start > a.end, the
    union's largest internal gap at the seam is b.start - a.end.
    """
    islands = sorted(islands)
    out: list[list[int]] = []
    for s, e, n in islands:
        if out and s <= out[-1][1] + gap_us:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += n
        else:
            out.append([s, e, n])
    return out


def user_sessions_ds(
    events: ray.data.Dataset, gap_minutes: int = 30, chunk_minutes: int | None = None
) -> ray.data.Dataset:
    """Session windows per user (gaps-and-islands), skew-hardened.

    Output: (user_id, session_id, n_events, start_us, end_us), session_id
    0-based per user in time order. ``events`` needs columns (user_id, ts).

    Scale shape — NO per-user event collect anywhere:
      1. block-local partial sessionization collapses each block to islands
         (start, end, n) per user — dense hot users collapse ~event_count x
         here already;
      2. islands group by (user, time-chunk) and merge — the salt bounds a
         group by one chunk's islands;
      3. chunk-merged islands group by user for the boundary merge. Since
         distinct islands after step 2 are > gap_us apart, a user's state
         here is <= chunk_span/gap_us islands per chunk — bounded by the
         time range, INDEPENDENT of the user's event count.
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    gap_us = gap_minutes * US_PER_MIN
    chunk_us = (chunk_minutes or gap_minutes * 48) * US_PER_MIN

    def block_islands(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id").to_numpy())
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts_idx = np.nonzero(new)[0]
        starts = ts[starts_idx]
        ends = np.maximum.reduceat(ts, starts_idx) if len(ts) else np.array([], dtype=np.int64)
        counts = np.diff(np.r_[starts_idx, len(ts)])
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(uid[starts_idx], type=pa.int64()),
                "chunk": pa.array(starts // chunk_us, type=pa.int64()),
                "start_us": pa.array(starts, type=pa.int64()),
                "end_us": pa.array(ends, type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    partial = events.map_batches(block_islands, batch_format="pyarrow")

    chunk_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def merge_chunk(key, items) -> pa.Table:
        if items is None or not items:
            return chunk_schema.empty_table()
        uid, _chunk = key
        merged = _merge_islands([tuple(x) for x in items], gap_us)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * len(merged), type=pa.int64()),
                "start_us": pa.array([m[0] for m in merged], type=pa.int64()),
                "end_us": pa.array([m[1] for m in merged], type=pa.int64()),
                "n": pa.array([m[2] for m in merged], type=pa.int64()),
            }
        )

    chunk_merged = flat_map_groups(
        collect_tuples(
            partial, ["user_id", "chunk"], ["start_us", "end_us", "n"],
            name="isl", shuffle_blocks="auto",  # islands are pre-combined
        ),
        merge_chunk,
        ["user_id", "chunk"],
        items_col="isl",
    )

    empty = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
        ]
    )

    def finalize(key, items) -> pa.Table:
        if items is None or not items:
            return empty.empty_table()
        (uid,) = key
        merged = _merge_islands([tuple(x) for x in items], gap_us)
        n = len(merged)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n, type=pa.int64()),
                "session_id": pa.array(range(n), type=pa.int64()),
                "n_events": pa.array([m[2] for m in merged], type=pa.int64()),
                "start_us": pa.array([m[0] for m in merged], type=pa.int64()),
                "end_us": pa.array([m[1] for m in merged], type=pa.int64()),
            }
        )

    return flat_map_groups(
        collect_tuples(
            chunk_merged, ["user_id"], ["start_us", "end_us", "n"],
            name="isl", shuffle_blocks="auto",
        ),
        finalize,
        ["user_id"],
        items_col="isl",
    )


def user_sessions(
    sf_dir: str, gap_minutes: int = 30, chunk_minutes: int | None = None
) -> ray.data.Dataset:
    ds = read_events(sf_dir, ["user_id", "ts"])
    return user_sessions_ds(ds, gap_minutes, chunk_minutes)


def order_revenue_join(sf_dir: str) -> ray.data.Dataset:
    """Large-x-large hash join demo: lineitem ⋈ orders on the order key,
    then revenue cents per order priority (both sides stream through Ray
    Data's partitioned hash join — no driver materialization).

    ``num_partitions`` is sized from parquet metadata (rows only, no read):
    each join partition carries a fixed actor/dispatch cost (measured ~2 s
    at 16 partitions vs ~0.4 s at 2 on a 60 k-row input), so small inputs
    get few partitions while 100 TB inputs scale to wide fan-out."""
    import pyarrow.parquet as pq

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    n_rows = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_parts = int(min(64, max(2, n_rows // 250_000)))

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def rev(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        cents = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64)
        )
        return pa.Table.from_pydict(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "rev_c2": pa.array(cents, type=pa.int64()),
            }
        )

    joined = lineitem.map_batches(rev, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow combiner: one hash group_by, no pandas round-trip
        t = pa.table(
            {
                "o_orderpriority": batch.column(
                    "o_orderpriority"
                ).combine_chunks(),
                "revenue_c2": batch.column("rev_c2").combine_chunks(),
            }
        )
        g = t.group_by("o_orderpriority").aggregate(
            [("revenue_c2", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "revenue_c2": g.column("revenue_c2_sum").cast(pa.int64()),
                "n_items": g.column("count_all").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        sum_cols=["revenue_c2", "n_items"],
    )
    return merged.sort("o_orderpriority")


def asof_error_attribution_ds(
    events: ray.data.Dataset, chunk_minutes: int = 24 * 60
) -> ray.data.Dataset:
    """As-of join: each 'error' event attributed to the most recent 'click'
    by the same user at or before it (ties broken on higher event_id — the
    rule is explicit so the DuckDB oracle is deterministic).

    Skew-hardened shape — no per-user event collect:
      0. a block-local combiner packs each block's (user, chunk) events
         into three binary cells (t/id/is_error arrays) — the shuffle moves
         one packed row per (user, chunk) per block, not per event, and the
         collect aggregate's python-tuple state stays tiny;
      1. events group by (user, time-chunk); errors resolve against
         IN-CHUNK clicks locally (one sort + searchsorted); unresolved
         errors, one DISTINCT (user, chunk) unresolved marker, and a
         one-row per-chunk last-click summary are emitted;
      2. the tiny (user x chunk) summary/marker table groups by user
         (state <= 2x number of chunks) and emits a carry row — the latest
         click strictly before each chunk that reported unresolved errors;
      3. carry rows union with the unresolved errors and a (user, chunk)
         groupby co-locates them (group = that chunk's unresolved errors
         + 1 carry row) — same collect/flat_map machinery as stage 1, no
         JoinOperator. Every stage's group state is bounded by a chunk,
         not by a user's lifetime event count.
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    chunk_us = chunk_minutes * US_PER_MIN

    def encode_pack(batch: pa.Table) -> pa.Table:
        # filter + encode + block-local pack in ONE task (a separate
        # Filter operator doubles per-block dispatch cost)
        keep = pc.is_in(
            batch.column("event_type"), value_set=pa.array(["error", "click"])
        )
        batch = batch.filter(keep)
        t = np.asarray(
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        uid = np.asarray(batch.column("user_id").to_numpy())
        eid = np.asarray(batch.column("event_id").to_numpy())
        er = (
            pc.equal(batch.column("event_type"), "error")
            .to_numpy(zero_copy_only=False)
            .astype(np.int8)
        )
        # floor division (like user_sessions / range_join) — truncation
        # toward zero would make chunk 0 span (-chunk_us, chunk_us) for
        # negative timestamps
        chunk = t // chunk_us
        order = np.lexsort((eid, t, chunk, uid))
        uid, chunk, t, eid, er = (
            uid[order], chunk[order], t[order], eid[order], er[order]
        )
        new = np.ones(len(t), dtype=bool)
        if len(t) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | (chunk[1:] != chunk[:-1])
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], len(t)] if len(starts) else starts
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "chunk": pa.array(chunk[starts], type=pa.int64()),
                "tb": pa.array(
                    [t[s:e].astype("<i8").tobytes() for s, e in zip(starts, ends)],
                    type=pa.binary(),
                ),
                "ib": pa.array(
                    [eid[s:e].astype("<i8").tobytes() for s, e in zip(starts, ends)],
                    type=pa.binary(),
                ),
                "eb": pa.array(
                    [er[s:e].astype("<i1").tobytes() for s, e in zip(starts, ends)],
                    type=pa.binary(),
                ),
            }
        )

    # packed input is pre-combined (one row per (user, chunk) per block),
    # so coalescing to ~#CPUs blocks before the sort-aggregate is cheap and
    # removes its block-count-proportional fixed cost
    collected = collect_tuples(
        events.map_batches(encode_pack, batch_format="pyarrow"),
        ["user_id", "chunk"],
        ["tb", "ib", "eb"],
        name="evs",
        shuffle_blocks="auto",
    )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("error_id", pa.int64()),
            ("click_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )
    # stage-1 union row: kind 0 = resolved pair, 1 = unresolved error,
    # 2 = chunk click summary (last (t, id) click of the chunk)
    mid_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("chunk", pa.int64()),
            ("kind", pa.int8()),
            ("a", pa.int64()),  # resolved: error_id | unresolved: error_id | summary: click t
            ("b", pa.int64()),  # resolved: click_id | unresolved: error t  | summary: click id
            ("gap_us", pa.int64()),
        ]
    )

    def resolve_chunk(key, items) -> pa.Table:
        if items is None or not items:
            return mid_schema.empty_table()
        uid, chunk = key
        t = np.concatenate([np.frombuffer(tb, dtype="<i8") for tb, _, _ in items])
        eid = np.concatenate([np.frombuffer(ib, dtype="<i8") for _, ib, _ in items])
        er = np.concatenate(
            [np.frombuffer(eb, dtype="<i1") for _, _, eb in items]
        ).astype(bool)
        clicks = sorted(zip(t[~er].tolist(), eid[~er].tolist()))
        errors = sorted(zip(t[er].tolist(), eid[er].tolist()))
        rows = []  # (kind, a, b, gap)
        if clicks:
            last_t, last_id = clicks[-1]
            rows.append((2, last_t, last_id, 0))
        if errors:
            ct = np.array([t for t, _ in clicks], dtype=np.int64)
            any_unresolved = False
            for t, eid in errors:
                i = int(np.searchsorted(ct, t, side="right")) - 1
                if i >= 0:
                    # clicks sorted by (t, id); side='right' lands after all
                    # equal-t clicks, so i is already the max-id tie
                    rows.append((0, eid, clicks[i][1], t - clicks[i][0]))
                else:
                    rows.append((1, eid, t, 0))
                    any_unresolved = True
            if any_unresolved:
                # ONE marker row per (user, chunk): the per-user carry pass
                # sees markers + summaries, never the error rows themselves
                rows.append((3, 0, 0, 0))
        n = len(rows)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n, type=pa.int64()),
                "chunk": pa.array([chunk] * n, type=pa.int64()),
                "kind": pa.array([r[0] for r in rows], type=pa.int8()),
                "a": pa.array([r[1] for r in rows], type=pa.int64()),
                "b": pa.array([r[2] for r in rows], type=pa.int64()),
                "gap_us": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )

    mid = flat_map_groups(
        collected, resolve_chunk, ["user_id", "chunk"], items_col="evs"
    ).materialize()

    def pick_resolved(batch: pa.Table) -> pa.Table:
        res = batch.filter(pc.equal(batch.column("kind"), 0))
        return pa.Table.from_pydict(
            {
                "user_id": res.column("user_id"),
                "error_id": res.column("a"),
                "click_id": res.column("b"),
                "gap_us": res.column("gap_us"),
            }
        )

    resolved = mid.map_batches(pick_resolved, batch_format="pyarrow")

    # stage 2: per-user carry — latest click strictly before each chunk
    # with unresolved errors; the collect sees ONLY summary (kind 2) and
    # marker (kind 3) rows: <= 2 per (user, chunk), never per event
    def pick_meta(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.greater_equal(batch.column("kind"), 2))
        return pa.Table.from_pydict(
            {
                "user_id": m.column("user_id"),
                "chunk": m.column("chunk"),
                "kind": m.column("kind"),
                "a": m.column("a"),
                "b": m.column("b"),
            }
        )

    carry_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("chunk", pa.int64()),
            ("carry_t", pa.int64()),
            ("carry_id", pa.int64()),
        ]
    )

    def carries(key, items) -> pa.Table:
        if items is None or not items:
            return carry_schema.empty_table()
        (uid,) = key
        summaries = {}  # chunk -> (last_t, last_id); dedup'd per chunk
        unresolved_chunks = set()
        for chunk, kind, a, b in items:
            if kind == 2:
                summaries[chunk] = (a, b)
            else:
                unresolved_chunks.add(chunk)
        if not summaries or not unresolved_chunks:
            return carry_schema.empty_table()
        sum_chunks = sorted(summaries)
        sum_t = [summaries[c] for c in sum_chunks]
        rows = []
        for c in sorted(unresolved_chunks):
            i = int(np.searchsorted(np.array(sum_chunks), c, side="left")) - 1
            if i >= 0:
                t, eid = sum_t[i]
                rows.append((c, t, eid))
        n = len(rows)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n, type=pa.int64()),
                "chunk": pa.array([r[0] for r in rows], type=pa.int64()),
                "carry_t": pa.array([r[1] for r in rows], type=pa.int64()),
                "carry_id": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )

    meta = mid.map_batches(pick_meta, batch_format="pyarrow")
    carry = flat_map_groups(
        collect_tuples(
            meta, ["user_id"], ["chunk", "kind", "a", "b"], name="m",
            shuffle_blocks="auto",
        ),
        carries,
        ["user_id"],
        items_col="m",
    )

    # stage 3: co-locate carry + unresolved errors per (user, chunk) with
    # the same collect machinery (kind 1 = error, kind 4 = carry) — no
    # JoinOperator (measured 2-5x slower here under whole-pool sharing)
    def pick_unresolved(batch: pa.Table) -> pa.Table:
        u = batch.filter(pc.equal(batch.column("kind"), 1))
        return pa.Table.from_pydict(
            {
                "user_id": u.column("user_id"),
                "chunk": u.column("chunk"),
                "kind": pa.array(
                    np.ones(len(u), dtype=np.int8), type=pa.int8()
                ),
                "a": u.column("a"),  # error_id
                "b": u.column("b"),  # error t
            }
        )

    def carry_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id"),
                "chunk": batch.column("chunk"),
                "kind": pa.array(
                    np.full(len(batch), 4, dtype=np.int8), type=pa.int8()
                ),
                "a": batch.column("carry_id"),
                "b": batch.column("carry_t"),
            }
        )

    unresolved = mid.map_batches(pick_unresolved, batch_format="pyarrow")
    both = unresolved.union(
        carry.map_batches(carry_rows, batch_format="pyarrow")
    )

    def late_resolve(key, items) -> pa.Table:
        if items is None or not items:
            return out_schema.empty_table()
        uid, _chunk = key
        carry_t = carry_id = None
        errs = []
        for kind, a, b in items:
            if kind == 4:
                carry_t, carry_id = b, a
            else:
                errs.append((a, b))
        if carry_t is None or not errs:
            return out_schema.empty_table()
        n = len(errs)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n, type=pa.int64()),
                "error_id": pa.array([e for e, _ in errs], type=pa.int64()),
                "click_id": pa.array([carry_id] * n, type=pa.int64()),
                "gap_us": pa.array(
                    [t - carry_t for _, t in errs], type=pa.int64()
                ),
            }
        )

    late = flat_map_groups(
        collect_tuples(
            both, ["user_id", "chunk"], ["kind", "a", "b"], name="x",
            shuffle_blocks="auto",
        ),
        late_resolve,
        ["user_id", "chunk"],
        items_col="x",
    )
    return resolved.union(late)


def asof_error_attribution(
    sf_dir: str, chunk_minutes: int = 24 * 60
) -> ray.data.Dataset:
    ds = read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return asof_error_attribution_ds(ds, chunk_minutes)


def range_join_events_ds(
    events: ray.data.Dataset,
    window_seconds: int = 60,
    chunk_multiple: int = 16,
) -> ray.data.Dataset:
    """Range join: pairs of events by the same user within
    ``window_seconds`` of each other (id_a < id_b).

    Skew-hardened banded shape: events band by (user, t // chunk_us) with
    ``chunk_us = chunk_multiple * win_us``; each event is ALSO sent as a
    guest to the previous band (any qualifying pair spans at most one band
    boundary since win_us <= chunk_us). The per-band sweep emits a pair
    only when the EARLIER event is home in that band — each pair exactly
    once. Group state is bounded by ~2x one band's events, not a user's
    lifetime; the sweep itself is the standard sorted two-pointer."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    win_us = window_seconds * 1_000_000
    chunk_us = max(1, chunk_multiple) * win_us

    def to_banded(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id").to_numpy())
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = np.asarray(batch.column("event_id").to_numpy())
        home = t // chunk_us
        # home copy + guest copy in the previous band
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(np.concatenate([uid, uid]), type=pa.int64()),
                "band": pa.array(
                    np.concatenate([home, home - 1]), type=pa.int64()
                ),
                "t": pa.array(np.concatenate([t, t]), type=pa.int64()),
                "event_id": pa.array(
                    np.concatenate([eid, eid]), type=pa.int64()
                ),
                "is_home": pa.array(
                    np.concatenate(
                        [np.ones(len(t), dtype=np.int8), np.zeros(len(t), dtype=np.int8)]
                    ),
                    type=pa.int8(),
                ),
            }
        )

    collected = collect_tuples(
        events.map_batches(to_banded, batch_format="pyarrow"),
        ["user_id", "band"],
        ["t", "event_id", "is_home"],
        name="evs",
    )

    empty = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_a", pa.int64()),
            ("event_b", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )

    def sweep(key, items) -> pa.Table:
        if items is None or not items:
            return empty.empty_table()
        uid, _band = key
        evs = sorted({tuple(x) for x in items})  # by (t, id, is_home)
        ts = np.array([t for t, _, _ in evs], dtype=np.int64)
        ids = np.array([e for _, e, _ in evs], dtype=np.int64)
        home = np.array([h for _, _, h in evs], dtype=np.int8)
        out_a, out_b, out_gap = [], [], []
        j_hi = np.searchsorted(ts, ts + win_us, side="right")
        for i in range(len(evs)):
            if not home[i]:
                continue  # pair counted from the earlier event's home band
            for j in range(i + 1, int(j_hi[i])):
                a, b = ids[i], ids[j]
                if a > b:
                    a, b = b, a
                out_a.append(int(a))
                out_b.append(int(b))
                out_gap.append(int(ts[j] - ts[i]))
        n = len(out_a)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n, type=pa.int64()),
                "event_a": pa.array(out_a, type=pa.int64()),
                "event_b": pa.array(out_b, type=pa.int64()),
                "gap_us": pa.array(out_gap, type=pa.int64()),
            }
        )

    return flat_map_groups(
        collected, sweep, ["user_id", "band"], items_col="evs"
    )


def range_join_events(
    sf_dir: str, window_seconds: int = 60, chunk_multiple: int = 16
) -> ray.data.Dataset:
    ds = read_events(sf_dir, ["event_id", "ts", "user_id"])
    return range_join_events_ds(ds, window_seconds, chunk_multiple)


def sliding_window_counts(
    sf_dir: str, window_minutes: int = 60, slide_minutes: int = 15
) -> ray.data.Dataset:
    """Sliding-window event counts + value cents per (window, event_type)
    — the overlapping-window sibling of ``tumbling_window_counts``.

    Each event belongs to ``window/slide`` windows; the per-block combiner
    emits one partial row per (window, type) per block (the replication
    happens inside the vectorized partial, never across the shuffle), then
    the same tiny grouped sum. Integer arithmetic end to end."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    width = window_minutes * US_PER_MIN
    slide = slide_minutes * US_PER_MIN
    ds = read_events(sf_dir, ["ts", "event_type", "value"])
    merged = grouped_sum(
        sliding_partials(ds, width, slide),
        ["window_start_us", "event_type"],
        sum_cols=["n_events", "sum_value_cents"],
    )
    return merged.sort(["window_start_us", "event_type"])


def sliding_partials(
    ds: ray.data.Dataset, width: int, slide: int
) -> ray.data.Dataset:
    """Block-local sliding-window partials: one pre-summed row per
    (window, type) per block, each event replicated into its
    ``width // slide`` covering windows INSIDE the vectorized partial
    (never across the shuffle). Shared by the batch query and the
    incremental sliding-window ingestion — integer arithmetic end to end
    so both hash identically to the SQL oracle."""
    assert width % slide == 0
    n_win = width // slide

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow combiner: replicate each event into its n_win covering
        # windows with numpy index arithmetic, then one hash group_by
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(np.int64)
        etype = batch.column("event_type").combine_chunks()
        # window starts containing t: ((t // slide) - j) * slide, j in [0, n)
        base = us // slide
        starts = np.concatenate(
            [(base - j) * slide for j in range(n_win)]
        )
        etype_rep = pa.concat_arrays([etype] * n_win)
        t = pa.table(
            {
                "window_start_us": pa.array(starts, type=pa.int64()),
                "event_type": etype_rep,
                "sum_value_cents": pa.array(
                    np.tile(cents, n_win), type=pa.int64()
                ),
            }
        )
        g = t.group_by(["window_start_us", "event_type"]).aggregate(
            [("sum_value_cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "window_start_us": g.column("window_start_us"),
                "event_type": g.column("event_type"),
                "n_events": g.column("count_all").cast(pa.int64()),
                "sum_value_cents": g.column("sum_value_cents_sum").cast(
                    pa.int64()
                ),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


# ------------------------------------------------------------------ lag gaps

_GAP_CHUNK_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("chunk", pa.int64()),
        ("n", pa.int64()),
        ("first_us", pa.int64()),
        ("last_us", pa.int64()),
        ("max_gap_us", pa.int64()),
    ]
)

_GAP_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_gaps", pa.int64()),
        ("span_us", pa.int64()),
        ("max_gap_us", pa.int64()),
    ]
)


def events_lag_gaps(sf_dir: str, chunk_minutes: int = 24 * 60) -> ray.data.Dataset:
    """Per-user inter-event gap statistics — the distributed equivalent of
    ``LAG(ts) OVER (PARTITION BY user ORDER BY ts)`` without ever collecting
    a user's full event list in one place.

    Time-chunk salting (the ``user_sessions`` pattern): chunks partition the
    time axis, so all events of chunk c precede all of chunk c+1.  Each
    (user, chunk) group reduces its events to (n, first, last, max_gap) —
    sum-of-gaps inside a chunk telescopes to last-first, so only the max
    needs the sorted list; per-group size is bounded by chunk span x event
    rate, independent of a hot user's total volume.  The per-user merge then
    sees only chunk summaries: boundary gap = next.first - prev.last.

    Output: (user_id, n_events, n_gaps, span_us, max_gap_us); single-event
    users report 0 gaps / 0 span / 0 max."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    chunk_us = chunk_minutes * US_PER_MIN
    ds = read_events(sf_dir, ["user_id", "ts"])

    def event_rows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        # floor division (not truncation): negative epochs chunk correctly
        chunk = pa.array(ts.to_numpy() // chunk_us, type=pa.int64())
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "chunk": chunk,
                "ts_us": ts,
            }
        )

    per_chunk_events = collect_tuples(
        ds.map_batches(event_rows, batch_format="pyarrow"),
        ["user_id", "chunk"],
        ["ts_us"],
        name="tss",
    )

    def chunk_summary(key, items) -> pa.Table:
        if items is None or not items:
            return _GAP_CHUNK_SCHEMA.empty_table()
        uid, chunk = key
        ts = np.sort(np.array([t for (t,) in items], dtype=np.int64))
        gaps = np.diff(ts)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid], type=pa.int64()),
                "chunk": pa.array([chunk], type=pa.int64()),
                "n": pa.array([len(ts)], type=pa.int64()),
                "first_us": pa.array([int(ts[0])], type=pa.int64()),
                "last_us": pa.array([int(ts[-1])], type=pa.int64()),
                "max_gap_us": pa.array(
                    [int(gaps.max()) if len(gaps) else 0], type=pa.int64()
                ),
            },
            schema=_GAP_CHUNK_SCHEMA,
        )

    summaries = flat_map_groups(
        per_chunk_events, chunk_summary, ["user_id", "chunk"], items_col="tss"
    )

    per_user = collect_tuples(
        summaries,
        ["user_id"],
        ["chunk", "n", "first_us", "last_us", "max_gap_us"],
        name="chunks",
        shuffle_blocks="auto",  # summaries are pre-combined: one row per chunk
    )

    def finalize(key, items) -> pa.Table:
        if items is None or not items:
            return _GAP_SCHEMA.empty_table()
        (uid,) = key
        rows = sorted(tuple(x) for x in items)  # by chunk (time order)
        n_events = sum(r[1] for r in rows)
        max_gap = max(r[4] for r in rows)
        for prev, nxt in zip(rows, rows[1:]):
            max_gap = max(max_gap, nxt[2] - prev[3])
        span = rows[-1][3] - rows[0][2]
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid], type=pa.int64()),
                "n_events": pa.array([n_events], type=pa.int64()),
                "n_gaps": pa.array([n_events - 1], type=pa.int64()),
                "span_us": pa.array([span], type=pa.int64()),
                "max_gap_us": pa.array([max_gap], type=pa.int64()),
            },
            schema=_GAP_SCHEMA,
        )

    return flat_map_groups(per_user, finalize, ["user_id"], items_col="chunks")


def window_anomalies(
    sf_dir: str, window_minutes: int = 60, k_sigma: int = 2
) -> ray.data.Dataset:
    """Per-type windowed volume anomaly flags — the classic streaming
    monitor ("did this event type spike this hour?") computed EXACTLY in
    integers: a window is anomalous when its count deviates from the
    type's mean by more than ``k_sigma`` standard deviations, tested via
    the cross-multiplied inequality

        (c*W - S)^2 > k^2 * (Q*W - S^2)

    (with W = #windows of the type, S = sum of counts, Q = sum of
    squared counts — both sides are exact integers, so no float
    mean/stddev ever exists and the SQL oracle matches bit-for-bit;
    Python's arbitrary precision covers the squares, the SQL side uses
    HUGEINT).

    Shape: one tumbling-count shuffle (the only corpus-scale exchange),
    then a |types|-row moment aggregate broadcast in the task closure,
    then a block-local flag map. Output (window_start_us, event_type,
    n_events, is_anomaly) sorted."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    counts = tumbling_window_counts(
        sf_dir, window_minutes=window_minutes
    ).materialize()

    def moment_rows(batch: pa.Table) -> pa.Table:
        n = batch.column("n_events")
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "w": pa.array([1] * len(batch), type=pa.int64()),
                "s": n,
                "q": pc.multiply_checked(n, n),
            }
        )

    moments = {
        r["event_type"]: (r["w"], r["s"], r["q"])
        for r in grouped_sum(
            counts.map_batches(moment_rows, batch_format="pyarrow"),
            ["event_type"],
            sum_cols=["w", "s", "q"],
        ).take_all()  # |types| rows — bounded driver state
    }

    def flag(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        cs = batch.column("n_events").to_pylist()
        out = []
        for t, c in zip(types, cs):
            w, s, q = moments[t]
            lhs = (int(c) * w - s) ** 2
            rhs = k_sigma * k_sigma * (q * w - s * s)
            out.append(int(lhs > rhs))
        return pa.table(
            {
                "window_start_us": batch.column("window_start_us"),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events"),
                "is_anomaly": pa.array(out, type=pa.int64()),
            }
        )

    return counts.map_batches(flag, batch_format="pyarrow").sort(
        ["window_start_us", "event_type"]
    )


def funnel_conversion(
    sf_dir: str, step_a: str = "signup", step_b: str = "purchase"
) -> ray.data.Dataset:
    """Two-step funnel: for every user whose first ``step_a`` event is
    followed (>=, ties count) by a ``step_b`` event, the conversion
    delay — (user_id, a_ts_us, b_ts_us, delay_us), plus non-converting
    ``step_a`` users with NULL b/delay. Skew-safe with NO per-user
    event collect:

      1. first-A per user = one grouped MIN over A events (combiner
         pre-folds, a hot user ships one row per block);
      2. B events join first-A on user via Ray Data's partitioned hash
         join (both sides stream), the ``ts >= a_ts`` filter runs
         block-local, and a second grouped MIN picks the earliest
         qualifying B;
      3. the converted table LEFT-extends first-A through the
         union-tag pattern (native join is inner-only).

    Every timestamp is epoch-micros int64, so the SQL window recompute
    hashes identically."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ev = read_events(sf_dir, ["user_id", "ts", "event_type"])

    def typed(name: str, out_col: str):
        def rows(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch.column("event_type"), pa.scalar(name))
            t = batch.filter(keep)
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    out_col: t.column("ts").cast(pa.int64()),
                }
            )

        return rows

    first_a = grouped_sum(
        ev.map_batches(typed(step_a, "a_ts_us"), batch_format="pyarrow"),
        ["user_id"],
        sum_cols=[],
        min_cols=["a_ts_us"],
    ).materialize()

    a_schema = pa.schema([("user_id", pa.int64()), ("a_ts_us", pa.int64())])

    def ensure_a(batch: pa.Table) -> pa.Table:
        # an empty aggregate partition can surface as a ZERO-COLUMN block;
        # the hash join needs every block to carry the key schema
        if batch.num_columns == 0:
            return a_schema.empty_table()
        return batch.select(["user_id", "a_ts_us"]).cast(a_schema)

    # partitions sized from input metadata (order_revenue_join precedent):
    # an 8-way join over a 4-user fixture would leave EMPTY hash
    # partitions, which surface schema-less blocks inside the join
    import pyarrow.parquet as pq_meta

    n_rows = pq_meta.read_metadata(f"{sf_dir}/events.parquet").num_rows
    n_parts = int(min(64, max(2, n_rows // 250_000)))

    b_rows = ev.map_batches(typed(step_b, "b_ts_us"), batch_format="pyarrow")
    joined = b_rows.join(
        first_a.map_batches(ensure_a, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("user_id",),
    )

    def after_a(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            batch.column("b_ts_us"), batch.column("a_ts_us")
        )
        t = batch.filter(keep)
        return pa.table(
            {"user_id": t.column("user_id"), "b_ts_us": t.column("b_ts_us")}
        )

    first_b = grouped_sum(
        joined.map_batches(after_a, batch_format="pyarrow"),
        ["user_id"],
        sum_cols=[],
        min_cols=["b_ts_us"],
    )

    # LEFT-extend: union tagged rows, one grouped fold (b absent -> NULL)
    def a_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "a_ts_us": batch.column("a_ts_us"),
                "b_or_inf": pa.array([None] * n, type=pa.int64()),
            }
        )

    def b_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "a_ts_us": pa.array(
                    [None] * n, type=pa.int64()
                ),
                "b_or_inf": batch.column("b_ts_us"),
            }
        )

    folded = grouped_sum(
        first_a.map_batches(a_side, batch_format="pyarrow").union(
            first_b.map_batches(b_side, batch_format="pyarrow")
        ),
        ["user_id"],
        sum_cols=[],
        min_cols=["a_ts_us", "b_or_inf"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("b_or_inf")
        delay = pc.subtract(b, batch.column("a_ts_us"))
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "a_ts_us": batch.column("a_ts_us"),
                "b_ts_us": b,
                "delay_us": delay,
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("user_id")


WEEK_US = 7 * 86_400_000_000


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: users grouped by their FIRST active week
    (the cohort), counted in every week they return —
    (cohort_week, week, n_users). The classic product-analytics
    triangle, shaped for scale:

    - one scan emits block-locally DEDUPED (user, week) rows (a hot
      user collapses to <= #weeks rows per block before any exchange);
    - ONE keyed collect per user gathers his distinct weeks — group
      payload bounded by the CALENDAR (weeks), never by event count —
      and emits (cohort = min week, week) pairs;
    - a grouped count folds the matrix (|cohorts| x |weeks| rows).
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    ev = read_events(sf_dir, ["user_id", "ts"])

    def user_weeks(batch: pa.Table) -> pa.Table:
        # numpy floor division (timestamps are non-negative epoch micros)
        weeks = (
            batch.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // WEEK_US
        )
        t = pa.table(
            {
                "user_id": batch.column("user_id").combine_chunks(),
                "week": pa.array(weeks, type=pa.int64()),
            }
        )
        return t.group_by(["user_id", "week"]).aggregate([])

    rows = ev.map_batches(user_weeks, batch_format="pyarrow")
    collected = collect_tuples(rows, ["user_id"], ["week"])
    pair_schema = pa.schema(
        [("cohort_week", pa.int64()), ("week", pa.int64())]
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return pair_schema.empty_table()
        weeks = sorted({w for (w,) in items})
        return pa.Table.from_pydict(
            {
                "cohort_week": pa.array(
                    [weeks[0]] * len(weeks), type=pa.int64()
                ),
                "week": pa.array(weeks, type=pa.int64()),
            }
        )

    pairs = flat_map_groups(collected, emit, ["user_id"])

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_users",
            pa.array(np.ones(len(batch), dtype=np.int64)),
        )

    return grouped_sum(
        pairs.map_batches(one, batch_format="pyarrow"),
        ["cohort_week", "week"],
        sum_cols=["n_users"],
    ).sort(["cohort_week", "week"])


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """Per-user Markov transition counts between CONSECUTIVE events —
    the first-order behavioral model (which action follows which) that
    funnels/retention summarize away: (prev_type, event_type, n),
    sorted. A user's first event has no predecessor and contributes no
    row (SQL's LAG-NULL frame).

    One global sort feeds :func:`~ner_pytorch_ray.stages.groupby_utils.
    grouped_shift` (per-user LAG with O(#blocks) boundary patching — no
    per-user collect, a hot user costs nothing extra), then transition
    pairs count per block and ONE grouped sum folds the
    |types|²-bounded matrix."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_shift, grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    shifted = grouped_shift(
        ds,
        part_keys=["user_id"],
        order_keys=["ts", "event_id"],
        descending=[False, False],
        value_cols=["event_type"],
    )

    def pairs(batch: pa.Table) -> pa.Table:
        prev = batch.column("event_type_lag")
        if isinstance(prev, pa.ChunkedArray):
            prev = prev.combine_chunks()
        cur = batch.column("event_type")
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        keep = pc.is_valid(prev)
        t = pa.table(
            {
                "prev_type": prev.filter(keep),
                "event_type": cur.filter(keep),
            }
        )
        g = t.group_by(["prev_type", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "prev_type": g.column("prev_type"),
                "event_type": g.column("event_type"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    return grouped_sum(
        shifted.map_batches(pairs, batch_format="pyarrow"),
        keys=["prev_type", "event_type"],
        sum_cols=["n"],
    ).sort(["prev_type", "event_type"])
