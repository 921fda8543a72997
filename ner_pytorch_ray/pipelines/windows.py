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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

US_PER_MIN = 60_000_000


def tumbling_window_counts(
    sf_dir: str, window_minutes: int = 60
) -> ray.data.Dataset:
    """Tumbling-window event counts + value cents per (window, event_type).

    Window start is epoch-microseconds floored to the window width —
    integer arithmetic end to end so the DuckDB oracle hashes identically.
    """
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    width = window_minutes * US_PER_MIN
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        win = (us // width) * width
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "window_start_us": win,
                "event_type": batch.column("event_type").to_pandas(),
                "n_events": 1,
                "sum_value_cents": cents,
            }
        )
        g = (
            df.groupby(["window_start_us", "event_type"], sort=True)
            .agg(
                n_events=("n_events", "sum"),
                sum_value_cents=("sum_value_cents", "sum"),
            )
            .reset_index()
        )
        return pa.Table.from_pydict(
            {
                "window_start_us": pa.array(
                    g["window_start_us"].to_numpy(dtype=np.int64),
                    type=pa.int64(),
                ),
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "n_events": pa.array(
                    g["n_events"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "sum_value_cents": pa.array(
                    g["sum_value_cents"].to_numpy(dtype=np.int64),
                    type=pa.int64(),
                ),
            }
        )

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_start_us", "event_type"],
        sum_cols=["n_events", "sum_value_cents"],
    )
    return merged.sort(["window_start_us", "event_type"])


def user_sessions(
    sf_dir: str, gap_minutes: int = 30
) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap since the
    previous event exceeds ``gap_minutes`` (classic gaps-and-islands).

    Output: (user_id, session_id, n_events, start_us, end_us), session_id
    0-based per user in time order. The per-user event list is bounded, so
    it travels through a collect aggregate keyed by user — one shuffle.
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    gap_us = gap_minutes * US_PER_MIN
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
            }
        )

    collected = collect_tuples(
        ds.map_batches(to_us, batch_format="pyarrow"),
        ["user_id"],
        ["ts_us"],
        name="stamps",
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

    def sessions(key, items) -> pa.Table:
        if items is None or not items:
            return empty.empty_table()
        (uid,) = key
        ts = np.sort(np.array([t[0] for t in items], dtype=np.int64))
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        n_sessions = int(sid[-1]) + 1
        starts = ts[new]
        ends = np.maximum.reduceat(ts, np.nonzero(new)[0])
        counts = np.bincount(sid, minlength=n_sessions)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n_sessions, type=pa.int64()),
                "session_id": pa.array(range(n_sessions), type=pa.int64()),
                "n_events": pa.array(counts, type=pa.int64()),
                "start_us": pa.array(starts, type=pa.int64()),
                "end_us": pa.array(ends, type=pa.int64()),
            }
        )

    return flat_map_groups(collected, sessions, ["user_id"], items_col="stamps")


def order_revenue_join(sf_dir: str) -> ray.data.Dataset:
    """Large-x-large hash join demo: lineitem ⋈ orders on the order key,
    then revenue cents per order priority (both sides stream through Ray
    Data's partitioned hash join — no driver materialization)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

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
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": batch.column("o_orderpriority").to_pandas(),
                "revenue_c2": batch.column("rev_c2").to_numpy(),
                "n_items": 1,
            }
        )
        g = (
            df.groupby("o_orderpriority", sort=True)
            .agg(revenue_c2=("revenue_c2", "sum"), n_items=("n_items", "sum"))
            .reset_index()
        )
        return pa.Table.from_pydict(
            {
                "o_orderpriority": pa.array(
                    g["o_orderpriority"], type=pa.string()
                ),
                "revenue_c2": pa.array(
                    g["revenue_c2"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "n_items": pa.array(
                    g["n_items"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
            }
        )

    merged = grouped_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        sum_cols=["revenue_c2", "n_items"],
    )
    return merged.sort("o_orderpriority")


def asof_error_attribution(sf_dir: str) -> ray.data.Dataset:
    """As-of join: each 'error' event attributed to the most recent 'click'
    by the same user at or before it (ties broken on higher event_id — the
    rule is explicit so the DuckDB oracle is deterministic).

    Ray expression: filter both sides at the read, collect per user (bounded
    per-user volume), one sort + searchsorted per user inside the group
    aggregate. At scale this is the standard per-key as-of pattern: the only
    shuffle is the user-key groupby of two pre-filtered event streams.
    """
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    ds = ds.filter(expr="event_type in ['error', 'click']")

    def encode(batch: pa.Table) -> pa.Table:
        # one tuple stream: positive ids = clicks, negative-offset = errors
        is_err = pc.equal(batch.column("event_type"), "error")
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id"),
                "t": batch.column("ts").cast(pa.int64()),
                "event_id": batch.column("event_id"),
                "is_error": is_err.cast(pa.int8()),
            }
        )

    collected = collect_tuples(
        ds.map_batches(encode, batch_format="pyarrow"),
        ["user_id"],
        ["t", "event_id", "is_error"],
        name="evs",
    )

    empty = pa.schema(
        [
            ("user_id", pa.int64()),
            ("error_id", pa.int64()),
            ("click_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )

    def attribute(key, items) -> pa.Table:
        if items is None or not items:
            return empty.empty_table()
        (uid,) = key
        clicks = sorted(
            [(t, e) for t, e, is_err in items if not is_err]
        )  # (t, id) asc — ties resolved by higher id = later element
        errors = sorted([(t, e) for t, e, is_err in items if is_err])
        if not clicks or not errors:
            return empty.empty_table()
        ct = np.array([t for t, _ in clicks], dtype=np.int64)
        out_err, out_clk, out_gap = [], [], []
        for t, eid in errors:
            i = int(np.searchsorted(ct, t, side="right")) - 1
            if i < 0:
                continue
            # ties on t: clicks are sorted by (t, id), and side="right"
            # lands after ALL equal-t clicks, so i is already the max-id tie
            out_err.append(eid)
            out_clk.append(clicks[i][1])
            out_gap.append(t - clicks[i][0])
        n = len(out_err)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([uid] * n, type=pa.int64()),
                "error_id": pa.array(out_err, type=pa.int64()),
                "click_id": pa.array(out_clk, type=pa.int64()),
                "gap_us": pa.array(out_gap, type=pa.int64()),
            }
        )

    return flat_map_groups(collected, attribute, ["user_id"], items_col="evs")


def range_join_events(
    sf_dir: str, window_seconds: int = 60
) -> ray.data.Dataset:
    """Range join: pairs of events by the same user within
    ``window_seconds`` of each other (id_a < id_b). Per-user sorted
    two-pointer sweep inside the keyed group — the standard distributed
    range-join shape: partition on the equality key (user), sweep the range
    predicate locally; no cross-user work ever shuffles."""
    from ner_pytorch_ray.stages.groupby_utils import (
        collect_tuples,
        flat_map_groups,
    )

    win_us = window_seconds * 1_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id"),
                "t": batch.column("ts").cast(pa.int64()),
                "event_id": batch.column("event_id"),
            }
        )

    collected = collect_tuples(
        ds.map_batches(to_us, batch_format="pyarrow"),
        ["user_id"],
        ["t", "event_id"],
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
        (uid,) = key
        evs = sorted(items)  # by (t, id)
        ts = np.array([t for t, _ in evs], dtype=np.int64)
        ids = np.array([e for _, e in evs], dtype=np.int64)
        out_a, out_b, out_gap = [], [], []
        j_hi = np.searchsorted(ts, ts + win_us, side="right")
        for i in range(len(evs)):
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

    return flat_map_groups(collected, sweep, ["user_id"], items_col="evs")
