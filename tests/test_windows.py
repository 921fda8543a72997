"""Windowed aggregates, sessionization, and the hash join vs DuckDB."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for name in ("events", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF}/{name}.parquet')"
        )
    return con


def _cmp(t: pd.DataFrame, o: pd.DataFrame):
    cols = sorted(t.columns)
    ts = t[cols].sort_values(cols).reset_index(drop=True)
    os_ = o[cols].sort_values(cols).reset_index(drop=True)
    assert ts.astype(str).equals(os_.astype(str)), (ts.head(), os_.head())


def test_tumbling_window_vs_duckdb(ray_session):
    from ner_pytorch_ray.pipelines.windows import tumbling_window_counts

    t = tumbling_window_counts(SF, window_minutes=15).to_pandas()
    o = _con().execute(
        """
        SELECT (epoch_us(ts) // 900000000) * 900000000 AS window_start_us,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events GROUP BY 1, 2
        """
    ).df()
    assert len(t) > 0
    _cmp(t, o)


def test_sessions_vs_duckdb(ray_session):
    from ner_pytorch_ray.pipelines.windows import user_sessions

    t = user_sessions(SF, gap_minutes=10).to_pandas()
    o = _con().execute(
        """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        marked AS (
          SELECT user_id, t,
                 CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 600000000
                      THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
        ),
        sid AS (
          SELECT user_id, t,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                                        ROWS UNBOUNDED PRECEDING) - 1 AS session_id
          FROM marked
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(t) AS start_us, MAX(t) AS end_us
        FROM sid GROUP BY 1, 2
        """
    ).df()
    assert len(t) > 0
    _cmp(t, o)


def test_sessions_gap_semantics(ray_session):
    """Events exactly at the gap boundary stay in one session (> not >=)."""
    from ner_pytorch_ray.pipelines.windows import user_sessions

    rows = user_sessions(SF, gap_minutes=10).take_all()
    # every session's span is consistent with its event count
    for r in rows[:200]:
        assert r["end_us"] >= r["start_us"]
        if r["n_events"] == 1:
            assert r["end_us"] == r["start_us"]


def test_join_vs_duckdb(ray_session):
    from ner_pytorch_ray.pipelines.windows import order_revenue_join

    t = order_revenue_join(SF).to_pandas()
    o = _con().execute(
        """
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                    AS BIGINT) AS revenue_c2,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        """
    ).df()
    _cmp(t, o)


def test_asof_attribution_vs_duckdb(ray_session):
    from ner_pytorch_ray.pipelines.windows import asof_error_attribution

    t = asof_error_attribution(SF).to_pandas()
    o = _con().execute(
        """
        WITH err AS (SELECT user_id, event_id AS error_id, epoch_us(ts) AS t
                     FROM events WHERE event_type = 'error'),
        clk AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS t
                FROM events WHERE event_type = 'click'),
        ranked AS (
          SELECT e.user_id, e.error_id, c.click_id, e.t - c.t AS gap_us,
                 ROW_NUMBER() OVER (PARTITION BY e.error_id
                                    ORDER BY c.t DESC, c.click_id DESC) AS rn
          FROM err e JOIN clk c ON e.user_id = c.user_id AND c.t <= e.t
        )
        SELECT user_id, error_id, click_id, gap_us FROM ranked WHERE rn = 1
        """
    ).df()
    assert len(t) > 0
    _cmp(t, o)
    # every gap non-negative; each error attributed at most once
    assert (t["gap_us"] >= 0).all()
    assert t["error_id"].is_unique


def test_range_join_vs_duckdb(ray_session):
    from ner_pytorch_ray.pipelines.windows import range_join_events

    t = range_join_events(SF, window_seconds=1800).to_pandas()
    o = _con().execute(
        """
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events)
        SELECT a.user_id,
               LEAST(a.event_id, b.event_id) AS event_a,
               GREATEST(a.event_id, b.event_id) AS event_b,
               b.t - a.t AS gap_us
        FROM e a
        JOIN e b ON a.user_id = b.user_id
                AND b.t - a.t BETWEEN 0 AND 1800000000
                AND (a.t, a.event_id) < (b.t, b.event_id)
        """
    ).df()
    assert len(t) > 0
    _cmp(t, o)


def test_window_anomalies_integer_k_sigma(ray_session, tmp_path):
    """Crafted spike: 9 quiet windows of ~2 events and one 40-event
    burst — only the burst is flagged, and the flag math matches the
    float z-score on non-boundary data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ts, rows_ty = [], []
    hour = 3_600_000_000
    for wdx in range(10):
        n = 40 if wdx == 7 else 2 + (wdx % 2)
        for i in range(n):
            rows_ts.append(wdx * hour + i * 1_000_000)
            rows_ty.append("spikey")
    t = pa.table(
        {
            "ts": pa.array(rows_ts, type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array(rows_ty),
            "value": pa.array([1.0] * len(rows_ts)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ner_pytorch_ray.pipelines.windows import window_anomalies

    out = window_anomalies(str(tmp_path), k_sigma=2).to_pandas()
    assert len(out) == 10
    flagged = out[out.is_anomaly == 1]
    assert flagged.window_start_us.tolist() == [7 * hour]
    assert flagged.n_events.tolist() == [40]
    # float cross-check away from the boundary
    import numpy as np

    c = out.n_events.to_numpy(dtype=np.float64)
    z_flag = np.abs(c - c.mean()) > 2 * c.std()
    assert (out.is_anomaly.to_numpy() == z_flag.astype(np.int64)).all()


def test_funnel_conversion_crafted(ray_session, tmp_path):
    """Hand-built funnel: converter (B after A), pre-A-B-only user (B
    before A -> no conversion), non-converting A user, B-only user
    (excluded), tie at equal timestamps counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # user 1: A@100, B@50 (before, ignored), B@300 -> converts, 200
        (1, 100, "signup"),
        (1, 50, "purchase"),
        (1, 300, "purchase"),
        # user 2: A@100, B@40 only -> no conversion (NULL)
        (2, 100, "signup"),
        (2, 40, "purchase"),
        # user 3: A@70, B@70 tie -> converts with delay 0
        (3, 70, "signup"),
        (3, 70, "purchase"),
        # user 4: B only -> not in the funnel at all
        (4, 10, "purchase"),
        # user 5: two A's -> first one (A@20) anchors
        (5, 90, "signup"),
        (5, 20, "signup"),
        (5, 60, "purchase"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ner_pytorch_ray.pipelines.windows import funnel_conversion

    got = {
        r["user_id"]: (r["a_ts_us"], r["b_ts_us"], r["delay_us"])
        for r in funnel_conversion(str(tmp_path)).take_all()
    }
    assert got == {
        1: (100, 300, 200),
        2: (100, None, None),
        3: (70, 70, 0),
        5: (20, 60, 40),
    }


def test_retention_cohorts_crafted(ray_session, tmp_path):
    """Hand-built cohorts: week-0 cohort of 2 users (one retained in
    week 1), week-1 cohort of 1 user; a hot user's repeat events in one
    week count once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    week = 604_800_000_000
    rows = [
        (1, 0),
        (1, 10),            # user 1: week 0 twice (dedup)
        (1, week + 5),      # ... returns week 1
        (2, 100),           # user 2: week 0 only
        (3, week + 50),     # user 3: cohort week 1
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ner_pytorch_ray.pipelines.windows import retention_cohorts

    got = {
        (r["cohort_week"], r["week"]): r["n_users"]
        for r in retention_cohorts(str(tmp_path)).take_all()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (1, 1): 1}


def test_event_transitions_crafted(ray_session, tmp_path):
    """Transitions count per user in (ts, event_id) order; first events
    contribute nothing; users never mix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.windows import event_transitions

    # user 1: a -> b -> a ; user 2: b (alone, no transition)
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "ts": pa.array([10, 20, 30, 5], type=pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "a", "b"]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in event_transitions(str(tmp_path)).take_all()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1}
