"""Negative-epoch (pre-1970) timestamps through the chunked window/join
operators (VERDICT.md round-3 "Next round" #8).

Time-chunk assignment everywhere uses FLOOR division (``t // chunk_us``);
truncation toward zero would make chunk 0 span (-chunk_us, +chunk_us) and
silently merge groups across the epoch boundary.  These tests feed synthetic
event tables whose timestamps straddle 1970 and compare against brute-force
Python oracles.
"""

import numpy as np
import pyarrow as pa
import pytest

US_PER_MIN = 60_000_000


def _events_ds(rows):
    """rows: list of (event_id, ts_us, user_id, event_type)."""
    import ray

    t = pa.Table.from_pydict(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(3)


def _mk_rows(seed=7, n_users=5, n_per_user=40, span_min=10_000):
    """Events spread symmetrically around the epoch (ts in [-span, +span] min)."""
    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        ts = rng.randint(-span_min * US_PER_MIN, span_min * US_PER_MIN, n_per_user)
        for t in np.sort(ts):
            kind = "click" if rng.rand() < 0.6 else "error"
            rows.append((eid, int(t), u, kind))
            eid += 1
    return rows


def test_asof_attribution_negative_ts(ray_session):
    from ner_pytorch_ray.pipelines.windows import asof_error_attribution_ds

    rows = _mk_rows()
    # chunk width small enough that many chunk boundaries fall on both sides
    # of the epoch (chunk_minutes=60 over +-10000 min => ~300 chunks)
    got = (
        asof_error_attribution_ds(_events_ds(rows), chunk_minutes=60)
        .to_pandas()
        .sort_values("error_id")
        .reset_index(drop=True)
    )

    # brute-force oracle: most recent click at-or-before, ties -> higher id
    expect = []
    for u in {r[2] for r in rows}:
        clicks = [(t, i) for i, t, uu, k in rows if uu == u and k == "click"]
        for i, t, uu, k in rows:
            if uu != u or k != "error":
                continue
            cands = [(ct, ci) for ct, ci in clicks if ct <= t]
            if cands:
                ct, ci = max(cands)  # latest t, then highest id
                expect.append((u, i, ci, t - ct))
    expect.sort(key=lambda r: r[1])
    assert len(got) == len(expect) and len(expect) > 0
    assert got["user_id"].tolist() == [e[0] for e in expect]
    assert got["error_id"].tolist() == [e[1] for e in expect]
    assert got["click_id"].tolist() == [e[2] for e in expect]
    assert got["gap_us"].tolist() == [e[3] for e in expect]
    assert (got["gap_us"] >= 0).all()


def test_user_sessions_negative_ts(ray_session):
    from ner_pytorch_ray.pipelines.windows import user_sessions_ds

    rows = _mk_rows(seed=11, n_per_user=30, span_min=3000)
    gap_min = 45
    got = (
        user_sessions_ds(_events_ds(rows), gap_minutes=gap_min, chunk_minutes=240)
        .to_pandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )

    gap_us = gap_min * US_PER_MIN
    expect = []
    for u in sorted({r[2] for r in rows}):
        ts = sorted(t for i, t, uu, k in rows if uu == u)
        start, prev, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - prev > gap_us:
                expect.append((u, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        expect.append((u, start, prev, n))
    assert len(got) == len(expect) and len(expect) > 0
    assert got["user_id"].tolist() == [e[0] for e in expect]
    assert got["start_us"].tolist() == [e[1] for e in expect]
    assert got["end_us"].tolist() == [e[2] for e in expect]
    assert got["n_events"].tolist() == [e[3] for e in expect]


def test_tumbling_window_negative_ts(ray_session):
    import ray
    from ner_pytorch_ray.pipelines.windows import tumbling_partials
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    rows = _mk_rows(seed=13, n_per_user=25, span_min=2000)
    win_us = 90 * US_PER_MIN
    t = pa.Table.from_pydict(
        {
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array(
                [float(i % 17) + 0.25 for i in range(len(rows))],
                type=pa.float64(),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = (
        grouped_sum(
            tumbling_partials(ds, win_us),
            ["window_start_us", "event_type"],
            sum_cols=["n_events", "sum_value_cents"],
        )
        .to_pandas()
        .sort_values(["window_start_us", "event_type"])
        .reset_index(drop=True)
    )

    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for i, (eid, ts, u, k) in enumerate(rows):
        cents = round((float(i % 17) + 0.25) * 100)
        st = agg[((ts // win_us) * win_us, k)]
        st[0] += 1
        st[1] += cents
    expect = sorted(agg.items())
    assert got["window_start_us"].tolist() == [w for (w, k), v in expect]
    assert got["event_type"].tolist() == [k for (w, k), v in expect]
    assert got["n_events"].tolist() == [v[0] for (w, k), v in expect]
    assert got["sum_value_cents"].tolist() == [v[1] for (w, k), v in expect]
    # pre-epoch windows must exist and start at negative multiples of width
    neg = [w for (w, k), v in expect if w < 0]
    assert neg and all(w % win_us == 0 for w in neg)
