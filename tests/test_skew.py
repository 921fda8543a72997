"""Skew-hardening: the keyed-collect window operators must survive a hot key
(one bot-grade user with orders of magnitude more events than anyone else)
and still produce output identical to a single-process brute force.

The operators' group state is bounded by a time chunk, not by a user's
lifetime event count (windows.py docstrings give the argument); these tests
pin the CORRECTNESS of the chunked/banded paths under exactly the
distribution that motivates them.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

US = 1_000_000
T0 = 1_600_000_000 * US


def _hot_events(n_hot=200_000, n_cold_users=20, seed=3):
    """One hot user (dense bursts + sparse stragglers) + cold users."""
    rng = np.random.RandomState(seed)
    # hot user: bursts of ~1000 events 5s apart, bursts separated by 2h
    burst = np.arange(n_hot, dtype=np.int64)
    ts_hot = (
        T0
        + (burst // 1000) * 2 * 3600 * US
        + (burst % 1000) * 5 * US
        + rng.randint(0, 4 * US, size=n_hot)
    )
    users = [np.full(n_hot, 0, dtype=np.int64)]
    ts = [ts_hot]
    for u in range(1, n_cold_users + 1):
        n = rng.randint(5, 50)
        users.append(np.full(n, u, dtype=np.int64))
        ts.append(T0 + np.sort(rng.randint(0, 7 * 24 * 3600 * US, size=n)))
    user_id = np.concatenate(users)
    tsa = np.concatenate(ts)
    event_id = np.arange(len(user_id), dtype=np.int64)
    # shuffle row order so blocks interleave users/time
    perm = rng.permutation(len(user_id))
    types = np.array(["click", "error", "view"], dtype=object)[
        rng.randint(0, 3, size=len(user_id))
    ]
    return pa.Table.from_pydict(
        {
            "event_id": pa.array(event_id[perm], type=pa.int64()),
            "ts": pa.array(tsa[perm], type=pa.timestamp("us")),
            "user_id": pa.array(user_id[perm], type=pa.int64()),
            "event_type": pa.array(types[perm], type=pa.string()),
        }
    )


def _brute_sessions(tbl, gap_us):
    out = {}
    uid = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts").cast(pa.int64()).to_numpy()
    for u in np.unique(uid):
        t = np.sort(ts[uid == u])
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        for s in range(int(sid[-1]) + 1):
            seg = t[sid == s]
            out[(int(u), s)] = (len(seg), int(seg[0]), int(seg[-1]))
    return out


@pytest.fixture(scope="module")
def hot_tbl():
    return _hot_events()


def test_hot_key_sessions_exact(ray_session, hot_tbl):
    from ner_pytorch_ray.pipelines.windows import user_sessions_ds

    ds = ray.data.from_arrow(hot_tbl).repartition(32)
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["start_us"],
            r["end_us"],
        )
        for r in user_sessions_ds(ds, gap_minutes=30).take_all()
    }
    want = _brute_sessions(hot_tbl, 30 * 60 * US)
    assert got == want
    # the hot user collapsed to a bounded number of sessions
    n_hot_sessions = sum(1 for (u, _) in got if u == 0)
    assert 1 <= n_hot_sessions <= 1000


def test_hot_key_asof_exact(ray_session, hot_tbl):
    from ner_pytorch_ray.pipelines.windows import asof_error_attribution_ds

    ds = ray.data.from_arrow(hot_tbl).repartition(32)
    got = {
        r["error_id"]: (r["click_id"], r["gap_us"])
        for r in asof_error_attribution_ds(ds, chunk_minutes=60).take_all()
    }
    # brute force
    uid = hot_tbl.column("user_id").to_numpy()
    ts = hot_tbl.column("ts").cast(pa.int64()).to_numpy()
    eid = hot_tbl.column("event_id").to_numpy()
    typ = np.array(hot_tbl.column("event_type").to_pylist(), dtype=object)
    want = {}
    for u in np.unique(uid):
        m = uid == u
        clicks = sorted(zip(ts[m & (typ == "click")], eid[m & (typ == "click")]))
        ct = np.array([t for t, _ in clicks], dtype=np.int64)
        for t, e in zip(ts[m & (typ == "error")], eid[m & (typ == "error")]):
            i = int(np.searchsorted(ct, t, side="right")) - 1
            if i >= 0:
                want[int(e)] = (int(clicks[i][1]), int(t - clicks[i][0]))
    assert got == want


def test_hot_key_range_join_exact(ray_session):
    from ner_pytorch_ray.pipelines.windows import range_join_events_ds

    # hot user with events sparse enough that pairs stay linear-ish
    rng = np.random.RandomState(11)
    n = 30_000
    ts = T0 + np.cumsum(rng.randint(40 * US, 200 * US, size=n)).astype(np.int64)
    tbl = pa.Table.from_pydict(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
            "event_type": pa.array(["view"] * n, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(16)
    got = {
        (r["event_a"], r["event_b"]): r["gap_us"]
        for r in range_join_events_ds(ds, window_seconds=60).take_all()
    }
    order = np.argsort(ts, kind="stable")
    t_s = ts[order]
    want = {}
    hi = np.searchsorted(t_s, t_s + 60 * US, side="right")
    for i in range(n):
        for j in range(i + 1, int(hi[i])):
            a, b = int(order[i]), int(order[j])
            want[(min(a, b), max(a, b))] = int(t_s[j] - t_s[i])
    assert got == want
    assert len(got) > 1000  # the window actually pairs things


def test_hot_key_canonicalization_exact(ray_session):
    """A4 head-entity skew: one surface form dominating the corpus must
    canonicalize exactly — the block-local partial collapses a hot key to
    one row per block before the shuffle, so no single group ever holds
    the mention volume."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ner_pytorch_ray.stages.graph import nodes_from_linked

    n_hot, n_cold = 200_000, 500
    ent = ["org:spark"] * n_hot + [f"per:u{i % 50}" for i in range(n_cold)]
    tag = ["ORG"] * n_hot + ["PER"] * n_cold
    surf = ["spark"] * n_hot + [f"user {i % 50}" for i in range(n_cold)]
    t = pa.Table.from_pydict(
        {
            "entity_id": pa.array(ent, type=pa.string()),
            "tag_type": pa.array(tag, type=pa.string()),
            "surface": pa.array(surf, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(32)
    out = nodes_from_linked(ds).to_pandas()
    hot = out[out["entity_id"] == "org:spark"]
    assert len(hot) == 1 and int(hot["n_mentions"].iloc[0]) == n_hot
    assert int(out["n_mentions"].sum()) == n_hot + n_cold
    assert len(out) == 1 + 50
