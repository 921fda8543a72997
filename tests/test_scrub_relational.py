"""Round-4 corpus-hygiene + relational-breadth operators: decontamination,
PII scrub, stratified sampling, left-outer/anti join rollup, GROUP BY
ROLLUP, exact count-distinct, and the distributed LAG. The full SQL-oracle
comparison for each runs in the driver-style gate (plain oracle_sql
entries); these tests cover the semantics the oracle can't see —
partitioning invariance, edge rows, and the sequential recompute."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------------- decontaminate
def _grams(text: str, n: int = 8) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_sequential(ray_session):
    """Distributed verdicts == plain-Python recompute, and eval/short docs
    never appear in the output."""
    from ner_pytorch_ray.pipelines.scrub import decontaminate

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    eval_grams: set[str] = set()
    for d, t in docs.items():
        if d % 13 == 0:
            eval_grams |= _grams(t)
    exp = {}
    for d, t in docs.items():
        if d % 13 == 0:
            continue
        g = _grams(t)
        if not g:
            continue
        exp[d] = (len(g), len(g & eval_grams))

    out = decontaminate(SF).to_pandas().set_index("doc_id")
    assert set(out.index) == set(exp)
    for d, (n_grams, n_hit) in exp.items():
        row = out.loc[d]
        assert (row.n_grams, row.n_hit, row.contaminated) == (
            n_grams,
            n_hit,
            1 if n_hit else 0,
        )
    # the synthetic corpus is word-salad over a tiny vocab: contamination
    # must actually fire, otherwise this test proves nothing
    assert out.contaminated.sum() > 0


def test_decontaminate_skips_short_docs(ray_session, tmp_path):
    """Docs with fewer than n tokens carry no n-gram evidence: excluded."""
    import ray

    from ner_pytorch_ray.pipelines.scrub import decontaminate

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                ["a b c d e f g h i", "too short", "a b c d e f g h x"]
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = decontaminate(str(tmp_path), n=8, eval_mod=13).to_pandas()
    # doc 0 is the eval doc (0 % 13 == 0); doc 1 is short; doc 2 remains
    assert out.doc_id.tolist() == [2]
    assert out.n_grams.tolist() == [2]
    assert out.n_hit.tolist() == [1]  # "a b c d e f g h" shared with doc 0


# ------------------------------------------------------------------ pii scrub
def test_pii_scrub_counts(ray_session, tmp_path):
    """Match counts / templates against hand-computed values, including
    no-match and multi-match rows."""
    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "b"]),
            "props": pa.array(
                ['{"k": 69}', '{"k": 7, "v": 12}', "no digits", '{"k": 69}']
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    from ner_pytorch_ray.pipelines.scrub import pii_scrub

    out = pii_scrub(str(tmp_path)).to_pandas().set_index("event_type")
    # type a: 3 events, 1+2+0 matches, templates {'{"k": <NUM>}',
    # '{"k": <NUM>, "v": <NUM>}', 'no digits'}
    assert tuple(out.loc["a"]) == (3, 3, 3)
    assert tuple(out.loc["b"]) == (1, 1, 1)


# ---------------------------------------------------------- stratified sample
def test_stratified_sample_is_md5_order(ray_session):
    """Sample == the per-lang smallest-md5 prefix, ranks contiguous."""
    from ner_pytorch_ray.pipelines.scrub import stratified_sample

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    by_lang: dict[str, list[tuple[str, int]]] = {}
    for d, lang in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("lang").to_pylist()
    ):
        by_lang.setdefault(lang, []).append(
            (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
    out = stratified_sample(SF, per_stratum=7).to_pandas()
    for lang, items in by_lang.items():
        exp = [d for _, d in sorted(items)[:7]]
        got = out[out.lang == lang].sort_values("rn")
        assert got.doc_id.tolist() == exp
        assert got.rn.tolist() == list(range(1, len(exp) + 1))


# ------------------------------------------------------------- relational ops
def test_customer_order_activity_anti_join(ray_session, tmp_path):
    """Anti-join cardinality (n_customers - n_active) and orphan guard."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                "c_nationkey": pa.array([7, 7, 8], type=pa.int32()),
                "c_acctbal": pa.array([10.005, -3.125, 0.0]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # cust 1 twice, cust 99 is an orphan (no customer row)
                "o_custkey": pa.array([1, 1, 99], type=pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    from ner_pytorch_ray.pipelines.relational import customer_order_activity

    out = customer_order_activity(str(tmp_path)).to_pandas().set_index("c_nationkey")
    # nation 7: custs {1 active(2 orders), 2 inactive}; cents round
    # half-away-from-zero: 10.005 -> 1001, -3.125 -> -313
    assert tuple(out.loc[7]) == (2, 1, 2, 1001 - 313)
    assert tuple(out.loc[8]) == (1, 0, 0, 0)
    assert 99 not in out.index  # orphan filtered by is_cust


def test_orders_rollup_levels(ray_session):
    """Subtotals and grand total are exact sums of the finest level."""
    from ner_pytorch_ray.pipelines.relational import orders_rollup

    out = orders_rollup(SF).to_pandas()
    finest = out[(out.o_year != -1) & (out.o_month != -1)]
    years = out[(out.o_year != -1) & (out.o_month == -1)].set_index("o_year")
    total = out[out.o_year == -1]
    for y, grp in finest.groupby("o_year"):
        assert years.loc[y].n_orders == grp.n_orders.sum()
        assert years.loc[y].revenue_cents == grp.revenue_cents.sum()
    assert len(total) == 1
    assert total.n_orders.iloc[0] == finest.n_orders.sum()
    assert total.revenue_cents.iloc[0] == finest.revenue_cents.sum()


# ---------------------------------------------------------------- lag gaps
def test_events_lag_gaps_chunk_invariance(ray_session, tmp_path):
    """Chunk salting never changes the answer: tiny chunks (many boundary
    merges) == one giant chunk (single group), including a single-event
    user and equal-timestamp ties."""
    import ray

    ts = [0, 10, 10, 25, 1_000_000_000, 1_000_000_060]
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    from ner_pytorch_ray.pipelines.windows import events_lag_gaps

    def run(chunk_minutes):
        df = (
            events_lag_gaps(str(tmp_path), chunk_minutes=chunk_minutes)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        return [tuple(r) for r in df.itertuples(index=False)]

    expect = [
        (1, 5, 4, 1_000_000_000, 1_000_000_000 - 25),
        (2, 1, 0, 0, 0),
    ]
    assert run(chunk_minutes=1) == expect
    assert run(chunk_minutes=10**9) == expect


def test_distinct_users_partition_invariance(ray_session):
    """Exact distinct is independent of block layout: 1-block vs many-block
    reads agree with a plain pandas recompute."""
    import pandas as pd

    from ner_pytorch_ray.pipelines.relational import distinct_users_by_type

    exp = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
        .to_pandas()
        .groupby("event_type")
        .agg(n_users=("user_id", "nunique"), n_events=("user_id", "size"))
        .reset_index()
    )
    got = distinct_users_by_type(SF).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("event_type").reset_index(drop=True),
        exp.sort_values("event_type").reset_index(drop=True),
        check_dtype=False,
    )


# -------------------------------------------------------------- HLL sketch
def test_hll_partitioning_invariance_and_error(ray_session, tmp_path):
    """The sketch estimate is bit-identical under any block layout (register
    max is order-free) and within ~2% of the exact count at 4k registers."""
    import ray

    rng = np.random.default_rng(7)
    n = 20_000
    users = rng.integers(0, 3_000, size=n)  # ~3000 distinct
    tbl = pa.table(
        {
            "event_type": pa.array(["t"] * n),
            "user_id": pa.array(users, type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    from ner_pytorch_ray.pipelines.sketches import approx_distinct_users, hll_distinct

    est_file = approx_distinct_users(str(tmp_path)).to_pandas()
    # same rows, shuffled + split into many tiny blocks
    perm = rng.permutation(n)
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["t"] * n),
                "user_id": pa.array(users[perm], type=pa.int64()),
            }
        )
    ).repartition(37)
    est_shuf = hll_distinct(ds2, "user_id", "event_type").to_pandas()
    assert est_file.n_distinct_approx.tolist() == est_shuf.n_distinct_approx.tolist()
    exact = len(np.unique(users))
    got = est_file.n_distinct_approx.iloc[0]
    assert abs(got - exact) / exact < 0.05  # ~3 sigma at m=4096 (sigma ~1.6%)


class TestPivotEvents:
    def test_matches_pandas_pivot(self):
        import pandas as pd

        from ner_pytorch_ray.pipelines.relational import pivot_events

        got = pivot_events(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
        ).to_pandas()
        ev["cents"] = (
            np.sign(ev.value) * np.floor(np.abs(ev.value) * 100 + 0.5)
        ).astype(np.int64)
        types = sorted(ev.event_type.unique())
        exp = ev.pivot_table(
            index="user_id",
            columns="event_type",
            values="cents",
            aggfunc=["count", "sum"],
            fill_value=0,
        )
        exp.columns = [
            ("n_" if a == "count" else "cents_") + t for a, t in exp.columns
        ]
        exp = exp.reset_index()
        cols = ["user_id"] + [f"n_{t}" for t in types] + [
            f"cents_{t}" for t in types
        ]
        assert list(got.columns) == cols
        pd.testing.assert_frame_equal(
            got[cols].astype(np.int64),
            exp[cols].astype(np.int64),
            check_names=False,
        )

    def test_unbounded_domain_raises(self, tmp_path):
        from ner_pytorch_ray.pipelines.relational import pivot_events

        n = 200
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(np.arange(n, dtype=np.int64)),
                    "event_type": pa.array([f"t{i}" for i in range(n)]),
                    "value": pa.array(np.ones(n)),
                }
            ),
            tmp_path / "events.parquet",
        )
        with pytest.raises(ValueError, match="pivot domain"):
            pivot_events(str(tmp_path)).materialize()


class TestBloomSemijoin:
    def test_no_false_negatives_and_fp_rate(self):
        from ner_pytorch_ray.pipelines.sketches import (
            bloom_build,
            bloom_contains,
        )

        m, k = 1 << 14, 7
        rng = np.random.default_rng(3)
        present = rng.choice(10_000_000, size=500, replace=False).astype(
            np.int64
        )
        bf = bloom_build(present, m, k)
        assert bloom_contains(bf, present, m, k).all()
        absent = (
            rng.choice(10_000_000, size=20_000, replace=False).astype(
                np.int64
            )
            + 10_000_000
        )
        fp = bloom_contains(bf, absent, m, k).mean()
        # n=500, m=16384, k=7 -> theoretical fp ~ 2e-4; allow slack
        assert fp < 0.01

    def test_distributed_build_equals_local(self, tmp_path):
        import ray

        from ner_pytorch_ray.pipelines.sketches import (
            bloom_build,
            bloom_from_dataset,
        )

        keys = np.arange(2_000, dtype=np.int64) * 37
        ds = ray.data.from_arrow(
            pa.table({"key": pa.array(keys)})
        ).repartition(13)
        got = bloom_from_dataset(ds, "key", m_bits=1 << 16, k=5)
        exp = bloom_build(keys, 1 << 16, 5)
        assert (got == exp).all()

    def test_semijoin_exact_even_with_forced_false_positives(self):
        from ner_pytorch_ray.pipelines.sketches import bloom_semijoin_orders

        # m_bits=64 saturates the filter: nearly every fact row survives
        # the prune, so the verify stage alone must produce exactness
        got = bloom_semijoin_orders(
            SF, segment="BUILDING", m_bits=64, k=2
        ).to_pandas()
        cust = pq.read_table(
            f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).to_pandas()
        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ).to_pandas()
        keep = set(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
        exp = orders[orders.o_custkey.isin(keep)].copy()
        exp["o_cents"] = (
            np.sign(exp.o_totalprice)
            * np.floor(np.abs(exp.o_totalprice) * 100 + 0.5)
        ).astype(np.int64)
        exp = exp.sort_values(["o_custkey", "o_orderkey"]).reset_index(
            drop=True
        )
        assert got[["o_custkey", "o_orderkey", "o_cents"]].values.tolist() == (
            exp[["o_custkey", "o_orderkey", "o_cents"]].values.tolist()
        )

    def test_antijoin_exact_even_with_forced_false_positives(self):
        from ner_pytorch_ray.pipelines.sketches import (
            bloom_antijoin_customers,
        )

        # a saturated 64-bit filter marks ~every probe row "maybe
        # matched": the zero-exchange miss path goes empty and the
        # verify stage alone must reproduce the exact NOT EXISTS
        got = bloom_antijoin_customers(
            SF, priority="1-URGENT", m_bits=64, k=2
        ).to_pandas()
        cust = pq.read_table(
            f"{SF}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        ).to_pandas()
        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        ).to_pandas()
        have = set(
            orders[orders.o_orderpriority == "1-URGENT"].o_custkey
        )
        exp = cust[~cust.c_custkey.isin(have)].copy()
        exp["acctbal_cents"] = (
            np.sign(exp.c_acctbal)
            * np.floor(np.abs(exp.c_acctbal) * 100 + 0.5)
        ).astype(np.int64)
        exp = exp.sort_values("c_custkey").reset_index(drop=True)
        assert len(got) > 0
        cols = ["c_custkey", "c_nationkey", "acctbal_cents"]
        assert got[cols].values.tolist() == exp[cols].values.tolist()


class TestBottomkQuantiles:
    def test_partition_invariant_and_rank_error(self):
        import ray

        from ner_pytorch_ray.pipelines.sketches import (
            bottomk_quantile_sketch,
        )

        got = {
            r["pct"]: r["cents"]
            for r in bottomk_quantile_sketch(SF, k=256).take_all()
        }
        # exact quantiles of the full value distribution for comparison
        vals = np.sort(
            (
                np.sign(v := pq.read_table(
                    f"{SF}/events.parquet", columns=["value"]
                ).column("value").to_numpy())
                * np.floor(np.abs(v) * 100 + 0.5)
            ).astype(np.int64)
        )
        n = len(vals)
        for pct, cents in got.items():
            exact_rank = (pct * (n - 1)) // 100
            got_rank = np.searchsorted(vals, cents)
            # rank error O(1/sqrt(k)): 3/sqrt(256) ~ 0.19 of n
            assert abs(int(got_rank) - exact_rank) < 0.2 * n, (pct, cents)


class TestValueHistogram:
    def test_matches_numpy_and_covers_all_rows(self):
        from ner_pytorch_ray.pipelines.analysis import value_histogram

        got = value_histogram(SF, n_bins=16).to_pandas()
        v = pq.read_table(f"{SF}/events.parquet", columns=["value"]).column(
            "value"
        ).to_numpy()
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(
            np.int64
        )
        lo, hi = cents.min(), cents.max()
        span = hi - lo + 1
        bins = (cents - lo) * 16 // span
        exp = np.bincount(bins, minlength=16)
        assert got.n_events.tolist() == exp.tolist()
        assert got.n_events.sum() == len(cents)
        # edges partition [lo, hi] contiguously
        assert got.lo_cents.iloc[0] == lo and got.hi_cents.iloc[15] == hi
        assert (
            got.lo_cents.iloc[1:].values == got.hi_cents.iloc[:-1].values + 1
        ).all()
        # every row's value falls inside its bin's edges
        for b in range(16):
            sel = cents[bins == b]
            if len(sel):
                assert sel.min() >= got.lo_cents.iloc[b]
                assert sel.max() <= got.hi_cents.iloc[b]


class TestOrderStarFlat:
    def test_matches_pandas_three_way_join(self):
        from ner_pytorch_ray.pipelines.relational import order_star_flat

        got = order_star_flat(SF).to_pandas()
        o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        n = pq.read_table(f"{SF}/nation.parquet").to_pandas()
        r = pq.read_table(f"{SF}/region.parquet").to_pandas()
        exp = (
            o.merge(c, left_on="o_custkey", right_on="c_custkey")
            .merge(n, left_on="c_nationkey", right_on="n_nationkey")
            .merge(r, left_on="n_regionkey", right_on="r_regionkey")
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        exp["o_cents"] = (
            np.sign(exp.o_totalprice)
            * np.floor(np.abs(exp.o_totalprice) * 100 + 0.5)
        ).astype(np.int64)
        cols = ["o_orderkey", "c_name", "n_name", "r_name", "o_cents"]
        assert got[cols].values.tolist() == exp[cols].values.tolist()


class TestUnpivotEvents:
    def test_round_trip_equals_long_aggregate(self):
        from ner_pytorch_ray.pipelines.relational import unpivot_events

        got = unpivot_events(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
        ).to_pandas()
        ev["cents"] = (
            np.sign(ev.value) * np.floor(np.abs(ev.value) * 100 + 0.5)
        ).astype(np.int64)
        exp = (
            ev.groupby(["user_id", "event_type"])
            .agg(n_events=("cents", "size"), value_cents=("cents", "sum"))
            .reset_index()
            .sort_values(["user_id", "event_type"])
            .reset_index(drop=True)
        )
        cols = ["user_id", "event_type", "n_events", "value_cents"]
        assert got[cols].values.tolist() == exp[cols].values.tolist()


class TestTableChecksum:
    def test_order_insensitive_and_detects_change(self, tmp_path):
        import ray

        from ner_pytorch_ray.pipelines.sketches import table_checksum

        t = pq.read_table(f"{SF}/orders.parquet")
        base = table_checksum(SF, "orders").take_all()[0]
        # same rows, reversed order + different row-group structure
        rev = t.take(pa.array(list(range(t.num_rows))[::-1]))
        pq.write_table(rev, tmp_path / "orders.parquet", row_group_size=41)
        shuf = table_checksum(str(tmp_path), "orders").take_all()[0]
        assert shuf == base
        # one mutated cell flips the checksum
        mut = t.set_column(
            t.schema.get_field_index("o_orderstatus"),
            "o_orderstatus",
            pa.array(
                ["X"] + t.column("o_orderstatus").to_pylist()[1:],
                type=pa.string(),
            ),
        )
        pq.write_table(mut, tmp_path / "orders.parquet")
        mutc = table_checksum(str(tmp_path), "orders").take_all()[0]
        assert mutc["n_rows"] == base["n_rows"]
        assert mutc["xor_hash"] != base["xor_hash"]


class TestGroupedMedian:
    def test_matches_numpy_lower_median(self):
        from ner_pytorch_ray.pipelines.relational import grouped_median_value

        got = {
            r["event_type"]: (r["median_cents"], r["n_events"])
            for r in grouped_median_value(SF).take_all()
        }
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["cents"] = (
            np.sign(ev.value) * np.floor(np.abs(ev.value) * 100 + 0.5)
        ).astype(np.int64)
        for t, grp in ev.groupby("event_type"):
            v = np.sort(grp.cents.values)
            assert got[t] == (v[(len(v) - 1) // 2], len(v)), t


class TestProfileTable:
    def test_matches_pandas_profile_with_nulls(self, tmp_path):
        from ner_pytorch_ray.pipelines.analysis import profile_table

        t = pa.table(
            {
                "a": pa.array([1, 2, 2, None, 5], type=pa.int64()),
                "b": pa.array(["x", None, None, "y", "x"], pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "orders.parquet", row_group_size=2)
        got = {
            r["column"]: (
                r["n_distinct"], r["n_nulls"], r["min_value"], r["max_value"]
            )
            for r in profile_table(str(tmp_path), "orders").take_all()
        }
        assert got["a"] == (3, 1, "1", "5")
        assert got["b"] == (2, 2, "x", "y")


class TestEquidepthHistogram:
    def test_matches_numpy_rank_binning(self):
        from ner_pytorch_ray.pipelines.analysis import equidepth_histogram

        got = equidepth_histogram(SF, n_bins=8).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_id", "value"]
        ).to_pandas()
        ev["cents"] = (
            np.sign(ev.value) * np.floor(np.abs(ev.value) * 100 + 0.5)
        ).astype(np.int64)
        ev = ev.sort_values(["cents", "event_id"]).reset_index(drop=True)
        n = len(ev)
        ev["bin"] = (np.arange(n) * 8) // n
        exp = (
            ev.groupby("bin")
            .agg(
                n_events=("cents", "size"),
                lo_cents=("cents", "min"),
                hi_cents=("cents", "max"),
            )
            .reset_index()
        )
        cols = ["bin", "n_events", "lo_cents", "hi_cents"]
        assert got[cols].values.tolist() == exp[cols].values.tolist()
        # depth balance: bins differ by at most 1 row
        assert got.n_events.max() - got.n_events.min() <= 1


class TestGroupedQuartiles:
    def test_matches_numpy_linear_interpolation(self):
        from ner_pytorch_ray.pipelines.relational import grouped_quartiles

        got = {
            (r["event_type"], r["pct"]): (r["q_cc"], r["n_events"])
            for r in grouped_quartiles(SF).take_all()
        }
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["cents"] = (
            np.sign(ev.value) * np.floor(np.abs(ev.value) * 100 + 0.5)
        ).astype(np.int64)
        assert got
        for t, grp in ev.groupby("event_type"):
            v = np.sort(grp.cents.to_numpy())
            for p in (25, 50, 75):
                pos = (len(v) - 1) * p
                lo, rem = pos // 100, pos % 100
                exp_cc = int(v[lo]) * 100 + (
                    (int(v[lo + 1]) - int(v[lo])) * rem if rem else 0
                )
                assert got[(t, p)] == (exp_cc, len(v))
                # and it equals numpy's percentile_cont up to the cc grid
                np_val = np.percentile(
                    v.astype(np.float64), p, method="linear"
                )
                assert abs(exp_cc / 100.0 - np_val) < 1e-6


class TestCorpusMixture:
    def test_prefix_property_and_budget(self):
        from ner_pytorch_ray.pipelines.scrub import corpus_mixture

        budget = 3_000
        out = corpus_mixture(SF, budget_tokens=budget).to_pandas()
        assert len(out) > 0
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
        ).to_pandas()
        docs["n_tokens"] = docs.text.str.split(" ").str.len()
        docs["hk"] = [
            hashlib.md5(str(d).encode()).hexdigest() for d in docs.doc_id
        ]
        srcs = sorted(docs.source.unique())
        base, rem = 100 // len(srcs), 100 % len(srcs)
        for i, s in enumerate(srcs):
            b = budget * (base + (1 if i < rem else 0)) // 100
            ordered = docs[docs.source == s].sort_values(["hk", "doc_id"])
            cum = ordered.n_tokens.cumsum()
            exp_ids = ordered.doc_id[(cum - ordered.n_tokens) < b]
            got_ids = out[out.source == s].doc_id
            assert sorted(got_ids) == sorted(exp_ids)
            # selection is a prefix of the hash order: at most the
            # straddling doc exceeds the budget
            kept_cum = cum[(cum - ordered.n_tokens) < b]
            if len(kept_cum):
                assert kept_cum.iloc[:-1].le(b).all() or len(kept_cum) == 1

    def test_explicit_weights(self):
        from ner_pytorch_ray.pipelines.scrub import corpus_mixture

        out = corpus_mixture(
            SF, budget_tokens=2_000, weights={"src1": 100}
        ).to_pandas()
        assert set(out.source) <= {"src1"}
        assert out.n_tokens.sum() >= 1  # src1 exists in the fixture


def test_orders_cube_levels(ray_session):
    """Every cube level is an exact re-sum of the finest level."""
    from ner_pytorch_ray.pipelines.relational import orders_cube

    out = orders_cube(SF).to_pandas()
    finest = out[(out.o_year != -1) & (out.o_orderpriority != "ALL")]
    years = out[(out.o_year != -1) & (out.o_orderpriority == "ALL")]
    prios = out[(out.o_year == -1) & (out.o_orderpriority != "ALL")]
    total = out[(out.o_year == -1) & (out.o_orderpriority == "ALL")]
    for _, row in years.iterrows():
        grp = finest[finest.o_year == row.o_year]
        assert row.n_orders == grp.n_orders.sum()
        assert row.revenue_cents == grp.revenue_cents.sum()
    for _, row in prios.iterrows():
        grp = finest[finest.o_orderpriority == row.o_orderpriority]
        assert row.n_orders == grp.n_orders.sum()
        assert row.revenue_cents == grp.revenue_cents.sum()
    assert len(total) == 1
    assert total.n_orders.iloc[0] == finest.n_orders.sum()


def test_span_corruption_stats_sequential(ray_session):
    """Row-at-a-time recompute of the integer-hash mask; masked fraction
    lands near 3x the 5% start rate."""
    from ner_pytorch_ray.pipelines.scrub import span_corruption_stats

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_starts"], r["n_masked"])
        for r in span_corruption_stats(SF).take_all()
    }
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    tot_tok = tot_mask = 0
    for d, t in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        n = len(t.split(" "))
        st = [
            ((d * 1_000_003 + p) % (1 << 32)) * 2654435761 % (1 << 32)
            < 214_748_364
            for p in range(n)
        ]
        mk = [
            st[p] or (p >= 1 and st[p - 1]) or (p >= 2 and st[p - 2])
            for p in range(n)
        ]
        assert got[d] == (n, sum(st), sum(mk))
        tot_tok += n
        tot_mask += sum(mk)
    assert 0.10 < tot_mask / tot_tok < 0.20


def test_regional_supplier_revenue_crafted(ray_session, tmp_path):
    """Hand-built micro warehouse: one local-supplier item counts, the
    non-local and out-of-window items do not."""
    from ner_pytorch_ray.pipelines.relational import (
        regional_supplier_revenue,
    )

    def ts(s):
        import numpy as np

        return np.datetime64(s, "us")

    pq.write_table(
        pa.table({"r_regionkey": pa.array([0, 1], type=pa.int64()),
                  "r_name": pa.array(["ASIA", "EUROPE"])}),
        tmp_path / "region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([10, 11, 20], type=pa.int64()),
                "n_name": pa.array(["JAPAN", "INDIA", "FRANCE"]),
                "n_regionkey": pa.array([0, 0, 1], type=pa.int64()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], type=pa.int64()),
                "s_name": pa.array(["s1", "s2"]),
                "s_nationkey": pa.array([10, 20], type=pa.int64()),
                "s_acctbal": pa.array([0.0, 0.0]),
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([100, 101], type=pa.int64()),
                "c_nationkey": pa.array([10, 11], type=pa.int64()),
                "c_acctbal": pa.array([0.0, 0.0]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1000, 1001, 1002], type=pa.int64()),
                "o_custkey": pa.array([100, 100, 101], type=pa.int64()),
                "o_orderdate": pa.array(
                    [ts("1996-06-01"), ts("1997-06-01"), ts("1996-03-01")],
                    type=pa.timestamp("us"),
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # item A: JAPAN cust x JAPAN supp, in window -> counts
                # item B: same order, EUROPE supp -> region-filtered
                # item C: order 1001 out of window -> dropped
                # item D: INDIA cust x JAPAN supp -> not local
                "l_orderkey": pa.array(
                    [1000, 1000, 1001, 1002], type=pa.int64()
                ),
                "l_suppkey": pa.array([1, 2, 1, 1], type=pa.int64()),
                "l_extendedprice": pa.array([10.0, 99.0, 50.0, 7.0]),
                "l_discount": pa.array([0.10, 0.0, 0.0, 0.0]),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    out = regional_supplier_revenue(
        str(tmp_path), region="ASIA", year=1996
    ).to_pandas()
    assert out.values.tolist() == [["JAPAN", 1000 * 90, 1]]


def test_collocations_boundary_and_lift(ray_session, tmp_path):
    """Bigrams never cross document boundaries; lift_ppm equals the
    exact integer formula; min_count drops rare pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.analysis import collocations

    docs = [
        "x y x y x y",   # (x,y) * 3, (y,x) * 2
        "y x",           # (y,x) * 1 -> (y,x) total 3
        "x",             # no bigram; "x y" must NOT pick up doc 2's "y"
        "y",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = {
        (r["w1"], r["w2"]): (
            r["n_ab"],
            r["n_w1"],
            r["n_w2"],
            r["lift_ppm"],
        )
        for r in collocations(str(tmp_path), min_count=3).take_all()
    }
    # N = 10 tokens; n_x = 5, n_y = 5
    assert got == {
        ("x", "y"): (3, 5, 5, 1_000_000 * 3 * 10 // 25),
        ("y", "x"): (3, 5, 5, 1_000_000 * 3 * 10 // 25),
    }


def test_doc_keywords_ranking_and_ties(ray_session, tmp_path):
    """Rarer tokens outrank frequent ones at equal tf; ties break on
    token asc; k truncates per doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.analysis import doc_keywords

    docs = [
        "rare common common",   # rare df=1, common df=3
        "common zeta alpha",    # zeta/alpha df=1 tie -> alpha first
        "common",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = [
        (r["doc_id"], r["rank"], r["token"], r["score_i"])
        for r in doc_keywords(str(tmp_path), k=2).take_all()
    ]
    idf1 = 1_000_000 * 3 // 1
    idf3 = 1_000_000 * 3 // 3
    assert got == [
        (0, 1, "rare", idf1),
        (0, 2, "common", 2 * idf3),
        (1, 1, "alpha", idf1),
        (1, 2, "zeta", idf1),
        (2, 1, "common", idf3),
    ]


def test_grouped_mad_outliers_crafted(ray_session, tmp_path):
    """Median/MAD exact on a crafted group; the single far point is the
    only outlier; a robust check the k-sigma test would miss is implied
    by MAD ignoring the outlier's own magnitude."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.relational import grouped_mad_outliers

    # values: 1 2 3 4 1000 -> med=3 (lower median), resid 2 1 0 1 997,
    # mad = lower median of (0 1 1 2 997) = 1; outliers: resid > 3 -> 997
    vals = [0.01, 0.02, 0.03, 0.04, 10.00]
    tbl = pa.table(
        {
            "event_id": pa.array(range(5), type=pa.int64()),
            "event_type": pa.array(["a"] * 5, type=pa.string()),
            "value": pa.array(vals, type=pa.float64()),
            "user_id": pa.array([1] * 5, type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    rows = grouped_mad_outliers(str(tmp_path)).take_all()
    assert [dict(r) for r in rows] == [
        {
            "event_type": "a",
            "median_cents": 3,
            "mad_cents": 1,
            "n_outliers": 1,
            "n_events": 5,
        }
    ]


def test_lang_top_tokens_rank_and_ties(ray_session, tmp_path):
    """Per-lang counts aggregate across docs; rank is (n desc, token
    asc); k truncates per language independently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.analysis import lang_top_tokens

    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), type=pa.int64()),
            "lang": pa.array(["en", "en", "fr"], type=pa.string()),
            "text": pa.array(
                ["b a a", "b c", "z z y"], type=pa.string()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = [
        (r["lang"], r["rank"], r["token"], r["n"])
        for r in lang_top_tokens(str(tmp_path), k=2).take_all()
    ]
    # en: a=2, b=2 tie -> a first; fr: z=2, y=1
    assert got == [
        ("en", 1, "a", 2),
        ("en", 2, "b", 2),
        ("fr", 1, "z", 2),
        ("fr", 2, "y", 1),
    ]


def test_fk_integrity_detects_orphans(ray_session, tmp_path):
    """Crafted orphans are counted at both row and key granularity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.relational import fk_integrity_report

    # child orders: custkeys 1,1,2,9,9,9 — 9 has no parent (3 rows, 1 key)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(6), type=pa.int64()),
                "o_custkey": pa.array([1, 1, 2, 9, 9, 9], type=pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                  "c_nationkey": pa.array([0, 0, 0], type=pa.int64())}),
        tmp_path / "customer.parquet",
    )
    # the other tables, minimal and clean
    pq.write_table(
        pa.table({"l_orderkey": pa.array([0, 5], type=pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], type=pa.int64())}),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table({"s_nationkey": pa.array([0], type=pa.int64())}),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table({"user_id": pa.array([1, 7], type=pa.int64())}),
        tmp_path / "events.parquet",
    )
    got = {
        r["fk"]: (
            r["n_child_rows"],
            r["n_child_keys"],
            r["n_orphan_rows"],
            r["n_orphan_keys"],
        )
        for r in fk_integrity_report(str(tmp_path)).take_all()
    }
    assert got["orders.o_custkey->customer.c_custkey"] == (6, 3, 3, 1)
    assert got["events.user_id->customer.c_custkey"] == (2, 2, 1, 1)
    assert got["lineitem.l_orderkey->orders.o_orderkey"] == (2, 2, 0, 0)
    assert got["customer.c_nationkey->nation.n_nationkey"] == (3, 1, 0, 0)
    assert got["supplier.s_nationkey->nation.n_nationkey"] == (1, 1, 0, 0)


def test_skyline_prefix_max_and_duplicates(ray_session, tmp_path):
    """Frontier matches brute force on a crafted set including
    equal-coordinate duplicates (both survive) and a same-x dominated
    point; block count must not matter."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.relational import customer_skyline

    # (key, bal, spend): 1&2 duplicate frontier points; 3 dominated by
    # them on same bal; 4 frontier (higher bal, lower spend); 5 dominated
    bal = {1: 5.00, 2: 5.00, 3: 5.00, 4: 9.00, 5: 1.00}
    spend = {1: 7.00, 2: 7.00, 3: 6.00, 4: 2.00, 5: 1.00}
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(sorted(bal), type=pa.int64()),
                "c_acctbal": pa.array(
                    [bal[k] for k in sorted(bal)], type=pa.float64()
                ),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array(sorted(spend), type=pa.int64()),
                "o_totalprice": pa.array(
                    [spend[k] for k in sorted(spend)], type=pa.float64()
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pts = {k: (int(bal[k] * 100), int(spend[k] * 100)) for k in bal}
    exp = sorted(
        (k, x, y)
        for k, (x, y) in pts.items()
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for qk, (qx, qy) in pts.items()
            if qk != k
        )
    )
    got = [
        (r["c_custkey"], r["bal_cents"], r["spend_cents"])
        for r in customer_skyline(str(tmp_path)).take_all()
    ]
    assert got == exp == [(1, 500, 700), (2, 500, 700), (4, 900, 200)]


def test_doc_chunks_boundaries(ray_session, tmp_path):
    """Short docs yield one chunk; an exact-stride doc suppresses the
    redundant tail; overlap tokens repeat across consecutive chunks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.scrub import doc_chunks

    toks = [f"t{i}" for i in range(10)]
    docs = [
        "a b",                       # shorter than chunk -> 1 chunk
        " ".join(toks),              # 10 tokens, chunk 6 overlap 2
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(2), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = [
        (
            r["doc_id"],
            r["chunk_id"],
            r["start_tok"],
            r["n_tokens"],
            r["chunk_text"],
        )
        for r in doc_chunks(str(tmp_path), chunk=6, overlap=2).take_all()
    ]
    # doc 1, stride 4: starts 0, 4 (4+2<10), 8 (8+2<10 false -> drop)
    assert got == [
        (0, 0, 0, 2, "a b"),
        (1, 0, 0, 6, "t0 t1 t2 t3 t4 t5"),
        (1, 1, 4, 6, "t4 t5 t6 t7 t8 t9"),
    ]


def test_nation_revenue_share_sums_to_1e6(ray_session):
    """Shares within a region sum to <= 1e6 (floor) and > 1e6 - |nations|;
    revenue matches the per-nation exact sum."""
    from ner_pytorch_ray.pipelines.relational import nation_revenue_share

    rows = nation_revenue_share("/root/testdata/sf0.001").take_all()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r["share_ppm"])
    assert by_region
    for region, shares in by_region.items():
        assert 1_000_000 - len(shares) < sum(shares) <= 1_000_000


def test_systematic_sample_exact_coverage(ray_session, tmp_path):
    """Exactly ceil(n/k) rows, at positions 0, k, 2k of the doc_id
    order, regardless of input block count or file order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.scrub import systematic_sample

    ids = [9, 3, 1, 7, 5, 0, 8, 2, 6, 4]  # unsorted on purpose
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([f"w{i} x" for i in ids], type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = [
        (r["doc_id"], r["row_idx"], r["n_tokens"])
        for r in systematic_sample(str(tmp_path), step=4).take_all()
    ]
    assert got == [(0, 0, 2), (4, 4, 2), (8, 8, 2)]
