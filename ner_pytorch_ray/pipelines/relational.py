"""Relational operator demos over the TPC-H-ish tables.

Exercises the engine's generic operator surface (SURVEY.md §2.2/2.4/2.5/2.6):
column-pruned reads, vectorized filters, broadcast hash joins (small side
``ray.put``), two-phase aggregation combiners, global sort and top-k.
Monetary aggregates are integer cents so results are bit-exact against the
DuckDB oracles (no float-summation-order sensitivity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    # half_towards_infinity == DuckDB's round() (half away from zero), so the
    # oracle comparison is bit-exact even on exact-.5 products
    return pc.cast(
        pc.round(
            pc.multiply(col, pa.scalar(100.0)), round_mode="half_towards_infinity"
        ),
        pa.int64(),
    )


def lineitem_pricing(sf_dir: str) -> ray.data.Dataset:
    """Pricing summary by (returnflag, linestatus) — sums in integer cents,
    counts; classic partial->final aggregation."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow combiner: one hash group_by, no pandas round-trip
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag").combine_chunks(),
                "l_linestatus": batch.column("l_linestatus").combine_chunks(),
                "qty_c": _cents(batch.column("l_quantity")),
                "price_c": _cents(batch.column("l_extendedprice")),
                "disc_c": _cents(batch.column("l_discount")),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty_c", "sum"),
                ("price_c", "sum"),
                ("disc_c", "sum"),
                ([], "count_all"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty_cents": g.column("qty_c_sum").cast(pa.int64()),
                "sum_price_cents": g.column("price_c_sum").cast(pa.int64()),
                "sum_disc_cents": g.column("disc_c_sum").cast(pa.int64()),
                "n_rows": g.column("count_all").cast(pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        sum_cols=["sum_qty_cents", "sum_price_cents", "sum_disc_cents", "n_rows"],
    )
    return merged.sort(["l_returnflag", "l_linestatus"])


def top_customers(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Top-n customers by total order value: broadcast join orders->customer
    (small side ray.put), partial per-customer sums, global merge, top-k."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    name_of = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist())
    )
    name_ref = ray.put(name_of)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    class JoinAgg:
        def __init__(self, ref):
            self.name_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "o_custkey": batch.column("o_custkey").combine_chunks(),
                    "price_c": _cents(batch.column("o_totalprice")),
                }
            )
            g = t.group_by("o_custkey").aggregate(
                [("price_c", "sum"), ([], "count_all")]
            )
            keys = g.column("o_custkey").to_pylist()
            return pa.table(
                {
                    "c_custkey": g.column("o_custkey"),
                    "total_cents": g.column("price_c_sum").cast(pa.int64()),
                    "n_orders": g.column("count_all").cast(pa.int64()),
                    "c_name": pa.array(
                        [self.name_of.get(k) for k in keys], type=pa.string()
                    ),
                }
            )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    agg = grouped_sum(
        orders.map_batches(
            JoinAgg, fn_constructor_args=(name_ref,), concurrency=(1, 32),
            batch_format="pyarrow",
        ),
        ["c_custkey", "c_name"],
        sum_cols=["total_cents", "n_orders"],
    )
    top = agg.sort(["total_cents", "c_custkey"], descending=[True, False]).limit(n)
    return top


def events_by_type(sf_dir: str) -> ray.data.Dataset:
    """Event counts + integer-cent value sums per (event_type)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type").combine_chunks(),
                "value_c": _cents(batch.column("value")),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("value_c", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_events": g.column("count_all").cast(pa.int64()),
                "sum_value_cents": g.column("value_c_sum").cast(pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        sum_cols=["n_events", "sum_value_cents"],
    )
    return merged.sort("event_type")


def orders_by_month(sf_dir: str) -> ray.data.Dataset:
    """Orders per calendar month (timestamp functions + agg)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.strftime(batch.column("o_orderdate"), format="%Y-%m")
        vc = m.combine_chunks().value_counts() if isinstance(m, pa.ChunkedArray) else m.value_counts()
        return pa.Table.from_pydict(
            {
                "month": vc.field("values").cast(pa.string()),
                "n_orders": vc.field("counts").cast(pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["month"],
        sum_cols=["n_orders"],
    )
    return merged.sort("month")


def customer_order_activity(sf_dir: str) -> ray.data.Dataset:
    """Distributed LEFT OUTER join + anti-join rollup: per nation, customer
    counts split by order activity. Ray Data's native join is inner-only,
    so this is the union-tag pattern — the generic large-x-large shape
    (neither side broadcast):

      1. orders -> per-block (custkey, order-count) combiner, payload 0;
      2. customer -> (is_cust=1, nationkey, acctbal cents, n_orders=0) rows;
      3. ONE shuffle on custkey sums tags and payloads — the customer table
         holds exactly one row per key, so its payload survives intact and
        sum(n_orders)=0 identifies the anti-join (customers with no order);
      4. per-nation combiner'd rollup.

    Output: (c_nationkey, n_customers, n_active, n_orders, acctbal_cents);
    n_customers - n_active is the anti-join cardinality."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def order_side(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate([([], "count_all")])
        n = g.num_rows
        z = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(
            {
                "c_custkey": g.column("o_custkey").cast(pa.int64()),
                "n_orders": g.column("count_all").cast(pa.int64()),
                "is_cust": z,
                "nationkey": z,
                "acctbal_cents": z,
            }
        )

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey").cast(pa.int64()),
                "n_orders": z,
                "is_cust": pa.array(np.ones(n, dtype=np.int64)),
                "nationkey": batch.column("c_nationkey").cast(pa.int64()),
                "acctbal_cents": _cents(batch.column("c_acctbal")),
            }
        )

    tagged = orders.map_batches(order_side, batch_format="pyarrow").union(
        customer.map_batches(cust_side, batch_format="pyarrow")
    )
    per_cust = grouped_sum(
        tagged,
        ["c_custkey"],
        sum_cols=["n_orders", "is_cust", "nationkey", "acctbal_cents"],
    )

    def rollup(batch: pa.Table) -> pa.Table:
        # is_cust==1 guards referential orphans (order rows with no customer)
        t = batch.filter(pc.equal(batch.column("is_cust"), 1))
        t = t.append_column(
            "active", pc.cast(pc.greater(t.column("n_orders"), 0), pa.int64())
        )
        g = t.group_by(["nationkey"]).aggregate(
            [
                ("active", "sum"),
                ("n_orders", "sum"),
                ("acctbal_cents", "sum"),
                ([], "count_all"),
            ]
        )
        return pa.table(
            {
                "c_nationkey": g.column("nationkey").cast(pa.int64()),
                "n_customers": g.column("count_all").cast(pa.int64()),
                "n_active": g.column("active_sum").cast(pa.int64()),
                "n_orders": g.column("n_orders_sum").cast(pa.int64()),
                "acctbal_cents": g.column("acctbal_cents_sum").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        per_cust.map_batches(rollup, batch_format="pyarrow"),
        ["c_nationkey"],
        sum_cols=["n_customers", "n_active", "n_orders", "acctbal_cents"],
    )
    return merged.sort("c_nationkey")


def orders_rollup(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY ROLLUP (year, month) over order revenue. The finest grain is
    aggregated distributed (combiner -> one small shuffle); the subtotal and
    grand-total levels re-aggregate the FINEST RESULT (|years x months| rows),
    never the fact table — the standard scale shape for grouping sets.
    Rollup placeholders use -1 (SQL NULL has no stable hash across engines).

    Output: (o_year, o_month, n_orders, revenue_cents); o_month=-1 rows are
    year subtotals, o_year=-1 the grand total."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_year": pc.year(batch.column("o_orderdate")).cast(pa.int64()),
                "o_month": pc.month(batch.column("o_orderdate")).cast(pa.int64()),
                "revenue_cents": _cents(batch.column("o_totalprice")),
            }
        )
        g = t.group_by(["o_year", "o_month"]).aggregate(
            [("revenue_cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "o_year": g.column("o_year"),
                "o_month": g.column("o_month"),
                "n_orders": g.column("count_all").cast(pa.int64()),
                "revenue_cents": g.column("revenue_cents_sum").cast(pa.int64()),
            }
        )

    finest = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_year", "o_month"],
        sum_cols=["n_orders", "revenue_cents"],
    )

    def add_levels(batch: pa.Table) -> pa.Table:
        yr = batch.group_by(["o_year"]).aggregate(
            [("n_orders", "sum"), ("revenue_cents", "sum")]
        )
        year_rows = pa.table(
            {
                "o_year": yr.column("o_year"),
                "o_month": pa.array([-1] * yr.num_rows, type=pa.int64()),
                "n_orders": yr.column("n_orders_sum").cast(pa.int64()),
                "revenue_cents": yr.column("revenue_cents_sum").cast(pa.int64()),
            }
        )
        total = pa.table(
            {
                "o_year": pa.array([-1], type=pa.int64()),
                "o_month": pa.array([-1], type=pa.int64()),
                "n_orders": pa.array(
                    [pc.sum(batch.column("n_orders")).as_py() or 0], type=pa.int64()
                ),
                "revenue_cents": pa.array(
                    [pc.sum(batch.column("revenue_cents")).as_py() or 0],
                    type=pa.int64(),
                ),
            }
        )
        return pa.concat_tables([batch, year_rows, total])

    # batch_size=None: the rollup levels need the WHOLE finest table in one
    # batch (it is |years x months| rows — tiny by construction)
    return finest.repartition(1).map_batches(
        add_levels, batch_format="pyarrow", batch_size=None
    ).sort(["o_year", "o_month"])


def distinct_users_by_type(sf_dir: str) -> ray.data.Dataset:
    """Distributed COUNT(DISTINCT): two-level exact distinct — per-block
    (event_type, user_id) combiner, one shuffle over DISTINCT pairs (not
    events), then a per-type count fold. The shuffle volume is bounded by
    the distinct-pair count regardless of event skew.

    Output: (event_type, n_users, n_events)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "user_id": g.column("user_id").cast(pa.int64()),
                "n_events": g.column("count_all").cast(pa.int64()),
            }
        )

    pairs = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"],
        sum_cols=["n_events"],
    )

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate(
            [("n_events", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_users": g.column("count_all").cast(pa.int64()),
                "n_events": g.column("n_events_sum").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        pairs.map_batches(fold, batch_format="pyarrow"),
        ["event_type"],
        sum_cols=["n_users", "n_events"],
    )
    return merged.sort("event_type")


def nation_balance_rank(sf_dir: str) -> ray.data.Dataset:
    """Per-nation account-balance ranking of customers — the window
    function ``row_number() OVER (PARTITION BY c_nationkey ORDER BY
    c_acctbal DESC, c_custkey)`` run distributed via
    :func:`~ner_pytorch_ray.stages.groupby_utils.grouped_rank` (global
    sort + O(#blocks) driver carry chain; no per-nation collect, so a
    hot nation with 10^9 customers ranks without any task holding the
    group)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    return grouped_rank(
        ds,
        part_keys=["c_nationkey"],
        order_keys=["c_acctbal", "c_custkey"],
        descending=[True, False],
        out_col="balance_rank",
    )


def customer_running_revenue(sf_dir: str) -> ray.data.Dataset:
    """Running order-revenue total per customer — the window aggregate
    ``SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate,
    o_orderkey)`` run distributed via
    :func:`~ner_pytorch_ray.stages.groupby_utils.grouped_running_sum`
    (global sort + O(#blocks) carry chain + per-block segmented cumsum;
    integer cents so the running totals are exact)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_running_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "date_us": batch.column("o_orderdate").cast(pa.int64()),
                "cents": _cents(batch.column("o_totalprice")),
            }
        )

    out = grouped_running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        part_keys=["o_custkey"],
        order_keys=["date_us", "o_orderkey"],
        descending=[False, False],
        value_col="cents",
        out_col="running_cents",
    )
    return out.select_columns(["o_custkey", "o_orderkey", "running_cents"])


def pivot_events(sf_dir: str) -> ray.data.Dataset:
    """Distributed PIVOT (long -> wide): one row per user with a count
    and an exact-cents value total per event type.

    Two-phase shape for scale:

    1. **Discover the column set** — distinct event types via a grouped
       count (the pivot domain is an enum, orders of magnitude smaller
       than the corpus; a pivot over an unbounded domain is a schema
       error, so a guard raises past ``max_types``).
    2. **Block-local wide partials** — each block hash-groups
       (user, type) with Arrow, then scatters the grouped rows into a
       fixed (users x types) numpy matrix (``pc.index_in`` for the type
       axis — no Python loop over rows). The exchange therefore carries
       one row per user per block with 2·|types| int64 columns, never
       the long event rows.
    3. One ``grouped_sum`` over user_id merges the partials; per-column
       sums are integers, so the result is bit-exact under any
       partitioning.
    """
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    max_types = 64
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )

    def type_rows(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column("event_type"))
        return pa.table(
            {
                "event_type": u,
                "one": pa.array(np.ones(len(u), dtype=np.int64)),
            }
        )

    type_tbl = grouped_sum(
        ds.map_batches(type_rows, batch_format="pyarrow"),
        ["event_type"],
        sum_cols=["one"],
    )
    types = sorted(r["event_type"] for r in type_tbl.take_all())
    if len(types) > max_types:
        raise ValueError(
            f"pivot domain has {len(types)} types (max {max_types}); an "
            "unbounded pivot domain is a schema error, not a wide table"
        )
    type_arr = pa.array(types, type=pa.string())
    n_cols = [f"n_{t}" for t in types]
    c_cols = [f"cents_{t}" for t in types]

    def wide_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "cents": _cents(batch.column("value")),
            }
        )
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        users, uidx = np.unique(
            g.column("user_id").to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        tidx = pc.index_in(
            g.column("event_type"), value_set=type_arr
        ).to_numpy(zero_copy_only=False)
        counts = np.zeros((len(users), len(types)), dtype=np.int64)
        cents = np.zeros((len(users), len(types)), dtype=np.int64)
        counts[uidx, tidx] = g.column("count_all").to_numpy(
            zero_copy_only=False
        )
        cents[uidx, tidx] = g.column("cents_sum").to_numpy(
            zero_copy_only=False
        )
        cols: dict = {"user_id": pa.array(users)}
        for j, name in enumerate(n_cols):
            cols[name] = pa.array(counts[:, j])
        for j, name in enumerate(c_cols):
            cols[name] = pa.array(cents[:, j])
        return pa.table(cols)

    return grouped_sum(
        ds.map_batches(wide_partial, batch_format="pyarrow"),
        ["user_id"],
        sum_cols=n_cols + c_cols,
    ).sort("user_id")


def order_star_flat(sf_dir: str) -> ray.data.Dataset:
    """Star-schema denormalization: flatten every order with its
    customer -> nation -> region dimension chain in ONE pass over the
    fact table. The three dimension tables are composed into a single
    custkey -> (c_name, n_name, r_name) lookup ONCE, shipped via
    ``ray.put``, and resolved per batch with vectorized dictionary
    take — the fact side is never exchanged and the dims are read once,
    not per task (the broadcast-join chain every star query at 100 TB
    wants; dim sizes here are customer-scale, far under worker heap)."""
    import ray

    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey"],
        )
        .to_pandas()
    )
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    flat = cust.merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    ).merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    # dense custkey -> row arrays (custkeys are 0..N-1 in this corpus;
    # fall back to a hash map if ever sparse)
    flat = flat.sort_values("c_custkey").reset_index(drop=True)
    lookup = {
        "custkey": flat.c_custkey.to_numpy(),
        "c_name": flat.c_name.to_numpy(),
        "n_name": flat.n_name.to_numpy(),
        "r_name": flat.r_name.to_numpy(),
    }
    ref = ray.put(lookup)

    class StarLookup:
        def __init__(self, ref):
            self._lk = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            # custkey array is sorted: one vectorized searchsorted per batch
            ck = self._lk["custkey"]
            idx = np.searchsorted(ck, keys)
            if not (ck[idx] == keys).all():
                raise KeyError("order references unknown custkey")
            return pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey"),
                    "c_name": pa.array(self._lk["c_name"][idx]),
                    "n_name": pa.array(self._lk["n_name"][idx]),
                    "r_name": pa.array(self._lk["r_name"][idx]),
                    "o_cents": _cents(batch.column("o_totalprice")),
                }
            )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        .map_batches(
            StarLookup,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .sort("o_orderkey")
    )


def unpivot_events(sf_dir: str) -> ray.data.Dataset:
    """Distributed UNPIVOT (wide -> long): melt the pivoted per-user
    table back to one (user, type) row per non-empty cell. Pure
    block-local reshape — each wide row becomes |types| long rows inside
    the same block (vectorized tile/repeat, no exchange at all); the
    round trip pivot -> unpivot == the plain long aggregate, which is
    exactly what the SQL oracle checks."""
    wide = pivot_events(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        names = [c for c in batch.column_names if c.startswith("n_")]
        types = [c[2:] for c in names]
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        n_rows, t = len(u), len(types)
        counts = np.stack(
            [
                batch.column(f"n_{ty}").to_numpy(zero_copy_only=False)
                for ty in types
            ],
            axis=1,
        )
        cents = np.stack(
            [
                batch.column(f"cents_{ty}").to_numpy(zero_copy_only=False)
                for ty in types
            ],
            axis=1,
        )
        keep = counts.ravel() > 0
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, t)[keep]),
                "event_type": pa.array(
                    np.tile(np.array(types, dtype=object), n_rows)[keep],
                    type=pa.string(),
                ),
                "n_events": pa.array(counts.ravel()[keep]),
                "value_cents": pa.array(cents.ravel()[keep]),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow").sort(
        ["user_id", "event_type"]
    )


def grouped_median_value(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group median (lower median at even counts) of the event
    value, composed from the engine's two window primitives — no
    per-group collect, so a group larger than any block still medians
    without one task holding it:

      1. :func:`grouped_rank` assigns each row its rank within
         (event_type) ordered by (cents, event_id);
      2. a per-type count aggregate (|types| rows) broadcast in the task
         closure selects rank == (n - 1) // 2 + 1.

    SQL mirrors via window row_number + COUNT() OVER."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_rank, grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": _cents(batch.column("value")),
                "event_id": batch.column("event_id"),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    counts = {
        r["event_type"]: r["one"]
        for r in grouped_sum(
            prepped, ["event_type"], sum_cols=["one"]
        ).take_all()
    }
    target = {t: (n - 1) // 2 + 1 for t, n in counts.items()}

    ranked = grouped_rank(
        prepped,
        part_keys=["event_type"],
        order_keys=["cents", "event_id"],
        descending=[False, False],
    )

    def pick(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        want = np.array([target[t] for t in types], dtype=np.int64)
        got = batch.column("rank").to_numpy(zero_copy_only=False)
        keep = batch.filter(pa.array(want == got))
        return pa.table(
            {
                "event_type": keep.column("event_type"),
                "median_cents": keep.column("cents"),
                "n_events": pa.array(
                    [counts[t] for t in keep.column("event_type").to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    return ranked.map_batches(pick, batch_format="pyarrow").sort(
        "event_type"
    )


def event_lead_lag(sf_dir: str) -> ray.data.Dataset:
    """Per-user previous/next event timestamps — the offset windows
    ``LAG(ts)`` / ``LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` run distributed via
    :func:`~ner_pytorch_ray.stages.groupby_utils.grouped_shift` (global
    sort + O(#blocks) boundary summaries + per-block vectorized shift;
    no per-user collect, so a hot user with 10^9 events never lands in
    one task)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_shift

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    out = grouped_shift(
        ds,
        part_keys=["user_id"],
        order_keys=["ts", "event_id"],
        descending=[False, False],
        value_cols=["ts"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["event_id", "user_id", "ts", "ts_lag", "ts_lead"]
        ).rename_columns(["event_id", "user_id", "ts", "prev_ts", "next_ts"])

    return out.map_batches(rename, batch_format="pyarrow").sort(
        ["user_id", "ts", "event_id"]
    )


def grouped_quartiles(sf_dir: str) -> ray.data.Dataset:
    """Exact interpolated per-group quartiles (`percentile_cont`-style at
    p = 0.25/0.50/0.75) of the event value, with NO per-group collect and
    NO floats: for position (n-1)*p the answer is
    ``a + (b-a) * rem/100`` over the two straddling order statistics, so
    emitting the LOW row with weight (100-rem) and the HIGH row with
    weight rem makes the interpolation a distributive grouped SUM in
    hundredths of a cent (q_cc).

    Same scaffold as :func:`grouped_median_value`: grouped_rank for the
    order statistics + a |types|-row count broadcast picking the
    straddle ranks; output (event_type, pct, q_cc, n_events) sorted by
    (event_type, pct)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_rank, grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": _cents(batch.column("value")),
                "event_id": batch.column("event_id"),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    counts = {
        r["event_type"]: r["one"]
        for r in grouped_sum(
            prepped, ["event_type"], sum_cols=["one"]
        ).take_all()
    }
    # per (type, pct): the straddle ranks and their interpolation weights
    pcts = (25, 50, 75)
    picks: dict = {}  # type -> rank -> list[(pct, weight)]
    for t, n in counts.items():
        for p in pcts:
            pos = (n - 1) * p
            lo, rem = pos // 100 + 1, pos % 100
            by_rank = picks.setdefault(t, {})
            if rem:
                by_rank.setdefault(lo, []).append((p, 100 - rem))
                by_rank.setdefault(lo + 1, []).append((p, rem))
            else:
                by_rank.setdefault(lo, []).append((p, 100))

    ranked = grouped_rank(
        prepped,
        part_keys=["event_type"],
        order_keys=["cents", "event_id"],
        descending=[False, False],
    )

    def contribs(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        rk = batch.column("rank").to_numpy(zero_copy_only=False)
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        o_t, o_p, o_q = [], [], []
        for t, r, c in zip(types, rk, cents):
            for p, w in picks.get(t, {}).get(int(r), ()):
                o_t.append(t)
                o_p.append(p)
                o_q.append(int(c) * w)
        return pa.table(
            {
                "event_type": pa.array(o_t, type=pa.string()),
                "pct": pa.array(o_p, type=pa.int64()),
                "q_cc": pa.array(o_q, type=pa.int64()),
            }
        )

    out = grouped_sum(
        ranked.map_batches(contribs, batch_format="pyarrow"),
        keys=["event_type", "pct"],
        sum_cols=["q_cc"],
    )

    def add_n(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_events",
            pa.array(
                [counts[t] for t in batch.column("event_type").to_pylist()],
                type=pa.int64(),
            ),
        )

    return out.map_batches(add_n, batch_format="pyarrow").sort(
        ["event_type", "pct"]
    )


def orders_cube(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY CUBE (year, priority) over order revenue — all four
    grouping sets from ONE shuffle: the finest grain pre-aggregates
    per block (combiner), each finest partial row then EXPANDS to its
    four cube coordinates ((y,p), (y,ALL), (ALL,p), (ALL,ALL)) and a
    single grouped sum folds every level at once. The fact table is
    read exactly once and the exchange carries 4x the finest-partial
    rows (grouping-key-bounded), never 4x the facts. Placeholders use
    -1 / 'ALL' (SQL NULL has no stable cross-engine hash).

    Output: (o_year, o_orderpriority, n_orders, revenue_cents) sorted.
    """
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )

    def expand(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_year": pc.year(batch.column("o_orderdate")).cast(
                    pa.int64()
                ),
                "o_orderpriority": batch.column("o_orderpriority"),
                "revenue_cents": _cents(batch.column("o_totalprice")),
            }
        )
        g = t.group_by(["o_year", "o_orderpriority"]).aggregate(
            [("revenue_cents", "sum"), ([], "count_all")]
        )
        def arr(col) -> pa.Array:
            c = col.combine_chunks()
            return c.chunk(0) if isinstance(c, pa.ChunkedArray) else c

        y = arr(g.column("o_year"))
        p = arr(g.column("o_orderpriority"))
        n = arr(g.column("count_all").cast(pa.int64()))
        r = arr(g.column("revenue_cents_sum").cast(pa.int64()))
        k = g.num_rows
        all_y = pa.array([-1] * k, type=pa.int64())
        all_p = pa.array(["ALL"] * k, type=pa.string())
        return pa.table(
            {
                "o_year": pa.concat_arrays([y, y, all_y, all_y]),
                "o_orderpriority": pa.concat_arrays([p, all_p, p, all_p]),
                "n_orders": pa.concat_arrays([n] * 4),
                "revenue_cents": pa.concat_arrays([r] * 4),
            }
        )

    cube = grouped_sum(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["o_year", "o_orderpriority"],
        sum_cols=["n_orders", "revenue_cents"],
    )
    return cube.sort(["o_year", "o_orderpriority"])


def regional_supplier_revenue(
    sf_dir: str, region: str = "ASIA", year: int = 1996
) -> ray.data.Dataset:
    """TPC-H Q5 shape — "revenue from local suppliers per nation of a
    region, one year": customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation
    ⋈ region with the local-supplier constraint
    ``c_nationkey = s_nationkey``, composed the way a 100 TB plan
    should be:

    - **fact ⋈ fact partitioned**: lineitem ⋈ orders (order key) and
      then ⋈ customer (cust key) run through Ray Data's partitioned
      hash join — both sides stream, nothing is collected
      (``order_revenue_join`` precedent; partitions sized from parquet
      row metadata).
    - **dims broadcast**: supplier→nation (|suppliers| ≪ facts by the
      TPC-H 1:6000 row ratio), nation names and the region's nation set
      ride once via ``ray.put`` and resolve inside ``map_batches`` —
      no shuffle for any dimension.
    - **prune at the read**: the date window filters orders before the
      first join; lineitem carries only (orderkey, suppkey, integer
      revenue) into the exchange.
    - revenue is EXACT integer cent-percent:
      ``round(price*100) * (100 - round(disc*100))``.

    Output: (n_name, revenue_c2, n_items) by (revenue desc, name)."""
    import pyarrow.parquet as pq_meta

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    n_rows = pq_meta.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_parts = int(min(64, max(2, n_rows // 250_000)))

    # --- broadcast side: region -> nations, supplier -> nationkey
    nation_t = pq_meta.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region_t = pq_meta.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkeys = {
        rk
        for rk, rn in zip(
            region_t.column("r_regionkey").to_pylist(),
            region_t.column("r_name").to_pylist(),
        )
        if rn == region
    }
    nation_name = {}
    region_nations = set()
    for nk, nn, rg in zip(
        nation_t.column("n_nationkey").to_pylist(),
        nation_t.column("n_name").to_pylist(),
        nation_t.column("n_regionkey").to_pylist(),
    ):
        nation_name[nk] = nn
        if rg in rkeys:
            region_nations.add(nk)
    supp_t = pq_meta.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_nat = dict(
        zip(
            supp_t.column("s_suppkey").to_pylist(),
            supp_t.column("s_nationkey").to_pylist(),
        )
    )
    supp_ref = ray.put((supp_nat, frozenset(region_nations)))

    # --- fact sides
    t0 = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    t1 = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def in_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (ts >= t0) & (ts < t1)
        return batch.filter(pa.array(keep)).select(
            ["o_orderkey", "o_custkey"]
        )

    orders = orders.map_batches(in_window, batch_format="pyarrow")

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    class AttachSupplierNation:
        def __init__(self, ref):
            self._supp, self._region = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            price = batch.column("l_extendedprice").to_numpy()
            disc = batch.column("l_discount").to_numpy()
            rev = np.rint(price * 100).astype(np.int64) * (
                100 - np.rint(disc * 100).astype(np.int64)
            )
            s_nat = np.array(
                [
                    self._supp[s]
                    for s in batch.column("l_suppkey").to_pylist()
                ],
                dtype=np.int64,
            )
            keep = np.array([n in self._region for n in s_nat])
            t = pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey"),
                    "s_nationkey": pa.array(s_nat),
                    "rev_c2": pa.array(rev),
                }
            ).filter(pa.array(keep))
            return t

    items = lineitem.map_batches(
        AttachSupplierNation,
        fn_constructor_args=(supp_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    oc = orders.join(
        customer,
        join_type="inner",
        num_partitions=n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    joined = items.join(
        oc,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def local_partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(
            batch.column("s_nationkey"), batch.column("c_nationkey")
        )
        t = batch.filter(keep)
        g = (
            pa.table(
                {
                    "n_nationkey": t.column("s_nationkey").combine_chunks(),
                    "rev_c2": t.column("rev_c2").combine_chunks(),
                }
            )
            .group_by("n_nationkey")
            .aggregate([("rev_c2", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "n_nationkey": g.column("n_nationkey"),
                "revenue_c2": g.column("rev_c2_sum").cast(pa.int64()),
                "n_items": g.column("count_all").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        joined.map_batches(local_partial, batch_format="pyarrow"),
        ["n_nationkey"],
        sum_cols=["revenue_c2", "n_items"],
    )
    names_ref = ray.put(nation_name)

    class AddName:
        def __init__(self, ref):
            self._names = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "n_name": pa.array(
                        [
                            self._names[k]
                            for k in batch.column(
                                "n_nationkey"
                            ).to_pylist()
                        ],
                        type=pa.string(),
                    ),
                    "revenue_c2": batch.column("revenue_c2"),
                    "n_items": batch.column("n_items"),
                }
            )

    return merged.map_batches(
        AddName, fn_constructor_args=(names_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    ).sort(["revenue_c2", "n_name"], descending=[True, False])


def grouped_mad_outliers(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Robust per-group outlier detection via the Median Absolute
    Deviation (the k-sigma test's heavy-tail-proof cousin — Hampel 1974):
    per event type, med = exact lower median of value cents, mad = exact
    lower median of |cents - med|, outlier = row with
    ``|cents - med| > k * mad``. Output per group:
    (event_type, median_cents, mad_cents, n_outliers, n_events).

    Both medians compose the SAME two window primitives as
    :func:`grouped_median_value` — distributed rank + target-rank pick —
    so no task ever holds a whole group; the per-type medians (|types|
    rows, bounded by the event-type cardinality, NOT by data volume)
    ride in task closures between the two passes. All comparisons are
    exact integers: ``residual > k * mad`` in cents, no floats
    anywhere."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_rank, grouped_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": _cents(batch.column("value")),
                "event_id": batch.column("event_id"),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    counts = {
        r["event_type"]: r["one"]
        for r in grouped_sum(
            prepped, ["event_type"], sum_cols=["one"]
        ).take_all()
    }
    target = {t: (n - 1) // 2 + 1 for t, n in counts.items()}

    def median_of(rows: ray.data.Dataset, col: str) -> dict:
        ranked = grouped_rank(
            rows,
            part_keys=["event_type"],
            order_keys=[col, "event_id"],
            descending=[False, False],
        )

        def pick(batch: pa.Table) -> pa.Table:
            types = batch.column("event_type").to_pylist()
            want = np.array([target[t] for t in types], dtype=np.int64)
            got = batch.column("rank").to_numpy(zero_copy_only=False)
            keep = batch.filter(pa.array(want == got))
            return pa.table(
                {
                    "event_type": keep.column("event_type"),
                    "m": keep.column(col),
                }
            )

        return {
            r["event_type"]: r["m"]
            for r in ranked.map_batches(
                pick, batch_format="pyarrow"
            ).take_all()
        }

    med = median_of(prepped, "cents")

    def residuals(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        m = np.array([med[t] for t in types], dtype=np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "resid": pa.array(np.abs(cents - m)),
                "event_id": batch.column("event_id"),
            }
        )

    resid = prepped.map_batches(
        residuals, batch_format="pyarrow"
    ).materialize()
    mad = median_of(resid, "resid")

    def flag(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        r = batch.column("resid").to_numpy(zero_copy_only=False)
        thr = np.array([k * mad[t] for t in types], dtype=np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_outliers": pa.array((r > thr).astype(np.int64)),
                "n_events": pa.array(np.ones(len(r), dtype=np.int64)),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import grouped_sum as gsum

    summary = gsum(
        resid.map_batches(flag, batch_format="pyarrow"),
        keys=["event_type"],
        sum_cols=["n_outliers", "n_events"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "median_cents": pa.array(
                    [med[t] for t in types], type=pa.int64()
                ),
                "mad_cents": pa.array(
                    [mad[t] for t in types], type=pa.int64()
                ),
                "n_outliers": batch.column("n_outliers"),
                "n_events": batch.column("n_events"),
            }
        )

    return summary.map_batches(finish, batch_format="pyarrow").sort(
        "event_type"
    )


_FK_PAIRS = [
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer.c_nationkey->nation.n_nationkey",
     "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey",
     "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer.c_custkey",
     "events", "user_id", "customer", "c_custkey"),
]


def fk_integrity_report(sf_dir: str) -> ray.data.Dataset:
    """Referential-integrity audit across the star schema's FK edges —
    the data-quality gate a warehouse load runs before anything consumes
    a snapshot: per FK pair, child row/key totals and orphan row/key
    counts (child keys with NO parent). One row per FK:
    (fk, n_child_rows, n_child_keys, n_orphan_rows, n_orphan_keys).

    The exchange is KEY-BOUNDED, never row-bounded: child blocks
    pre-aggregate to (fk, key, child_n) partials, parent blocks to
    distinct-key markers, and ALL FIVE pairs fold through ONE grouped
    sum keyed by (fk_id, key) (the union-tag anti-join — no broadcast:
    the parent side is fact-sized for lineitem->orders). A second tiny
    fold over the per-key table emits the five summary rows. Tables read
    only their key columns (columns= pruning); one shuffle total instead
    of one per pair, and the pair tag travels as a small int — the fk
    STRING would otherwise be repeated per key row through the
    exchange."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    fk_names = [fk for fk, *_ in _FK_PAIRS]
    parts = []
    for fk_id, (fk, child, ck, parent, pk) in enumerate(_FK_PAIRS):
        c_ds = ray.data.read_parquet(
            f"{sf_dir}/{child}.parquet", columns=[ck]
        )
        p_ds = ray.data.read_parquet(
            f"{sf_dir}/{parent}.parquet", columns=[pk]
        )

        def child_rows(batch: pa.Table, _ck=ck, _id=fk_id) -> pa.Table:
            t = pa.table({"key": batch.column(_ck).cast(pa.int64())})
            g = t.group_by(["key"]).aggregate([([], "count_all")])
            n = len(g)
            return pa.table(
                {
                    "fk_id": pa.array([_id] * n, type=pa.int64()),
                    "key": g.column("key"),
                    "child_n": g.column("count_all").cast(pa.int64()),
                    "parent_n": pa.array([0] * n, type=pa.int64()),
                }
            )

        def parent_rows(batch: pa.Table, _pk=pk, _id=fk_id) -> pa.Table:
            t = pa.table({"key": batch.column(_pk).cast(pa.int64())})
            g = t.group_by(["key"]).aggregate([([], "count_all")])
            n = len(g)
            return pa.table(
                {
                    "fk_id": pa.array([_id] * n, type=pa.int64()),
                    "key": g.column("key"),
                    "child_n": pa.array([0] * n, type=pa.int64()),
                    "parent_n": pa.array([1] * n, type=pa.int64()),
                }
            )

        parts.append(c_ds.map_batches(child_rows, batch_format="pyarrow"))
        parts.append(p_ds.map_batches(parent_rows, batch_format="pyarrow"))

    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.union(p)
    folded = grouped_sum(
        tagged, keys=["fk_id", "key"], sum_cols=["child_n", "parent_n"]
    )

    def summarize(batch: pa.Table) -> pa.Table:
        cn = batch.column("child_n").to_numpy(zero_copy_only=False)
        pn = batch.column("parent_n").to_numpy(zero_copy_only=False)
        is_child = cn > 0
        orphan = is_child & (pn == 0)
        t = pa.table(
            {
                "fk_id": batch.column("fk_id"),
                "n_child_rows": pa.array(cn, type=pa.int64()),
                "n_child_keys": pa.array(
                    is_child.astype(np.int64), type=pa.int64()
                ),
                "n_orphan_rows": pa.array(
                    np.where(orphan, cn, 0), type=pa.int64()
                ),
                "n_orphan_keys": pa.array(
                    orphan.astype(np.int64), type=pa.int64()
                ),
            }
        )
        g = t.group_by(["fk_id"]).aggregate(
            [
                ("n_child_rows", "sum"),
                ("n_child_keys", "sum"),
                ("n_orphan_rows", "sum"),
                ("n_orphan_keys", "sum"),
            ]
        )
        # <= 5 group rows: id -> name here, off the per-key hot path
        return pa.table(
            {
                "fk": pa.array(
                    [fk_names[i] for i in g.column("fk_id").to_pylist()],
                    type=pa.string(),
                ),
                "n_child_rows": g.column("n_child_rows_sum"),
                "n_child_keys": g.column("n_child_keys_sum"),
                "n_orphan_rows": g.column("n_orphan_rows_sum"),
                "n_orphan_keys": g.column("n_orphan_keys_sum"),
            }
        )

    return grouped_sum(
        folded.map_batches(summarize, batch_format="pyarrow"),
        keys=["fk"],
        sum_cols=[
            "n_child_rows",
            "n_child_keys",
            "n_orphan_rows",
            "n_orphan_keys",
        ],
    ).sort("fk")


def customer_skyline(sf_dir: str) -> ray.data.Dataset:
    """Distributed 2-D skyline / Pareto frontier (Börzsönyi, Kossmann &
    Stocker 2001, "The Skyline Operator"): customers not dominated on
    (account balance, lifetime order spend) — q dominates p iff q >= p
    on both axes and > on at least one. Output
    (c_custkey, bal_cents, spend_cents), frontier only, sorted by key.

    The classic sorted-scan, distributed: fold points to per-x groups
    (x, ymax) with ONE grouped sum/max; global sort x-descending; the
    EXCLUSIVE prefix max of ymax (``add_exclusive_prefix_max`` —
    O(#blocks) driver carries, blocks never move) is exactly "best y at
    strictly greater x", so a group survives iff ``ymax > prefix``;
    surviving (x, ymax) coordinates then pull their point rows back via
    one keyed collect per (x, y) (group = duplicate-coordinate points +
    one flag row). Equal-(x, y) duplicates all survive — neither
    dominates the other. No quadratic comparisons anywhere; the oracle's
    NOT EXISTS self-join is the brute-force proof."""
    from ner_pytorch_ray.stages.groupby_utils import (
        add_exclusive_prefix_max,
        collect_tuples,
        flat_map_groups,
        grouped_sum,
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def bal_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch.column("c_custkey").cast(pa.int64()),
                "bal": _cents(batch.column("c_acctbal")),
                "spend": pa.array(
                    np.zeros(len(batch), dtype=np.int64)
                ),
            }
        )

    def spend_rows(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": batch.column("o_custkey").cast(pa.int64()),
                "spend": _cents(batch.column("o_totalprice")),
            }
        )
        g = t.group_by(["key"]).aggregate([("spend", "sum")])
        n = len(g)
        return pa.table(
            {
                "key": g.column("key"),
                "bal": pa.array(np.zeros(n, dtype=np.int64)),
                "spend": g.column("spend_sum").cast(pa.int64()),
            }
        )

    pts = grouped_sum(
        cust.map_batches(bal_rows, batch_format="pyarrow").union(
            orders.map_batches(spend_rows, batch_format="pyarrow")
        ),
        keys=["key"],
        sum_cols=["bal", "spend"],
    ).materialize()

    xg = grouped_sum(
        pts, keys=["bal"], sum_cols=[], max_cols=["spend"]
    ).sort("bal", descending=True)
    scanned = add_exclusive_prefix_max(xg, "spend", "best_above")

    def survivors(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.greater(batch.column("spend"), batch.column("best_above"))
        )
        n = len(keep)
        return pa.table(
            {
                "bal": keep.column("bal"),
                "spend": keep.column("spend"),
                "key": pa.array([None] * n, type=pa.int64()),
            }
        )

    def pt_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bal": batch.column("bal"),
                "spend": batch.column("spend"),
                "key": batch.column("key"),
            }
        )

    unioned = scanned.map_batches(
        survivors, batch_format="pyarrow"
    ).union(pts.map_batches(pt_rows, batch_format="pyarrow"))
    groups = collect_tuples(unioned, ["bal", "spend"], ["key"])
    out_schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("bal_cents", pa.int64()),
            ("spend_cents", pa.int64()),
        ]
    )

    def emit(key, items) -> pa.Table:
        if items is None:
            return out_schema.empty_table()
        keys = [k for (k,) in items if k is not None]
        if len(keys) == len(items):  # no survivor flag: dominated
            return out_schema.empty_table()
        bal, spend = key
        return pa.table(
            {
                "c_custkey": pa.array(sorted(keys), type=pa.int64()),
                "bal_cents": pa.array([bal] * len(keys), type=pa.int64()),
                "spend_cents": pa.array(
                    [spend] * len(keys), type=pa.int64()
                ),
            }
        )

    return flat_map_groups(groups, emit, ["bal", "spend"]).sort("c_custkey")


def nation_revenue_share(sf_dir: str) -> ray.data.Dataset:
    """Ratio-to-parent report (the BI "percent of total" window,
    ``SUM() OVER (PARTITION BY region)`` shape): per nation, total order
    revenue and its share of the REGION total in exact integer ppm —
    ``share_ppm = 1e6 * nation_cents // region_cents``. Output
    (region, nation, revenue_cents, share_ppm), sorted.

    Shape: facts pre-aggregate per block to (custkey, cents) partials,
    ONE grouped sum folds per-customer revenue, the customer→nation→
    region dims broadcast once via ``ray.put`` (dimension tables are
    tiny by the star contract), a second grouped sum folds per-nation
    totals, and the region totals — |regions| rows — ride in the task
    closure for the final vectorized division. Two key-bounded
    exchanges, no fact ever moves twice."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ).take_all()
    }
    nation = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in ray.data.read_parquet(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name", "n_regionkey"],
        ).take_all()
    }
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in ray.data.read_parquet(
            f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
        ).take_all()
    }
    cust_ref = ray.put(
        {k: (nation[v][0], region[nation[v][1]]) for k, v in cust.items()}
    )

    class Partial:
        def __init__(self, ref):
            self._lut = ray.get(ref)  # once per actor, zero-copy

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_pylist()
            cents = _cents(batch.column("o_totalprice")).to_numpy()
            names = [self._lut[k] for k in keys]
            t = pa.table(
                {
                    "nation": pa.array([n for n, _ in names]),
                    "region": pa.array([r for _, r in names]),
                    "revenue_cents": pa.array(cents, type=pa.int64()),
                }
            )
            return (
                t.group_by(["region", "nation"])
                .aggregate([("revenue_cents", "sum")])
                .rename_columns(["region", "nation", "revenue_cents"])
            )

    per_nation = grouped_sum(
        orders.map_batches(
            Partial,
            fn_constructor_args=(cust_ref,),
            concurrency=(1, 8),
            batch_format="pyarrow",
        ),
        keys=["region", "nation"],
        sum_cols=["revenue_cents"],
    ).materialize()

    totals = {}
    for r in per_nation.take_all():
        totals[r["region"]] = totals.get(r["region"], 0) + r["revenue_cents"]

    def finish(batch: pa.Table) -> pa.Table:
        regions = batch.column("region").to_pylist()
        cents = batch.column("revenue_cents").to_numpy(
            zero_copy_only=False
        )
        tot = np.array([totals[r] for r in regions], dtype=np.int64)
        if len(cents) and int(cents.max()) <= (2**63 - 1) // 1_000_000:
            share = 1_000_000 * cents // tot
        else:  # exact big-int path for web-scale revenue totals
            share = np.array(
                [1_000_000 * int(c) // int(t) for c, t in zip(cents, tot)],
                dtype=np.int64,
            )
        return batch.append_column(
            "share_ppm", pa.array(share, type=pa.int64())
        )

    return per_nation.map_batches(finish, batch_format="pyarrow").sort(
        ["region", "nation"]
    )
