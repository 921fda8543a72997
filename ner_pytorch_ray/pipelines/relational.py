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
