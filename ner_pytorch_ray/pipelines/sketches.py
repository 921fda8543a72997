"""Mergeable sketches: HyperLogLog count-distinct over Ray Data.

``distinct_users_by_type`` (relational.py) is the EXACT two-level distinct —
its shuffle moves every distinct (type, user) pair. At 10^12 events with
10^9 distinct users that exchange is the bottleneck; the sketch path below
moves a FIXED 2^p-register summary per (block, type) instead, independent of
cardinality. Flajolet et al. 2007 (HyperLogLog) with the standard
small-range linear-counting correction; estimates are deterministic —
register values are maxima of per-key hashes (order-free), and the fold is
evaluated once over the merged registers — so the result is bit-identical
under any partitioning, which the tests assert.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

import ray.data

_P = 12  # 2^12 = 4096 registers; rel. error ~1.04/sqrt(m) ~ 1.6%
_M = 1 << _P


def _hash64(vals: np.ndarray) -> np.ndarray:
    """Stable vectorized 64-bit mix of int keys (splitmix64 finalizer —
    platform-independent, no per-row Python loop, well-distributed even for
    sequential ids)."""
    with np.errstate(over="ignore"):
        x = vals.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _register_rows(keys: np.ndarray, groups: np.ndarray) -> pa.Table:
    """(group, register, rho) rows, max-combined within the block."""
    h = _hash64(keys)
    reg = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = h << np.uint64(_P)  # top 64-p suffix bits, left-aligned
    # rho = position of the first 1-bit in the suffix (1-based); all-zero
    # suffix -> 64-p+1
    nz = rest != 0
    rho = np.full(len(h), 64 - _P + 1, dtype=np.int64)
    if nz.any():
        # count leading zeros via float log2 is unsafe near 2^63; use
        # bit-twiddling on uint64 instead
        x = rest[nz]
        lz = np.zeros(x.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        rho[nz] = lz + 1
    t = pa.table(
        {
            "grp": pa.array(groups.tolist(), type=pa.string()),
            "reg": pa.array(reg),
            # store NEGATIVE rho so the engine-wide grouped_sum(min) helper
            # realizes the register max
            "neg_rho": pa.array(-rho),
        }
    )
    g = t.group_by(["grp", "reg"]).aggregate([("neg_rho", "min")])
    return g.rename_columns(["grp", "reg", "neg_rho"])


def _estimate(rhos: np.ndarray) -> int:
    """HLL estimate from the 2^p register maxima (0 = never touched)."""
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-rhos.astype(np.float64))))
    zeros = int(np.sum(rhos == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting (small range)
    return int(round(e))


def hll_distinct(
    ds: ray.data.Dataset, key_col: str, group_col: str
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT key) per group. Output:
    (``group_col``: string, n_distinct_approx: int64)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    def partial(batch: pa.Table) -> pa.Table:
        return _register_rows(
            batch.column(key_col).to_numpy(),
            np.asarray(batch.column(group_col).to_pylist(), dtype=object),
        )

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["grp", "reg"],
        sum_cols=[],
        min_cols=["neg_rho"],
    )

    def fold_partial(batch: pa.Table) -> pa.Table:
        """Pack each block's register rows into one dense row per group so
        the final fold sees O(groups) rows regardless of block count."""
        grp = np.asarray(batch.column("grp").to_pylist(), dtype=object)
        reg = batch.column("reg").to_numpy()
        rho = -batch.column("neg_rho").to_numpy()
        out_g, out_v = [], []
        for g in np.unique(grp):
            sel = grp == g
            dense = np.zeros(_M, dtype=np.int64)
            dense[reg[sel]] = rho[sel]
            out_g.append(str(g))
            out_v.append(dense.tolist())
        return pa.table(
            {
                "grp": pa.array(out_g, type=pa.string()),
                "regs": pa.array(out_v, type=pa.list_(pa.int64())),
            }
        )

    dense = merged.map_batches(fold_partial, batch_format="pyarrow")

    def finish(key, items) -> pa.Table:
        empty = pa.schema(
            [(group_col, pa.string()), ("n_distinct_approx", pa.int64())]
        )
        if items is None or not items:
            return empty.empty_table()
        (g,) = key
        regs = np.zeros(_M, dtype=np.int64)
        for (r,) in items:
            regs = np.maximum(regs, np.asarray(r, dtype=np.int64))
        return pa.Table.from_pydict(
            {
                group_col: pa.array([g], type=pa.string()),
                "n_distinct_approx": pa.array([_estimate(regs)], type=pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import collect_tuples, flat_map_groups

    collected = collect_tuples(
        dense, ["grp"], ["regs"], name="sketches", shuffle_blocks="auto"
    )
    out = flat_map_groups(collected, finish, ["grp"], items_col="sketches")
    return out.sort(group_col)


def approx_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """HLL count-distinct users per event_type (sketch twin of the exact
    ``distinct_users_by_type``). No SQL oracle: DuckDB's approx_count_distinct
    uses a different HLL variant; correctness is pytest-gated instead —
    partitioning-invariance (bit-exact) and <=2% error vs the exact count."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_distinct(ds, key_col="user_id", group_col="event_type")
