"""Shuffle helpers: native-aggregate groupbys instead of per-group UDF calls.

``groupby().map_groups`` invokes the UDF once per group — measured ~8x
slower than ``groupby().aggregate`` on many-small-group workloads (80k
groups: 21s vs 2.7s at 8 CPUs). Every many-group shuffle in the engine goes
through these helpers; ``map_groups`` remains only where groups are few
(top-k merges) or the per-group logic is genuinely relational.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn, Count, Max, Min, Sum


def _auto_shuffle_blocks() -> int:
    """Shuffle partition count ~ cluster CPUs. Ray's sort-based shuffle cost
    grows with input block count (measured: groupby over 128 tiny blocks
    ~2.9s vs 8 blocks ~0.35s at 8 CPUs) — combiner'd partials are small, so
    coalescing to ~#CPUs blocks before the shuffle removes that fixed cost
    without losing parallelism."""
    try:
        if ray.is_initialized():
            return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 8


def grouped_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    shuffle_blocks: int | str | None = "auto",
) -> ray.data.Dataset:
    """groupby(keys).sum(sum_cols)[.min(min_cols)][.max(max_cols)] with
    original column names restored (ray emits 'sum(col)' / 'min(col)' /
    'max(col)').

    ``shuffle_blocks``: coalesce the (pre-aggregated, hence small) input to
    this many blocks before the shuffle; "auto" = ~cluster CPUs; None =
    leave the input block count alone (use when partials are themselves
    large, e.g. huge keyspaces where per-block combine barely shrinks)."""
    if shuffle_blocks == "auto":
        shuffle_blocks = _auto_shuffle_blocks()
    if shuffle_blocks:
        ds = ds.repartition(shuffle_blocks)
    aggs = (
        [Sum(c) for c in sum_cols]
        + [Min(c) for c in (min_cols or [])]
        + [Max(c) for c in (max_cols or [])]
    )
    out = ds.groupby(keys).aggregate(*aggs)
    renames = {f"sum({c})": c for c in sum_cols}
    renames.update({f"min({c})": c for c in (min_cols or [])})
    renames.update({f"max({c})": c for c in (max_cols or [])})

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([renames.get(n, n) for n in t.column_names])

    return out.map_batches(rename, batch_format="pyarrow")


def collect_tuples(
    ds: ray.data.Dataset,
    keys: list[str],
    value_cols: list[str],
    name: str = "items",
    shuffle_blocks: int | str | None = None,
) -> ray.data.Dataset:
    """groupby(keys) -> one row per group with ``name`` = list of value
    tuples. The group payload ships as a python list inside the aggregate
    state — suitable for bucket-style groups (bounded size), not for
    collecting whole partitions.

    ``shuffle_blocks``: optionally coalesce the input before the shuffle
    (Ray's sort-based aggregate cost grows with input block count). Unlike
    ``grouped_sum`` this defaults to None — collect inputs are NOT
    pre-aggregated, so a repartition is a full extra exchange; opt in only
    when the input is known-small (e.g. signature band rows)."""
    if shuffle_blocks == "auto":
        shuffle_blocks = _auto_shuffle_blocks()
    if shuffle_blocks:
        ds = ds.repartition(shuffle_blocks)

    def acc_block(a: list, block) -> list:
        cols = [block.column(c).to_pylist() for c in value_cols]
        a = list(a)
        a.extend(zip(*cols))
        return a

    agg = AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=lambda a, b: list(a) + list(b),
        name=name,
    )
    return ds.groupby(keys).aggregate(agg)


def flat_map_groups(
    collected: ray.data.Dataset,
    fn: Callable[[tuple, list], pa.Table | None],
    keys: list[str],
    items_col: str = "items",
) -> ray.data.Dataset:
    """Vectorized follow-up to ``collect_tuples``: ``fn(key_tuple, items)``
    per *row* (group), executed many-per-batch inside map_batches."""

    def run(batch: pa.Table) -> pa.Table:
        key_cols = [batch.column(k).to_pylist() for k in keys]
        items = batch.column(items_col).to_pylist()
        outs = []
        for i, it in enumerate(items):
            kt = tuple(col[i] for col in key_cols)
            t = fn(kt, it)
            if t is not None and len(t):
                outs.append(t)
        if not outs:
            return fn(None, None)  # must return an empty, typed table
        return pa.concat_tables(outs)

    return collected.map_batches(run, batch_format="pyarrow")


def topk_by_group(
    ds: ray.data.Dataset,
    keys: list[str],
    rank_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
) -> ray.data.Dataset:
    """Per-group top-k (O4, train.py:383-395 dynamic_inference: rank adv
    variants by per-example loss desc, keep rank < k). Groups are bounded
    (variants per sentence), so the group payload travels as a collect
    aggregate; ties break on id_col asc for determinism."""
    import pyarrow as pa  # noqa: F811 (local for worker serialization)

    collected = collect_tuples(ds, keys, [id_col, rank_col], name="items")
    key_fields = [(kk, pa.string() if kk == "url" else pa.int64()) for kk in keys]
    empty = pa.schema(
        key_fields
        + [(id_col, pa.int64()), (rank_col, pa.float64()), ("rank", pa.int64())]
    )

    def pick(key, items):
        if items is None or not items:
            return empty.empty_table()
        uniq = sorted(
            {tuple(x) for x in items},
            key=lambda x: (-x[1], x[0]) if descending else (x[1], x[0]),
        )[:k]
        n = len(uniq)
        if not n:
            return empty.empty_table()
        cols = {}
        for kk, kv in zip(keys, key):
            cols[kk] = pa.array([kv] * n)
        cols[id_col] = pa.array([int(i) for i, _ in uniq], type=pa.int64())
        cols[rank_col] = pa.array([float(s) for _, s in uniq], type=pa.float64())
        cols["rank"] = pa.array(range(n), type=pa.int64())
        return pa.Table.from_pydict(cols)

    return flat_map_groups(collected, pick, keys, items_col="items")


def add_global_index(
    ds: ray.data.Dataset, col: str = "row_id", start: int = 0
) -> ray.data.Dataset:
    """Append a contiguous global row-number column to an ALREADY-ORDERED
    dataset (block order = global order, e.g. the output of ``ds.sort``).

    The distributed-rank building block (create_mapping's contiguous ids,
    utils.py:59-67, without the driver collect): the driver touches only
    per-block METADATA (num_rows) to compute each block's offset prefix —
    O(#blocks) driver state — then per-block tasks append ``arange(offset,
    offset+len)``. Blocks never leave the object store; at 10^12 rows the
    driver holds ~1e5 integers, not the table."""
    import numpy as np

    import ray

    m = ds.materialize()
    refs: list = []
    offsets: list[int] = []
    off = start
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            n = meta.num_rows
            if n is None:  # pragma: no cover - materialized blocks have counts
                n = len(ray.get(ref))
            refs.append(ref)
            offsets.append(off)
            off += int(n)

    @ray.remote
    def _append(block, offset: int):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        idx = pa.array(
            np.arange(offset, offset + block.num_rows, dtype=np.int64),
            type=pa.int64(),
        )
        return block.append_column(col, idx)

    new_refs = [_append.remote(r, o) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(new_refs)


def add_exclusive_prefix(
    ds: ray.data.Dataset, value_col: str, out_col: str, start: int = 0
) -> ray.data.Dataset:
    """Append the EXCLUSIVE prefix sum of ``value_col`` to an
    ALREADY-ORDERED dataset (block order = global order, e.g. after
    ``ds.sort``) — the distributed prefix-sum building block.

    Two-phase: one tiny task per block computes its total (driver holds
    O(#blocks) integers), then per-block tasks add the block base to a
    local cumsum. Blocks never leave the object store; there is NO
    driver-side per-row (or per-chunk) state, so the pattern holds at any
    row count."""
    import numpy as np

    import ray

    m = ds.materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]

    @ray.remote
    def _total(block) -> int:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        col = block.column(value_col)
        import pyarrow.compute as pc

        s = pc.sum(col).as_py()
        return int(s or 0)

    totals = ray.get([_total.remote(r) for r in refs])
    offsets = [start] * len(refs)
    acc = start
    for i, t in enumerate(totals):
        offsets[i] = acc
        acc += t

    @ray.remote
    def _append(block, offset: int):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        v = np.asarray(
            block.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        prefix = offset + np.concatenate(([0], np.cumsum(v[:-1]))) if len(v) else v
        return block.append_column(
            out_col, pa.array(prefix, type=pa.int64())
        )

    new_refs = [_append.remote(r, o) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(new_refs)


def _run_boundaries(block: "pa.Table", part_keys: list[str]):
    """Boolean vector ``new_run[i]`` = row i starts a new partition-key run
    in an ALREADY-SORTED block (row 0 always starts one). Vectorized
    per-column adjacent equality; part keys must be non-null."""
    import numpy as np
    import pyarrow.compute as pc

    n = block.num_rows
    if n == 0:
        return np.zeros(0, dtype=bool)
    same = np.ones(n - 1, dtype=bool)
    for k in part_keys:
        a = block.column(k).combine_chunks()
        eq = pc.equal(a.slice(0, n - 1), a.slice(1, n - 1))
        same &= np.asarray(eq.to_numpy(zero_copy_only=False), dtype=bool)
    return np.concatenate(([True], ~same))


def grouped_rank(
    ds: ray.data.Dataset,
    part_keys: list[str],
    order_keys: list[str],
    descending: list[bool],
    out_col: str = "rank",
    start: int = 1,
) -> ray.data.Dataset:
    """Distributed ``row_number() OVER (PARTITION BY part_keys ORDER BY
    order_keys)`` — the window-function building block WITHOUT a per-group
    collect (per-user/per-key groups at web scale are unbounded; shipping a
    group to one task is the skew trap this avoids).

    Three phases, same discipline as :func:`add_global_index` /
    :func:`add_exclusive_prefix`:

    1. global sort on part_keys + order_keys (Ray's range-partitioned
       sort) — after it, every partition's rows are contiguous in block
       order, possibly spanning adjacent blocks;
    2. one tiny task per block summarizes (first_key, last_key,
       leading-run length, trailing-run length, n_rows); the driver scans
       those O(#blocks) summaries once, chaining the carry each block's
       leading run inherits from the previous block;
    3. per-block tasks append ``carry + local row-number within run``,
       fully vectorized. Blocks never leave the object store.

    ``order_keys`` must end with a unique tiebreaker for determinism;
    part keys must be non-null."""
    import numpy as np

    import ray

    m = ds.sort(
        part_keys + order_keys,
        descending=[False] * len(part_keys) + list(descending),
    ).materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]

    @ray.remote
    def _summary(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        n = block.num_rows
        if n == 0:
            return (None, None, 0, 0, 0)
        new_run = _run_boundaries(block, part_keys)
        starts = np.flatnonzero(new_run)
        first = tuple(block.column(k)[0].as_py() for k in part_keys)
        last = tuple(block.column(k)[n - 1].as_py() for k in part_keys)
        n_first = int(starts[1]) if len(starts) > 1 else n
        n_last = n - int(starts[-1])
        return (first, last, n_first, n_last, n)

    infos = ray.get([_summary.remote(r) for r in refs])
    carries: list[int] = []
    prev_last, prev_run_end = None, 0
    for first, last, _n_first, n_last, n in infos:
        if n == 0:
            carries.append(0)
            continue
        carry = prev_run_end if first == prev_last else 0
        carries.append(carry)
        # a sorted block whose first and last keys agree is one single run
        prev_run_end = (carry + n) if first == last else n_last
        prev_last = last

    @ray.remote
    def _rank(block, carry: int):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        n = block.num_rows
        new_run = _run_boundaries(block, part_keys)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        local = idx - run_start
        if n:
            lead = int(np.flatnonzero(new_run)[1]) if new_run.sum() > 1 else n
            local[:lead] += carry
        return block.append_column(
            out_col, pa.array(local + start, type=pa.int64())
        )

    new_refs = [_rank.remote(r, c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(new_refs)


def grouped_running_sum(
    ds: ray.data.Dataset,
    part_keys: list[str],
    order_keys: list[str],
    descending: list[bool],
    value_col: str,
    out_col: str = "running_sum",
) -> ray.data.Dataset:
    """Distributed ``SUM(value) OVER (PARTITION BY part_keys ORDER BY
    order_keys ROWS UNBOUNDED PRECEDING)`` — the running-total sibling of
    :func:`grouped_rank`, same three phases: global sort, O(#blocks)
    driver carry chain (here the carry is the partition's value sum up to
    the block boundary), then per-block vectorized segmented cumsum.
    ``value_col`` must be integer (the repo-wide exactness contract:
    integer sums are order-independent); order_keys must end with a
    unique tiebreaker; part keys must be non-null."""
    import numpy as np

    import ray

    m = ds.sort(
        part_keys + order_keys,
        descending=[False] * len(part_keys) + list(descending),
    ).materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]

    @ray.remote
    def _summary(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        n = block.num_rows
        if n == 0:
            return (None, None, 0, 0)
        new_run = _run_boundaries(block, part_keys)
        starts = np.flatnonzero(new_run)
        v = np.asarray(
            block.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        first = tuple(block.column(k)[0].as_py() for k in part_keys)
        last = tuple(block.column(k)[n - 1].as_py() for k in part_keys)
        # value sum of the trailing run (the partition still open at the
        # block's end)
        last_run_sum = int(v[int(starts[-1]) :].sum())
        return (first, last, last_run_sum, int(v.sum()))

    infos = ray.get([_summary.remote(r) for r in refs])
    carries: list[int] = []
    prev_last, prev_run_end = None, 0
    for first, last, last_run_sum, total in infos:
        if first is None:
            carries.append(0)
            continue
        carry = prev_run_end if first == prev_last else 0
        carries.append(carry)
        prev_run_end = (
            (carry + total) if first == last else last_run_sum
        )
        prev_last = last

    @ray.remote
    def _cumsum(block, carry: int):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        n = block.num_rows
        new_run = _run_boundaries(block, part_keys)
        v = np.asarray(
            block.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        cum = np.cumsum(v)
        if n:
            # segmented cumsum: subtract the cumulative total just before
            # each row's run start (index-based propagation — correct for
            # negative values too, where cumsum is not monotone)
            starts = np.flatnonzero(new_run)
            idx = np.arange(n, dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
            base = cum[run_start] - v[run_start]
            out = cum - base
            lead = int(starts[1]) if len(starts) > 1 else n
            out[:lead] += carry
        else:
            out = cum
        return block.append_column(
            out_col, pa.array(out, type=pa.int64())
        )

    new_refs = [_cumsum.remote(r, c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(new_refs)


def grouped_shift(
    ds: ray.data.Dataset,
    part_keys: list[str],
    order_keys: list[str],
    descending: list[bool],
    value_cols: list[str],
    lag_suffix: str = "_lag",
    lead_suffix: str = "_lead",
) -> ray.data.Dataset:
    """Distributed ``LAG(v, 1)`` / ``LEAD(v, 1) OVER (PARTITION BY
    part_keys ORDER BY order_keys)`` — the offset-window sibling of
    :func:`grouped_rank`, same three phases: global sort, O(#blocks)
    boundary summaries (here each block's first/last partition key and
    first/last values), then a per-block vectorized one-row shift whose
    block-edge cells are patched from the NEAREST NON-EMPTY neighbor
    block's summary. NULL outside the partition (the SQL default frame).

    Appends ``<col><lag_suffix>`` and ``<col><lead_suffix>`` for each of
    ``value_cols``, preserving the column's Arrow type (timestamps stay
    timestamps). order_keys must end with a unique tiebreaker; part keys
    must be non-null."""
    import numpy as np
    import pyarrow.compute as pc

    import ray

    m = ds.sort(
        part_keys + order_keys,
        descending=[False] * len(part_keys) + list(descending),
    ).materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]

    @ray.remote
    def _summary(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        n = block.num_rows
        if n == 0:
            return None
        first = tuple(block.column(k)[0].as_py() for k in part_keys)
        last = tuple(block.column(k)[n - 1].as_py() for k in part_keys)
        fv = tuple(block.column(c)[0].as_py() for c in value_cols)
        lv = tuple(block.column(c)[n - 1].as_py() for c in value_cols)
        return (first, last, fv, lv)

    infos = ray.get([_summary.remote(r) for r in refs])
    # each block's lag source = nearest non-empty block BEFORE it; lead
    # source = nearest non-empty block AFTER it
    prevs: list = []
    cur = None
    for info in infos:
        prevs.append(cur)
        if info is not None:
            cur = (info[1], info[3])
    nexts: list = [None] * len(infos)
    cur = None
    for i in range(len(infos) - 1, -1, -1):
        nexts[i] = cur
        if infos[i] is not None:
            cur = (infos[i][0], infos[i][2])

    @ray.remote
    def _shift(block, prev, nxt):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        n = block.num_rows
        if n == 0:
            return block
        new_run = _run_boundaries(block, part_keys)
        first = tuple(block.column(k)[0].as_py() for k in part_keys)
        last = tuple(block.column(k)[n - 1].as_py() for k in part_keys)
        lag_cont = prev is not None and prev[0] == first
        lead_cont = nxt is not None and nxt[0] == last
        lag_null = new_run.copy()
        if lag_cont:
            lag_null[0] = False
        lead_null = np.concatenate((new_run[1:], [not lead_cont]))
        out = block
        for j, c in enumerate(value_cols):
            col = block.column(c).combine_chunks()
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            lag_head = pa.array(
                [prev[1][j] if lag_cont else None], type=arr.type
            )
            lag_arr = pc.if_else(
                pa.array(lag_null),
                pa.nulls(n, arr.type),
                pa.concat_arrays([lag_head, arr.slice(0, n - 1)]),
            )
            lead_tail = pa.array(
                [nxt[1][j] if lead_cont else None], type=arr.type
            )
            lead_arr = pc.if_else(
                pa.array(lead_null),
                pa.nulls(n, arr.type),
                pa.concat_arrays([arr.slice(1, n - 1), lead_tail]),
            )
            out = out.append_column(c + lag_suffix, lag_arr)
            out = out.append_column(c + lead_suffix, lead_arr)
        return out

    new_refs = [
        _shift.remote(r, p, x) for r, p, x in zip(refs, prevs, nexts)
    ]
    return ray.data.from_arrow_refs(new_refs)


def add_exclusive_prefix_max(
    ds: ray.data.Dataset,
    value_col: str,
    out_col: str,
    start: int = -(2**62),
) -> ray.data.Dataset:
    """Append the EXCLUSIVE prefix MAX of ``value_col`` to an
    ALREADY-ORDERED dataset — :func:`add_exclusive_prefix`'s sibling for
    running-maximum scans (skylines, watermark checks). Same two-phase
    shape: one tiny task per block reports its max (driver holds
    O(#blocks) integers), per-block tasks prepend the inherited carry to
    a local ``np.maximum.accumulate``; blocks never leave the object
    store, no per-row driver state."""
    import numpy as np

    import ray

    m = ds.materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]

    @ray.remote
    def _bmax(block) -> tuple:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        # a sort can emit EMPTY schema-less blocks on tiny inputs —
        # report them so the append phase drops them outright
        if block.num_rows == 0 or value_col not in block.column_names:
            return (0, -(2**62))
        import pyarrow.compute as pc

        s = pc.max(block.column(value_col)).as_py()
        return (
            block.num_rows,
            int(s) if s is not None else -(2**62),
        )

    summaries = ray.get([_bmax.remote(r) for r in refs])
    carries = [start] * len(refs)
    acc = start
    for i, (_, t) in enumerate(summaries):
        carries[i] = acc
        acc = max(acc, t)

    @ray.remote
    def _append(block, carry: int):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block)
        v = np.asarray(
            block.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        run = np.maximum.accumulate(np.concatenate(([carry], v[:-1])))
        return block.append_column(out_col, pa.array(run, type=pa.int64()))

    new_refs = [
        _append.remote(r, c)
        for r, c, (n, _) in zip(refs, carries, summaries)
        if n > 0
    ]
    if not new_refs:
        schema = m.schema()
        fields = list(zip(schema.names, schema.types)) + [
            (out_col, pa.int64())
        ]
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    return ray.data.from_arrow_refs(new_refs)
