"""Hash-bucketed Parquet storage layout + shuffle-free co-located join.

At 100 TB the single most expensive thing a pipeline does is an
all-to-all exchange; the classic storage-side answer is to pay the
exchange ONCE — write each table hash-partitioned into B bucket
directories by its join/grouping key — and let every later join or
aggregate on that key run bucket-by-bucket with NO shuffle at all
(Hive/Spark bucketing, "storage-partitioned join"). The reference's
engine holds everything in one process (`/root/reference/train.py`
loads full datasets into memory) so it never needs this; a Ray engine
streaming Common-Crawl-scale tables does.

- :func:`bucketed_write` — a proper Ray ``Datasink``: each write task
  splits its blocks by ``hash(key) % n_buckets`` (vectorized splitmix64
  over the int64 key — an avalanching hash, so adversarially clustered
  key RANGES still spread; per-VALUE hot keys are a salting problem,
  not a bucketing problem) and writes one parquet part per non-empty
  bucket under ``bucket={i}/``. A ``_MANIFEST.json`` recording the key,
  bucket count, schema and per-part row counts commits only after all
  tasks succeed — the same commit-on-success lineage contract as the
  N-Triples sink (sources/ntriples.py), so a crashed job is
  distinguishable from a complete one and re-runs never read stale
  parts.
- :func:`bucketed_join` — the payoff: an equi-join of two layouts
  bucketed the same way runs as one task per bucket, each reading ONLY
  its own bucket's parts from both sides and joining locally (Arrow
  hash join inside the task). Matching rows are co-located by
  construction; nothing is exchanged. Repeated joins on the same key
  amortize the one write-time exchange across every downstream use —
  the "pick ONE partitioning key and reuse it across stages" rule made
  concrete.
- :func:`read_bucketed` — manifest-gated streaming read-back.

Partitioning assumption (documented contract): both layouts were
written with the SAME ``n_buckets`` and the same hash (this module's),
on the respective join keys. ``bucketed_join`` verifies both manifests
and raises otherwise rather than silently mis-joining.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.datasource import Datasink

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain, Steele et al.):
    avalanching uint64 -> uint64, so consecutive keys land in unrelated
    buckets."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _md5_u63(s: str) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.md5(s.encode()).digest()[:8], "little"
    ) & 0x7FFFFFFFFFFFFFFF


def bucket_ids(keys: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Bucket id per row. Int keys hash through splitmix64 (vectorized);
    string keys through md5 (the repo's string-hash convention — per-row
    hashlib, the doc_fingerprint precedent; runs once at write time)."""
    if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
        vals = np.array(
            [_md5_u63(v) for v in keys.to_pylist()], dtype=np.uint64
        )
        return (vals % np.uint64(n_buckets)).astype(np.int64)
    arr = pc.cast(keys, pa.int64())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.to_numpy(zero_copy_only=False).astype(np.int64)
    return (splitmix64(vals.view(np.uint64)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def key_bucket(key, n_buckets: int) -> int:
    """The bucket a single key value lands in — the point-lookup side of
    :func:`bucket_ids` (read ONE bucket instead of scanning the layout)."""
    if isinstance(key, str):
        return int(_md5_u63(key) % n_buckets)
    v = np.array([key], dtype=np.int64)
    return int(splitmix64(v.view(np.uint64))[0] % np.uint64(n_buckets))


class BucketedParquetDatasink(Datasink):
    """One parquet part per (write task, non-empty bucket) under
    ``bucket={i}/``; ``_MANIFEST.json`` committed only on full success."""

    def __init__(
        self,
        path: str,
        key: str,
        n_buckets: int,
        stats_cols: list[str] | None = None,
    ):
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self._path = path
        self._key = key
        self._n = n_buckets
        # zone maps: per-part [min, max] for these columns, recorded in
        # the manifest so range reads can skip whole parts (data
        # skipping). Correct for ANY layout (a non-intersecting part
        # cannot hold a matching row); EFFECTIVE when the write input is
        # clustered on the column (e.g. log data arriving in time order).
        self._stats_cols = list(stats_cols or [])

    def on_write_start(self) -> None:
        os.makedirs(self._path, exist_ok=True)
        m = os.path.join(self._path, "_MANIFEST.json")
        if os.path.exists(m):
            os.remove(m)
        # stale-part guard: a re-run must not leave parts from a prior
        # (possibly larger) job lying around for the reader to pick up
        for d in os.listdir(self._path):
            full = os.path.join(self._path, d)
            if d.startswith("bucket=") and os.path.isdir(full):
                for f in os.listdir(full):
                    if f.endswith(".parquet") or f.endswith(".tmp"):
                        os.remove(os.path.join(full, f))

    def write(self, blocks: Iterable, ctx) -> dict:
        tables = []
        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if len(block):
                tables.append(block)
        out: dict = {"task": ctx.task_idx, "parts": []}
        if not tables:
            return out
        t = pa.concat_tables(tables)
        b = bucket_ids(t.column(self._key), self._n)
        # vectorized split: one stable sort by bucket, then slice runs
        order = np.argsort(b, kind="stable")
        t = t.take(pa.array(order))
        bs = b[order]
        bounds = np.flatnonzero(np.diff(bs)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(bs)]))
        out["schema"] = t.schema.serialize().to_pybytes().hex()
        for s, e in zip(starts, ends):
            i = int(bs[s])
            bdir = os.path.join(self._path, f"bucket={i}")
            os.makedirs(bdir, exist_ok=True)
            fname = f"part-{ctx.task_idx:06d}.parquet"
            tmp = os.path.join(bdir, "." + fname + ".tmp")
            part = t.slice(s, e - s)
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(bdir, fname))  # atomic per part
            rec = {"bucket": i, "file": fname, "n_rows": int(e - s)}
            if self._stats_cols:
                zones = {}
                for c in self._stats_cols:
                    col = pc.cast(part.column(c), pa.int64())
                    mm = pc.min_max(col)
                    zones[c] = [mm["min"].as_py(), mm["max"].as_py()]
                rec["zones"] = zones
            out["parts"].append(rec)
        return out

    def on_write_complete(self, write_result) -> None:
        rets = sorted(write_result.write_returns, key=lambda r: r["task"])
        parts = [p for r in rets for p in r["parts"]]
        schema_hex = next(
            (r["schema"] for r in rets if r.get("schema")), None
        )
        manifest = {
            "format": "bucketed-parquet",
            "key": self._key,
            "n_buckets": self._n,
            "hash": "splitmix64",
            "stats_cols": self._stats_cols,
            "schema": schema_hex,
            "parts": sorted(parts, key=lambda p: (p["bucket"], p["file"])),
            "n_rows": sum(p["n_rows"] for p in parts),
        }
        tmp = os.path.join(self._path, "._MANIFEST.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self._path, "_MANIFEST.json"))

    @property
    def supports_distributed_writes(self) -> bool:
        # single-node sandbox writes to a local path; on a real cluster
        # point this at shared storage and flip to True
        return False


def bucketed_write(
    ds: ray.data.Dataset,
    key: str,
    n_buckets: int,
    path: str,
    stats_cols: list[str] | None = None,
) -> dict:
    """Write ``ds`` hash-bucketed by ``key``; returns the committed
    manifest. ``stats_cols`` adds per-part min/max zone maps for range
    data-skipping (:func:`read_bucketed_range`)."""
    ds.write_datasink(
        BucketedParquetDatasink(path, key, n_buckets, stats_cols)
    )
    return load_manifest(path)


def load_manifest(path: str) -> dict:
    mpath = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{path} has no _MANIFEST.json — incomplete bucketed layout"
        )
    with open(mpath, encoding="utf-8") as f:
        return json.load(f)


def _bucket_table(path: str, manifest: dict, bucket: int) -> pa.Table:
    """All committed parts of one bucket as a single Arrow table (exactly
    the manifest's files — never whatever else the directory contains)."""
    files = [
        os.path.join(path, f"bucket={p['bucket']}", p["file"])
        for p in manifest["parts"]
        if p["bucket"] == bucket
    ]
    if not files:
        schema = pa.ipc.read_schema(
            pa.BufferReader(bytes.fromhex(manifest["schema"]))
        )
        return schema.empty_table()
    return pa.concat_tables(pq.read_table(f) for f in files)


def read_bucketed(path: str) -> ray.data.Dataset:
    """Stream a bucketed layout back, one read task per bucket."""
    manifest = load_manifest(path)
    buckets = sorted({p["bucket"] for p in manifest["parts"]})

    def load(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            _bucket_table(path, manifest, int(i))
            for i in batch.column("bucket").to_pylist()
        )

    return ray.data.from_arrow(
        pa.table({"bucket": pa.array(buckets, type=pa.int64())})
    ).map_batches(load, batch_format="pyarrow", batch_size=1)


def prune_parts(
    manifest: dict, col: str, lo: int, hi: int
) -> tuple[list[dict], int]:
    """Zone-map pruning plan: the parts whose [min, max] intersects
    ``[lo, hi)``, plus the total part count (for skip-rate assertions).
    A part without a zone for ``col`` is conservatively kept."""
    if col not in manifest.get("stats_cols", []):
        raise ValueError(
            f"layout has no zone maps for {col!r} "
            f"(stats_cols={manifest.get('stats_cols')})"
        )
    kept = [
        p
        for p in manifest["parts"]
        if "zones" not in p
        or (p["zones"][col][1] >= lo and p["zones"][col][0] < hi)
    ]
    return kept, len(manifest["parts"])


def read_bucketed_range(
    path: str, col: str, lo: int, hi: int
) -> ray.data.Dataset:
    """Range read with data skipping: only parts whose zone map
    intersects ``[lo, hi)`` are opened at all; an exact vectorized
    filter inside each kept part finishes the job. On time-clustered
    log data this turns a full-layout scan into a ~selectivity-
    proportional one without any index build."""
    manifest = load_manifest(path)
    kept, _total = prune_parts(manifest, col, lo, hi)
    if not kept:
        schema = pa.ipc.read_schema(
            pa.BufferReader(bytes.fromhex(manifest["schema"]))
        )
        return ray.data.from_arrow(schema.empty_table())

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        for j in batch.column("part").to_pylist():
            p = kept[int(j)]
            t = pq.read_table(
                os.path.join(path, f"bucket={p['bucket']}", p["file"])
            )
            c = pc.cast(t.column(col), pa.int64())
            outs.append(
                t.filter(
                    pc.and_(
                        pc.greater_equal(c, pa.scalar(lo, pa.int64())),
                        pc.less(c, pa.scalar(hi, pa.int64())),
                    )
                )
            )
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_arrow(
        pa.table({"part": pa.array(range(len(kept)), pa.int64())})
    ).map_batches(load, batch_format="pyarrow", batch_size=1)


def bucketed_join(
    path_a: str,
    path_b: str,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Equi-join two co-bucketed layouts with NO shuffle: one task per
    bucket reads its own parts from both sides and hash-joins locally
    (``pyarrow.Table.join``). The write-time exchange is the only data
    movement this join ever does."""
    ma, mb = load_manifest(path_a), load_manifest(path_b)
    if ma["n_buckets"] != mb["n_buckets"] or ma["hash"] != mb["hash"]:
        raise ValueError(
            "bucketed_join requires identical bucketing: "
            f"{ma['n_buckets']}/{ma['hash']} vs {mb['n_buckets']}/{mb['hash']}"
        )
    key_a, key_b = ma["key"], mb["key"]
    n = ma["n_buckets"]

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for i in batch.column("bucket").to_pylist():
            ta = _bucket_table(path_a, ma, int(i))
            tb = _bucket_table(path_b, mb, int(i))
            outs.append(
                ta.join(
                    tb,
                    keys=[key_a],
                    right_keys=[key_b],
                    join_type=join_type,
                    # collision-safe: shared non-key column names get _r
                    # on the right side instead of a duplicate-name table
                    right_suffix="_r",
                )
            )
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_arrow(
        pa.table({"bucket": pa.array(range(n), type=pa.int64())})
    ).map_batches(join_bucket, batch_format="pyarrow", batch_size=1)


def bucketed_aggregate(
    path: str, keys: list[str], sum_cols: list[str]
) -> ray.data.Dataset:
    """groupby(keys).sum(sum_cols) over a bucketed layout with NO
    shuffle: when the layout's bucketing key is one of ``keys``, every
    row of a group lives in exactly one bucket, so the per-bucket local
    aggregate IS the final answer. The second way the one write-time
    exchange keeps paying off (first: :func:`bucketed_join`)."""
    manifest = load_manifest(path)
    if manifest["key"] not in keys:
        raise ValueError(
            f"layout is bucketed by {manifest['key']!r}, which must be one "
            f"of the grouping keys {keys} for bucket-local aggregation to "
            "be exact"
        )

    def agg_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for i in batch.column("bucket").to_pylist():
            t = _bucket_table(path, manifest, int(i))
            g = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
            outs.append(
                g.rename_columns(keys + sum_cols)
            )
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_arrow(
        pa.table(
            {"bucket": pa.array(range(manifest["n_buckets"]), pa.int64())}
        )
    ).map_batches(agg_bucket, batch_format="pyarrow", batch_size=1)


def bucketed_user_totals(sf_dir: str, n_buckets: int = 16) -> pa.Table:
    """Registered-query entry point for :func:`bucketed_aggregate`:
    bucket events by user, then per-user event count + value total (exact
    cents) with bucket-local finality — no aggregation shuffle."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bucketed_agg_")
    try:
        events = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        )

        from ner_pytorch_ray.pipelines.relational import _cents

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "n_events": pa.array(
                        np.ones(len(batch), dtype=np.int64)
                    ),
                    "value_cents": _cents(batch.column("value")),
                }
            )

        bucketed_write(
            events.map_batches(prep, batch_format="pyarrow"),
            "user_id",
            n_buckets,
            f"{tmp}/events",
        )
        return (
            bucketed_aggregate(
                f"{tmp}/events", ["user_id"], ["n_events", "value_cents"]
            )
            .sort("user_id")
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bucketed_upsert(
    base_path: str | None,
    delta_path: str,
    out_path: str,
    order_cols: list[str],
) -> dict:
    """CDC upsert / compaction: merge a delta layout into a base layout,
    keeping per key the row with the LARGEST ``order_cols`` tuple
    (latest-version-wins). Both inputs and the output share one
    bucketing, so the merge is bucket-local — each task compacts its own
    bucket's base+delta parts with one vectorized sort, and NOTHING is
    exchanged. Upsert is an associative max, so any delta arrival order
    converges to the same table (the incremental-ingest contract).

    ``base_path=None`` bootstraps the table from the first delta."""
    md = load_manifest(delta_path)
    if base_path is not None:
        mb = load_manifest(base_path)
        if (
            mb["n_buckets"] != md["n_buckets"]
            or mb["hash"] != md["hash"]
            or mb["key"] != md["key"]
        ):
            raise ValueError(
                "bucketed_upsert requires identical bucketing and key: "
                f"{mb['key']}/{mb['n_buckets']} vs {md['key']}/{md['n_buckets']}"
            )
    key = md["key"]
    n = md["n_buckets"]

    def compact(batch: pa.Table) -> pa.Table:
        outs = []
        for i in batch.column("bucket").to_pylist():
            parts = [_bucket_table(delta_path, md, int(i))]
            if base_path is not None:
                parts.append(_bucket_table(base_path, mb, int(i)))
            t = pa.concat_tables(parts, promote_options="default")
            if len(t) == 0:
                outs.append(t)
                continue
            t = t.sort_by(
                [(key, "ascending")]
                + [(c, "ascending") for c in order_cols]
            )
            k = t.column(key).to_numpy(zero_copy_only=False)
            last_of_run = np.append(k[:-1] != k[1:], True)
            outs.append(t.filter(pa.array(last_of_run)))
        return pa.concat_tables(outs, promote_options="default")

    compacted = ray.data.from_arrow(
        pa.table({"bucket": pa.array(range(n), pa.int64())})
    ).map_batches(compact, batch_format="pyarrow", batch_size=1)
    # zone maps survive compaction: carry the union of both sides' stats
    stats = sorted(
        set(md.get("stats_cols", []))
        | (set(mb.get("stats_cols", [])) if base_path is not None else set())
    )
    return bucketed_write(compacted, key, n, out_path, stats_cols=stats)


def cdc_latest_events(sf_dir: str, n_buckets: int = 8) -> pa.Table:
    """Registered-query entry point for :func:`bucketed_upsert`: the
    events stream arrives as three UNORDERED CDC deltas (event_id mod 3);
    each folds into the upsert table keyed by user with version
    (ts_us, event_id). The final table — each user's latest event — must
    equal the one-shot SQL argmax over the whole stream."""
    import shutil
    import tempfile

    from ner_pytorch_ray.pipelines.relational import _cents

    tmp = tempfile.mkdtemp(prefix="cdc_upsert_")
    try:
        events = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "value"],
        )

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                    "event_id": batch.column("event_id"),
                    "cents": _cents(batch.column("value")),
                }
            )

        prepped = events.map_batches(prep, batch_format="pyarrow")
        table = None
        # deltas deliberately NOT time-ordered: upsert must converge anyway
        def mod3(batch: pa.Table, r: int) -> pa.Table:
            ids = batch.column("event_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % 3 == r))

        for j, r in enumerate((2, 0, 1)):
            delta = prepped.map_batches(
                lambda b, _r=r: mod3(b, _r), batch_format="pyarrow"
            )
            bucketed_write(
                delta, "user_id", n_buckets, f"{tmp}/delta{j}"
            )
            nxt = f"{tmp}/v{j}"
            bucketed_upsert(
                table, f"{tmp}/delta{j}", nxt, ["ts_us", "event_id"]
            )
            table = nxt
        return (
            read_bucketed(table)
            .select_columns(["user_id", "event_id", "ts_us", "cents"])
            .sort("user_id")
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def zonemap_time_range(
    sf_dir: str,
    lo_us: int = 1704672000000000,  # 2024-01-08 00:00:00 UTC in micros
    hi_us: int = 1705017600000000,  # 2024-01-12 00:00:00 UTC
    n_buckets: int = 8,
) -> pa.Table:
    """Registered-query entry point for zone-map data skipping: land the
    (time-ordered) events into a bucketed layout with per-part ts zone
    maps, then answer a 4-day window without opening the other ~26 days'
    parts. Output: the window's rows (event_id, user_id, ts_us, cents)."""
    import shutil
    import tempfile

    from ner_pytorch_ray.pipelines.relational import _cents

    tmp = tempfile.mkdtemp(prefix="zonemap_")
    try:
        events = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "value"],
        )

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_id": batch.column("event_id"),
                    "user_id": batch.column("user_id"),
                    "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                    "cents": _cents(batch.column("value")),
                }
            )

        bucketed_write(
            events.map_batches(prep, batch_format="pyarrow"),
            "user_id",
            n_buckets,
            f"{tmp}/events",
            stats_cols=["ts_us"],
        )
        return (
            read_bucketed_range(f"{tmp}/events", "ts_us", lo_us, hi_us)
            .sort("event_id")
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bucketed_join_orders(sf_dir: str, n_buckets: int = 16) -> pa.Table:
    """Registered-query entry point: bucket ``customer`` and ``orders``
    by custkey under /tmp, then join co-located — the joined rows
    (custkey, name, orderkey, totalprice in exact cents) prove the
    bucket-local join loses and duplicates nothing vs a SQL join."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bucketed_join_")
    try:
        cust = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )

        from ner_pytorch_ray.pipelines.relational import _cents

        def cents(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("o_totalprice"),
                "o_cents",
                _cents(batch.column("o_totalprice")),
            )

        bucketed_write(cust, "c_custkey", n_buckets, f"{tmp}/customer")
        bucketed_write(
            orders.map_batches(cents, batch_format="pyarrow"),
            "o_custkey",
            n_buckets,
            f"{tmp}/orders",
        )
        joined = bucketed_join(f"{tmp}/customer", f"{tmp}/orders")
        return (
            joined.select_columns(
                ["c_custkey", "c_name", "o_orderkey", "o_cents"]
            )
            .sort(["c_custkey", "o_orderkey"])
            .materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bucketed_lookup(
    path: str, keys: list, columns: list[str] | None = None
) -> pa.Table:
    """Point lookups against a bucketed layout: each requested key reads
    ONLY its own bucket's parts (computed driver-side from the manifest's
    hash spec), then an exact vectorized filter — the serving-side payoff
    of the layout: O(|keys| x bucket) I/O, never a layout scan."""
    manifest = load_manifest(path)
    n = manifest["n_buckets"]
    key_col = manifest["key"]
    by_bucket: dict[int, list] = {}
    for k in keys:
        by_bucket.setdefault(key_bucket(k, n), []).append(k)
    outs = []
    for b, ks in sorted(by_bucket.items()):
        t = _bucket_table(path, manifest, b)
        t = t.filter(pc.is_in(t.column(key_col), value_set=pa.array(ks)))
        outs.append(t.select(columns) if columns else t)
    if not outs:
        schema = pa.ipc.read_schema(
            pa.BufferReader(bytes.fromhex(manifest["schema"]))
        )
        t = schema.empty_table()
        return t.select(columns) if columns else t
    return pa.concat_tables(outs, promote_options="default")


def kg_subj_lookup(
    sf_dir: str, subjects: tuple = ("loc:stream", "org:spark")
) -> pa.Table:
    """Registered-query entry point: materialize the constructed KG's
    edge table as a bucketed STORE keyed by subject (string-key
    bucketing), then answer per-entity neighborhood lookups by reading
    only the subjects' buckets — the serving shape of the north-star's
    'graph materializes as deduplicated, sorted tables'."""
    import shutil
    import tempfile

    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    tmp = tempfile.mkdtemp(prefix="kg_store_")
    try:
        edges, _nodes = kg_from_documents(sf_dir)
        bucketed_write(edges, "subj", 8, f"{tmp}/edges")
        t = bucketed_lookup(
            f"{tmp}/edges", list(subjects),
            columns=["subj", "pred", "obj", "weight"],
        )
        return (
            ray.data.from_arrow(t).sort(["subj", "pred", "obj"]).materialize()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
