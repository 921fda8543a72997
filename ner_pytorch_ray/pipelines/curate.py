"""Checkpointed end-to-end corpus curation — the job a webtext pipeline
actually ships: per-doc quality signals (C4/Gopher gate) + corpus-level
near-dup removal, combined into a final keep/drop table with per-partition
lineage manifests (north_rule: resume from checkpoint at partition
granularity with lineage + counters).

Two phases, mirroring `pipelines/resumable.py`'s split:

  1. SHARDED, RESUMABLE, expensive: each input shard (doc_id % n_shards)
     streams through the one-scan quality gate (`webtext.corpus_filter`'s
     batch kernel) and writes ``out/signals/shard=K/`` + a manifest with
     (n_docs, n_quality_kept) counters; finished shards are skipped on
     re-run.
  2. WIDE, IDEMPOTENT, cheap relative to the scan: near-dup clusters over
     the full corpus (`webtext.near_dup_clusters` — bucketed pairs +
     components, no all-pairs), merged with the signal shards by a
     union + grouped-sum keyed merge (integer marker columns, no join),
     writing ``out/decisions/`` (doc_id, quality_kept, dup_kept, kept)
     and a drop-reason report. A crash here loses only the cheap
     aggregation, never the scans.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ner_pytorch_ray.pipelines.webtext import _filter_batch, near_dup_clusters
from ner_pytorch_ray.state import manifests as mf

STAGE = "signals"


def _shard_docs(sf_dir: str, n_shards: int, shard: int) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return mf.filter_shard(ds, n_shards, shard)


def run_signal_shard(
    sf_dir: str,
    out_dir: str,
    n_shards: int,
    shard: int,
    fail_on_shard: int | None = None,
) -> None:
    """One shard through the quality gate; manifest written LAST so a
    crash mid-write leaves the shard pending, not half-done."""
    if fail_on_shard is not None and shard == fail_on_shard:
        raise RuntimeError(f"injected failure on shard {shard}")
    signals = _shard_docs(sf_dir, n_shards, shard).map_batches(
        _filter_batch, batch_format="pyarrow"
    )
    dest = mf.shard_dir(out_dir, STAGE, shard)
    if os.path.exists(dest):
        shutil.rmtree(dest)  # partial output from a crashed attempt
    signals.write_parquet(dest)
    n_docs = 0
    n_kept = 0
    for f in os.listdir(dest):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(dest, f), columns=["kept"])
        n_docs += len(t)
        n_kept += int(pa.compute.sum(t.column("kept")).as_py() or 0)
    mf.write_manifest(
        out_dir,
        STAGE,
        shard,
        mf.input_fingerprint(sf_dir, STAGE, n_shards, shard),
        {"n_docs": n_docs, "n_quality_kept": n_kept},
    )


def run_curate(
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    tau: float = 0.5,
    fail_on_shard: int | None = None,
) -> dict:
    """Run (or resume) the checkpointed curation job. Returns run info
    including the drop-reason report. ``fail_on_shard`` injects a crash
    for resume tests."""
    pending = mf.pending_shards(out_dir, STAGE, sf_dir, n_shards)
    for shard in pending:
        run_signal_shard(sf_dir, out_dir, n_shards, shard, fail_on_shard)

    # read the exact shard set the manifests validated — stale shard dirs
    # from a different n_shards raise instead of silently double-counting
    signals = ray.data.read_parquet(
        mf.stage_shard_paths(out_dir, STAGE, n_shards),
        columns=["doc_id", "kept", "reason"],
    )

    # keyed merge WITHOUT a join: both sides are one int row per doc;
    # union with marker columns, one grouped sum resolves the pair
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    def q_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "quality_kept": t.column("kept").cast(pa.int64()),
                "dup_kept": pa.array(
                    np.zeros(len(t), dtype=np.int64)
                ),
            }
        )

    dups = near_dup_clusters(sf_dir, tau=tau)

    def d_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "quality_kept": pa.array(np.zeros(len(t), dtype=np.int64)),
                "dup_kept": t.column("kept").cast(pa.int64()),
            }
        )

    merged = grouped_sum(
        signals.map_batches(q_rows, batch_format="pyarrow").union(
            dups.map_batches(d_rows, batch_format="pyarrow")
        ),
        ["doc_id"],
        sum_cols=["quality_kept", "dup_kept"],
    )

    def decide(t: pa.Table) -> pa.Table:
        q = t.column("quality_kept").to_numpy(zero_copy_only=False)
        d = t.column("dup_kept").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "quality_kept": pa.array(q),
                "dup_kept": pa.array(d),
                "kept": pa.array(((q == 1) & (d == 1)).astype(np.int64)),
            }
        )

    decisions = merged.map_batches(decide, batch_format="pyarrow")
    dec_dir = os.path.join(out_dir, "decisions")
    if os.path.exists(dec_dir):
        shutil.rmtree(dec_dir)
    decisions.write_parquet(dec_dir)

    # drop-reason report: distributive counters only
    reason_counts = {
        r["reason"]: r["count()"]
        for r in signals.groupby("reason").count().take_all()
    }
    dec = ray.data.read_parquet(dec_dir)
    n_total = dec.count()
    n_kept = int(dec.sum("kept") or 0)
    # quality-kept docs that only the dup pass removed (pure aggregates)
    n_dup_dropped = int(dec.sum("quality_kept") or 0) - n_kept
    return {
        "skipped_shards": n_shards - len(pending),
        "ran_shards": len(pending),
        "counters": mf.all_counters(out_dir, STAGE, n_shards),
        "n_docs": n_total,
        "n_kept": n_kept,
        "n_dup_dropped": n_dup_dropped,
        "drop_reasons": {
            k: int(v) for k, v in sorted(reason_counts.items()) if k != "ok"
        },
        "decisions_dir": dec_dir,
    }
