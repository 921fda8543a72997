"""Checkpointed, shard-resumable KG run (north_rule: resume from checkpoint
at partition granularity with per-partition lineage + counters).

The expensive stage (extract -> sentences -> tag -> mentions -> link) runs
shard-by-shard over a deterministic split of the input (doc_id % n_shards);
each shard streams through Ray Data at full cluster width, writes
``out/mentions/shard=K/`` and then its manifest. The cheap wide stage
(edges/nodes groupbys over the much smaller mention table) recomputes from
the materialized mention shards — idempotent, so a crash there loses only
the final aggregation.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

import ray.data

from ner_pytorch_ray.pipelines.kg import linked_mentions
from ner_pytorch_ray.sources.pages import pages_from_documents
from ner_pytorch_ray.stages.graph import edges_from_linked, nodes_from_linked
from ner_pytorch_ray.state import manifests as mf

STAGE = "mentions"


def _shard_pages(sf_dir: str, n_shards: int, shard: int) -> ray.data.Dataset:
    import pyarrow as pa

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    # shared resume-contract shard split (state/manifests.filter_shard)
    ds = mf.filter_shard(ds, n_shards, shard)
    from ner_pytorch_ray.sources.pages import _documents_to_pages

    return ds.map_batches(_documents_to_pages, batch_format="pyarrow")


def run_shard(
    sf_dir: str, out_dir: str, n_shards: int, shard: int, fail_on_shard: int | None = None
) -> None:
    """Process one input shard end-to-end and write its manifest."""
    if fail_on_shard is not None and shard == fail_on_shard:
        raise RuntimeError(f"injected failure on shard {shard}")
    pages = _shard_pages(sf_dir, n_shards, shard)
    linked = linked_mentions(pages)
    dest = mf.shard_dir(out_dir, STAGE, shard)
    if os.path.exists(dest):
        shutil.rmtree(dest)  # partial output from a crashed attempt
    linked.write_parquet(dest)
    # counters from the written files' metadata (no re-execution)
    n_mentions = sum(
        pq.read_metadata(os.path.join(dest, f)).num_rows
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )
    mf.write_manifest(
        out_dir,
        STAGE,
        shard,
        mf.input_fingerprint(sf_dir, STAGE, n_shards, shard),
        {"n_mentions": n_mentions},
    )


def run_resumable_kg(
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    fail_on_shard: int | None = None,
) -> dict:
    """Run (or resume) the checkpointed KG build. Returns run info.

    ``fail_on_shard`` injects a crash for resume tests.
    """
    pending = mf.pending_shards(out_dir, STAGE, sf_dir, n_shards)
    for shard in pending:
        run_shard(sf_dir, out_dir, n_shards, shard, fail_on_shard)

    # read the exact shard set the manifests validated — stale shard dirs
    # from a different n_shards raise instead of silently double-counting
    mentions = ray.data.read_parquet(
        mf.stage_shard_paths(out_dir, STAGE, n_shards)
    )
    edges = edges_from_linked(mentions)
    nodes = nodes_from_linked(mentions)
    edges_dir = os.path.join(out_dir, "edges")
    nodes_dir = os.path.join(out_dir, "nodes")
    for d in (edges_dir, nodes_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    edges.write_parquet(edges_dir)
    nodes.write_parquet(nodes_dir)
    return {
        "skipped_shards": n_shards - len(pending),
        "ran_shards": len(pending),
        "counters": mf.all_counters(out_dir, STAGE, n_shards),
        "edges_dir": edges_dir,
        "nodes_dir": nodes_dir,
    }
