"""Per-partition lineage manifests: the cross-run resume layer.

Ray provides task retries *within* a run; cross-run resume is our design
(SURVEY.md §4): the expensive stage's input is split into deterministic
shards; each shard runs as its own (streamed) Ray Data pipeline, writes its
output under ``out/<stage>/shard=K/`` and only then writes a manifest row
``out/_manifests/<stage>/shard=K.json`` with row counters and an input
fingerprint. On resume, shards with a valid manifest are skipped; a changed
input fingerprint invalidates the shard (replacing the reference's
stage-level ``--preprocess_set`` pickle reload, gen_adv_pipline.py:263-270,
with partition-level granularity).
"""

from __future__ import annotations

import hashlib
import json
import os


def shard_dir(out_dir: str, stage: str, shard: int) -> str:
    return os.path.join(out_dir, stage, f"shard={shard}")


def manifest_path(out_dir: str, stage: str, shard: int) -> str:
    return os.path.join(out_dir, "_manifests", stage, f"shard={shard}.json")


def stage_shard_paths(out_dir: str, stage: str, n_shards: int) -> list[str]:
    """The exact shard directories a downstream read may consume. Raises
    if the stage directory contains shard dirs OUTSIDE shard=0..n-1 —
    stale output from a previous run with a different n_shards would
    otherwise be silently merged in (manifests only validate shards
    0..n-1, so orphans are never fingerprint-checked)."""
    stage_dir = os.path.join(out_dir, stage)
    expected = {f"shard={i}" for i in range(n_shards)}
    if os.path.isdir(stage_dir):
        stray = sorted(
            d
            for d in os.listdir(stage_dir)
            if d.startswith("shard=") and d not in expected
        )
        if stray:
            raise RuntimeError(
                f"{stage_dir} contains shard dirs {stray} outside "
                f"n_shards={n_shards}; output from a previous run with a "
                f"different shard count — remove the directory or rerun "
                f"with the original n_shards"
            )
    # expand to files: ray.data.read_parquet expands a single directory
    # path but not directories inside a list
    paths: list[str] = []
    for i in range(n_shards):
        d = shard_dir(out_dir, stage, i)
        paths.extend(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    return paths


def filter_shard(ds, n_shards: int, shard: int):
    """Deterministic shard split (doc_id % n_shards) — THE resume-contract
    rule the per-shard fingerprints describe; every checkpointed job must
    use this one helper so the split cannot desynchronize between jobs.
    At real scale a shard is a subset of input fragments and no row filter
    is needed; on the single-file testdata it is a vectorized filter."""
    import pyarrow as pa

    def keep_shard(b):
        mask = (b.column("doc_id").to_numpy() % n_shards) == shard
        return b.filter(pa.array(mask))

    return ds.map_batches(keep_shard, batch_format="pyarrow")


def input_fingerprint(sf_dir: str, stage: str, n_shards: int, shard: int) -> str:
    """Deterministic fingerprint of a shard's input definition + source files."""
    h = hashlib.blake2b(digest_size=16)
    h.update(f"{stage}:{n_shards}:{shard}".encode())
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    # size alone is spoofable by same-size regenerated data; mtime_ns makes
    # any rewrite invalidate the shard
    h.update(f"{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()


def chained_fingerprint(*parts: str) -> str:
    """Fingerprint of a DERIVED shard: hash of (stage definition, upstream
    shard fingerprint(s), source fingerprint). A re-run of any upstream
    shard (new fingerprint) transitively invalidates its dependents — the
    lineage chain of the multi-stage adversarial runner."""
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(p.encode())
        h.update(b"\0")
    return h.hexdigest()


def write_manifest(
    out_dir: str,
    stage: str,
    shard: int,
    fingerprint: str,
    counters: dict[str, int],
) -> None:
    path = manifest_path(out_dir, stage, shard)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "stage": stage,
                "shard": shard,
                "input_fingerprint": fingerprint,
                "counters": counters,
                "status": "done",
            },
            f,
        )
    os.replace(tmp, path)  # atomic: a manifest either exists fully or not


def read_manifest(out_dir: str, stage: str, shard: int) -> dict | None:
    path = manifest_path(out_dir, stage, shard)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def shard_is_done(
    out_dir: str, stage: str, shard: int, fingerprint: str
) -> bool:
    m = read_manifest(out_dir, stage, shard)
    return (
        m is not None
        and m.get("status") == "done"
        and m.get("input_fingerprint") == fingerprint
    )


def pending_shards(
    out_dir: str, stage: str, sf_dir: str, n_shards: int
) -> list[int]:
    return [
        k
        for k in range(n_shards)
        if not shard_is_done(
            out_dir, stage, k, input_fingerprint(sf_dir, stage, n_shards, k)
        )
    ]


def all_counters(out_dir: str, stage: str, n_shards: int) -> dict[str, int]:
    total: dict[str, int] = {}
    for k in range(n_shards):
        m = read_manifest(out_dir, stage, k)
        if m:
            for key, v in m.get("counters", {}).items():
                total[key] = total.get(key, 0) + v
    return total
