"""Checkpointed KG-construction runner — the ``ray job submit`` entrypoint.

    python -m ner_pytorch_ray.kg_cli --sf_dir /root/testdata/sf0.001 \
        --out /tmp/kg_run --n_shards 8 [--resume-only] [--stats]

Runs (or resumes) the shard-checkpointed KG build
(pipelines/resumable.py): each input shard streams through the full
extract -> sentences -> tag -> mentions -> link DAG, writes
``out/mentions/shard=K/`` + a lineage manifest, and finished shards are
skipped on re-run; the edge/node aggregation recomputes from the mention
shards (idempotent). Exit code 0 iff every shard has a valid manifest.

On a real cluster this file IS the job driver:
``ray job submit -- python -m ner_pytorch_ray.kg_cli --sf_dir s3://... --out s3://...``
(the sandbox runs it against local parquet; nothing here assumes one node).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Resumable Ray Data KG build")
    p.add_argument("--sf_dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True, help="output root (edges/nodes/mentions)")
    p.add_argument("--n_shards", type=int, default=8)
    p.add_argument(
        "--resume-only",
        action="store_true",
        help="fail instead of computing if any shard is pending",
    )
    p.add_argument(
        "--stats", action="store_true", help="print per-shard counters"
    )
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False)
    try:
        from ner_pytorch_ray.pipelines.resumable import run_resumable_kg
        from ner_pytorch_ray.state import manifests as mf

        if args.resume_only:
            pending = mf.pending_shards(
                args.out, "mentions", args.sf_dir, args.n_shards
            )
            if pending:
                print(f"pending shards: {pending}")
                return 1
        info = run_resumable_kg(args.sf_dir, args.out, n_shards=args.n_shards)
        if args.stats:
            print(json.dumps(info, indent=1))
        else:
            print(
                f"ran {info['ran_shards']} shards, skipped "
                f"{info['skipped_shards']}; counters {info['counters']}"
            )
    finally:
        if owns:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
