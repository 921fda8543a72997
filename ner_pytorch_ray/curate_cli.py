"""Checkpointed corpus-curation runner — the ``ray job submit`` entrypoint
for the webtext curation job (quality gate + near-dup removal).

    python -m ner_pytorch_ray.curate_cli --sf_dir /root/testdata/sf0.001 \
        --out /tmp/curate_run --n_shards 8 [--resume-only] [--stats]

Phase 1 (sharded, resumable): per-shard quality signals with lineage
manifests under ``out/signals/shard=K/`` — finished shards are skipped on
re-run. Phase 2 (idempotent): near-dup clusters + the final keep/drop
table under ``out/decisions/`` and a drop-reason report.

On a real cluster this file IS the job driver:
``ray job submit -- python -m ner_pytorch_ray.curate_cli --sf_dir s3://... --out s3://...``
(the sandbox runs it against local parquet; nothing here assumes one node).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Resumable Ray Data corpus curation")
    p.add_argument("--sf_dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True, help="output root (signals/decisions)")
    p.add_argument("--n_shards", type=int, default=8)
    p.add_argument("--tau", type=float, default=0.5, help="near-dup jaccard threshold")
    p.add_argument(
        "--resume-only",
        action="store_true",
        help="fail instead of computing if any shard is pending",
    )
    p.add_argument("--stats", action="store_true", help="print the full JSON report")
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False)
    try:
        from ner_pytorch_ray.pipelines.curate import run_curate
        from ner_pytorch_ray.state import manifests as mf

        if args.resume_only:
            pending = mf.pending_shards(
                args.out, "signals", args.sf_dir, args.n_shards
            )
            if pending:
                print(f"pending shards: {pending}")
                return 1
        info = run_curate(
            args.sf_dir, args.out, n_shards=args.n_shards, tau=args.tau
        )
        if args.stats:
            print(json.dumps(info, indent=1))
        else:
            print(
                f"ran {info['ran_shards']} shards, skipped "
                f"{info['skipped_shards']}; kept {info['n_kept']}/"
                f"{info['n_docs']} (dup-dropped {info['n_dup_dropped']}; "
                f"reasons {info['drop_reasons']})"
            )
    finally:
        if owns:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
