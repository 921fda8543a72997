"""Incremental KG ingestion runner — the per-crawl ``ray job submit``
entrypoint for pipelines/incremental.py.

    # ingest one delta (today's crawl) into persisted aggregate state
    python -m ner_pytorch_ray.incr_cli ingest --sf_dir /root/testdata/sf0.001 \
        --state /tmp/kg_state --delta 0 --n_deltas 3

    # write the current graph (sorted edges/nodes parquet)
    python -m ner_pytorch_ray.incr_cli finalize --state /tmp/kg_state \
        --out /tmp/kg_graph

``ingest`` is exactly-once per (delta, input fingerprint): re-running a
finished delta is a no-op (exit 0, version unchanged), so a crashed crawl
loop can simply be restarted from delta 0. On a real cluster each delta is
the day's new input files; the modulo split only simulates arrival order
on the fixed test tables.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Incremental Ray Data KG ingest")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="fold one document delta into state")
    pi.add_argument("--sf_dir", default="/root/testdata/sf0.001")
    pi.add_argument("--state", required=True, help="state directory")
    pi.add_argument("--delta", type=int, required=True)
    pi.add_argument("--n_deltas", type=int, default=3)

    pf = sub.add_parser("finalize", help="write sorted edges/nodes parquet")
    pf.add_argument("--state", required=True)
    pf.add_argument("--out", required=True)
    pf.add_argument(
        "--analytics",
        action="store_true",
        help="also write the per-entity dashboard (node_metrics parquet)",
    )

    ps = sub.add_parser("status", help="print the state manifest")
    ps.add_argument("--state", required=True)

    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns and args.cmd != "status":
        ray.init(address="local", include_dashboard=False)
    try:
        from ner_pytorch_ray.pipelines import incremental as incr
        from ner_pytorch_ray.state import manifests as mf

        if args.cmd == "status":
            print(json.dumps(incr.read_state(args.state), indent=1))
            return 0
        if args.cmd == "ingest":
            fp = mf.chained_fingerprint(
                mf.input_fingerprint(
                    args.sf_dir, "kg_incremental", args.n_deltas, args.delta
                )
            )
            before = incr.read_state(args.state)["version"]
            ver = incr.ingest_pages_delta(
                incr._delta_pages(args.sf_dir, args.n_deltas, args.delta),
                args.state,
                delta_id=f"delta={args.delta}/{args.n_deltas}",
                fingerprint=fp,
            )
            print(
                f"delta {args.delta}/{args.n_deltas}: "
                + ("ingested" if ver != before else "already ingested")
                + f", state version v{ver}"
            )
            return 0
        # finalize: clear each target first — write_parquet appends new
        # uuid-named fragments and never deletes, so a re-run after more
        # ingests would otherwise mix stale rows with fresh ones
        import os
        import shutil

        def _clean_write(ds, out):
            if os.path.exists(out):
                shutil.rmtree(out)
            ds.write_parquet(out)

        _clean_write(incr.final_edges(args.state), f"{args.out}/edges")
        _clean_write(incr.final_nodes(args.state), f"{args.out}/nodes")
        wrote = [f"{args.out}/edges", f"{args.out}/nodes"]
        if args.analytics:
            _clean_write(
                incr.state_node_metrics(args.state),
                f"{args.out}/node_metrics",
            )
            wrote.append(f"{args.out}/node_metrics")
        print("wrote " + " and ".join(wrote))
        return 0
    finally:
        if owns and args.cmd != "status":
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
