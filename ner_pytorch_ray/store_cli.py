"""Bucketed-store runner — the ``ray job submit`` entrypoint for
sources/bucketed.py (the lakehouse-style storage layer).

    # land a parquet table hash-bucketed by a key (pay the exchange once)
    python -m ner_pytorch_ray.store_cli write --input orders.parquet \
        --key o_custkey --buckets 32 --out /data/orders_by_cust \
        --stats o_orderdate

    # shuffle-free co-located equi-join of two co-bucketed layouts
    python -m ner_pytorch_ray.store_cli join --left /data/cust \
        --right /data/orders_by_cust --out joined.parquet

    # CDC upsert: fold a delta layout into a base (latest version wins)
    python -m ner_pytorch_ray.store_cli upsert --base /data/t_v1 \
        --delta /data/delta0 --out /data/t_v2 --order ts_us,event_id

    # point lookups / zone-map range reads (serving side)
    python -m ner_pytorch_ray.store_cli lookup --path /data/orders_by_cust \
        --keys 17,42
    python -m ner_pytorch_ray.store_cli range --path /data/orders_by_cust \
        --col o_date_us --lo 1704672000000000 --hi 1705017600000000

Every command prints one JSON status line; layouts carry commit-on-success
manifests, so a crashed ``write`` leaves no manifest and readers refuse it.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Bucketed parquet store")
    sub = p.add_subparsers(dest="cmd", required=True)

    pw = sub.add_parser("write", help="land a table hash-bucketed by key")
    pw.add_argument("--input", required=True, help="parquet file/dir")
    pw.add_argument("--key", required=True)
    pw.add_argument("--buckets", type=int, default=32)
    pw.add_argument("--out", required=True)
    pw.add_argument(
        "--stats", default="", help="comma list of zone-map columns"
    )

    pj = sub.add_parser("join", help="co-located equi-join of two layouts")
    pj.add_argument("--left", required=True)
    pj.add_argument("--right", required=True)
    pj.add_argument("--out", required=True, help="output parquet dir")

    pu = sub.add_parser("upsert", help="fold a delta layout into a base")
    pu.add_argument("--base", default=None)
    pu.add_argument("--delta", required=True)
    pu.add_argument("--out", required=True)
    pu.add_argument(
        "--order", required=True, help="comma list of version columns"
    )

    pl = sub.add_parser("lookup", help="point lookups by key")
    pl.add_argument("--path", required=True)
    pl.add_argument("--keys", required=True, help="comma list")
    pl.add_argument("--string-keys", action="store_true")

    pr = sub.add_parser("range", help="zone-map range read")
    pr.add_argument("--path", required=True)
    pr.add_argument("--col", required=True)
    pr.add_argument("--lo", type=int, required=True)
    pr.add_argument("--hi", type=int, required=True)
    pr.add_argument("--out", default=None)

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():  # driver may own the session already
        ray.init(address="local", include_dashboard=False)
    import ray.data

    from ner_pytorch_ray.sources import bucketed as b

    if args.cmd == "write":
        ds = ray.data.read_parquet(args.input)
        man = b.bucketed_write(
            ds,
            args.key,
            args.buckets,
            args.out,
            stats_cols=[c for c in args.stats.split(",") if c],
        )
        print(json.dumps({"cmd": "write", "n_rows": man["n_rows"],
                          "n_buckets": man["n_buckets"], "out": args.out}))
    elif args.cmd == "join":
        out = b.bucketed_join(args.left, args.right)
        out.write_parquet(args.out)
        print(json.dumps({"cmd": "join", "out": args.out}))
    elif args.cmd == "upsert":
        man = b.bucketed_upsert(
            args.base, args.delta, args.out, args.order.split(",")
        )
        print(json.dumps({"cmd": "upsert", "n_rows": man["n_rows"],
                          "out": args.out}))
    elif args.cmd == "lookup":
        keys = (
            args.keys.split(",")
            if args.string_keys
            else [int(k) for k in args.keys.split(",")]
        )
        t = b.bucketed_lookup(args.path, keys)
        print(json.dumps({"cmd": "lookup", "n_rows": t.num_rows}))
        for row in t.to_pylist():
            print(json.dumps(row, default=str))
    elif args.cmd == "range":
        ds = b.read_bucketed_range(args.path, args.col, args.lo, args.hi)
        if args.out:
            ds.write_parquet(args.out)
            print(json.dumps({"cmd": "range", "out": args.out}))
        else:
            print(json.dumps({"cmd": "range", "n_rows": ds.count()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
