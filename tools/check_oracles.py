"""Reproduce the driver's correctness gate locally: run every
``__ray_entry__.queries()`` entry against its ``oracle_sql()`` oracle in
DuckDB and compare row count + schema + EXACT values (order-insensitive;
floats compared bit-for-bit — no rounding).

    python tools/check_oracles.py                  # all queries at sf0.01
    python tools/check_oracles.py kg_edges adv_topk
    SF=/root/testdata/sf0.001 python tools/check_oracles.py   # note:
        expected-parquet oracles are frozen at sf0.01 and only compare there

Exit code 0 iff every query passes.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=16,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import duckdb
    import pandas as pd

    sf = os.environ.get("SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    n_pass = 0
    failed: list[str] = []

    def value_hash(df: pd.DataFrame, cols: list[str]) -> str:
        d = df[cols].copy()
        for c in d.columns:
            if d[c].dtype == object:
                d[c] = d[c].astype(str)
        d = d.sort_values(cols).reset_index(drop=True)
        return hashlib.md5(
            pd.util.hash_pandas_object(d, index=False).values.tobytes()
        ).hexdigest()

    for name in names:
        try:
            res = qs[name](sf)
            got = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            want = con.execute(sqls[name]).df()
            cols_g, cols_w = sorted(got.columns), sorted(want.columns)
            ok = (
                cols_g == cols_w
                and len(got) == len(want)
                and value_hash(got, cols_g) == value_hash(want, cols_w)
            )
        except Exception as ex:  # pragma: no cover - reporting path
            print(f"{name:24s} ERROR {str(ex)[:160]}")
            failed.append(name)
            continue
        print(
            f"{name:24s} {'PASS' if ok else 'FAIL'} "
            f"rows={len(got)}/{len(want)}"
        )
        if ok:
            n_pass += 1
        else:
            failed.append(name)
    print(f"\n{n_pass}/{len(names)} pass (exact float comparison)")
    if owns:
        ray.shutdown()
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
