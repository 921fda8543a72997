"""Distributed offset windows (groupby_utils.grouped_shift): LAG/LEAD
OVER (PARTITION BY ... ORDER BY ...) via global sort + per-block shift
patched at block edges — groups deliberately larger than a block so the
boundary cells must come from neighbor-block summaries."""

import pyarrow as pa

import ray.data


def _ref_shift(rows):
    # rows: (grp, ord, val); per grp sorted by (ord, val): prev/next val
    by = {}
    for g, o, v in rows:
        by.setdefault(g, []).append((o, v))
    out = {}
    for g, items in by.items():
        items.sort()
        for i, (o, v) in enumerate(items):
            prev = items[i - 1][1] if i > 0 else None
            nxt = items[i + 1][1] if i < len(items) - 1 else None
            out[(g, v)] = (prev, nxt)
    return out


class TestGroupedShift:
    def _ds(self, rows, blocks):
        return ray.data.from_arrow(
            pa.table(
                {
                    "grp": pa.array([r[0] for r in rows], type=pa.string()),
                    "ord": pa.array([r[1] for r in rows], type=pa.int64()),
                    "val": pa.array([r[2] for r in rows], type=pa.int64()),
                }
            )
        ).repartition(blocks)

    def _run(self, rows, blocks):
        from ner_pytorch_ray.stages.groupby_utils import grouped_shift

        got = grouped_shift(
            self._ds(rows, blocks),
            part_keys=["grp"],
            order_keys=["ord", "val"],
            descending=[False, False],
            value_cols=["val"],
        ).take_all()
        return {(r["grp"], r["val"]): (r["val_lag"], r["val_lead"]) for r in got}

    def test_groups_span_blocks(self):
        # 3 groups x 200 rows over 16 blocks: most block edges fall
        # inside a group, so lag/lead cells cross blocks
        rows = [
            (f"g{g}", (u * 7919) % 997, g * 1000 + u)
            for g in range(3)
            for u in range(200)
        ]
        assert self._run(rows, 16) == _ref_shift(rows)

    def test_partitioning_invariance(self):
        rows = [(f"g{u % 7}", (u * 31) % 53, u) for u in range(120)]
        ref = _ref_shift(rows)
        assert self._run(rows, 1) == ref
        assert self._run(rows, 13) == ref

    def test_single_row_groups_all_null(self):
        rows = [(f"g{u}", u, u) for u in range(40)]
        got = self._run(rows, 8)
        assert got == {(f"g{u}", u): (None, None) for u in range(40)}

    def test_preserves_timestamp_type(self, ray_session):
        import datetime

        from ner_pytorch_ray.stages.groupby_utils import grouped_shift

        ts = [
            datetime.datetime(2020, 1, 1) + datetime.timedelta(seconds=i)
            for i in range(10)
        ]
        t = pa.table(
            {
                "grp": pa.array(["a"] * 10),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "uid": pa.array(list(range(10)), type=pa.int64()),
            }
        )
        out = grouped_shift(
            ray.data.from_arrow(t).repartition(4),
            part_keys=["grp"],
            order_keys=["ts", "uid"],
            descending=[False, False],
            value_cols=["ts"],
        )
        sch = out.schema().base_schema
        assert sch.field("ts_lag").type == pa.timestamp("us")
        rows = sorted(out.take_all(), key=lambda r: r["uid"])
        assert rows[0]["ts_lag"] is None and rows[0]["ts_lead"] == ts[1]
        assert rows[-1]["ts_lead"] is None and rows[-1]["ts_lag"] == ts[8]
