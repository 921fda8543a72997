"""Distributed window-function rank (groupby_utils.grouped_rank):
row_number() OVER (PARTITION BY ... ORDER BY ...) via global sort +
per-block carry chain — groups deliberately larger than a block so ranks
must flow across block boundaries."""

import pyarrow as pa

import ray.data


def _ref_rank(rows, desc):
    # rows: (grp, val, uid); rank within grp by (val desc?, uid asc)
    out = {}
    by = {}
    for g, v, u in rows:
        by.setdefault(g, []).append((v, u))
    for g, items in by.items():
        items.sort(key=lambda t: ((-t[0] if desc else t[0]), t[1]))
        for i, (v, u) in enumerate(items):
            out[(g, u)] = i + 1
    return out


class TestGroupedRank:
    def _ds(self, rows, blocks):
        return ray.data.from_arrow(
            pa.table(
                {
                    "grp": pa.array([r[0] for r in rows], type=pa.string()),
                    "val": pa.array([r[1] for r in rows], type=pa.int64()),
                    "uid": pa.array([r[2] for r in rows], type=pa.int64()),
                }
            )
        ).repartition(blocks)

    def test_groups_span_blocks(self):
        from ner_pytorch_ray.stages.groupby_utils import grouped_rank

        # 3 groups x 200 rows across 16 blocks: every group spans many
        # sorted blocks, so the driver carry chain does the work
        rows = [
            (f"g{g}", (u * 7919) % 101, g * 1000 + u)
            for g in range(3)
            for u in range(200)
        ]
        got = {
            (r["grp"], r["uid"]): r["rank"]
            for r in grouped_rank(
                self._ds(rows, 16),
                part_keys=["grp"],
                order_keys=["val", "uid"],
                descending=[True, False],
            ).take_all()
        }
        assert got == _ref_rank(rows, desc=True)

    def test_single_row_groups_and_ascending(self):
        from ner_pytorch_ray.stages.groupby_utils import grouped_rank

        rows = [(f"g{u}", u % 5, u) for u in range(50)]
        got = {
            (r["grp"], r["uid"]): r["rank"]
            for r in grouped_rank(
                self._ds(rows, 8),
                part_keys=["grp"],
                order_keys=["val", "uid"],
                descending=[False, False],
            ).take_all()
        }
        assert got == _ref_rank(rows, desc=False)
        assert set(got.values()) == {1}  # all groups singleton

    def test_block_count_invariance(self):
        from ner_pytorch_ray.stages.groupby_utils import grouped_rank

        rows = [("a", (u * 13) % 17, u) for u in range(120)] + [
            ("b", (u * 5) % 7, 1000 + u) for u in range(60)
        ]
        outs = []
        for blocks in (1, 4, 32):
            got = {
                (r["grp"], r["uid"]): r["rank"]
                for r in grouped_rank(
                    self._ds(rows, blocks),
                    part_keys=["grp"],
                    order_keys=["val", "uid"],
                    descending=[True, False],
                ).take_all()
            }
            outs.append(got)
        assert outs[0] == outs[1] == outs[2] == _ref_rank(rows, desc=True)


def _ref_running(rows):
    # rows: (grp, ordv, uid, val) -> running sum by (ordv, uid) per grp
    out = {}
    by = {}
    for g, o, u, v in rows:
        by.setdefault(g, []).append((o, u, v))
    for g, items in by.items():
        items.sort()
        acc = 0
        for o, u, v in items:
            acc += v
            out[(g, u)] = acc
    return out


class TestGroupedRunningSum:
    def _ds(self, rows, blocks):
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "grp": pa.array([r[0] for r in rows], type=pa.string()),
                    "ordv": pa.array([r[1] for r in rows], type=pa.int64()),
                    "uid": pa.array([r[2] for r in rows], type=pa.int64()),
                    "val": pa.array([r[3] for r in rows], type=pa.int64()),
                }
            )
        ).repartition(blocks)

    def test_groups_span_blocks_with_negatives(self):
        from ner_pytorch_ray.stages.groupby_utils import grouped_running_sum

        # negative values make the cumsum non-monotone — the segmented
        # base propagation must be index-based, not max-based
        rows = [
            (f"g{g}", (u * 31) % 97, g * 1000 + u, ((u * 7) % 11) - 5)
            for g in range(3)
            for u in range(150)
        ]
        got = {
            (r["grp"], r["uid"]): r["running_sum"]
            for r in grouped_running_sum(
                self._ds(rows, 16),
                part_keys=["grp"],
                order_keys=["ordv", "uid"],
                descending=[False, False],
                value_col="val",
            ).take_all()
        }
        assert got == _ref_running(rows)

    def test_block_count_invariance(self):
        from ner_pytorch_ray.stages.groupby_utils import grouped_running_sum

        rows = [("a", (u * 13) % 29, u, u % 7) for u in range(120)] + [
            ("b", u % 5, 1000 + u, -u % 3) for u in range(60)
        ]
        outs = []
        for blocks in (1, 4, 32):
            got = {
                (r["grp"], r["uid"]): r["running_sum"]
                for r in grouped_running_sum(
                    self._ds(rows, blocks),
                    part_keys=["grp"],
                    order_keys=["ordv", "uid"],
                    descending=[False, False],
                    value_col="val",
                ).take_all()
            }
            outs.append(got)
        assert outs[0] == outs[1] == outs[2] == _ref_running(rows)
