"""Hash-bucketed Parquet layout + co-located join (sources/bucketed.py):
round trip, manifest commit-on-success gating, stale-part overwrite,
empty buckets, join parity vs a local pandas merge."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from ner_pytorch_ray.sources.bucketed import (
    bucket_ids,
    bucketed_join,
    bucketed_write,
    load_manifest,
    read_bucketed,
    splitmix64,
)


def _table(n, offset=0):
    k = np.arange(offset, offset + n, dtype=np.int64)
    return pa.table(
        {
            "k": pa.array(k),
            "v": pa.array([f"row{x}" for x in k], type=pa.string()),
        }
    )


class TestBucketing:
    def test_splitmix64_avalanche(self):
        # consecutive keys spread: no bucket gets more than 3x its share
        b = bucket_ids(pa.array(np.arange(8000, dtype=np.int64)), 16)
        counts = np.bincount(b, minlength=16)
        assert counts.min() > 0 and counts.max() < 3 * 8000 / 16

    def test_bucket_ids_deterministic(self):
        a = bucket_ids(pa.array([1, 2, 3], type=pa.int64()), 8)
        b = bucket_ids(pa.array([1, 2, 3], type=pa.int64()), 8)
        assert list(a) == list(b)

    def test_splitmix64_known_zero(self):
        # splitmix64(0) reference value (public test vector)
        got = splitmix64(np.array([0], dtype=np.uint64))[0]
        assert int(got) == 0xE220A8397B1DCDAF


class TestWriteRead:
    def test_round_trip(self, tmp_path):
        t = _table(500)
        m = bucketed_write(ray.data.from_arrow(t), "k", 8, str(tmp_path / "l"))
        assert m["n_rows"] == 500 and m["n_buckets"] == 8
        back = read_bucketed(str(tmp_path / "l")).take_all()
        assert sorted((r["k"], r["v"]) for r in back) == list(
            zip(t.column("k").to_pylist(), t.column("v").to_pylist())
        )

    def test_rows_land_in_their_hash_bucket(self, tmp_path):
        bucketed_write(
            ray.data.from_arrow(_table(200)), "k", 4, str(tmp_path / "l")
        )
        man = load_manifest(str(tmp_path / "l"))
        for p in man["parts"]:
            part = pq.read_table(
                str(tmp_path / "l" / f"bucket={p['bucket']}" / p["file"])
            )
            got = bucket_ids(part.column("k"), 4)
            assert (got == p["bucket"]).all()

    def test_reader_requires_manifest(self, tmp_path):
        bucketed_write(
            ray.data.from_arrow(_table(50)), "k", 4, str(tmp_path / "l")
        )
        os.remove(tmp_path / "l" / "_MANIFEST.json")
        with pytest.raises(FileNotFoundError, match="_MANIFEST"):
            read_bucketed(str(tmp_path / "l"))

    def test_rerun_clears_stale_parts(self, tmp_path):
        path = str(tmp_path / "l")
        bucketed_write(
            ray.data.from_arrow(_table(400)).repartition(4), "k", 4, path
        )
        bucketed_write(ray.data.from_arrow(_table(10)), "k", 4, path)
        back = read_bucketed(path).take_all()
        assert sorted(r["k"] for r in back) == list(range(10))

    def test_manifest_counts_match_files(self, tmp_path):
        path = str(tmp_path / "l")
        bucketed_write(ray.data.from_arrow(_table(123)), "k", 8, path)
        man = json.load(open(os.path.join(path, "_MANIFEST.json")))
        total = 0
        for p in man["parts"]:
            n = pq.read_table(
                os.path.join(path, f"bucket={p['bucket']}", p["file"])
            ).num_rows
            assert n == p["n_rows"]
            total += n
        assert total == man["n_rows"] == 123


class TestAggregate:
    def test_bucket_local_aggregate_matches_pandas(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import bucketed_aggregate

        rng = np.random.default_rng(7)
        k = rng.integers(0, 20, size=500).astype(np.int64)
        t = pa.table({"g": pa.array(k), "x": pa.array(k * 3 + 1)})
        bucketed_write(
            ray.data.from_arrow(t).repartition(5), "g", 8, str(tmp_path / "l")
        )
        got = sorted(
            (r["g"], r["x"])
            for r in bucketed_aggregate(
                str(tmp_path / "l"), ["g"], ["x"]
            ).take_all()
        )
        exp = sorted(
            t.to_pandas().groupby("g")["x"].sum().items()
        )
        assert got == exp

    def test_aggregate_rejects_wrong_key(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import bucketed_aggregate

        bucketed_write(
            ray.data.from_arrow(_table(10)), "k", 4, str(tmp_path / "l")
        )
        with pytest.raises(ValueError, match="bucketed by"):
            bucketed_aggregate(str(tmp_path / "l"), ["v"], [])


class TestUpsert:
    def _delta(self, keys, vers):
        return pa.table(
            {
                "k": pa.array(np.array(keys, np.int64)),
                "ver": pa.array(np.array(vers, np.int64)),
                "payload": pa.array([f"v{v}" for v in vers]),
            }
        )

    def test_latest_wins_any_delta_order(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import bucketed_upsert

        d1 = self._delta([1, 2, 3], [10, 10, 10])
        d2 = self._delta([2, 3, 4], [20, 5, 20])  # k=3 arrives OLDER
        for order, name in (((d1, d2), "fwd"), ((d2, d1), "rev")):
            base = None
            for j, d in enumerate(order):
                p = str(tmp_path / f"{name}_delta{j}")
                bucketed_write(ray.data.from_arrow(d), "k", 4, p)
                out = str(tmp_path / f"{name}_v{j}")
                bucketed_upsert(base, p, out, ["ver"])
                base = out
            got = sorted(
                (r["k"], r["ver"], r["payload"])
                for r in read_bucketed(base).take_all()
            )
            assert got == [
                (1, 10, "v10"),
                (2, 20, "v20"),
                (3, 10, "v10"),
                (4, 20, "v20"),
            ], name

    def test_upsert_preserves_zone_maps(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import (
            bucketed_upsert,
            read_bucketed_range,
        )

        d = pa.table(
            {
                "k": pa.array(np.arange(100, dtype=np.int64)),
                "ver": pa.array(np.arange(100, dtype=np.int64) * 10),
            }
        )
        p = str(tmp_path / "d")
        bucketed_write(
            ray.data.from_arrow(d), "k", 4, p, stats_cols=["ver"]
        )
        out = str(tmp_path / "v")
        bucketed_upsert(None, p, out, ["ver"])
        assert load_manifest(out)["stats_cols"] == ["ver"]
        got = sorted(
            r["ver"]
            for r in read_bucketed_range(out, "ver", 100, 200).take_all()
        )
        assert got == [100, 110, 120, 130, 140, 150, 160, 170, 180, 190]

    def test_upsert_rejects_mismatched_layouts(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import bucketed_upsert

        bucketed_write(
            ray.data.from_arrow(self._delta([1], [1])),
            "k",
            4,
            str(tmp_path / "a"),
        )
        bucketed_write(
            ray.data.from_arrow(self._delta([1], [1])),
            "k",
            8,
            str(tmp_path / "b"),
        )
        with pytest.raises(ValueError, match="identical bucketing"):
            bucketed_upsert(
                str(tmp_path / "a"),
                str(tmp_path / "b"),
                str(tmp_path / "c"),
                ["ver"],
            )

    def test_version_tiebreak_is_full_tuple(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import bucketed_upsert

        # equal ver -> second order col decides deterministically
        d = pa.table(
            {
                "k": pa.array(np.array([7, 7], np.int64)),
                "ver": pa.array(np.array([5, 5], np.int64)),
                "seq": pa.array(np.array([1, 2], np.int64)),
                "payload": pa.array(["a", "b"]),
            }
        )
        p = str(tmp_path / "d")
        bucketed_write(ray.data.from_arrow(d), "k", 2, p)
        out = str(tmp_path / "v")
        bucketed_upsert(None, p, out, ["ver", "seq"])
        rows = read_bucketed(out).take_all()
        assert len(rows) == 1 and rows[0]["payload"] == "b"


class TestLookup:
    def test_string_keys_and_point_lookup(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import (
            bucketed_lookup,
            key_bucket,
        )

        t = pa.table(
            {
                "name": pa.array([f"ent:{i}" for i in range(300)]),
                "w": pa.array(np.arange(300, dtype=np.int64)),
            }
        )
        path = str(tmp_path / "l")
        bucketed_write(ray.data.from_arrow(t).repartition(5), "name", 8, path)
        got = bucketed_lookup(path, ["ent:7", "ent:200", "ent:absent"])
        rows = sorted(
            zip(got.column("name").to_pylist(), got.column("w").to_pylist())
        )
        assert rows == [("ent:200", 200), ("ent:7", 7)]
        # key_bucket agrees with the write-side assignment
        man = load_manifest(path)
        for p in man["parts"]:
            part = pq.read_table(
                str(tmp_path / "l" / f"bucket={p['bucket']}" / p["file"])
            )
            for name in part.column("name").to_pylist():
                assert key_bucket(name, 8) == p["bucket"]


class TestZoneMaps:
    def _layout(self, tmp_path, shuffled=False):
        n = 4000
        ts = np.arange(n, dtype=np.int64) * 1000  # time-ordered
        if shuffled:
            ts = np.random.default_rng(5).permutation(ts)
        t = pa.table(
            {
                "k": pa.array(np.arange(n, dtype=np.int64) % 97),
                "ts": pa.array(ts),
            }
        )
        path = str(tmp_path / "l")
        bucketed_write(
            ray.data.from_arrow(t).repartition(10),
            "k",
            4,
            path,
            stats_cols=["ts"],
        )
        return path, t

    def test_skips_parts_on_clustered_input(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import (
            prune_parts,
            read_bucketed_range,
        )

        path, t = self._layout(tmp_path)
        lo, hi = 1_000_000, 1_400_000  # 10% of the time range
        kept, total = prune_parts(load_manifest(path), "ts", lo, hi)
        assert total > 10 and len(kept) < total / 2  # real skipping
        got = sorted(
            r["ts"] for r in read_bucketed_range(path, "ts", lo, hi).take_all()
        )
        exp = sorted(
            x for x in t.column("ts").to_pylist() if lo <= x < hi
        )
        assert got == exp

    def test_exact_on_shuffled_input(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import read_bucketed_range

        path, t = self._layout(tmp_path, shuffled=True)
        lo, hi = 1_000_000, 1_400_000
        got = sorted(
            r["ts"] for r in read_bucketed_range(path, "ts", lo, hi).take_all()
        )
        exp = sorted(x for x in t.column("ts").to_pylist() if lo <= x < hi)
        assert got == exp

    def test_empty_window(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import read_bucketed_range

        path, _ = self._layout(tmp_path)
        assert read_bucketed_range(path, "ts", 10**12, 10**13).count() == 0

    def test_requires_stats_col(self, tmp_path):
        from ner_pytorch_ray.sources.bucketed import read_bucketed_range

        bucketed_write(
            ray.data.from_arrow(_table(10)), "k", 4, str(tmp_path / "l")
        )
        with pytest.raises(ValueError, match="zone maps"):
            read_bucketed_range(str(tmp_path / "l"), "k", 0, 5)


class TestJoin:
    def test_join_matches_pandas_merge(self, tmp_path):
        left = _table(100)
        # right: keys 50..149 with an extra payload column, some keys twice
        k = np.concatenate(
            [np.arange(50, 150), np.arange(60, 70)]
        ).astype(np.int64)
        right = pa.table(
            {"rk": pa.array(k), "w": pa.array(k * 2)}
        )
        bucketed_write(ray.data.from_arrow(left), "k", 8, str(tmp_path / "a"))
        bucketed_write(
            ray.data.from_arrow(right), "rk", 8, str(tmp_path / "b")
        )
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in bucketed_join(
                str(tmp_path / "a"), str(tmp_path / "b")
            ).take_all()
        )
        exp = sorted(
            left.to_pandas()
            .merge(right.to_pandas(), left_on="k", right_on="rk")[
                ["k", "v", "w"]
            ]
            .itertuples(index=False, name=None)
        )
        assert got == exp

    def test_join_rejects_mismatched_bucketing(self, tmp_path):
        bucketed_write(
            ray.data.from_arrow(_table(10)), "k", 4, str(tmp_path / "a")
        )
        bucketed_write(
            ray.data.from_arrow(_table(10)), "k", 8, str(tmp_path / "b")
        )
        with pytest.raises(ValueError, match="identical bucketing"):
            bucketed_join(str(tmp_path / "a"), str(tmp_path / "b"))

    def test_join_with_empty_buckets(self, tmp_path):
        # 2 rows into 16 buckets: most buckets empty on both sides
        bucketed_write(
            ray.data.from_arrow(_table(2)), "k", 16, str(tmp_path / "a")
        )
        bucketed_write(
            ray.data.from_arrow(_table(2)), "k", 16, str(tmp_path / "b")
        )
        got = bucketed_join(str(tmp_path / "a"), str(tmp_path / "b"))
        rows = got.take_all()
        assert sorted(r["k"] for r in rows) == [0, 1]
        # shared non-key column name arrives suffixed, values preserved
        assert all(r["v"] == r["v_r"] == f"row{r['k']}" for r in rows)


class TestStoreCli:
    def test_write_lookup_range_upsert_via_cli(self, tmp_path):
        from ner_pytorch_ray.store_cli import main

        src = tmp_path / "src.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(np.arange(100, dtype=np.int64)),
                    "ver": pa.array(np.arange(100, dtype=np.int64)),
                }
            ),
            src,
        )
        assert main([
            "write", "--input", str(src), "--key", "k",
            "--buckets", "4", "--out", str(tmp_path / "l"),
            "--stats", "ver",
        ]) == 0
        assert main([
            "lookup", "--path", str(tmp_path / "l"), "--keys", "7,42",
        ]) == 0
        assert main([
            "range", "--path", str(tmp_path / "l"), "--col", "ver",
            "--lo", "10", "--hi", "20",
        ]) == 0
        assert main([
            "upsert", "--delta", str(tmp_path / "l"),
            "--out", str(tmp_path / "v1"), "--order", "ver",
        ]) == 0
        assert load_manifest(str(tmp_path / "v1"))["n_rows"] == 100
