"""DSIR importance resampling (pipelines/dsir.py) vs the sequential
hashed-bigram oracle, plus partitioning invariance and the target-lift
property."""

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_matches_sequential_recompute(ray_session):
    from tools.make_expected import dsir_expected

    from ner_pytorch_ray.pipelines.dsir import dsir_select

    got = dsir_select(SF, k=50).to_pandas()
    exp = dsir_expected(SF, k=50).to_pandas()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_partitioning_invariance(ray_session):
    import pyarrow.parquet as pq

    import ray.data

    from ner_pytorch_ray.pipelines import dsir as d

    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    # score weights block-locally at two partitionings: the histograms
    # and per-doc integer sums must be identical
    import numpy as np

    def hist(ds):
        import pyarrow as pa

        from ner_pytorch_ray.stages.groupby_utils import grouped_sum

        import pyarrow.compute as pc

        def tag(b):
            return b.append_column(
                "is_target", pc.equal(b.column("lang"), pa.scalar("en"))
            )

        rows = grouped_sum(
            ds.map_batches(tag, batch_format="pyarrow").map_batches(
                d._hist_partials("is_target", 512),
                batch_format="pyarrow",
            ),
            keys=["bucket"],
            sum_cols=["t_cnt", "r_cnt"],
        ).take_all()
        out = np.zeros((512, 2), dtype=np.int64)
        for r in rows:
            out[r["bucket"]] = (r["t_cnt"], r["r_cnt"])
        return out

    a = hist(ray.data.from_arrow(t).repartition(1))
    b = hist(ray.data.from_arrow(t).repartition(11))
    assert (a == b).all()


def test_target_language_ranks_higher(ray_session):
    import pyarrow.parquet as pq

    from ner_pytorch_ray.pipelines.dsir import dsir_select

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    lang = dict(
        zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist())
    )
    n = t.num_rows
    top = [r["doc_id"] for r in dsir_select(SF, k=n // 4).take_all()]
    frac_top = sum(lang[d] == "en" for d in top) / len(top)
    frac_all = sum(v == "en" for v in lang.values()) / n
    assert frac_top >= frac_all
