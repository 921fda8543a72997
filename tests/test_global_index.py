"""add_global_index / distributed vocab ranking (VERDICT.md round-3 #4):
create_mapping's contiguous ids (reference utils.py:59-67) assigned without
collecting the vocabulary to the driver."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_add_global_index_matches_sorted_order(ray_session):
    import ray
    from ner_pytorch_ray.stages.groupby_utils import add_global_index

    rng = np.random.RandomState(5)
    vals = rng.permutation(1000)
    ds = (
        ray.data.from_arrow(
            pa.Table.from_pydict({"v": pa.array(vals, type=pa.int64())})
        )
        .repartition(13)
        .sort("v")
    )
    out = add_global_index(ds, col="rank").to_pandas().sort_values("rank")
    # global order preserved block-by-block: rank i holds value i
    assert out["v"].tolist() == list(range(1000))
    assert out["rank"].tolist() == list(range(1000))


def test_vocab_mapping_table_is_distributed_and_ranked(ray_session):
    import ray
    from ner_pytorch_ray.pipelines.analysis import (
        vocab_count,
        vocab_mapping,
        vocab_mapping_table,
    )

    t = vocab_mapping_table(SF)
    # the ranking must come back as a lazy/streamable Dataset, not a
    # driver-side table — the whole point of the distributed rank
    assert isinstance(t, ray.data.Dataset)
    df = t.to_pandas().sort_values("word_id").reset_index(drop=True)
    vc = vocab_count(SF).to_pandas()
    assert df["token"].tolist() == vc["token"].tolist()
    assert df["word_id"].tolist() == list(range(len(df)))
    # the dict convenience agrees
    assert vocab_mapping(SF) == dict(zip(df["token"], df["word_id"]))


def test_add_exclusive_prefix_max_across_blocks(ray_session):
    """Exclusive prefix max equals the sequential scan on an ordered
    table regardless of block count, including negative values and the
    leading start sentinel."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ner_pytorch_ray.stages.groupby_utils import add_exclusive_prefix_max

    rng = np.random.RandomState(29)
    v = rng.randint(-50, 50, size=200).astype(np.int64)
    t = pa.table(
        {
            "i": pa.array(np.arange(200, dtype=np.int64)),
            "v": pa.array(v),
        }
    )
    exp = np.empty(200, dtype=np.int64)
    acc = -(2**62)
    for i, x in enumerate(v):
        exp[i] = acc
        acc = max(acc, int(x))
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks).sort("i")
        out = (
            add_exclusive_prefix_max(ds, "v", "pm")
            .to_pandas()
            .sort_values("i")
        )
        assert (out["pm"].to_numpy() == exp).all()
