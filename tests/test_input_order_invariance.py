"""Input-file-order invariance for the two frozen-oracle queries the round-3
verdict flagged as determinism risks (VERDICT.md "What's wrong" #2/#3):

- ``tag_embedding_table`` accumulates occurrence vectors in integer
  billionths, so the per-(tag_type, surface) mean must be identical no matter
  how the documents parquet rows are ordered / partitioned.
- ``ivf_topk`` / ``pq_topk`` fit on "the first ``sample`` vec_ids" via a
  vec_id-sorted driver load (`similarity._load_matrix`), so the fitted
  centroids/codebooks — and therefore the results — must be identical when
  the embeddings parquet is row-shuffled on disk.

Each test writes a deterministically SHUFFLED copy of the sf0.001 table into
a temp sf_dir and asserts bit-identical results vs the original directory.
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _shuffled_sf_dir(tmp_path, table_name: str, seed: int = 1234) -> str:
    """Copy sf0.001 into tmp, replacing <table_name>.parquet with a
    row-shuffled (and re-chunked) version."""
    out = tmp_path / "sf_shuffled"
    out.mkdir()
    for f in os.listdir(SF):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(SF, f)
        dst = str(out / f)
        if f == f"{table_name}.parquet":
            t = pq.read_table(src)
            rng = np.random.RandomState(seed)
            perm = rng.permutation(t.num_rows)
            shuffled = t.take(pa.array(perm))
            # split into several row groups so block boundaries move too
            pq.write_table(shuffled, dst, row_group_size=max(1, t.num_rows // 7))
        else:
            shutil.copy(src, dst)
    return str(out)


def _as_sorted_pandas(ds, keys):
    df = ds.to_pandas()
    return df.sort_values(keys).reset_index(drop=True)


def test_tag_embedding_table_row_order_invariant(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.embeddings import tag_embedding_table

    shuf = _shuffled_sf_dir(tmp_path, "documents")
    a = _as_sorted_pandas(tag_embedding_table(SF), ["tag_type", "surface"])
    b = _as_sorted_pandas(tag_embedding_table(shuf), ["tag_type", "surface"])
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    assert (a["tag_type"] == b["tag_type"]).all()
    assert (a["surface"] == b["surface"]).all()
    assert (a["n_occurrences"] == b["n_occurrences"]).all()
    for va, vb in zip(a["embedding"], b["embedding"]):
        assert np.array_equal(np.asarray(va), np.asarray(vb))


def test_ivf_topk_row_order_invariant(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.similarity import ivf_topk

    shuf = _shuffled_sf_dir(tmp_path, "embeddings")
    keys = ["query_id", "rank"]
    a = _as_sorted_pandas(ivf_topk(SF), keys)
    b = _as_sorted_pandas(ivf_topk(shuf), keys)
    assert len(a) == len(b) and len(a) > 0
    for col in a.columns:
        assert a[col].tolist() == b[col].tolist(), col


def test_pq_topk_row_order_invariant(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.similarity import pq_topk

    shuf = _shuffled_sf_dir(tmp_path, "embeddings")
    keys = ["query_id", "rank"]
    a = _as_sorted_pandas(pq_topk(SF), keys)
    b = _as_sorted_pandas(pq_topk(shuf), keys)
    assert len(a) == len(b) and len(a) > 0
    for col in a.columns:
        assert a[col].tolist() == b[col].tolist(), col
