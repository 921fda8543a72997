"""End-to-end corpus curation job (pipelines/curate.py): decisions match
the standalone operators, crash-resume equals a clean run, and the CLI
round-trips."""

import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _decisions(path):
    import pyarrow.parquet as pq

    df = pq.read_table(path).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_curate_decisions_match_operators(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.curate import run_curate
    from ner_pytorch_ray.pipelines.webtext import corpus_filter, near_dup_clusters

    info = run_curate(SF, str(tmp_path / "run"), n_shards=4)
    dec = _decisions(info["decisions_dir"])

    q = {r["doc_id"]: r["kept"] for r in corpus_filter(SF).take_all()}
    d = {r["doc_id"]: r["kept"] for r in near_dup_clusters(SF).take_all()}
    assert len(dec) == len(q) == len(d)
    for row in dec.itertuples():
        assert row.quality_kept == q[row.doc_id]
        assert row.dup_kept == d[row.doc_id]
        assert row.kept == (q[row.doc_id] & d[row.doc_id])

    assert info["n_docs"] == len(dec)
    assert info["n_kept"] == int(dec.kept.sum())
    assert info["n_dup_dropped"] == int(
        ((dec.quality_kept == 1) & (dec.dup_kept == 0)).sum()
    )
    assert info["n_dup_dropped"] > 0  # testdata plants near-dups
    assert "ok" not in info["drop_reasons"]
    assert sum(info["drop_reasons"].values()) == info["n_docs"] - int(
        dec.quality_kept.sum()
    )
    # manifest counters agree with the decisions table
    assert info["counters"]["n_docs"] == info["n_docs"]
    assert info["counters"]["n_quality_kept"] == int(dec.quality_kept.sum())


def test_curate_crash_resume_equals_clean(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.curate import run_curate

    clean = run_curate(SF, str(tmp_path / "clean"), n_shards=4)

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected"):
        run_curate(SF, crash_dir, n_shards=4, fail_on_shard=2)
    assert os.path.exists(
        os.path.join(crash_dir, "_manifests", "signals", "shard=0.json")
    )
    assert not os.path.exists(
        os.path.join(crash_dir, "_manifests", "signals", "shard=2.json")
    )

    resumed = run_curate(SF, crash_dir, n_shards=4)
    assert resumed["skipped_shards"] == 2 and resumed["ran_shards"] == 2
    pd.testing.assert_frame_equal(
        _decisions(clean["decisions_dir"]), _decisions(resumed["decisions_dir"])
    )


def test_curate_rejects_stale_shard_dirs(ray_session, tmp_path):
    """Re-running with a smaller n_shards must fail loudly: orphan
    shard=K dirs outside 0..n-1 are never fingerprint-validated and would
    otherwise be silently merged in (double-counting every doc)."""
    from ner_pytorch_ray.pipelines.curate import run_curate

    out = str(tmp_path / "run")
    run_curate(SF, out, n_shards=4)
    with pytest.raises(RuntimeError, match="shard dirs.*outside"):
        run_curate(SF, out, n_shards=2)


def test_sentence_dedup_packed_key_guard(ray_session, tmp_path):
    """A doc with >= 2^20 sentences must raise, not mis-credit winners."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from ner_pytorch_ray.pipelines.webtext import sentence_dedup

    huge = " ".join(["w"] * (12 * (1 << 20)))
    pq2.write_table(
        pa.Table.from_pydict(
            {"doc_id": pa.array([0], type=pa.int64()), "text": pa.array([huge])}
        ),
        tmp_path / "documents.parquet",
    )
    with pytest.raises(Exception, match="2\\^20|packed key"):
        sentence_dedup(str(tmp_path)).take_all()


def test_curate_cli(ray_session, tmp_path, capsys):
    from ner_pytorch_ray.curate_cli import main

    out = str(tmp_path / "cli")
    assert main(["--sf_dir", SF, "--out", out, "--n_shards", "2"]) == 0
    assert "kept" in capsys.readouterr().out
    # second run: everything resumes
    assert main(["--sf_dir", SF, "--out", out, "--n_shards", "2", "--resume-only"]) == 0
    assert main(["--sf_dir", SF, "--out", out, "--n_shards", "2"]) == 0
    assert "skipped 2" in capsys.readouterr().out
