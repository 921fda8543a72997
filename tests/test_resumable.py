"""Checkpoint/resume: crash mid-run, resume, outputs identical to a clean run."""

import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _read_sorted(path):
    import pyarrow.parquet as pq

    df = pq.read_table(path).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_crash_resume_equals_clean_run(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.resumable import run_resumable_kg

    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    info = run_resumable_kg(SF, clean_dir, n_shards=4)
    assert info["ran_shards"] == 4 and info["skipped_shards"] == 0
    assert info["counters"]["n_mentions"] > 0

    # crash on shard 2: shards 0,1 complete, 2+ don't
    with pytest.raises(RuntimeError, match="injected"):
        run_resumable_kg(SF, crash_dir, n_shards=4, fail_on_shard=2)
    assert os.path.exists(
        os.path.join(crash_dir, "_manifests", "mentions", "shard=0.json")
    )
    assert not os.path.exists(
        os.path.join(crash_dir, "_manifests", "mentions", "shard=2.json")
    )

    # resume: only pending shards run
    info2 = run_resumable_kg(SF, crash_dir, n_shards=4)
    assert info2["skipped_shards"] == 2
    assert info2["ran_shards"] == 2

    pd.testing.assert_frame_equal(
        _read_sorted(os.path.join(clean_dir, "edges")),
        _read_sorted(os.path.join(crash_dir, "edges")),
    )
    pd.testing.assert_frame_equal(
        _read_sorted(os.path.join(clean_dir, "nodes")),
        _read_sorted(os.path.join(crash_dir, "nodes")),
    )
    # counters merged across shards equal clean-run counters
    assert info2["counters"] == info["counters"]


def test_resume_noop_when_complete(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.resumable import run_resumable_kg

    out = str(tmp_path / "out")
    run_resumable_kg(SF, out, n_shards=2)
    info = run_resumable_kg(SF, out, n_shards=2)
    assert info["ran_shards"] == 0 and info["skipped_shards"] == 2


def test_kg_cli_run_and_resume(ray_session, tmp_path, capsys):
    """The job-submit entrypoint: full run, then a resume that skips every
    shard and reproduces identical edges."""
    import pyarrow.parquet as pq

    from ner_pytorch_ray.kg_cli import main

    out = str(tmp_path / "kg")
    assert main(["--sf_dir", SF, "--out", out, "--n_shards", "4"]) == 0
    first = capsys.readouterr().out
    assert "ran 4 shards, skipped 0" in first
    edges1 = pq.read_table(out + "/edges").to_pydict()

    assert main(["--sf_dir", SF, "--out", out, "--n_shards", "4"]) == 0
    second = capsys.readouterr().out
    assert "ran 0 shards, skipped 4" in second
    edges2 = pq.read_table(out + "/edges").to_pydict()
    assert edges1 == edges2

    # --resume-only on a complete run succeeds; on a fresh dir it fails
    assert main(["--sf_dir", SF, "--out", out, "--n_shards", "4",
                 "--resume-only"]) == 0
    assert main(["--sf_dir", SF, "--out", str(tmp_path / "empty"),
                 "--n_shards", "4", "--resume-only"]) == 1
