"""Kill-and-resume for the sharded multi-stage adversarial runner
(VERDICT r2 #9): crash mid-second-stage, resume, and the final output is
row-identical to an uninterrupted run, with finished shards skipped."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _final_df(info) -> pd.DataFrame:
    import ray.data

    df = ray.data.read_parquet(info["final_dir"]).to_pandas()
    cols = sorted(df.columns)
    import numpy as np

    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_kill_and_resume_two_stage_order(ray_session, tmp_path):
    from ner_pytorch_ray.pipelines.adv_resumable import run_resumable_adv

    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    clean = run_resumable_adv(SF, clean_dir, order="rep,ppdb", n_shards=3)
    assert clean["ran"]["00_base"] == 3 and clean["ran"]["02_ppdb"] == 3

    # crash in the middle of the second stage
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable_adv(
            SF, crash_dir, order="rep,ppdb", n_shards=3, fail_at=("ppdb", 1)
        )

    resumed = run_resumable_adv(SF, crash_dir, order="rep,ppdb", n_shards=3)
    # everything that finished before the crash is skipped on resume
    assert resumed["skipped"]["00_base"] == 3
    assert resumed["skipped"]["01_rep"] == 3
    assert resumed["ran"]["02_ppdb"] >= 1  # at least the killed shard reran
    assert resumed["skipped"]["02_ppdb"] + resumed["ran"]["02_ppdb"] == 3

    pd.testing.assert_frame_equal(_final_df(resumed), _final_df(clean))

    # a third run is a full no-op
    again = run_resumable_adv(SF, crash_dir, order="rep,ppdb", n_shards=3)
    assert sum(again["ran"].values()) == 0


def test_upstream_invalidation_cascades(ray_session, tmp_path):
    """Deleting an upstream shard manifest invalidates its dependents
    (chained fingerprints), but only for that shard."""
    import os

    from ner_pytorch_ray.pipelines.adv_resumable import run_resumable_adv
    from ner_pytorch_ray.state import manifests as mf

    out = str(tmp_path / "run")
    first = run_resumable_adv(SF, out, order="ppdb", n_shards=3)
    assert sum(first["ran"].values()) == 6

    os.remove(mf.manifest_path(out, "00_base", 2))
    second = run_resumable_adv(SF, out, order="ppdb", n_shards=3)
    assert second["ran"]["00_base"] == 1
    # base shard 2 got a fresh (identical) fingerprint only if inputs are
    # unchanged -> dependents stay valid; the run must not redo shards 0/1
    assert second["skipped"]["00_base"] == 2
    assert second["skipped"]["01_ppdb"] == 3
