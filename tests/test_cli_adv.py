"""gen_adv_cli: the reference's --order UX over the engine — staged runs,
per-stage saves, --preprocess_set resume short-circuit, --filter."""

import pytest

SF = "/root/testdata/sf0.001"


def _keyed(ds):
    return {
        (r["url"], r["sent_id"], r["variant_id"]): (r["tokens"], r["tags"])
        for r in ds.take_all()
    }


def test_two_stage_resume_equals_one_shot(ray_session, tmp_path):
    from ner_pytorch_ray.gen_adv_cli import run_pipeline

    one_shot, counts = run_pipeline(
        SF, order="rep,ppdb", n=2, save_dir=str(tmp_path), name="a",
        verbose=False,
    )
    assert counts["rep"] > 0 and counts["rep_ppdb"] > 0
    # resume: reload the saved rep stage via --preprocess_set, recompute ppdb
    resumed, counts2 = run_pipeline(
        SF, order="rep,ppdb", n=2, save_dir=str(tmp_path), name="b",
        preprocess_set="a_rep_", verbose=False,
    )
    assert _keyed(one_shot) == _keyed(resumed)
    assert counts2["rep_ppdb"] == counts["rep_ppdb"]


def test_filter_caps_variants_per_sentence(ray_session):
    from ner_pytorch_ray.gen_adv_cli import run_pipeline

    out, _ = run_pipeline(
        SF, order="rep", n=2, filter_ppl=True, gen_pool=5, verbose=False
    )
    per_sent = {}
    for r in out.take_all():
        per_sent[(r["url"], r["sent_id"])] = (
            per_sent.get((r["url"], r["sent_id"]), 0) + 1
        )
    assert per_sent and max(per_sent.values()) <= 2


def test_rep_with_variants_differ(ray_session):
    from ner_pytorch_ray.gen_adv_cli import run_pipeline

    close, _ = run_pipeline(SF, order="rep", n=2, rep_with="closest", verbose=False)
    far, _ = run_pipeline(SF, order="rep", n=2, rep_with="farthest", verbose=False)
    assert _keyed(close) != _keyed(far)


def test_cli_main_smoke(ray_session, capsys):
    from ner_pytorch_ray.gen_adv_cli import main

    rc = main(["--sf_dir", SF, "--order", "orun", "--n", "1"])
    assert rc == 0
    assert "orun:" in capsys.readouterr().out


def test_cli_sharded_resume_mode(ray_session, tmp_path, capsys):
    """gen_adv_cli --shards runs the partition-manifested pipeline and a
    rerun skips every shard."""
    from ner_pytorch_ray.gen_adv_cli import main

    out = str(tmp_path / "sharded")
    rc = main(
        [
            "--sf_dir", "/root/testdata/sf0.001",
            "--order", "ppdb",
            "--shards", "2",
            "--save_dir", out,
        ]
    )
    assert rc == 0
    first = capsys.readouterr().out
    assert "00_base: ran 2 shards, skipped 0" in first
    rc = main(
        [
            "--sf_dir", "/root/testdata/sf0.001",
            "--order", "ppdb",
            "--shards", "2",
            "--save_dir", out,
        ]
    )
    assert rc == 0
    second = capsys.readouterr().out
    assert "00_base: ran 0 shards, skipped 2" in second
    assert "01_ppdb: ran 0 shards, skipped 2" in second
