"""Shard-resumable multi-stage adversarial generation (VERDICT r2 #9).

The reference resumes the adversarial pipeline at STAGE granularity
(``--preprocess_set`` pickle reload, gen_adv_pipline.py:263-270); the
engine's ``materialize_stage`` mirrors that. This module adds the
PARTITION-granular layer the 100 TB story needs, reusing the KG job's
manifest machinery (pipelines/resumable.py / state/manifests.py):

  * the input shards deterministically (doc_id % n_shards; at real scale a
    shard is a file range);
  * stage 0 materializes the gazetteer-tagged base sentences per shard;
  * every ``--order`` stage runs shard-by-shard over the previous stage's
    shard output, writes ``out/<NN_stage>/shard=K/`` and only then its
    manifest row;
  * manifests carry CHAINED fingerprints (stage definition + upstream
    shard fingerprint + source file fingerprint), so re-running an
    upstream shard transitively invalidates its dependents, while a crash
    anywhere resumes with only the unfinished shards recomputed.

Corpus-level stage state (the 'rep' word bank, the 'ppl' unigram LM) is
built from the fully-materialized base stage / source corpus — identical
state regardless of which shards re-ran, so resumed outputs are
bit-identical to a single-shot run (tested: kill mid-stage, resume,
compare row-level equality against an uninterrupted run).
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

import ray.data

from ner_pytorch_ray.state import manifests as mf

BASE_STAGE = "00_base"


def _stage_names(order: str) -> list[str]:
    return [
        f"{i:02d}_{s.strip()}"
        for i, s in enumerate(order.split(","), start=1)
    ]


def _write_shard(ds: ray.data.Dataset, out_dir: str, stage: str, shard: int) -> int:
    dest = mf.shard_dir(out_dir, stage, shard)
    if os.path.exists(dest):
        shutil.rmtree(dest)  # partial output from a crashed attempt
    ds.write_parquet(dest)
    return sum(
        pq.read_metadata(os.path.join(dest, f)).num_rows
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )


def _base_fingerprint(sf_dir: str, n_shards: int, shard: int) -> str:
    return mf.input_fingerprint(sf_dir, BASE_STAGE, n_shards, shard)


def run_resumable_adv(
    sf_dir: str,
    out_dir: str,
    order: str = "rep,ppdb",
    n_shards: int = 4,
    n_variants: int = 3,
    method: str = "closest",
    fail_at: tuple[str, int] | None = None,
) -> dict:
    """Run (or resume) the sharded adversarial pipeline.

    ``fail_at=(stage_name, shard)`` injects a crash for resume tests
    (stage_name is the bare method, e.g. "ppdb", or "base")."""
    from ner_pytorch_ray.pipelines.adversarial import (
        build_word_bank,
        ppdb_orun_stage,
        ppdb_stage,
        ppl_filter,
        rep_stage,
        unigram_counts,
    )
    from ner_pytorch_ray.pipelines.resumable import _shard_pages
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage
    from ner_pytorch_ray.stages.extract import extract_stage

    ran: dict[str, int] = {}
    skipped: dict[str, int] = {}

    # ---------------------------------------------------------- stage 0
    base_fps: dict[int, str] = {}
    ran[BASE_STAGE] = skipped[BASE_STAGE] = 0
    for shard in range(n_shards):
        fp = _base_fingerprint(sf_dir, n_shards, shard)
        base_fps[shard] = fp
        if mf.shard_is_done(out_dir, BASE_STAGE, shard, fp):
            skipped[BASE_STAGE] += 1
            continue
        if fail_at == ("base", shard):
            raise RuntimeError(f"injected failure at base shard {shard}")
        tagged = gazetteer_tag_stage(
            sentences_stage(
                extract_stage(_shard_pages(sf_dir, n_shards, shard)),
                zeros=True,
            )
        )
        n_rows = _write_shard(tagged, out_dir, BASE_STAGE, shard)
        mf.write_manifest(out_dir, BASE_STAGE, shard, fp, {"n_rows": n_rows})
        ran[BASE_STAGE] += 1

    # corpus-level stage state from the complete base materialization:
    # identical regardless of which shards just re-ran
    bank = None
    counts = None

    prev_stage = BASE_STAGE
    prev_fps = base_fps
    for stage_full in _stage_names(order):
        stage = stage_full.split("_", 1)[1]
        ran[stage_full] = skipped[stage_full] = 0
        fps: dict[int, str] = {}
        for shard in range(n_shards):
            fp = mf.chained_fingerprint(
                f"{stage_full}:{n_variants}:{method}:{n_shards}",
                prev_fps[shard],
            )
            fps[shard] = fp
            if mf.shard_is_done(out_dir, stage_full, shard, fp):
                skipped[stage_full] += 1
                continue
            if fail_at == (stage, shard):
                raise RuntimeError(
                    f"injected failure at {stage} shard {shard}"
                )
            source = ray.data.read_parquet(
                mf.shard_dir(out_dir, prev_stage, shard)
            )
            if stage == "rep":
                if bank is None:
                    bank = build_word_bank(
                        ray.data.read_parquet(
                            mf.stage_shard_paths(out_dir, BASE_STAGE, n_shards)
                        )
                    )
                out = rep_stage(source, bank, n_variants, method=method)
            elif stage == "ppdb":
                out = ppdb_stage(source, n_variants=max(1, n_variants - 1))
            elif stage == "orun":
                out = ppdb_orun_stage(source)
            elif stage == "para":
                from ner_pytorch_ray.stages.parser import (
                    paraphrase_stage,
                    parser_stage,
                )

                out = paraphrase_stage(parser_stage(source))
            elif stage == "ppl":
                if counts is None:
                    counts = unigram_counts(sf_dir)
                base_shard = ray.data.read_parquet(
                    mf.shard_dir(out_dir, BASE_STAGE, shard)
                )
                out = ppl_filter(
                    source, base_shard, counts, carry=True
                ).drop_columns(["ppl"])
            else:
                raise ValueError(f"unknown adv stage {stage!r}")
            n_rows = _write_shard(out, out_dir, stage_full, shard)
            mf.write_manifest(
                out_dir, stage_full, shard, fp, {"n_rows": n_rows}
            )
            ran[stage_full] += 1
        prev_stage, prev_fps = stage_full, fps

    return {
        "final_dir": os.path.join(out_dir, prev_stage),
        "stages": [BASE_STAGE] + _stage_names(order),
        "ran": ran,
        "skipped": skipped,
    }
