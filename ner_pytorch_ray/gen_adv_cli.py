"""Adversarial-generation CLI — the reference's ``gen_adv_pipline.py`` UX
(arguments.py:20-45, gen_adv_pipline.py:240-399) over the Ray Data engine.

    python -m ner_pytorch_ray.gen_adv_cli \
        --sf_dir /root/testdata/sf0.001 --order rep,ppdb --rep_with closest \
        --n 3 --filter --save_dir /tmp/adv --name run1

Mirrored surface:
  * ``--order``         comma list of stages (rep, ppdb, orun, para), run
                        sequentially; each stage consumes the previous
                        stage's output when one exists (the reference's
                        ``updated_data`` carry, :298-312);
  * ``--rep_with``      closest | farthest | random (word_rep.py candidate
                        rule) and ``--pool`` mean | min | max;
  * ``--filter``        perplexity-filter each stage's output against the
                        source sentences, keeping ``--n`` per sentence
                        (filter_examples, :200-234); while filtering, the
                        generation pool is ``--gen_pool`` (the reference's
                        hardcoded 100, :276-279);
  * ``--cascade``       keep generating the full pool at every stage
                        (without it the pool resets to ``--n`` after the
                        first stage, :394-395);
  * ``--preprocess_set`` comma list of saved stage names to reload instead
                        of recomputing (suffix rule as in :263-270: a name
                        ending in 'para'/'ppdb' maps to that stage, else
                        'rep');
  * per-stage outputs land under ``--save_dir/<name>_<agg>`` as parquet
    (savefile, :238-246 — parquet + _DONE marker instead of pickle), and a
    rerun short-circuits from them;
  * ``--shards N``      run shard-resumable instead (partition-granular
                        manifests with chained lineage,
                        pipelines/adv_resumable.py): a crash resumes with
                        only unfinished shards recomputed.
"""

from __future__ import annotations

import argparse
import os


def run_pipeline(
    sf_dir: str,
    order: str = "ppdb",
    rep_with: str = "closest",
    pool: str = "mean",
    n: int = 3,
    filter_ppl: bool = False,
    cascade: bool = False,
    gen_pool: int = 100,
    save_dir: str | None = None,
    name: str = "adv",
    preprocess_set: str = "",
    verbose: bool = True,
):
    """Run the staged pipeline; returns (final Dataset, per-stage row counts)."""
    import ray.data  # noqa: F401  (ensures ray.data registered)

    from ner_pytorch_ray.pipelines.adversarial import (
        adv_pipeline,  # noqa: F401 (library analog)
        build_word_bank,
        materialize_stage,
        ppdb_orun_stage,
        ppdb_stage,
        ppl_filter,
        rep_stage,
        unigram_counts,
    )
    from ner_pytorch_ray.pipelines.kg import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage

    def log(msg: str) -> None:
        if verbose:
            print(msg)

    tagged = gazetteer_tag_stage(
        sentences_stage(extract_stage(pages_from_documents(sf_dir)), zeros=True)
    ).materialize()

    # --preprocess_set: saved stage name -> method (suffix rule, :263-270)
    method_to_path: dict[str, str] = {}
    if preprocess_set and save_dir:
        for filename in (x.strip() for x in preprocess_set.split(",")):
            method = filename[-4:] if filename[-4:] in ("para", "ppdb", "orun") else "rep"
            method_to_path[method] = os.path.join(save_dir, filename)

    counts_cache: dict | None = None
    updated = None
    agg_name = ""
    stage_counts: dict[str, int] = {}
    gen_n = gen_pool if filter_ppl else n

    for i, method in enumerate(x.strip() for x in order.split(",")):
        agg_name += method + "_"

        if method in method_to_path:
            import ray.data as rd

            updated = rd.read_parquet(method_to_path[method])
            log(f"used pre-processed data {method_to_path[method]}")
        else:
            source = updated if updated is not None else tagged
            log(
                "used last step data" if updated is not None else f"used {sf_dir}"
            )
            if method == "rep":
                bank = build_word_bank(tagged)
                out = rep_stage(
                    source, bank, n_variants=gen_n, pool=pool, method=rep_with
                )
            elif method == "ppdb":
                out = ppdb_stage(source, n_variants=gen_n)
            elif method == "orun":
                out = ppdb_orun_stage(source)
            elif method == "para":
                from ner_pytorch_ray.stages.parser import (
                    paraphrase_stage,
                    parser_stage,
                )

                out = paraphrase_stage(parser_stage(source))
            else:
                raise SystemExit(f"unknown stage {method!r} in --order")
            if filter_ppl:
                if counts_cache is None:
                    counts_cache = unigram_counts(sf_dir)
                out = ppl_filter(
                    out, tagged, counts_cache, keep_n=n, carry=True
                ).drop_columns(["ppl"])
            if save_dir:
                out = materialize_stage(out, save_dir, f"{name}_{agg_name}")
            updated = out
        stage_counts[agg_name[:-1]] = updated.count()
        log(f"{method} finished ({stage_counts[agg_name[:-1]]} rows)")

        if not cascade:
            gen_n = n

    return updated, stage_counts


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="Generate adversarial NER variants (Ray Data engine)"
    )
    p.add_argument("--sf_dir", default="/root/testdata/sf0.001")
    p.add_argument("--order", default="ppdb", help="the pipeline, e.g. rep,ppdb")
    p.add_argument(
        "--rep_with",
        default="closest",
        choices=["closest", "farthest", "random"],
        help="replace with closest|farthest|random embedding",
    )
    p.add_argument("--pool", default="mean", choices=["mean", "min", "max"])
    p.add_argument("--n", type=int, default=3, help="variants to keep per sentence")
    p.add_argument(
        "--filter", action="store_true", help="perplexity-filter each stage"
    )
    p.add_argument(
        "--cascade",
        action="store_true",
        help="keep the full generation pool through every stage",
    )
    p.add_argument(
        "--gen_pool", type=int, default=100, help="pool size while filtering"
    )
    p.add_argument("--save_dir", default=None, help="per-stage parquet dir")
    p.add_argument("--name", default="adv", help="run name prefix for saves")
    p.add_argument(
        "--preprocess_set",
        default="",
        help="comma list of saved stage names to reload",
    )
    p.add_argument(
        "--shards",
        type=int,
        default=0,
        help="run shard-resumable (partition manifests + chained lineage; "
        "requires --save_dir); 0 = the stage-granular pipeline above",
    )
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False)
    try:
        if args.shards > 0:
            if not args.save_dir:
                raise SystemExit("--shards requires --save_dir")
            from ner_pytorch_ray.pipelines.adv_resumable import (
                run_resumable_adv,
            )

            info = run_resumable_adv(
                args.sf_dir,
                args.save_dir,
                order=args.order,
                n_shards=args.shards,
                n_variants=args.n,
                method=args.rep_with,
            )
            for stage in info["stages"]:
                print(
                    f"{stage}: ran {info['ran'][stage]} shards, "
                    f"skipped {info['skipped'][stage]}"
                )
            print(f"final: {info['final_dir']}")
            return 0
        _, counts = run_pipeline(
            sf_dir=args.sf_dir,
            order=args.order,
            rep_with=args.rep_with,
            pool=args.pool,
            n=args.n,
            filter_ppl=args.filter,
            cascade=args.cascade,
            gen_pool=args.gen_pool,
            save_dir=args.save_dir,
            name=args.name,
            preprocess_set=args.preprocess_set,
        )
        for stage, c in counts.items():
            print(f"{stage}: {c} variants")
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
