"""Batch-inference + scoring entrypoint — the reference's ``eval.py`` /
``adv_example_eval.py`` lifecycle (eval.py:85-163: load mappings + model,
decode per sentence, write `word true pred` rows, conlleval; here the
decode is the distributed tagger actor pool and the prediction file is the
S7 parquet sink):

    python -m ner_pytorch_ray.eval_cli --sf_dir /root/testdata/sf0.001 \
        [--checkpoint best.npz] [--vocab vocab.json] [--out /tmp/preds]

Without ``--checkpoint`` the frozen seeded weights are used (pure smoke);
with one (from train_cli) the LEARNED head scores the corpus. ``--vocab``
reuses a persisted training vocabulary (ids must match the checkpoint's
embedding rows when corpora differ); default rebuilds it from the corpus,
which is deterministic and identical for the same corpus.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Ray Data tagger evaluation")
    p.add_argument("--sf_dir", default="/root/testdata/sf0.001")
    p.add_argument("--checkpoint", default=None, help="npz weights (train_cli)")
    p.add_argument("--vocab", default=None, help="vocab json (save_vocab)")
    p.add_argument("--out", default=None, help="S7 prediction parquet dir")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False)
    try:
        import pyarrow as pa

        from ner_pytorch_ray.pipelines.neural import (
            build_vocab_state,
            frozen_weights,
        )
        from ner_pytorch_ray.sources.pages import pages_from_documents
        from ner_pytorch_ray.stages.encode import encode_stage
        from ner_pytorch_ray.stages.evaluate import (
            conlleval_score,
            predictions_table,
            tag_accuracy_metrics,
        )
        from ner_pytorch_ray.stages.extract import extract_stage
        from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
        from ner_pytorch_ray.stages.sentences import sentences_stage
        from ner_pytorch_ray.stages.tagger import tagger_stage
        from ner_pytorch_ray.state.model import load_weights
        from ner_pytorch_ray.state.vocab import load_vocab

        sents = sentences_stage(
            extract_stage(pages_from_documents(args.sf_dir)), zeros=True
        ).materialize()
        vocab = (
            load_vocab(args.vocab) if args.vocab else build_vocab_state(sents)
        )
        weights = (
            load_weights(args.checkpoint)
            if args.checkpoint
            else frozen_weights(vocab, args.seed)
        )

        def rename(col_from: str, col_to: str):
            def f(t: pa.Table) -> pa.Table:
                return t.rename_columns(
                    [col_to if n == col_from else n for n in t.column_names]
                )

            return f

        labeled = gazetteer_tag_stage(sents).map_batches(
            rename("tags", "tags_true"), batch_format="pyarrow"
        )
        encoded = encode_stage(labeled, vocab["word_to_id"], vocab["char_to_id"])
        pairs = tagger_stage(encoded, weights, vocab["id_to_tag"]).map_batches(
            rename("tags", "tags_pred"), batch_format="pyarrow"
        ).materialize()

        metrics = tag_accuracy_metrics(pairs)
        cl = conlleval_score(pairs)
        print(
            f"conlleval: P {cl['precision']:.4f}  R {cl['recall']:.4f}  "
            f"F1 {cl['f1']:.4f}"
        )
        print(
            f"micro acc {metrics['micro_acc']:.4f}  macro acc "
            f"{metrics['macro_acc']:.4f}  hit rate {metrics['hit_rate']:.4f}"
        )
        if args.out:
            predictions_table(pairs).write_parquet(args.out)
            print(f"predictions: {args.out}")
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
