"""Neural KG path: vocab build -> encode -> BiLSTM-CRF actor pool -> mentions.

The full reference inference lifecycle (SURVEY.md §3.3) re-expressed on Ray
Data, with a frozen deterministic model (no training in this sandbox). The
single-process oracle for parity tests is the same numpy model called
sentence-by-sentence — the distributed pipeline must emit identical tags for
every (url, sent_id) regardless of batching/partitioning.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ner_pytorch_ray.sources.pages import pages_from_documents
from ner_pytorch_ray.stages.extract import extract_stage
from ner_pytorch_ray.stages.sentences import sentences_stage
from ner_pytorch_ray.stages.encode import encode_stage
from ner_pytorch_ray.stages.tagger import tagger_stage
from ner_pytorch_ray.stages.mentions import mentions_stage
from ner_pytorch_ray.state.vocab import (
    IOBES_TAGSET,
    char_mapping,
    tag_mapping_from_tagset,
    word_mapping,
)
from ner_pytorch_ray.state.model import init_weights

DEFAULT_SEED = 1234


def sample_sentences(
    sentences: ray.data.Dataset, fraction: float, salt: str = "vocab"
) -> ray.data.Dataset:
    """Deterministic url-keyed sentence sample (md5, like hash_sample):
    whole documents are kept or dropped together, stable under retries and
    partitioning."""
    import hashlib

    import pyarrow as pa

    thresh = int(fraction * 1_000_000)

    def keep(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        mask = [
            int.from_bytes(
                hashlib.md5(f"{salt}|{u}".encode()).digest()[:8], "little"
            )
            % 1_000_000
            < thresh
            for u in urls
        ]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return sentences.map_batches(keep, batch_format="pyarrow")


def build_vocab_state(
    sentences: ray.data.Dataset, sample_fraction: float | None = None
) -> dict:
    """Distributed vocab counts -> driver-side deterministic mappings.

    One pass over the sentence stream for word+char counts (matching
    loader.py:69-97 semantics: words lowered, freq>=3 cut; chars raw).

    ``sample_fraction``: the 100 TB mode — count over a deterministic
    url-keyed sample instead of the full corpus (vocabulary quality needs
    corpus-representative frequencies, not the exact corpus; OOV words hit
    the <UNK> fallback exactly as reference loader.py:158 does). With a
    sample the vocab pass reads a FRACTION of the data and the main
    sentence stream no longer needs to be materialized for double
    consumption."""
    from ner_pytorch_ray.state.vocab import word_and_char_mapping

    if sample_fraction is not None and sample_fraction < 1.0:
        sentences = sample_sentences(sentences, sample_fraction)
    (word_to_id, id_to_word), (char_to_id, id_to_char) = word_and_char_mapping(
        sentences, lower=True, min_freq=3
    )
    tag_to_id, id_to_tag = tag_mapping_from_tagset(IOBES_TAGSET)
    return {
        "word_to_id": word_to_id,
        "id_to_word": id_to_word,
        "char_to_id": char_to_id,
        "id_to_char": id_to_char,
        "tag_to_id": tag_to_id,
        "id_to_tag": id_to_tag,
    }


def frozen_weights(vocab: dict, seed: int = DEFAULT_SEED) -> dict[str, np.ndarray]:
    return init_weights(
        n_words=len(vocab["word_to_id"]),
        n_chars=len(vocab["char_to_id"]),
        n_tags=len(vocab["tag_to_id"]),
        word_dim=50,
        char_dim=16,
        char_out=16,
        hidden=32,
        seed=seed,
    )


def neural_tagged_sentences(
    sf_dir: str,
    seed: int = DEFAULT_SEED,
    concurrency: int | tuple[int, int] = (1, 32),
    batch_size: int = 256,
    replicate: int = 1,
    override_num_blocks: int | None = None,
    vocab_sample: float | None = None,
):
    """pages(sf_dir documents) -> tagged sentences (+ vocab/weights state).

    Returns (tagged_ds, vocab, weights).

    ``vocab_sample``: the 100 TB vocab mode — the vocabulary is counted
    over a deterministic url-keyed SAMPLE of the base corpus
    (build_vocab_state), and the main sentence stream is consumed exactly
    once by encode+tag, fully streaming (no materialization of the big
    pass). Default None keeps the exact-corpus vocabulary: the stream is
    then materialized once because BOTH the vocab count and the encode+tag
    pass consume it.
    """
    pages = pages_from_documents(
        sf_dir, replicate=replicate, override_num_blocks=override_num_blocks
    )
    if replicate > 1:
        # replicated corpora (bench-scale synthesis) share the base corpus
        # vocabulary — build it from ONE copy (optionally sampled) and
        # stream the big pass.
        base = sentences_stage(
            extract_stage(pages_from_documents(sf_dir)), zeros=True
        )
        vocab = build_vocab_state(base, sample_fraction=vocab_sample)
        # materialize the replicated sentence stream once: it feeds the
        # encode+tag pass and breaks fusion with the tiny shard-id source
        # (fused bundling by row-count over a 128-row source serializes the
        # pipeline into one task).
        sents = sentences_stage(extract_stage(pages), zeros=True).materialize()
    elif vocab_sample is not None:
        # vocab from the sampled base; the big pass streams end-to-end
        base = sentences_stage(
            extract_stage(pages_from_documents(sf_dir)), zeros=True
        )
        vocab = build_vocab_state(base, sample_fraction=vocab_sample)
        sents = sentences_stage(extract_stage(pages), zeros=True)
    else:
        sents = sentences_stage(extract_stage(pages), zeros=True).materialize()
        vocab = build_vocab_state(sents)
    weights = frozen_weights(vocab, seed)
    encoded = encode_stage(sents, vocab["word_to_id"], vocab["char_to_id"])
    tagged = tagger_stage(
        encoded,
        weights,
        vocab["id_to_tag"],
        concurrency=concurrency,
        batch_size=batch_size,
    )
    return tagged, vocab, weights


def neural_mentions(sf_dir: str, seed: int = DEFAULT_SEED, **kw):
    tagged, vocab, weights = neural_tagged_sentences(sf_dir, seed, **kw)
    return mentions_stage(tagged), vocab, weights


def neural_eval(sf_dir: str, seed: int = DEFAULT_SEED):
    """Score the neural tagger against the gazetteer reference labels:
    micro/macro non-O accuracy + hit rate (A7, adv_example_eval.py:198-215),
    span P/R/F1 (A5, conlleval), and the tag confusion matrix (A6).

    Returns (metrics_dict, confusion_ds). The comparison dataset carries
    both tag columns per sentence row — no join: both taggers run over the
    same stream.
    """
    import pyarrow as pa

    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.evaluate import (
        confusion_matrix,
        conlleval_score,
        tag_accuracy_metrics,
    )

    pages = pages_from_documents(sf_dir)
    sents = sentences_stage(extract_stage(pages), zeros=True).materialize()
    vocab = build_vocab_state(sents)
    weights = frozen_weights(vocab, seed)

    def to_true(t: pa.Table) -> pa.Table:
        names = ["tags_true" if n == "tags" else n for n in t.column_names]
        return t.rename_columns(names)

    labeled = gazetteer_tag_stage(sents).map_batches(
        to_true, batch_format="pyarrow"
    )
    encoded = encode_stage(labeled, vocab["word_to_id"], vocab["char_to_id"])
    tagged = tagger_stage(encoded, weights, vocab["id_to_tag"])

    def to_pred(t: pa.Table) -> pa.Table:
        names = ["tags_pred" if n == "tags" else n for n in t.column_names]
        return t.rename_columns(names)

    pairs = tagged.map_batches(to_pred, batch_format="pyarrow").select_columns(
        ["tags_true", "tags_pred"]
    ).materialize()

    metrics = tag_accuracy_metrics(pairs)
    cl = conlleval_score(pairs)
    metrics.update(
        {
            f"conlleval_{k}": v
            for k, v in cl.items()
            if k in ("precision", "recall", "f1")
        }
    )
    metrics["per_type"] = cl.get("per_type", {})
    return metrics, confusion_matrix(pairs)


def adv_nll_topk(
    sf_dir: str,
    order: str = "rep",
    n_variants: int = 3,
    k: int = 2,
    seed: int = DEFAULT_SEED,
):
    """O4 with the reference's TRUE ranking signal (train.py:383-395
    dynamic_inference): adversarial variants ranked per source sentence by
    CRF NLL under the frozen model (highest loss = hardest example first),
    keep top-``k``. Vocab/weights come from the SOURCE corpus, as in the
    reference where the model was trained before adversarial augmentation.
    Output: (url, sent_id, variant_id, nll, rank)."""
    from ner_pytorch_ray.pipelines.adversarial import adv_pipeline
    from ner_pytorch_ray.stages.groupby_utils import topk_by_group
    from ner_pytorch_ray.stages.tagger import nll_stage

    sents = sentences_stage(
        extract_stage(pages_from_documents(sf_dir)), zeros=True
    ).materialize()
    vocab = build_vocab_state(sents)
    weights = frozen_weights(vocab, seed)

    variants = adv_pipeline(sf_dir, order=order, n_variants=n_variants)
    encoded = encode_stage(variants, vocab["word_to_id"], vocab["char_to_id"])
    scored = nll_stage(encoded, weights, vocab["tag_to_id"])
    return topk_by_group(
        scored, ["url", "sent_id"], "nll", "variant_id", k=k, descending=True
    )


def neural_epoch_loss(sf_dir: str, seed: int = DEFAULT_SEED):
    """One evaluation epoch's corpus CRF NLL under the frozen model against
    the gazetteer labels — the distributed analog of the reference's
    per-epoch loss logging (train.py:404-447 accumulates loss/count over
    the epoch). Returns a 1-row table (n_sentences, total_nll, mean_nll).

    Determinism contract: per-sentence NLLs round to 4 decimals (NllActor)
    and sum as integer ten-thousandths — summation-order independent. The
    REPORTED total then rounds to 2 decimals: BLAS GEMM kernel dispatch
    differs across CPU microarchitectures, so a per-sentence value sitting
    exactly on a 4-decimal rounding boundary can flip by 1e-4 between
    hosts (observed twice across sandbox host migrations); the 2-decimal
    report absorbs up to ~50 such single-sentence flips, making the
    frozen oracle host-portable instead of host-pinned."""
    import pyarrow as pa

    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.tagger import nll_stage

    pages = pages_from_documents(sf_dir)
    sents = sentences_stage(extract_stage(pages), zeros=True).materialize()
    vocab = build_vocab_state(sents)
    weights = frozen_weights(vocab, seed)
    labeled = gazetteer_tag_stage(sents)
    encoded = encode_stage(labeled, vocab["word_to_id"], vocab["char_to_id"])
    scored = nll_stage(encoded, weights, vocab["tag_to_id"])

    def to_int(batch: pa.Table) -> pa.Table:
        import numpy as np

        # integer ten-thousandths: float summation order cannot move the
        # 4th decimal of the total
        v = np.rint(batch.column("nll").to_numpy() * 10000).astype(np.int64)
        return pa.Table.from_pydict({"nll_i": pa.array(v, type=pa.int64())})

    from ray.data.aggregate import Count, Sum

    # one streaming pass for both statistics — no materialization
    agg = scored.map_batches(to_int, batch_format="pyarrow").aggregate(
        Sum("nll_i"), Count()
    )
    n = int(agg["count()"] or 0)
    total_i = int(agg["sum(nll_i)"] or 0)
    total = round(total_i / 10000.0, 2)
    return pa.Table.from_pydict(
        {
            "n_sentences": pa.array([n], type=pa.int64()),
            "total_nll": pa.array([total], type=pa.float64()),
            "mean_nll": pa.array(
                [round(total / n, 6) if n else 0.0], type=pa.float64()
            ),
        }
    )


def epoch_stream(
    sf_dir: str, seed: int = 0, concurrency: int | tuple[int, int] = (1, 32)
):
    """O7 (train.py:410 np.random.permutation over batches): one training
    epoch's encoded sentence stream, globally shuffled with a fixed seed —
    `random_shuffle` is the distributed permutation; batch formation happens
    wherever the consumer iterates (`iter_batches`)."""
    tagged, vocab, weights = neural_tagged_sentences(sf_dir)
    return tagged.random_shuffle(seed=seed), vocab, weights
