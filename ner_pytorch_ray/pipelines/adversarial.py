"""Adversarial example generation — the reference's pipeline proper
(gen_adv_pipline.py) re-expressed Ray-Data-first.

Stages (composable via ``order``, mirroring ``--order rep,ppdb``,
gen_adv_pipline.py:260-396):

  * ``rep``  — entity-chunk replacement via the word bank + cosine k-NN
    (Word_Replacement, word_rep.py:40-334): segment each sentence into
    kept-tokens vs replaceable chunks (C2), probe the bank for
    closest/farthest/seeded-random same-type chunks (J3), assemble variants
    (C3) with retagged IOBES spans.
  * ``ppdb`` — paraphrase-dictionary rewrite of O-runs; entity chunks
    untouched (PPDB_Replacement, ppdb.py:119-144). The dictionary here is a
    small deterministic synonym table (no PPDB file in the sandbox) behind
    the same lookup semantics (unigram/bigram O-run hits).
  * ``ppl``  — perplexity filter (gen_adv_pipline.py:200-234): keep the
    first ``keep_n`` variants (index order) with ppl < 3x the source
    sentence's; top-up from the remaining candidates in index order if
    fewer pass (O5 fallback, :224-227). The LM is a broadcast
    unigram model built from the corpus vocabulary (GPT-2 is unavailable —
    semantics identical, scorer swapped; the scorer is an actor-pool stage
    exactly like a GPU LM would be).

Every random choice is seeded by (url, sent_id, variant key) — SURVEY §4's
keyed-determinism requirement (the reference is unseeded; we must not be).

Variant identity is carried as (url, sent_id, variant_id) key columns; the
reference's positional alignment asserts (train.py:323-324) become key
equality (J6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_pytorch_ray.functions.spans import extract_spans
from ner_pytorch_ray.sources.glove import pseudo_glove

# ------------------------------------------------------------ segmentation
def segment_sentence(
    tokens: list[str], tags: list[str]
) -> list[tuple[int, list[int]]]:
    """C2: sentence -> [(is_chunk, token_indices)] in order
    (word_rep.py:291-334 semantics via span algebra)."""
    spans = extract_spans(tags)
    out: list[tuple[int, list[int]]] = []
    pos = 0
    for sp in spans:
        for i in range(pos, sp.begin):
            out.append((0, [i]))
        out.append((1, list(range(sp.begin, sp.end))))
        pos = sp.end
    for i in range(pos, len(tokens)):
        out.append((0, [i]))
    return out


def retag(n: int, tag_type: str) -> list[str]:
    """IOBES tags for a chunk of length n."""
    if n == 1:
        return [f"S-{tag_type}"]
    return [f"B-{tag_type}"] + [f"I-{tag_type}"] * (n - 2) + [f"E-{tag_type}"]


def _seed_of(*parts) -> int:
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=4)
    return int.from_bytes(h.digest(), "little")


# ------------------------------------------------------------- word bank
def build_word_bank(
    tagged: ray.data.Dataset, dim: int = 32, max_per_type: int = 100_000
) -> dict:
    """Distinct (tag_type, surface) chunk bank with pooled embeddings.

    Dedup = grouped count over mention keys (D1: word_rep.py:151-153);
    pooling (A3) = mean/min/max over per-word pseudo-GloVe vectors of the
    surface tokens (word_rep.py:92-123) — computed after dedup, so the
    shuffle moves only keys. Returns per-type normalized matrices for the
    three pool methods + token lists.

    The driver collect is BOUNDED: each tag type keeps its ``max_per_type``
    most-mentioned surfaces (ties: surface asc), selected distributively
    before take_all — a web-scale entity vocabulary cannot blow the
    driver; at test scales the cap is far above the bank size, so outputs
    are unchanged.
    """
    from ner_pytorch_ray.stages.mentions import mentions_stage
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    mentions = mentions_stage(tagged)

    def key_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "tag_type": b.column("tag_type"),
                "surface": b.column("surface"),
                "n": pa.array([1] * len(b), type=pa.int64()),
            }
        )

    distinct = grouped_sum(
        mentions.map_batches(key_rows, batch_format="pyarrow"),
        ["tag_type", "surface"],
        sum_cols=["n"],
    )

    def head_per_type(df):
        # groups = tag types (a handful): per-group frequency cut is the
        # one place map_groups is the right tool (few, bounded groups)
        return (
            df.sort_values(["n", "surface"], ascending=[False, True])
            .head(max_per_type)
            .reset_index(drop=True)
        )

    capped = distinct.groupby("tag_type").map_groups(
        head_per_type, batch_format="pandas"
    )
    rows = capped.take_all()  # bounded: <= n_types * max_per_type

    bank: dict[str, dict] = {}
    vocab = sorted({w for r in rows for w in r["surface"].split(" ")})
    wv = pseudo_glove(vocab, dim=dim)
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["tag_type"], r["surface"])):
        by_type.setdefault(r["tag_type"], []).append(r["surface"])
    for t, surfaces in by_type.items():
        toks_list = [s.split(" ") for s in surfaces]
        mats = {}
        for pool in ("mean", "min", "max"):
            m = np.stack(
                [
                    pool_vectors([wv[w] for w in toks], pool)
                    for toks in toks_list
                ]
            )
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mats[pool] = (m / norms).astype(np.float32)
        bank[t] = {"surfaces": surfaces, "tokens": toks_list, "mats": mats}
    bank["_wv_vocab"] = vocab
    bank["_dim"] = dim
    return bank


def pool_vectors(vecs: list[np.ndarray], method: str) -> np.ndarray:
    a = np.asarray(vecs, dtype=np.float32)
    if method == "min":
        return a.min(axis=0)
    if method == "max":
        return a.max(axis=0)
    return a.mean(axis=0)


# ----------------------------------------------------------- 'rep' stage
class ChunkReplacer:
    """Actor: bank built once per worker from a broadcast ref (T4/T5)."""

    def __init__(self, bank_ref, n_variants: int, pool: str, method: str):
        bank = ray.get(bank_ref) if isinstance(bank_ref, ray.ObjectRef) else bank_ref
        self.bank = bank
        self.wv = pseudo_glove(bank["_wv_vocab"], dim=bank["_dim"])
        self.n_variants = n_variants
        self.pool = pool
        self.method = method
        self.dim = bank["_dim"]

    def _candidates(self, tag_type: str, toks: list[str], seed: int) -> list[list[str]]:
        entry = self.bank.get(tag_type)
        if entry is None:
            return []
        k = self.n_variants
        if self.method == "random":
            rng = np.random.RandomState(seed)
            idx = rng.randint(0, len(entry["tokens"]), size=k)
            return [entry["tokens"][i] for i in idx]
        q = pool_vectors(
            [self.wv.get(w, np.zeros(self.dim, dtype=np.float32)) for w in toks],
            self.pool,
        )
        n = np.linalg.norm(q)
        q = q / n if n else q
        if self.method == "farthest":
            q = -q
        sims = entry["mats"][self.pool] @ q
        # deterministic rank: (-sim, surface) — skip self for 'closest'
        order = np.lexsort((np.array(entry["surfaces"], dtype=object), -sims))
        surface = " ".join(toks).lower()
        out = []
        for i in order:
            if self.method != "farthest" and entry["surfaces"][i] == surface:
                continue
            out.append(entry["tokens"][i])
            if len(out) >= k:
                break
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sent_ids = batch.column("sent_id").to_pylist()
        tokens = batch.column("tokens").to_pylist()
        tags = batch.column("tags").to_pylist()
        o_url, o_sid, o_vid, o_toks, o_tags = [], [], [], [], []
        for u, sid, toks, tgs in zip(urls, sent_ids, tokens, tags):
            segs = segment_sentence(toks, tgs)
            chunk_slots = [i for i, (c, _) in enumerate(segs) if c]
            if not chunk_slots:
                continue
            # per-slot candidate lists (word_rep.py:255-289 assembly)
            cands = {}
            for slot in chunk_slots:
                idxs = segs[slot][1]
                ctoks = [toks[i] for i in idxs]
                ttype = tgs[idxs[0]].partition("-")[2]
                cands[slot] = self._candidates(
                    ttype, ctoks, _seed_of(u, sid, slot)
                )
            n_out = min(
                self.n_variants,
                min((len(c) for c in cands.values()), default=0),
            )
            for v in range(n_out):
                new_toks: list[str] = []
                new_tags: list[str] = []
                for i, (is_chunk, idxs) in enumerate(segs):
                    if not is_chunk:
                        new_toks.append(toks[idxs[0]])
                        new_tags.append(tgs[idxs[0]])
                    else:
                        rep = cands[i][v]
                        ttype = tgs[idxs[0]].partition("-")[2]
                        new_toks.extend(rep)
                        new_tags.extend(retag(len(rep), ttype))
                o_url.append(u)
                o_sid.append(sid)
                o_vid.append(v)
                o_toks.append(new_toks)
                o_tags.append(new_tags)
        return pa.Table.from_pydict(
            {
                "url": pa.array(o_url, type=pa.string()),
                "sent_id": pa.array(o_sid, type=pa.int64()),
                "variant_id": pa.array(o_vid, type=pa.int64()),
                "tokens": pa.array(o_toks, type=pa.list_(pa.string())),
                "tags": pa.array(o_tags, type=pa.list_(pa.string())),
            }
        )


def rep_stage(
    tagged: ray.data.Dataset,
    bank: dict,
    n_variants: int = 3,
    pool: str = "mean",
    method: str = "closest",
    concurrency=(1, 32),
) -> ray.data.Dataset:
    bank_ref = ray.put(bank)
    return tagged.map_batches(
        ChunkReplacer,
        fn_constructor_args=(bank_ref, n_variants, pool, method),
        concurrency=concurrency,
        batch_format="pyarrow",
    )


# ----------------------------------------------------------- 'ppdb' stage
# Deterministic synonym table over the synthetic vocabulary (stand-in for
# the PPDB Equivalence dict, ppdb.py:36-76; same unigram lookup semantics).
PARAPHRASES: dict[str, list[str]] = {
    "fast": ["quick"],
    "slow": ["sluggish"],
    "big": ["large"],
    "small": ["tiny"],
    "merge": ["combine"],
    "sort": ["order"],
    "query": ["request"],
}


def ppdb_stage(
    sentences: ray.data.Dataset,
    n_variants: int = 2,
    paraphrases: dict[str, list[str]] | None = None,
) -> ray.data.Dataset:
    """C4: rewrite O-run tokens via the paraphrase dict; entities untouched.
    Seeded per (url, sent_id, parent variant, variant). ``paraphrases``
    defaults to the built-in synonym table; pass ``{k: sorted(v) for k, v in
    parse_ppdb(...).items()}`` for a real PPDB file.

    Key identity (J6): when the input already carries a ``variant_id``
    (this stage composed after another, e.g. order='rep,ppdb'), the output
    key is ``parent_variant_id * n_variants + v`` — unique per (parent, v),
    preserving positional variant identity through sequential stages the way
    the reference's in-order list-of-lists does (gen_adv_pipline.py:260-396).
    """
    PARAPHRASES_local = paraphrases if paraphrases is not None else PARAPHRASES

    def rewrite(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        tokens = batch.column("tokens").to_pylist()
        tags = batch.column("tags").to_pylist()
        parent_vids = (
            batch.column("variant_id").to_pylist()
            if "variant_id" in batch.column_names
            else [None] * len(batch)
        )
        o_url, o_sid, o_vid, o_toks, o_tags = [], [], [], [], []
        for u, sid, pvid, toks, tgs in zip(urls, sids, parent_vids, tokens, tags):
            hit_pos = [
                i for i, (w, tg) in enumerate(zip(toks, tgs))
                if tg == "O" and w in PARAPHRASES_local
            ]
            if not hit_pos:
                continue
            for v in range(n_variants):
                rng = np.random.RandomState(
                    _seed_of(u, sid, "ppdb", v)
                    if pvid is None
                    else _seed_of(u, sid, "ppdb", pvid, v)
                )
                new = list(toks)
                changed = False
                for i in hit_pos:
                    opts = PARAPHRASES_local[new[i]]
                    if rng.rand() < 0.7:
                        new[i] = opts[rng.randint(0, len(opts))]
                        changed = True
                if not changed or new == toks:  # identity filter (M15)
                    continue
                o_url.append(u)
                o_sid.append(sid)
                o_vid.append(v if pvid is None else pvid * n_variants + v)
                o_toks.append(new)
                o_tags.append(list(tgs))
        return pa.Table.from_pydict(
            {
                "url": pa.array(o_url, type=pa.string()),
                "sent_id": pa.array(o_sid, type=pa.int64()),
                "variant_id": pa.array(o_vid, type=pa.int64()),
                "tokens": pa.array(o_toks, type=pa.list_(pa.string())),
                "tags": pa.array(o_tags, type=pa.list_(pa.string())),
            }
        )

    return sentences.map_batches(rewrite, batch_format="pyarrow")


def ppdb_orun_stage(
    sentences: ray.data.Dataset,
    paraphrase_dict: dict[str, set] | None = None,
) -> ray.data.Dataset:
    """C4 with reference fidelity (ppdb.py:119-144): contiguous O-runs are
    lowered and rewritten as phrases via the (parsed) PPDB dict — entity
    chunks untouched; rows emitted only for changed sentences (the
    reference's id_of_change_examples tracking becomes row presence).
    ``paraphrase_dict`` defaults to the built-in synonym table lifted to
    set-valued form; pass ``parse_ppdb(...)`` output for a real PPDB file.
    """
    from ner_pytorch_ray.functions.paraphrase import ppdb_orun_rewrite

    if paraphrase_dict is None:
        paraphrase_dict = {k: set(v) for k, v in PARAPHRASES.items()}

    def rewrite(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        tokens = batch.column("tokens").to_pylist()
        tags = batch.column("tags").to_pylist()
        parent_vids = (
            batch.column("variant_id").to_pylist()
            if "variant_id" in batch.column_names
            else [None] * len(batch)
        )
        o_url, o_sid, o_vid, o_toks, o_tags = [], [], [], [], []
        for u, sid, pvid, toks, tgs in zip(urls, sids, parent_vids, tokens, tags):
            new_toks, new_tags, changed = ppdb_orun_rewrite(
                toks,
                tgs,
                paraphrase_dict,
                seed=_seed_of(u, sid, "orun")
                if pvid is None
                else _seed_of(u, sid, "orun", pvid),
            )
            if not changed:
                continue
            o_url.append(u)
            o_sid.append(sid)
            # one variant per input row: the parent key passes through (J6)
            o_vid.append(0 if pvid is None else pvid)
            o_toks.append(new_toks)
            o_tags.append(new_tags)
        return pa.Table.from_pydict(
            {
                "url": pa.array(o_url, type=pa.string()),
                "sent_id": pa.array(o_sid, type=pa.int64()),
                "variant_id": pa.array(o_vid, type=pa.int64()),
                "tokens": pa.array(o_toks, type=pa.list_(pa.string())),
                "tags": pa.array(o_tags, type=pa.list_(pa.string())),
            }
        )

    return sentences.map_batches(rewrite, batch_format="pyarrow")


# ------------------------------------------------------------ 'ppl' stage
class UnigramLM:
    """Broadcast unigram LM: ppl = exp(-mean log p(w)), add-1 smoothed.

    Stand-in for the GPT-2 scorer (perplexity_est.py:18-82) with identical
    pipeline semantics; an actor-pool stage exactly as a GPU LM would be.
    """

    def __init__(self, counts_ref):
        counts = (
            ray.get(counts_ref)
            if isinstance(counts_ref, ray.ObjectRef)
            else counts_ref
        )
        total = sum(counts.values()) + len(counts) + 1
        self.logp = {
            w: float(np.log((c + 1) / total)) for w, c in counts.items()
        }
        self.unk = float(np.log(1.0 / total))

    def ppl(self, toks: list[str]) -> float:
        if not toks:
            return float("inf")
        s = sum(self.logp.get(w, self.unk) for w in toks)
        return float(np.exp(-s / len(toks)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ppls = [self.ppl(t) for t in batch.column("tokens").to_pylist()]
        return batch.append_column("ppl", pa.array(ppls, type=pa.float64()))


class PplEstimator(UnigramLM):
    """T7 backend seam (mirrors stages/parser.ParserActor's ``backend=``):

      * ``backend="unigram"`` — the deterministic broadcast stand-in
        (this class's parent), same actor-pool dataflow as a GPU LM;
      * ``backend="gpt2"`` — the reference's real scorer
        (perplexity_est.py:18-82, batched CE with attention-mask lengths);
        torch/transformers are not in this container, so it raises a
        clearly-marked stub error. On a GPU cluster, swapping the real
        model in is THIS constructor argument, not a rewrite.
    """

    BACKENDS = ("unigram", "gpt2")

    def __init__(self, counts_ref, backend: str = "unigram"):
        if backend == "gpt2":
            raise NotImplementedError(
                "backend='gpt2' needs torch+transformers (reference "
                "perplexity_est.py:18-82); unavailable in this container — "
                "use backend='unigram'"
            )
        if backend != "unigram":
            raise ValueError(f"unknown ppl backend {backend!r}")
        super().__init__(counts_ref)


def ppl_stage(
    ds: ray.data.Dataset,
    counts: dict,
    concurrency=(1, 32),
    backend: str = "unigram",
):
    ref = ray.put(counts)
    return ds.map_batches(
        PplEstimator,
        fn_constructor_args=(ref, backend),
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def ppl_filter(
    variants: ray.data.Dataset,
    sources: ray.data.Dataset,
    counts: dict,
    threshold: float = 3.0,
    keep_n: int = 2,
    carry: bool = False,
) -> ray.data.Dataset:
    """M13/O5 with reference-parity selection (gen_adv_pipline.py:221-230):
    candidates in variant_id order; keep those with ppl < threshold *
    source_ppl, truncated to the FIRST ``keep_n`` that pass (``sel_index =
    np.where(...)[0][:n]``); if fewer pass, top-up from the remaining
    candidates in index order (the reference's ``set(range(100)) -
    sel_index`` ascending-index fallback, :224-227).

    Scale shape: the source sentence is tagged variant_id = -1 and UNIONED
    with its variants, so ONE keyed groupby co-locates each sentence's base
    ppl with its candidates — no driver-side source map (one float per
    sentence is 100 GB-scale at corpus size), no broadcast.

    ``carry=True`` ships tokens/tags through the keyed group so surviving
    rows come back with their payload intact — the distributed alternative
    to semi-joining the kept keyset against the variants afterwards (a
    driver-side keyset broadcast is O(sentences x keep_n) driver memory).
    The group payload is bounded (n variants + 1 source per sentence).
    """
    from ner_pytorch_ray.stages.groupby_utils import collect_tuples, flat_map_groups

    payload = ["tokens", "tags"] if carry else ["tokens"]

    def tag_source(b: pa.Table) -> pa.Table:
        cols = {
            "url": b.column("url"),
            "sent_id": b.column("sent_id"),
            "variant_id": pa.array([-1] * len(b), type=pa.int64()),
        }
        for c in payload:
            cols[c] = b.column(c)
        return pa.Table.from_pydict(cols)

    base = sources.select_columns(["url", "sent_id", *payload]).map_batches(
        tag_source, batch_format="pyarrow"
    )
    both = variants.select_columns(
        ["url", "sent_id", "variant_id", *payload]
    ).union(base)
    scored = ppl_stage(both, counts)
    collected = collect_tuples(
        scored,
        ["url", "sent_id"],
        ["variant_id", "ppl"] + (["tokens", "tags"] if carry else []),
        name="vs",
    )
    fields = [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("variant_id", pa.int64()),
    ]
    if carry:
        fields += [
            ("tokens", pa.list_(pa.string())),
            ("tags", pa.list_(pa.string())),
        ]
    fields.append(("ppl", pa.float64()))
    empty = pa.schema(fields)

    def select(key, items) -> pa.Table:
        if items is None:
            return empty.empty_table()
        u, sid = key
        # dedup on (variant_id, ppl); candidates in variant_id order —
        # variant_id is the positional index the reference selects by
        by_vid: dict[int, tuple] = {}
        for x in items:
            by_vid.setdefault(x[0], tuple(x))
        base_ppl = by_vid.get(-1, (None, float("inf")))[1]
        cands = [by_vid[v] for v in sorted(by_vid) if v != -1]
        if not cands:
            return empty.empty_table()
        kept = [c for c in cands if c[1] < threshold * base_ppl][:keep_n]
        if len(kept) < keep_n:  # index-order top-up fallback
            kept_ids = {c[0] for c in kept}
            rest = [c for c in cands if c[0] not in kept_ids]
            kept = kept + rest[: keep_n - len(kept)]
        cols = {
            "url": pa.array([u] * len(kept), type=pa.string()),
            "sent_id": pa.array([sid] * len(kept), type=pa.int64()),
            "variant_id": pa.array([c[0] for c in kept], type=pa.int64()),
        }
        if carry:
            cols["tokens"] = pa.array(
                [list(c[2]) for c in kept], type=pa.list_(pa.string())
            )
            cols["tags"] = pa.array(
                [list(c[3]) for c in kept], type=pa.list_(pa.string())
            )
        cols["ppl"] = pa.array([c[1] for c in kept], type=pa.float64())
        return pa.Table.from_pydict(cols)

    return flat_map_groups(collected, select, ["url", "sent_id"], items_col="vs")


def unigram_counts(sf_dir: str, top_k: int = 65536) -> dict[str, int]:
    """Corpus unigram counts for the LM stand-in, capped to the ``top_k``
    most frequent tokens via a DISTRIBUTED sort+limit (web-scale vocab is
    ~1e8 tokens; the LM is a GPT-2 stand-in, so truncating the tail to
    <unk> is semantically free — only the top-K dict ships to the driver)."""
    from ner_pytorch_ray.pipelines.analysis import vocab_count

    rows = (
        vocab_count(sf_dir)
        .sort(["freq", "token"], descending=[True, False])
        .limit(top_k)
        .take_all()
    )
    return {r["token"]: r["freq"] for r in rows}


# ------------------------------------------------------------- pipeline
def adv_pipeline(
    sf_dir: str,
    order: str = "rep,ppdb",
    n_variants: int = 3,
    method: str = "closest",
):
    """Composable stage list over gazetteer-tagged sentences (the reference's
    --order contract). Returns the final variants Dataset."""
    from ner_pytorch_ray.pipelines.kg import (
        pages_from_documents,
    )
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage

    pages = pages_from_documents(sf_dir)
    tagged = gazetteer_tag_stage(
        sentences_stage(extract_stage(pages), zeros=True)
    ).materialize()

    current = tagged
    for stage in order.split(","):
        stage = stage.strip()
        if stage == "rep":
            bank = build_word_bank(tagged)
            current = rep_stage(current, bank, n_variants, method=method)
        elif stage == "ppdb":
            current = ppdb_stage(current, n_variants=max(1, n_variants - 1))
        elif stage == "orun":
            current = ppdb_orun_stage(current)
        elif stage == "para":
            from ner_pytorch_ray.stages.parser import (
                parser_stage,
                paraphrase_stage,
            )

            current = paraphrase_stage(parser_stage(current))
        elif stage == "ppl":
            # tokens/tags ride through the keyed group (carry=True): the
            # surviving rows come back payload-intact with no driver-side
            # keyset broadcast — fully distributed, take_all-free
            counts = unigram_counts(sf_dir)
            current = ppl_filter(
                current, tagged, counts, carry=True
            ).drop_columns(["ppl"])
        else:
            raise ValueError(f"unknown adv stage {stage!r}")
    return current


# ------------------------------------------------------- stage materialize
def materialize_stage(
    ds: ray.data.Dataset, stage_dir: str, name: str
) -> ray.data.Dataset:
    """S5 stage-level resume (gen_adv_pipline.py:238-246,263-270: per-stage
    pickle + --preprocess_set reload, re-expressed as parquet): write the
    stage output under ``{stage_dir}/{name}/`` once; subsequent runs
    short-circuit from disk."""
    import os
    import shutil

    import ray.data as rd

    out = os.path.join(stage_dir, name)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return rd.read_parquet(out)
    if os.path.exists(out):
        # no marker but the dir exists: a previous attempt crashed between
        # write_parquet and the marker — rerunning would append new
        # UUID-named fragments next to the stale ones and duplicate rows
        shutil.rmtree(out)
    ds.write_parquet(out)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("done\n")
    return rd.read_parquet(out)


def adv_stage_stats(sf_dir: str, order: str = "rep,ppdb,orun") -> pa.Table:
    """A8 (gen_adv_pipline.py:162,183 '%Examples modified' prints): per
    adversarial stage, source-sentence count, emitted variants, distinct
    modified sources and the modification rate — as a small table."""
    from ner_pytorch_ray.pipelines.kg import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage
    from ner_pytorch_ray.stages.gazetteer import gazetteer_tag_stage
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    tagged = gazetteer_tag_stage(
        sentences_stage(extract_stage(pages_from_documents(sf_dir)), zeros=True)
    ).materialize()
    n_sources = tagged.count()

    stages, n_vars, n_mod, rates = [], [], [], []
    for stage in order.split(","):
        stage = stage.strip()
        if stage == "rep":
            out = rep_stage(tagged, build_word_bank(tagged))
        elif stage == "ppdb":
            out = ppdb_stage(tagged)
        elif stage == "orun":
            out = ppdb_orun_stage(tagged)
        elif stage == "para":
            from ner_pytorch_ray.stages.parser import (
                parser_stage,
                paraphrase_stage,
            )

            out = paraphrase_stage(parser_stage(tagged))
        else:
            raise ValueError(f"unknown adv stage {stage!r}")

        def key_rows(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "url": b.column("url"),
                    "sent_id": b.column("sent_id"),
                    "n": pa.array([1] * len(b), type=pa.int64()),
                }
            )

        per_src = grouped_sum(
            out.map_batches(key_rows, batch_format="pyarrow"),
            ["url", "sent_id"],
            sum_cols=["n"],
        ).materialize()
        total_variants = per_src.sum("n") or 0
        modified = per_src.count()
        stages.append(stage)
        n_vars.append(int(total_variants))
        n_mod.append(int(modified))
        rates.append(float(modified) / n_sources if n_sources else 0.0)

    return pa.Table.from_pydict(
        {
            "stage": pa.array(stages, type=pa.string()),
            "n_sources": pa.array([n_sources] * len(stages), type=pa.int64()),
            "n_variants": pa.array(n_vars, type=pa.int64()),
            "n_modified_sources": pa.array(n_mod, type=pa.int64()),
            "modification_rate": pa.array(rates, type=pa.float64()),
        }
    )
