"""Generate expected-output parquet oracles for queries whose semantics are
not ANSI-SQL-expressible (frozen-model scoring, seeded variant generation).

Everything here is SINGLE-PROCESS and sequential — plain Python loops over
``documents.parquet`` rows, no ray.data — so the files pin the distributed
pipelines' output against an execution that shares none of the partitioning,
batching, shuffling or actor machinery. Pure per-sentence functions
(span algebra, seeded RNG derivation, the frozen numpy model) are shared
with the library on purpose: they are unit-tested against the reference
(msps9341012/NER-pytorch) separately; what these files verify is that the
RAY DATA execution — any partitioning, any concurrency — reproduces the
sequential truth exactly.

HOST SENSITIVITY: the frozen values pin partitioning/concurrency
invariance on the machine that generated them. Float GEMM results can
differ in the last ulp across CPU microarchitectures (BLAS kernel
dispatch), which can flip a round-to-N-decimals boundary: observed once
for neural_epoch_loss (total moved 2e-4 of 8e4 after the execution host
changed; every other frozen file was byte-identical). If the driver's
gate host changes, regenerate with this script — only rounding-boundary
metrics should move, and the sequential and distributed values must
still agree with each other on the new host.

Usage:  python tools/make_expected.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 -> tests/expected/
The driver's oracle gate reads them via DuckDB read_parquet (see
__ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ner_pytorch_ray.functions.spans import extract_spans
from ner_pytorch_ray.functions.conlleval import (
    ChunkCounts,
    count_chunks,
    evaluate_counts,
)
from ner_pytorch_ray.functions.paraphrase import combine_tag
from ner_pytorch_ray.functions.projection import reorder_sentence
from ner_pytorch_ray.sources.glove import pseudo_glove
from ner_pytorch_ray.sources.pages import SENT_TOKENS, doc_url
from ner_pytorch_ray.stages.gazetteer import BIGRAMS, GAZETTEER
from ner_pytorch_ray.state.model import NumpyBiLSTMCRF, init_weights
from ner_pytorch_ray.state.vocab import (
    IOBES_TAGSET,
    PAD,
    UNK,
    create_mapping,
    tag_mapping_from_tagset,
)
from ner_pytorch_ray.pipelines.adversarial import (
    PARAPHRASES,
    _seed_of,
    pool_vectors,
    retag,
    segment_sentence,
)


# ------------------------------------------------------------ corpus -> rows
def load_docs(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def sentence_rows(sf_dir: str, zeros: bool = True):
    """(url, sent_id, tokens) — sequential mirror of pages->extract->split."""
    out = []
    for doc_id, text in load_docs(sf_dir):
        url = doc_url(doc_id)
        toks = text.split(" ") if text else []
        for sid, i in enumerate(range(0, len(toks), SENT_TOKENS)):
            line = " ".join(toks[i : i + SENT_TOKENS])
            if zeros:
                line = re.sub(r"\d", "0", line)
            if not line:
                continue
            out.append((url, sid, line.split(" ")))
    return out


def gaz_tags(tokens: list[str]) -> list[str]:
    tags = ["O"] * len(tokens)
    for i in range(len(tokens) - 1):
        hit = BIGRAMS.get((tokens[i], tokens[i + 1]))
        if hit and tags[i] == "O" and tags[i + 1] == "O":
            tags[i], tags[i + 1] = f"B-{hit[0]}", f"E-{hit[0]}"
    for i, w in enumerate(tokens):
        if tags[i] == "O" and w in GAZETTEER:
            tags[i] = f"S-{GAZETTEER[w][0]}"
    return tags


def mentions_of(tokens: list[str], tags: list[str]):
    """(mention_id, begin, end, tag_type, surface) per sentence."""
    rows = []
    for mid, sp in enumerate(sorted(extract_spans(tags), key=lambda s: s.begin)):
        rows.append(
            (mid, sp.begin, sp.end, sp.type, " ".join(tokens[sp.begin : sp.end]))
        )
    return rows


MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("mention_id", pa.int64()),
        ("begin", pa.int32()),
        ("end", pa.int32()),
        ("tag_type", pa.string()),
        ("surface", pa.string()),
    ]
)


def mentions_table(rows_with_tags) -> pa.Table:
    cols = {k: [] for k in MENTIONS_SCHEMA.names}
    for url, sid, toks, tags in rows_with_tags:
        for mid, b, e, typ, surf in mentions_of(toks, tags):
            cols["url"].append(url)
            cols["sent_id"].append(sid)
            cols["mention_id"].append(mid)
            cols["begin"].append(b)
            cols["end"].append(e)
            cols["tag_type"].append(typ)
            cols["surface"].append(surf)
    return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)


# ------------------------------------------------------------- neural oracle
def build_model_state(sents, seed: int = 1234):
    """Sequential vocab build + frozen model (mirrors pipelines/neural.py
    vocab semantics: words lowered / min_freq 3, chars raw, fixed tagset)."""
    w_dico: Counter = Counter()
    c_dico: Counter = Counter()
    for _, _, toks in sents:
        w_dico.update(w.lower() for w in toks)
        c_dico.update("".join(toks))
    w_dico = {k: v for k, v in w_dico.items() if v >= 3}
    w_dico[PAD] = 10000001
    w_dico[UNK] = 10000000
    word_to_id, _ = create_mapping(w_dico)
    c_dico = dict(c_dico)
    c_dico[PAD] = 10000000
    char_to_id, _ = create_mapping(c_dico)
    tag_to_id, id_to_tag = tag_mapping_from_tagset(IOBES_TAGSET)
    weights = init_weights(
        n_words=len(word_to_id),
        n_chars=len(char_to_id),
        n_tags=len(tag_to_id),
        word_dim=50,
        char_dim=16,
        char_out=16,
        hidden=32,
        seed=seed,
    )
    return word_to_id, char_to_id, tag_to_id, id_to_tag, NumpyBiLSTMCRF(weights)


def encode_sentence(toks, word_to_id, char_to_id):
    unk_id = word_to_id[UNK]
    wids = [word_to_id.get(t.lower(), unk_id) for t in toks]
    cids = [[char_to_id[c] for c in t if c in char_to_id] for t in toks]
    return wids, cids


def neural_pred_tags(sents, seed: int = 1234):
    """Per-sentence (batch=1) Viterbi decode."""
    word_to_id, char_to_id, _, id_to_tag, model = build_model_state(sents, seed)
    out = []
    for url, sid, toks in sents:
        wids, cids = encode_sentence(toks, word_to_id, char_to_id)
        path = model.decode([wids], [cids])[0]
        out.append((url, sid, toks, [id_to_tag[t] for t in path]))
    return out


def adv_topk_loss_expected(sents, variants, k=2, seed: int = 1234) -> pa.Table:
    """Per-sentence (batch=1) CRF NLL of each adversarial variant, ranked
    desc per source sentence (train.py:383-395 semantics)."""
    word_to_id, char_to_id, tag_to_id, _, model = build_model_state(sents, seed)
    by_sent: dict[tuple, list] = {}
    for u, sid, v, toks, tags in variants:
        wids, cids = encode_sentence(toks, word_to_id, char_to_id)
        tids = [tag_to_id[t] for t in tags]
        # round as the distributed NllActor does (shape-dependent f32 GEMM)
        nll = round(float(model.nll([wids], [cids], [tids])[0]), 4)
        by_sent.setdefault((u, sid), []).append((v, nll))
    rows = []
    for (u, sid), cands in sorted(by_sent.items()):
        ranked = sorted(set(cands), key=lambda c: (-c[1], c[0]))[:k]
        rows.extend((u, sid, v, n, r) for r, (v, n) in enumerate(ranked))
    return pa.Table.from_pydict(
        {
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "sent_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "variant_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "nll": pa.array([r[3] for r in rows], type=pa.float64()),
            "rank": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def conlleval_tables(pairs):
    """(metrics_table, confusion_table) from (true, pred) tag-list pairs,
    mirroring __ray_entry__._q_neural_eval_metrics / _q_neural_confusion."""
    total = ChunkCounts()
    conf: Counter = Counter()
    correct_non_o = total_non_o = macro_n = hits = 0
    macro_sum = 0  # integer billionths, matching stages/evaluate.py
    for t_tags, p_tags in pairs:
        total.merge(count_chunks(t_tags, p_tags))
        for t, p in zip(t_tags, p_tags):
            conf[(t, p)] += 1
        nz = [(t, p) for t, p in zip(t_tags, p_tags) if t != "O"]
        correct_non_o += sum(1 for t, p in nz if t == p)
        total_non_o += len(nz)
        if nz:
            macro_sum += int(
                np.rint(1_000_000_000 * sum(1 for t, p in nz if t == p) / len(nz))
            )
            macro_n += 1
        if any(t != p for t, p in zip(t_tags, p_tags)):
            hits += 1
    n_sent = len(pairs)
    cl = evaluate_counts(total)
    metrics = {
        "micro_acc": correct_non_o / total_non_o if total_non_o else float("nan"),
        "macro_acc": (
            macro_sum / 1_000_000_000 / macro_n if macro_n else float("nan")
        ),
        "hit_rate": hits / n_sent if n_sent else float("nan"),
        "n_sentences": n_sent,
    }
    metrics.update(
        {f"conlleval_{k}": v for k, v in cl.items() if k in ("precision", "recall", "f1")}
    )
    for typ, (p, r, f) in cl.get("per_type", {}).items():
        metrics[f"precision_{typ}"] = p
        metrics[f"recall_{typ}"] = r
        metrics[f"f1_{typ}"] = f
    mt = pa.Table.from_pydict(
        {
            "metric": pa.array(sorted(metrics), type=pa.string()),
            "value": pa.array(
                [float(metrics[k]) for k in sorted(metrics)], type=pa.float64()
            ),
        }
    )
    keys = sorted(conf)
    ct = pa.Table.from_pydict(
        {
            "true_tag": pa.array([k[0] for k in keys], type=pa.string()),
            "pred_tag": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array([conf[k] for k in keys], type=pa.int64()),
        }
    )
    return mt, ct


# -------------------------------------------------------- adversarial oracle
def build_bank(tagged, dim: int = 32):
    """Sequential mirror of adversarial.build_word_bank."""
    distinct = sorted(
        {
            (typ, surf)
            for _, _, toks, tags in tagged
            for _, _, _, typ, surf in mentions_of(toks, tags)
        }
    )
    vocab = sorted({w for _, s in distinct for w in s.split(" ")})
    wv = pseudo_glove(vocab, dim=dim)
    by_type: dict[str, list[str]] = {}
    for t, s in distinct:
        by_type.setdefault(t, []).append(s)
    bank: dict[str, dict] = {}
    for t, surfaces in by_type.items():
        toks_list = [s.split(" ") for s in surfaces]
        mats = {}
        for pool in ("mean", "min", "max"):
            m = np.stack([pool_vectors([wv[w] for w in tk], pool) for tk in toks_list])
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mats[pool] = (m / norms).astype(np.float32)
        bank[t] = {"surfaces": surfaces, "tokens": toks_list, "mats": mats}
    bank["_wv"] = wv
    bank["_dim"] = dim
    return bank


def rep_candidates(bank, tag_type, toks, seed, k, pool="mean", method="closest"):
    entry = bank.get(tag_type)
    if entry is None:
        return []
    if method == "random":
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(entry["tokens"]), size=k)
        return [entry["tokens"][i] for i in idx]
    wv, dim = bank["_wv"], bank["_dim"]
    q = pool_vectors(
        [wv.get(w, np.zeros(dim, dtype=np.float32)) for w in toks], pool
    )
    n = np.linalg.norm(q)
    q = q / n if n else q
    if method == "farthest":
        q = -q
    sims = entry["mats"][pool] @ q
    order = np.lexsort((np.array(entry["surfaces"], dtype=object), -sims))
    surface = " ".join(toks).lower()
    out = []
    for i in order:
        if method != "farthest" and entry["surfaces"][i] == surface:
            continue
        out.append(entry["tokens"][i])
        if len(out) >= k:
            break
    return out


def rep_variants(tagged, bank, n_variants, method="closest", pool="mean"):
    """(url, sent_id, variant_id, tokens, tags) — mirror of ChunkReplacer."""
    out = []
    for u, sid, toks, tgs in tagged:
        segs = segment_sentence(toks, tgs)
        chunk_slots = [i for i, (c, _) in enumerate(segs) if c]
        if not chunk_slots:
            continue
        cands = {}
        for slot in chunk_slots:
            idxs = segs[slot][1]
            ctoks = [toks[i] for i in idxs]
            ttype = tgs[idxs[0]].partition("-")[2]
            cands[slot] = rep_candidates(
                bank, ttype, ctoks, _seed_of(u, sid, slot), n_variants, pool, method
            )
        n_out = min(n_variants, min((len(c) for c in cands.values()), default=0))
        for v in range(n_out):
            new_toks, new_tags = [], []
            for i, (is_chunk, idxs) in enumerate(segs):
                if not is_chunk:
                    new_toks.append(toks[idxs[0]])
                    new_tags.append(tgs[idxs[0]])
                else:
                    rep = cands[i][v]
                    ttype = tgs[idxs[0]].partition("-")[2]
                    new_toks.extend(rep)
                    new_tags.extend(retag(len(rep), ttype))
            out.append((u, sid, v, new_toks, new_tags))
    return out


def ppdb_variants(tagged, n_variants):
    out = []
    for u, sid, toks, tgs in tagged:
        hit_pos = [
            i
            for i, (w, tg) in enumerate(zip(toks, tgs))
            if tg == "O" and w in PARAPHRASES
        ]
        if not hit_pos:
            continue
        for v in range(n_variants):
            rng = np.random.RandomState(_seed_of(u, sid, "ppdb", v))
            new = list(toks)
            changed = False
            for i in hit_pos:
                opts = PARAPHRASES[new[i]]
                if rng.rand() < 0.7:
                    new[i] = opts[rng.randint(0, len(opts))]
                    changed = True
            if not changed or new == toks:
                continue
            out.append((u, sid, v, new, list(tgs)))
    return out


def orun_variants(tagged):
    from ner_pytorch_ray.functions.paraphrase import ppdb_orun_rewrite

    pd_dict = {k: set(v) for k, v in PARAPHRASES.items()}
    out = []
    for u, sid, toks, tgs in tagged:
        new_toks, new_tags, changed = ppdb_orun_rewrite(
            toks, tgs, pd_dict, seed=_seed_of(u, sid, "orun")
        )
        if changed:
            out.append((u, sid, 0, new_toks, new_tags))
    return out


def para_variants(tagged):
    """Mirror of parser_stage + paraphrase_stage (rules backend)."""
    from ner_pytorch_ray.stages.parser import ParserActor

    parser = ParserActor("rules")
    out = []
    for u, sid, toks, tgs in tagged:
        if len(toks) < 2:
            continue
        dp = parser._parse(toks)
        units, unit_tags, _, _ = combine_tag(toks, tgs)
        tok2unit = []
        for ui, unit in enumerate(units):
            tok2unit.extend([ui] * len(unit.split(" ")))
        heads, deprels, upos = [], [], []
        start = 0
        for ui, unit in enumerate(units):
            d = dp[start]
            h_tok = int(d["head"])
            if h_tok == 0:
                heads.append(0)
            else:
                hu = tok2unit[h_tok - 1]
                heads.append(0 if hu == ui else hu + 1)
            deprels.append(d["deprel"])
            upos.append(d["upos"])
            start += len(unit.split(" "))
        seed = int.from_bytes(
            hashlib.blake2b(f"{u}|{sid}|para".encode(), digest_size=4).digest(),
            "little",
        )
        order = reorder_sentence(heads, deprels, upos, seed, temperature=1.0)
        if order == sorted(order):
            continue
        out.append((u, sid, 0))
    return out


def unigram_lm(sf_dir: str, top_k: int = 65536):
    c: Counter = Counter()
    for _, text in load_docs(sf_dir):
        c.update(text.split(" "))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    counts = dict(top)
    total = sum(counts.values()) + len(counts) + 1
    logp = {w: float(np.log((n + 1) / total)) for w, n in counts.items()}
    unk = float(np.log(1.0 / total))

    def ppl(toks):
        if not toks:
            return float("inf")
        s = sum(logp.get(w, unk) for w in toks)
        return float(np.exp(-s / len(toks)))

    return ppl


def keys_table(rows) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "sent_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "variant_id": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


# ----------------------------------------------------------------- ANN oracle
def ann_lsh_expected(
    sf_dir: str, n_queries=10, k=5, n_bits=12, max_d=2
) -> pa.Table:
    """Exhaustive single-process recompute of the multi-probe LSH contract:
    candidates = hamming(sig_q, sig_c) <= max_d over ALL corpus rows, then
    exact cosine top-k with (-score, vec_id) tie-break. The banded
    distributed implementation must produce exactly this (pigeonhole
    recall argument, similarity.py:ann_lsh_topk)."""
    from ner_pytorch_ray.pipelines.similarity import _hyperplanes

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_numpy())
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    H = _hyperplanes(M.shape[1], n_bits)
    sigs = (M @ H.T > 0).astype(np.uint64)
    keys = np.zeros(len(ids), dtype=np.uint64)
    for b in range(n_bits):
        keys |= sigs[:, b] << np.uint64(b)
    rows = []
    for qpos in np.nonzero(ids < n_queries)[0]:
        ham = np.array(
            [bin(int(keys[qpos] ^ kc)).count("1") for kc in keys]
        )
        cand = np.nonzero((ham <= max_d) & (ids != ids[qpos]))[0]
        if not len(cand):
            continue
        s = M[cand] @ M[qpos]
        sel = np.lexsort((ids[cand], -s))[:k]
        for r, i in enumerate(sel, start=1):
            rows.append((int(ids[qpos]), int(ids[cand][i]), r))
    return pa.Table.from_pydict(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "rank": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def ivf_topk_expected(
    sf_dir: str, n_queries=10, k=5, n_centroids=16, n_probe=4, sample=4096
) -> pa.Table:
    """Sequential recompute of the IVF contract: same deterministic
    centroid fit, full-corpus nearest-centroid assignment, per-query probe
    sets, exact top-k among probed buckets."""
    from ner_pytorch_ray.pipelines.similarity import _fit_centroids

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_numpy())
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    C = _fit_centroids(M[:sample], n_centroids)
    assign = np.argmax(M @ C.T, axis=1)
    rows = []
    for qpos in np.nonzero(ids < n_queries)[0]:
        probe = set(
            np.argsort(-(M[qpos] @ C.T), kind="stable")[:n_probe].tolist()
        )
        cand = np.nonzero(
            np.isin(assign, list(probe)) & (ids != ids[qpos])
        )[0]
        if not len(cand):
            continue
        s = M[cand] @ M[qpos]
        sel = np.lexsort((ids[cand], -s))[:k]
        for r, i in enumerate(sel, start=1):
            rows.append((int(ids[qpos]), int(ids[cand][i]), r))
    return pa.Table.from_pydict(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "rank": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def pq_topk_expected(
    sf_dir: str, n_queries=10, k=5, n_subq=4, n_codes=16, sample=4096
) -> pa.Table:
    """Sequential recompute of the PQ/ADC contract: same codebook fit on
    the vec_id-sorted sample prefix, full-corpus PQ encode, per-query ADC
    table-lookup scores, exact global top-k by (-score, id)."""
    from ner_pytorch_ray.pipelines.similarity import (
        _fit_pq_codebooks,
        pq_encode,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_numpy())
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    fit_rows = M[ids < max(sample, n_queries)][:sample]
    books = _fit_pq_codebooks(fit_rows, n_subq, n_codes)
    codes = pq_encode(M, books)
    n_sq, n_c, d = books.shape
    rows = []
    for qpos in np.nonzero(ids < n_queries)[0]:
        lut = np.einsum(
            "sd,scd->sc", M[qpos].reshape(n_sq, d), books
        )  # [n_subq, n_codes]
        s = np.zeros(len(M), dtype=np.float64)
        for sub in range(n_sq):
            s += lut[sub, codes[:, sub]]
        s[ids == ids[qpos]] = -np.inf
        sel = np.lexsort((ids, -s))[:k]
        sel = sel[np.isfinite(s[sel])]
        for r, i in enumerate(sel, start=1):
            rows.append((int(ids[qpos]), int(ids[i]), r))
    return pa.Table.from_pydict(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "rank": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def neural_epoch_loss_expected(sents, tagged, seed: int = 1234) -> pa.Table:
    """Sequential recompute: per-sentence (batch=1) CRF NLL of the
    gazetteer labels, rounded to 4 decimals like NllActor, totalled; the
    reported total rounds to 2 decimals (host-portability guard — see
    pipelines/neural.neural_epoch_loss docstring)."""
    word_to_id, char_to_id, tag_to_id, _, model = build_model_state(sents, seed)
    total_i = 0  # integer ten-thousandths: summation-order independent
    n = 0
    for _, _, toks, tags in tagged:
        wids, cids = encode_sentence(toks, word_to_id, char_to_id)
        tids = [tag_to_id[t] for t in tags]
        nll4 = round(float(model.nll([wids], [cids], [tids])[0]), 4)
        total_i += int(np.rint(nll4 * 10000))
        n += 1
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


def tag_embeddings_expected(tagged, dim=16, pooling="mean") -> pa.Table:
    """Sequential mirror of pipelines/embeddings.tag_embedding_table
    (same integer-billionths accumulation, so the mean is identical under
    any summation order)."""
    from ner_pytorch_ray.pipelines.embeddings import (
        chunk_rows,
        mean_from_billionths,
        vec_billionths,
    )

    acc: dict[tuple, list] = {}
    for _, _, toks, tags in tagged:
        for t, s, vec in chunk_rows(toks, tags, dim, pooling):
            iv = vec_billionths(vec)
            st = acc.get((t, s))
            if st is None:
                acc[(t, s)] = [iv, 1]
            else:
                st[0] = st[0] + iv
                st[1] += 1
    keys = sorted(acc)
    return pa.Table.from_pydict(
        {
            "tag_type": pa.array([k[0] for k in keys], type=pa.string()),
            "surface": pa.array([k[1] for k in keys], type=pa.string()),
            "n_occurrences": pa.array([acc[k][1] for k in keys], type=pa.int64()),
            "embedding": pa.array(
                [
                    mean_from_billionths(acc[k][0], acc[k][1]).tolist()
                    for k in keys
                ],
                type=pa.list_(pa.float64()),
            ),
        }
    )


def training_curve_expected(
    sents,
    n_epochs: int = 3,
    lr: float = 6.0,
    lr_decay: float = 0.3,
    momentum: float = 0.5,
    clip: float = 5.0,
    seed: int = 1234,
    dev_mod: int = 5,
) -> pa.Table:
    """Sequential mirror of pipelines/training.train_loop (teacher labels):
    plain python loop over sentences — per-sentence frozen-backbone
    features, teacher-head Viterbi labels, integer-summed analytic
    gradients, the same driver-side SGD — no ray.data anywhere."""
    from ner_pytorch_ray.functions.conlleval import (
        ChunkCounts,
        count_chunks,
        evaluate_counts,
    )
    from ner_pytorch_ray.pipelines.training import (
        GRAD_SCALE,
        NLL_SCALE,
        _dev_of,
        sgd_step,
    )
    from ner_pytorch_ray.state.model import (
        crf_head_grads,
        head_emissions,
        viterbi_path,
    )

    word_to_id, char_to_id, tag_to_id, id_to_tag, model = build_model_state(
        sents, seed
    )
    n_tags = len(tag_to_id)
    start, stop = n_tags - 2, n_tags - 1
    tw = init_weights(
        n_words=len(word_to_id),
        n_chars=len(char_to_id),
        n_tags=n_tags,
        word_dim=50,
        char_dim=16,
        char_out=16,
        hidden=32,
        seed=seed + 1,
    )
    teacher = (
        tw["fc_w"].astype(np.float64),
        tw["fc_b"].astype(np.float64),
        tw["trans"].astype(np.float64),
    )

    cache = []
    for url, sid, toks in sents:
        wids, cids = encode_sentence(toks, word_to_id, char_to_id)
        h, _ = model.hidden_states([wids], [cids])
        hn = h[0, : len(wids)].astype("<f4")
        feats = head_emissions(hn.astype(np.float64), teacher[0], teacher[1])
        tids = np.array(
            viterbi_path(feats, teacher[2], start, stop), dtype=np.int64
        )
        cache.append((hn, tids, _dev_of(url, int(sid), dev_mod)))

    w0 = model.w
    head = (
        w0["fc_w"].astype(np.float64).copy(),
        w0["fc_b"].astype(np.float64).copy(),
        w0["trans"].astype(np.float64).copy(),
    )
    momenta = tuple(np.zeros_like(p) for p in head)

    def f1_of(head):
        total = ChunkCounts()
        for hn, tids, is_dev in cache:
            if not is_dev:
                continue
            feats = head_emissions(hn.astype(np.float64), head[0], head[1])
            pred = viterbi_path(feats, head[2], start, stop)
            total.merge(
                count_chunks(
                    [id_to_tag[t] for t in tids], [id_to_tag[t] for t in pred]
                )
            )
        return float(evaluate_counts(total)["f1"])

    rows = [(0, 0, 0.0, f1_of(head))]
    C, H2 = head[0].shape
    for epoch in range(1, n_epochs + 1):
        gw = np.zeros((C, H2), dtype=np.int64)
        gb = np.zeros(C, dtype=np.int64)
        gt = np.zeros((C, C), dtype=np.int64)
        nll_i = 0
        n = 0
        n_tok = 0
        for hn, tids, is_dev in cache:
            if is_dev:
                continue
            nll, dw, db, dt = crf_head_grads(
                np.frombuffer(hn.tobytes(), dtype="<f4").reshape(hn.shape),
                tids, head[0], head[1], head[2], start, stop,
            )
            gw += np.rint(dw * GRAD_SCALE).astype(np.int64)
            gb += np.rint(db * GRAD_SCALE).astype(np.int64)
            gt += np.rint(dt * GRAD_SCALE).astype(np.int64)
            nll_i += int(round(nll * NLL_SCALE))
            n += 1
            n_tok += len(tids)
        mean_nll = (nll_i / NLL_SCALE) / n if n else 0.0
        grads = tuple(
            g.astype(np.float64) / GRAD_SCALE / max(n_tok, 1)
            for g in (gw, gb, gt)
        )
        lr_t = lr / (1.0 + lr_decay * (epoch - 1))
        sgd_step(head, momenta, grads, lr_t, momentum, clip)
        rows.append((epoch, n, round(mean_nll, 4), f1_of(head)))
    return pa.Table.from_pydict(
        {
            "epoch": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_train": pa.array([r[1] for r in rows], type=pa.int64()),
            "mean_nll": pa.array([r[2] for r in rows], type=pa.float64()),
            "dev_f1": pa.array(
                [round(r[3], 6) for r in rows], type=pa.float64()
            ),
        }
    )


def training_curve_full_expected(
    sents,
    n_epochs: int = 3,
    lr: float = 1.0,
    lr_decay: float = 0.3,
    momentum: float = 0.5,
    clip: float = 5.0,
    seed: int = 1234,
    dev_mod: int = 5,
) -> pa.Table:
    """Sequential mirror of pipelines/training_full.train_loop_full: plain
    python loop over sentences — same teacher labels as train_loop, then
    FULL-MODEL per-sentence integer-quantized gradients
    (training_full.quantized_sentence_grads, the shared atomic unit) and
    the same all-parameter SGD; no ray.data anywhere. Hash-matching this
    proves the distributed trajectory is partitioning-invariant."""
    from ner_pytorch_ray.functions.conlleval import (
        ChunkCounts,
        count_chunks,
        evaluate_counts,
    )
    from ner_pytorch_ray.pipelines.training import GRAD_SCALE, NLL_SCALE, _dev_of
    from ner_pytorch_ray.pipelines.training_full import (
        TRAINED_PARAMS,
        quantized_sentence_grads,
        sgd_step_full,
        unpack_dense,
    )
    from ner_pytorch_ray.state.backprop import dense_shapes, full_forward
    from ner_pytorch_ray.state.model import head_emissions, viterbi_path

    word_to_id, char_to_id, tag_to_id, id_to_tag, model = build_model_state(
        sents, seed
    )
    n_tags = len(tag_to_id)
    start, stop = n_tags - 2, n_tags - 1
    tw = init_weights(
        n_words=len(word_to_id),
        n_chars=len(char_to_id),
        n_tags=n_tags,
        word_dim=50,
        char_dim=16,
        char_out=16,
        hidden=32,
        seed=seed + 1,
    )
    teacher = (
        tw["fc_w"].astype(np.float64),
        tw["fc_b"].astype(np.float64),
        tw["trans"].astype(np.float64),
    )

    cache = []
    for url, sid, toks in sents:
        wids, cids = encode_sentence(toks, word_to_id, char_to_id)
        h, _ = model.hidden_states([wids], [cids])
        hn = h[0, : len(wids)].astype("<f4")
        feats = head_emissions(hn.astype(np.float64), teacher[0], teacher[1])
        tids = np.array(
            viterbi_path(feats, teacher[2], start, stop), dtype=np.int64
        )
        cache.append((wids, cids, tids, _dev_of(url, int(sid), dev_mod)))

    w0 = model.w
    params = {k: w0[k].astype(np.float64).copy() for k in TRAINED_PARAMS}
    params["meta"] = w0["meta"]
    momenta = {k: np.zeros_like(params[k]) for k in TRAINED_PARAMS}
    shapes = dense_shapes(w0)
    dsize = int(sum(np.prod(shapes[k]) for k in shapes))

    def f1_of():
        total = ChunkCounts()
        for wids, cids, tids, is_dev in cache:
            if not is_dev:
                continue
            feats, _ = full_forward(params, wids, cids)
            pred = viterbi_path(feats, params["trans"], start, stop)
            total.merge(
                count_chunks(
                    [id_to_tag[t] for t in tids], [id_to_tag[t] for t in pred]
                )
            )
        return float(evaluate_counts(total)["f1"])

    rows = [(0, 0, 0.0, f1_of())]
    d_w = params["word_embed"].shape[1]
    for epoch in range(1, n_epochs + 1):
        dense_i = np.zeros(dsize, dtype=np.int64)
        word_i = np.zeros(params["word_embed"].shape, dtype=np.int64)
        nll_i = 0
        n = 0
        n_tok = 0
        for wids, cids, tids, is_dev in cache:
            if is_dev:
                continue
            s_nll, flat_i, uniq, agg_i = quantized_sentence_grads(
                params, wids, cids, tids, start, stop, shapes
            )
            dense_i += flat_i
            np.add.at(word_i, uniq, agg_i)
            nll_i += s_nll
            n += 1
            n_tok += len(wids)
        mean_nll = (nll_i / NLL_SCALE) / n if n else 0.0
        grads = unpack_dense(
            dense_i.astype(np.float64) / GRAD_SCALE / max(n_tok, 1), shapes
        )
        grads["word_embed"] = (
            word_i.astype(np.float64) / GRAD_SCALE / max(n_tok, 1)
        )
        lr_t = lr / (1.0 + lr_decay * (epoch - 1))
        sgd_step_full(params, momenta, grads, lr_t, momentum, clip)
        rows.append((epoch, n, round(mean_nll, 4), f1_of()))
    return pa.Table.from_pydict(
        {
            "epoch": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_train": pa.array([r[1] for r in rows], type=pa.int64()),
            "mean_nll": pa.array([r[2] for r in rows], type=pa.float64()),
            "dev_f1": pa.array(
                [round(r[3], 6) for r in rows], type=pa.float64()
            ),
        }
    )


def training_curve_adv_expected(
    sents,
    n_epochs: int = 3,
    lr: float = 6.0,
    lr_decay: float = 0.3,
    momentum: float = 0.5,
    clip: float = 5.0,
    seed: int = 1234,
    dev_mod: int = 5,
    adv_n_variants: int = 2,
    adv_mode: str = "dynamic",
    adv_topk: int = 5,
    launch_epoch: int = 1,
    adv_ratio: float = 0.5,
    adv_warmup_epochs: int = 2,
) -> pa.Table:
    """Sequential mirror of pipelines/training.train_loop with
    adversarial-loss mixing (adv_order='rep'): rep variants generated by
    the same seeded mirror as adv_rep_variants, run through the frozen
    backbone + teacher labels, dev rows dropped, then per epoch >=
    launch_epoch: per-sentence top-k-by-NLL selection (dynamic) and
    grad = (1-ratio)*clean + ratio*adv with the WarmupWeight ratio — all
    in a plain python loop, no ray.data anywhere."""
    from ner_pytorch_ray.functions.conlleval import (
        ChunkCounts,
        count_chunks,
        evaluate_counts,
    )
    from ner_pytorch_ray.pipelines.training import (
        GRAD_SCALE,
        NLL_SCALE,
        _dev_of,
        sgd_step,
    )
    from ner_pytorch_ray.state.model import (
        crf_head_grads,
        crf_head_nll,
        head_emissions,
        viterbi_path,
    )
    from ner_pytorch_ray.state.schedulers import WarmupWeight

    word_to_id, char_to_id, tag_to_id, id_to_tag, model = build_model_state(
        sents, seed
    )
    n_tags = len(tag_to_id)
    start, stop = n_tags - 2, n_tags - 1
    tw = init_weights(
        n_words=len(word_to_id),
        n_chars=len(char_to_id),
        n_tags=n_tags,
        word_dim=50,
        char_dim=16,
        char_out=16,
        hidden=32,
        seed=seed + 1,
    )
    teacher = (
        tw["fc_w"].astype(np.float64),
        tw["fc_b"].astype(np.float64),
        tw["trans"].astype(np.float64),
    )

    def featurize(toks):
        wids, cids = encode_sentence(toks, word_to_id, char_to_id)
        h, _ = model.hidden_states([wids], [cids])
        hn = h[0, : len(wids)].astype("<f4")
        feats = head_emissions(hn.astype(np.float64), teacher[0], teacher[1])
        tids = np.array(
            viterbi_path(feats, teacher[2], start, stop), dtype=np.int64
        )
        return hn, tids

    cache = []
    for url, sid, toks in sents:
        hn, tids = featurize(toks)
        cache.append((hn, tids, _dev_of(url, int(sid), dev_mod)))

    # adversarial variant cache: rep variants of TRAIN sentences, packed
    # per source sentence in variant_id order
    tagged = [(u, s, t, gaz_tags(t)) for u, s, t in sents]
    bank = build_bank(tagged)
    adv_packed: dict[tuple, list] = {}
    for u, sid, vid, toks, _tags in rep_variants(
        tagged, bank, adv_n_variants
    ):
        if _dev_of(u, int(sid), dev_mod):
            continue
        hn, tids = featurize(toks)
        adv_packed.setdefault((u, sid), []).append((vid, hn, tids))
    adv_cache = [
        sorted(v, key=lambda x: x[0]) for _, v in sorted(adv_packed.items())
    ]

    w0 = model.w
    head = (
        w0["fc_w"].astype(np.float64).copy(),
        w0["fc_b"].astype(np.float64).copy(),
        w0["trans"].astype(np.float64).copy(),
    )
    momenta = tuple(np.zeros_like(p) for p in head)
    ratio_sched = WarmupWeight(adv_ratio, adv_warmup_epochs, n_epochs, "linear")

    def f1_of(head):
        total = ChunkCounts()
        for hn, tids, is_dev in cache:
            if not is_dev:
                continue
            feats = head_emissions(hn.astype(np.float64), head[0], head[1])
            pred = viterbi_path(feats, head[2], start, stop)
            total.merge(
                count_chunks(
                    [id_to_tag[t] for t in tids], [id_to_tag[t] for t in pred]
                )
            )
        return float(evaluate_counts(total)["f1"])

    def int_grads(items):
        C, H2 = head[0].shape
        gw = np.zeros((C, H2), dtype=np.int64)
        gb = np.zeros(C, dtype=np.int64)
        gt = np.zeros((C, C), dtype=np.int64)
        nll_i = 0
        n = 0
        n_tok = 0
        for hn, tids in items:
            nll, dw, db, dt = crf_head_grads(
                np.frombuffer(hn.tobytes(), dtype="<f4").reshape(hn.shape),
                tids, head[0], head[1], head[2], start, stop,
            )
            gw += np.rint(dw * GRAD_SCALE).astype(np.int64)
            gb += np.rint(db * GRAD_SCALE).astype(np.int64)
            gt += np.rint(dt * GRAD_SCALE).astype(np.int64)
            nll_i += int(round(nll * NLL_SCALE))
            n += 1
            n_tok += len(tids)
        return n, n_tok, nll_i, gw, gb, gt

    rows = [(0, 0, 0.0, f1_of(head), 0, 0.0, 0.0)]
    for epoch in range(1, n_epochs + 1):
        n, n_tok, nll_i, gw, gb, gt = int_grads(
            (hn, tids) for hn, tids, is_dev in cache if not is_dev
        )
        mean_nll = (nll_i / NLL_SCALE) / n if n else 0.0
        grads = tuple(
            g.astype(np.float64) / GRAD_SCALE / max(n_tok, 1)
            for g in (gw, gb, gt)
        )
        ratio = 0.0
        n_adv = 0
        mean_nll_adv = 0.0
        if (epoch - 1) >= launch_epoch:
            ratio = float(ratio_sched.step())
            sel = []
            for group in adv_cache:
                its = group
                if adv_mode == "dynamic" and len(its) > adv_topk:
                    nlls = np.array(
                        [
                            crf_head_nll(
                                np.frombuffer(
                                    hn.tobytes(), dtype="<f4"
                                ).reshape(hn.shape),
                                tids, head[0], head[1], head[2], start, stop,
                            )
                            for _, hn, tids in its
                        ]
                    )
                    keep = np.argsort(-nlls, kind="stable")[:adv_topk]
                    its = [its[i] for i in sorted(keep)]
                sel.extend((hn, tids) for _, hn, tids in its)
            n_adv, n_adv_tok, nll_adv_i, aw, ab, at = int_grads(sel)
            mean_nll_adv = (nll_adv_i / NLL_SCALE) / n_adv if n_adv else 0.0
            adv_grads = tuple(
                g.astype(np.float64) / GRAD_SCALE / max(n_adv_tok, 1)
                for g in (aw, ab, at)
            )
            grads = tuple(
                (1.0 - ratio) * gc + ratio * ga
                for gc, ga in zip(grads, adv_grads)
            )
        lr_t = lr / (1.0 + lr_decay * (epoch - 1))
        sgd_step(head, momenta, grads, lr_t, momentum, clip)
        rows.append(
            (epoch, n, round(mean_nll, 4), f1_of(head),
             n_adv, round(mean_nll_adv, 4), round(ratio, 6))
        )
    return pa.Table.from_pydict(
        {
            "epoch": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_train": pa.array([r[1] for r in rows], type=pa.int64()),
            "mean_nll": pa.array([r[2] for r in rows], type=pa.float64()),
            "dev_f1": pa.array(
                [round(r[3], 6) for r in rows], type=pa.float64()
            ),
            "n_adv": pa.array([r[4] for r in rows], type=pa.int64()),
            "mean_nll_adv": pa.array([r[5] for r in rows], type=pa.float64()),
            "ratio": pa.array([r[6] for r in rows], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------- main
def hll_expected(sf_dir: str) -> pa.Table:
    """Sequential HLL count-distinct per event_type. The REGISTER build is an
    independent pure-Python reimplementation (per-key loop, no numpy/arrow);
    only the final estimate formula is shared with
    pipelines/sketches._estimate so the two sides round identically."""
    from ner_pytorch_ray.pipelines.sketches import _M, _P, _estimate

    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    MASK = 0xFFFFFFFFFFFFFFFF

    def h64(v: int) -> int:
        x = (v + 0x9E3779B97F4A7C15) & MASK
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
        return x ^ (x >> 31)

    regs: dict[str, list[int]] = {}
    for et, uid in zip(
        t.column("event_type").to_pylist(), t.column("user_id").to_pylist()
    ):
        h = h64(int(uid))
        r = h >> (64 - _P)
        rest = (h << _P) & MASK
        if rest == 0:
            rho = 64 - _P + 1
        else:
            rho = 1
            while not (rest >> 63) & 1:
                rho += 1
                rest = (rest << 1) & MASK
        m = regs.setdefault(et, [0] * _M)
        if rho > m[r]:
            m[r] = rho
    ets = sorted(regs)
    return pa.table(
        {
            "event_type": pa.array(ets, type=pa.string()),
            "n_distinct_approx": pa.array(
                [_estimate(np.asarray(regs[et], dtype=np.int64)) for et in ets],
                type=pa.int64(),
            ),
        }
    )


def transe_expected(sf_dir: str, dim: int = 16, epochs: int = 5) -> pa.Table:
    """Sequential TransE recompute — INDEPENDENT implementation (scalar
    loops + dicts; the pipeline uses vectorized gather/einsum/reduceat).
    Triples come from the kg_relations SQL oracle (itself proven equal to
    the distributed extraction), so this gates the training math, not the
    extraction."""
    curve, _, _, _, _ = _transe_train_seq(sf_dir, dim, epochs)
    return pa.table(
        {
            "epoch": pa.array([c[0] for c in curve], type=pa.int64()),
            "loss_micro2": pa.array([c[1] for c in curve], type=pa.int64()),
            "n_active": pa.array([c[2] for c in curve], type=pa.int64()),
            "emb_checksum": pa.array([c[3] for c in curve], type=pa.int64()),
        }
    )


def _transe_train_seq(sf_dir: str, dim: int, epochs: int):
    """Shared sequential trainer: (curve rows, E, R, entities, triples)."""
    import glob

    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(path))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    sql = entry.oracle_sql()["kg_relations"]
    tri = con.execute(
        f"SELECT DISTINCT subj, pred, obj FROM ({sql})"
    ).fetchall()
    entities = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    relations = sorted({p for _, p, _ in tri})
    MICRO, INIT = 1_000_000, 375_000
    margin_sq, lr = MICRO * MICRO, 10_000
    n_ent = len(entities)
    eix = {e: i for i, e in enumerate(entities)}
    rix = {r: i for i, r in enumerate(relations)}

    def h64(s: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )

    E = {
        e: [(h64(f"ent:{e}:{k}") % (2 * INIT + 1)) - INIT for k in range(dim)]
        for e in entities
    }
    R = {
        r: [(h64(f"rel:{r}:{k}") % (2 * INIT + 1)) - INIT for k in range(dim)]
        for r in relations
    }
    curve = []
    for epoch in range(epochs):
        ge: dict[str, list[int]] = {}
        gr: dict[str, list[int]] = {}
        loss = active = 0

        def add(acc, key, vec, sign):
            a = acc.setdefault(key, [0] * dim)
            for k in range(dim):
                a[k] += sign * vec[k]

        for s, p, o in tri:
            h, r, t = E[s], R[p], E[o]
            dp = [h[k] + r[k] - t[k] for k in range(dim)]
            d_pos = sum(x * x for x in dp)
            for salt, corrupt_head in (("nt", False), ("nh", True)):
                ni = h64(f"{s}|{p}|{o}|{salt}") % n_ent
                if corrupt_head:
                    if ni == eix[s]:
                        ni = (ni + 1) % n_ent
                    cand = entities[ni]
                    dn = [E[cand][k] + r[k] - t[k] for k in range(dim)]
                else:
                    if ni == eix[o]:
                        ni = (ni + 1) % n_ent
                    cand = entities[ni]
                    dn = [h[k] + r[k] - E[cand][k] for k in range(dim)]
                d_neg = sum(x * x for x in dn)
                hinge = margin_sq + d_pos - d_neg
                if hinge <= 0:
                    continue
                active += 1
                loss += hinge
                gp = [2 * x for x in dp]
                gn = [2 * x for x in dn]
                add(gr, p, gp, 1)
                add(gr, p, gn, -1)
                if corrupt_head:
                    add(ge, s, gp, 1)
                    add(ge, o, gn, 1)
                    add(ge, o, gp, -1)
                    add(ge, cand, gn, -1)
                else:
                    add(ge, s, gp, 1)
                    add(ge, s, gn, -1)
                    add(ge, o, gp, -1)
                    add(ge, cand, gn, 1)
        for e, g in ge.items():
            for k in range(dim):
                E[e][k] -= (lr * g[k]) // MICRO
        for r_, g in gr.items():
            for k in range(dim):
                R[r_][k] -= (lr * g[k]) // MICRO
        checksum = sum(abs(x) for v in E.values() for x in v) + sum(
            abs(x) for v in R.values() for x in v
        )
        curve.append((epoch, loss, active, checksum))
    return curve, E, R, entities, tri


def transe_hits_expected(sf_dir: str, dim: int = 16, epochs: int = 5) -> pa.Table:
    """Sequential TransE link-prediction scoring — scalar loops over the
    sequentially-trained state (pipeline scores with vectorized gather +
    einsum over the distributed-trained state; equality gates both the
    training and the scoring math)."""
    _, E, R, entities, tri = _transe_train_seq(sf_dir, dim, epochs)
    n_ent = len(entities)
    eix = {e: i for i, e in enumerate(entities)}

    def h64(s: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )

    def dist(h, r, t):
        return sum((h[k] + r[k] - t[k]) ** 2 for k in range(dim))

    rows = []
    for s_, p_, o_ in sorted(tri):
        nt = h64(f"{s_}|{p_}|{o_}|nt") % n_ent
        if nt == eix[o_]:
            nt = (nt + 1) % n_ent
        nh = h64(f"{s_}|{p_}|{o_}|nh") % n_ent
        if nh == eix[s_]:
            nh = (nh + 1) % n_ent
        d_pos = dist(E[s_], R[p_], E[o_])
        d_nt = dist(E[s_], R[p_], E[entities[nt]])
        d_nh = dist(E[entities[nh]], R[p_], E[o_])
        rows.append(
            (s_, p_, o_, d_pos, d_nt, d_nh,
             int(d_pos < d_nt and d_pos < d_nh))
        )
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], type=pa.string()),
            "pred": pa.array([r[1] for r in rows], type=pa.string()),
            "obj": pa.array([r[2] for r in rows], type=pa.string()),
            "d_pos": pa.array([r[3] for r in rows], type=pa.int64()),
            "d_neg_tail": pa.array([r[4] for r in rows], type=pa.int64()),
            "d_neg_head": pa.array([r[5] for r in rows], type=pa.int64()),
            "hit": pa.array([r[6] for r in rows], type=pa.int64()),
        }
    )


def coreness_expected(sf_dir: str) -> pa.Table:
    """Sequential k-core peel — INDEPENDENT implementation (classic
    min-degree peeling with dict adjacency; the pipeline runs the
    Montresor H-index fixpoint). Edges come from the graph_components
    oracle's SQL pair CTE (itself proven equal to the distributed
    containment stage), so this gates the decomposition, not the pair
    generation."""
    import collections

    import duckdb

    q = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  ' ' || text || ' ' AS padded
           FROM read_parquet('{sf_dir}/documents.parquet')),
p AS (SELECT doc_id, ' ' || array_to_string(toks[1:5], ' ') || ' ' AS prefix
      FROM t WHERE len(toks) >= 5),
pairs AS (SELECT p.doc_id AS a, t2.doc_id AS b FROM p JOIN t t2
          ON position(p.prefix IN t2.padded) > 0
         AND t2.doc_id <> p.doc_id AND len(t2.toks) >= 5),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs)
SELECT a, b FROM edges
"""
    rows = duckdb.sql(q).fetchall()
    adjacency = collections.defaultdict(set)
    for a, b in rows:
        adjacency[a].add(b)
    remaining = {v: len(ns) for v, ns in adjacency.items()}
    core: dict[int, int] = {}
    k = 0
    while remaining:
        k = max(k, min(remaining.values()))
        peel = [v for v, d in remaining.items() if d <= k]
        while peel:
            v = peel.pop()
            if v not in remaining:
                continue
            core[v] = k
            del remaining[v]
            for u in adjacency[v]:
                if u in remaining:
                    remaining[u] -= 1
                    if remaining[u] <= k:
                        peel.append(u)
    ks = sorted(core)
    return pa.table(
        {
            "node": pa.array(ks, type=pa.int64()),
            "core": pa.array([core[n] for n in ks], type=pa.int64()),
        }
    )


def main(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table):
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    write("ann_lsh_topk", ann_lsh_expected(sf_dir))
    write("ivf_topk", ivf_topk_expected(sf_dir))
    write("pq_topk", pq_topk_expected(sf_dir))
    write("approx_distinct_users", hll_expected(sf_dir))
    write("kg_transe_curve", transe_expected(sf_dir))
    write("graph_coreness", coreness_expected(sf_dir))
    write("kg_transe_hits", transe_hits_expected(sf_dir))
    write("pca_components", pca_expected(sf_dir))

    sents = sentence_rows(sf_dir, zeros=True)
    tagged = [(u, s, t, gaz_tags(t)) for u, s, t in sents]

    # neural path
    pred = neural_pred_tags(sents)
    write("neural_mentions", mentions_table(pred))
    pairs = [
        (tt, pt)
        for (_, _, _, tt), (_, _, _, pt) in zip(tagged, pred)
    ]
    mt, ct = conlleval_tables(pairs)
    write("neural_eval_metrics", mt)
    write("neural_confusion", ct)

    write("tag_embeddings", tag_embeddings_expected(tagged))
    write("neural_epoch_loss", neural_epoch_loss_expected(sents, tagged))
    write("training_curve", training_curve_expected(sents))
    write("training_curve_adv", training_curve_adv_expected(sents))
    write("training_curve_full", training_curve_full_expected(sents))

    # adversarial path
    bank = build_bank(tagged)
    rep2 = rep_variants(tagged, bank, n_variants=2)
    write("adv_rep_variants", keys_table(rep2))
    write("adv_ppdb_variants", keys_table(ppdb_variants(tagged, n_variants=1)))
    write("adv_para_variants", keys_table(para_variants(tagged)))

    ppl = unigram_lm(sf_dir)
    rep3 = rep_variants(tagged, bank, n_variants=3)
    write("adv_topk_loss", adv_topk_loss_expected(sents, rep3))
    base_ppl = {(u, s): ppl(t) for u, s, t in sents}
    by_sent: dict[tuple, list] = {}
    for u, s, v, toks, _ in rep3:
        by_sent.setdefault((u, s), []).append((v, ppl(toks)))
    filtered, topk = [], []
    for (u, s), cands in sorted(by_sent.items()):
        cands.sort()
        bp = base_ppl[(u, s)]
        kept = [c for c in cands if c[1] < 3.0 * bp][:2]
        if len(kept) < 2:
            kept_ids = {c[0] for c in kept}
            kept += [c for c in cands if c[0] not in kept_ids][: 2 - len(kept)]
        filtered.extend((u, s, v) for v, _ in kept)
        # adv_topk: rank by ppl desc (ties: variant_id asc), keep top 2
        ranked = sorted(cands, key=lambda c: (-c[1], c[0]))[:2]
        topk.extend((u, s, v, p, r) for r, (v, p) in enumerate(ranked))
    write("adv_ppl_filtered", keys_table(filtered))
    write(
        "adv_topk",
        pa.Table.from_pydict(
            {
                "url": pa.array([r[0] for r in topk], type=pa.string()),
                "sent_id": pa.array([r[1] for r in topk], type=pa.int64()),
                "variant_id": pa.array([r[2] for r in topk], type=pa.int64()),
                "ppl": pa.array([r[3] for r in topk], type=pa.float64()),
                "rank": pa.array([r[4] for r in topk], type=pa.int64()),
            }
        ),
    )

    # adv_stage_stats over order rep,ppdb,orun (defaults: rep n=3, ppdb n=2)
    n_sources = len(tagged)
    stats = []
    for stage, rows in (
        ("rep", rep3),
        ("ppdb", ppdb_variants(tagged, n_variants=2)),
        ("orun", orun_variants(tagged)),
    ):
        mod = {(r[0], r[1]) for r in rows}
        stats.append((stage, len(rows), len(mod), len(mod) / n_sources))
    write(
        "adv_stage_stats",
        pa.Table.from_pydict(
            {
                "stage": pa.array([s[0] for s in stats], type=pa.string()),
                "n_sources": pa.array([n_sources] * len(stats), type=pa.int64()),
                "n_variants": pa.array([s[1] for s in stats], type=pa.int64()),
                "n_modified_sources": pa.array(
                    [s[2] for s in stats], type=pa.int64()
                ),
                "modification_rate": pa.array(
                    [s[3] for s in stats], type=pa.float64()
                ),
            }
        ),
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "tests", "expected")
    main(sf, out)


def pca_expected(sf_dir: str, k: int = 2) -> pa.Table:
    """Sequential PCA recompute: one plain row-at-a-time pass over the
    vec_id-sorted embedding table with the engine's published
    quantization spec (per-dim sums in int64 billionths; per-row UNCENTERED
    outer products in int64 millionths; C = M/1e6/n - mu mu^T), then
    numpy eigh + the same
    sign/rounding rules. No ray.data, no engine imports."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    rows = [
        np.asarray(e, dtype=np.float64)
        for e in t.column("embedding").to_pylist()
    ]
    n, d = len(rows), len(rows[0])
    s = np.zeros(d, dtype=np.int64)
    m = np.zeros((d, d), dtype=np.int64)
    for r in rows:
        s += np.rint(r * 1_000_000_000).astype(np.int64)
        m += np.rint(np.outer(r, r) * 1_000_000).astype(np.int64)
    mu = s.astype(np.float64) / 1_000_000_000 / n
    cov = m.astype(np.float64) / 1_000_000 / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps, dims, vals, eigs = [], [], [], []
    for rank, idx in enumerate(order):
        vec = v[:, idx]
        for x in vec:
            if abs(x) > 1e-9:
                if x < 0:
                    vec = -vec
                break
        for j, x in enumerate(vec):
            comps.append(rank)
            dims.append(j)
            vals.append(int(np.rint(x * 10_000)))
            eigs.append(int(np.rint(w[idx] * 10_000)))
    return pa.Table.from_pydict(
        {
            "component": pa.array(comps, type=pa.int64()),
            "dim_idx": pa.array(dims, type=pa.int64()),
            "value_tm": pa.array(vals, type=pa.int64()),
            "eigval_tm": pa.array(eigs, type=pa.int64()),
        }
    )


def ivfpq_topk_expected(
    sf_dir: str,
    n_queries=10,
    k=5,
    n_centroids=16,
    n_probe=4,
    n_subq=4,
    n_codes=16,
    sample=4096,
) -> pa.Table:
    """Sequential recompute of the IVF-PQ contract: same seeded fits,
    full-corpus coarse assignment + residual codes, and per query the
    fixed-order ADC score (coarse term first, then subspace terms in
    ascending s) over the probed lists only."""
    from ner_pytorch_ray.pipelines.similarity import (
        _fit_centroids,
        _fit_pq_codebooks,
        pq_encode,
    )

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id").to_numpy())
    M = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    C = _fit_centroids(M[:sample], n_centroids)
    assign_s = np.argmax(M[:sample] @ C.T, axis=1)
    books = _fit_pq_codebooks(M[:sample] - C[assign_s], n_subq, n_codes)
    assign = np.argmax(M @ C.T, axis=1)
    codes = pq_encode(M - C[assign], books)
    n_sq, n_c, d = books.shape
    rows = []
    for qpos in np.nonzero(ids < n_queries)[0]:
        q = M[qpos]
        lut = np.einsum("sd,scd->sc", q.reshape(n_sq, d), books)
        lut_c = q @ C.T
        probe = set(
            np.argsort(-(q @ C.T), kind="stable")[:n_probe].tolist()
        )
        cand = np.nonzero(
            np.isin(assign, list(probe)) & (ids != ids[qpos])
        )[0]
        if not len(cand):
            continue
        s = lut_c[assign[cand]].copy()
        for sub in range(n_sq):
            s += lut[sub, codes[cand, sub]]
        sel = np.lexsort((ids[cand], -s))[:k]
        for r, i in enumerate(sel, start=1):
            rows.append((int(ids[qpos]), int(ids[cand][i]), r))
    return pa.Table.from_pydict(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "rank": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def pca_project_expected(sf_dir: str, k: int = 2) -> pa.Table:
    """Sequential recompute of the integer PCA projection: the same
    component table as pca_expected, row-at-a-time integer dot
    products."""
    comp = pca_expected(sf_dir, k=k)
    d = max(comp.column("dim_idx").to_pylist()) + 1
    V = np.zeros((d, k), dtype=np.int64)
    for c, j, v in zip(
        comp.column("component").to_pylist(),
        comp.column("dim_idx").to_pylist(),
        comp.column("value_tm").to_pylist(),
    ):
        V[j, c] = v
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = t.column("vec_id").to_pylist()
    cols = {f"p{j}_i": [] for j in range(k)}
    for e in t.column("embedding").to_pylist():
        x = np.rint(np.asarray(e, np.float64) * 1_000_000_000).astype(
            np.int64
        )
        for j in range(k):
            cols[f"p{j}_i"].append(int(x @ V[:, j]))
    out = {"vec_id": pa.array(ids, pa.int64())}
    for j in range(k):
        out[f"p{j}_i"] = pa.array(cols[f"p{j}_i"], pa.int64())
    return pa.Table.from_pydict(out)


def bpe_expected(
    sf_dir: str, n_merges: int = 20, min_count: int = 2
) -> tuple[pa.Table, pa.Table]:
    """Sequential BPE recompute (Sennrich et al. 2016 greedy merges) with
    the engine's exact spec: whitespace words of 1..32 chars without
    embedded newlines, symbols = chars + '</w>', best pair per round under
    the total order (-count, left, right), classic greedy left-to-right
    merge application. Plain Counter loops — no ray.data, no engine
    imports. Returns (merge table, piece-stats table)."""
    import collections

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    wc: collections.Counter = collections.Counter()
    for txt in t.column("text").to_pylist():
        for w in (txt.split(" ") if txt else []):
            if 0 < len(w) <= 32 and "\n" not in w and "\r" not in w:
                wc[w] += 1
    syms = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rank in range(n_merges):
        pcnt: collections.Counter = collections.Counter()
        for w, f in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pcnt[(s[i], s[i + 1])] += f
        if not pcnt:
            break
        (left, right), c = min(
            pcnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if c < min_count:
            break
        merges.append((rank, left, right, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    merge_t = pa.Table.from_pydict(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )
    stats: dict[int, list[int]] = {}
    for w, s in syms.items():
        e = stats.setdefault(len(s), [0, 0])
        e[0] += 1
        e[1] += wc[w]
    ks = sorted(stats)
    stats_t = pa.Table.from_pydict(
        {
            "n_pieces": pa.array(ks, pa.int64()),
            "n_words": pa.array([stats[k][0] for k in ks], pa.int64()),
            "total_freq": pa.array([stats[k][1] for k in ks], pa.int64()),
        }
    )
    return merge_t, stats_t


def semdedup_expected(
    sf_dir: str,
    n_centroids: int = 8,
    tau_int: int = 450_000_000_000,
    sample: int = 4096,
) -> pa.Table:
    """Sequential SemDeDup recompute: the engine's published spec
    (spherical k-means on the vec_id<sample rows, seeded init; embeddings
    quantized to int64 millionths; integer argmax assignment with
    lowest-index ties; within-cluster union-find over integer-dot pairs
    >= tau_int; keep = min (centroid-dot, vec_id) per component), with
    row-at-a-time integer dot products. No ray.data, no engine imports —
    only the fit reuses the same numpy calls (sum/argmax) the spec
    defines."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = t.column("vec_id").to_pylist()
    M = np.array(
        [np.asarray(e, np.float64) for e in t.column("embedding").to_pylist()]
    )
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    fit_rows = np.array([i for i, v in enumerate(ids) if v < sample])
    Mf = M[fit_rows]
    rng = np.random.RandomState(23)
    idx = rng.choice(len(Mf), size=min(len(Mf), n_centroids), replace=False)
    C = Mf[np.sort(idx)].copy()
    for _ in range(5):
        assign = np.argmax(Mf @ C.T, axis=1)
        for c in range(len(C)):
            members = Mf[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    Ci = np.rint(C * 1_000_000).astype(np.int64)
    X = np.rint(M * 1_000_000).astype(np.int64)

    # row-at-a-time integer assignment, strict > keeps the lowest index
    clusters, cdots = [], []
    for x in X:
        best_c, best_d = 0, None
        for c in range(len(Ci)):
            d = int(sum(int(a) * int(b) for a, b in zip(x, Ci[c])))
            if best_d is None or d > best_d:
                best_c, best_d = c, d
        clusters.append(best_c)
        cdots.append(best_d)

    keep = [False] * len(ids)
    for c in sorted(set(clusters)):
        rows = [i for i in range(len(ids)) if clusters[i] == c]
        parent = {i: i for i in rows}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for ai in range(len(rows)):
            for bi in range(ai + 1, len(rows)):
                i, j = rows[ai], rows[bi]
                d = int(sum(int(a) * int(b) for a, b in zip(X[i], X[j])))
                if d >= tau_int:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comps: dict[int, list[int]] = {}
        for i in rows:
            comps.setdefault(find(i), []).append(i)
        for members in comps.values():
            w = min(members, key=lambda i: (cdots[i], ids[i]))
            keep[w] = True
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array([int(c) for c in clusters], pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def bpe_encode_expected(
    sf_dir: str, n_merges: int = 20, min_count: int = 2
) -> pa.Table:
    """Sequential corpus-encode recompute: train the merge table with the
    same Counter loop as ``bpe_expected``, then tokenize EVERY document
    word (no length/newline filter at encode time — the engine's spec)
    by applying the merges in rank order, greedy left-to-right per rank.
    Plain dict/list loops — no ray.data, no engine imports. Returns
    (doc_id, n_words, n_pieces) sorted by doc_id."""
    import collections

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    wc: collections.Counter = collections.Counter()
    for txt in t.column("text").to_pylist():
        for w in (txt.split(" ") if txt else []):
            if 0 < len(w) <= 32 and "\n" not in w and "\r" not in w:
                wc[w] += 1
    syms = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for _rank in range(n_merges):
        pcnt: collections.Counter = collections.Counter()
        for w, f in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pcnt[(s[i], s[i + 1])] += f
        if not pcnt:
            break
        (left, right), c = min(
            pcnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if c < min_count:
            break
        merges.append((left, right))

        def _apply(s, left=left, right=right):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        for w in syms:
            syms[w] = _apply(syms[w])

    cache: dict = {}

    def n_pieces(word: str) -> int:
        n = cache.get(word)
        if n is None:
            s = list(word) + ["</w>"]
            for left, right in merges:
                out, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == left
                        and s[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            n = len(s)
            cache[word] = n
        return n

    rows = []
    for doc, txt in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        words = txt.split(" ")
        rows.append((doc, len(words), sum(n_pieces(w) for w in words)))
    rows.sort()
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_words": pa.array([r[1] for r in rows], pa.int64()),
            "n_pieces": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def dsir_expected(
    sf_dir: str,
    target_lang: str = "en",
    k: int = 100,
    n_buckets: int = 4096,
) -> pa.Table:
    """Sequential DSIR recompute (Xie et al. 2023 hashed-bigram
    importance weights): row-at-a-time blake2b token hashes, uint64
    bigram mix, add-one-smoothed integer-millionth log-ratio weights
    (the only float step — the same driver-side numpy expression the
    spec defines), per-doc integer sums, top-k by (weight desc,
    doc_id). No ray.data, no engine imports."""
    import hashlib

    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    hcache: dict = {}

    def th(tok: str) -> int:
        v = hcache.get(tok)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                "little",
            )
            hcache[tok] = v
        return v

    def buckets(text: str) -> list[int]:
        toks = text.split(" ")
        out = []
        for a, b in zip(toks, toks[1:]):
            mix = ((th(a) * 1_000_003) ^ th(b)) % (1 << 64)
            out.append(mix % n_buckets)
        return out

    t_cnt = np.zeros(n_buckets, dtype=np.int64)
    r_cnt = np.zeros(n_buckets, dtype=np.int64)
    docs = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    for _doc, text, lang in docs:
        for b in buckets(text):
            r_cnt[b] += 1
            if lang == target_lang:
                t_cnt[b] += 1
    T, R = int(t_cnt.sum()), int(r_cnt.sum())
    lam = np.rint(
        1_000_000
        * (
            np.log((t_cnt + 1) / (T + n_buckets))
            - np.log((r_cnt + 1) / (R + n_buckets))
        )
    ).astype(np.int64)
    rows = []
    for doc, text, _lang in docs:
        w = 0
        for b in buckets(text):
            w += int(lam[b])
        rows.append((doc, w))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "weight_i": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
