"""Dependency-parser actor-pool stage (C5/T6) + projection paraphrase stage.

The reference parses each sentence with a UDPipe model loaded once per
process (/root/reference/paraphrase_model.py:24-32,
/root/reference/dependency_paraphraser/udpipe.py:15-72) and reorders via
tree projection. UDPipe model files are NOT available in this sandbox:

  * ``ParserActor`` keeps the REAL shape — model "load" in ``__init__``
    (once per actor), per-batch parse in ``__call__``, output column
    ``deps: list<struct<head:int32, deprel:string, upos:string>>`` —
    with the real backend stubbed behind ``NotImplementedError`` and a
    deterministic rule parse standing in (clearly marked):
      - upos: verb lexicon -> VERB, gazetteer surfaces -> PROPN,
        'the'/'a' -> DET, else NOUN;
      - tree: first VERB is root; other tokens attach to the nearest verb
        to their left (else the root); deprel: root / nsubj (before root) /
        obj (after);
    The stand-in is pure and vocabulary-driven so tests pin it exactly.
  * ``paraphrase_stage`` is the 'para' adversarial stage analog
    (paraphrase_model.py:74-112): combine entity chunks into units
    (combine_tag), reorder units by seeded tree projection, re-emit
    aligned (tokens, tags).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ner_pytorch_ray.functions.projection import reorder_sentence
from ner_pytorch_ray.stages.gazetteer import BIGRAMS, GAZETTEER
from ner_pytorch_ray.stages.relations import VERB_LEXICON

DEP_TYPE = pa.list_(
    pa.struct(
        [
            ("head", pa.int32()),
            ("deprel", pa.string()),
            ("upos", pa.string()),
        ]
    )
)


class ParserActor:
    """Stateful map_batches callable: parser 'model' resolved once per
    actor; per-sentence parse in the batch loop (string ops — the heavy
    per-token work is bounded by the tiny rule set)."""

    def __init__(self, backend: str = "rules"):
        if backend != "rules":
            raise NotImplementedError(
                "UDPipe model files are unavailable in this container; "
                "backend='rules' is the deterministic stand-in"
            )
        # module-top imports: cloudpickle captures the globals by value, so
        # the actor constructs on workers regardless of their cwd/sys.path
        self.verbs = frozenset(VERB_LEXICON)
        self.propn = frozenset(GAZETTEER) | {
            w for pair in BIGRAMS for w in pair
        }
        self.det = frozenset({"the", "a"})

    def _parse(self, tokens: list[str]) -> list[dict]:
        upos = []
        for w in tokens:
            lw = w.lower()
            if lw in self.verbs:
                upos.append("VERB")
            elif lw in self.propn:
                upos.append("PROPN")
            elif lw in self.det:
                upos.append("DET")
            else:
                upos.append("NOUN")
        verb_pos = [i for i, u in enumerate(upos) if u == "VERB"]
        root = verb_pos[0] if verb_pos else 0
        out = []
        for i in range(len(tokens)):
            if i == root:
                out.append({"head": 0, "deprel": "root", "upos": upos[i]})
                continue
            # nearest verb at or left of i, else root
            head = root
            for v in verb_pos:
                if v < i:
                    head = v
                elif v > i:
                    break
            rel = "nsubj" if i < head else "obj"
            if upos[i] == "DET":
                rel = "det"
            out.append(
                {"head": head + 1, "deprel": rel, "upos": upos[i]}
            )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        deps = [self._parse(t) for t in batch.column("tokens").to_pylist()]
        return batch.append_column("deps", pa.array(deps, type=DEP_TYPE))


def parser_stage(
    ds: ray.data.Dataset,
    concurrency: int | tuple[int, int] = (1, 32),
    backend: str = "rules",
    num_gpus: float = 0,
) -> ray.data.Dataset:
    """sentences -> + deps (C5): the dependency substrate for relation
    patterns and tree-projection paraphrase. ``num_gpus`` reserves GPU
    fractions per parser actor for a neural backend (0 = CPU, identical
    numerics with the rules backend)."""
    extra = {"num_gpus": num_gpus} if num_gpus else {}
    return ds.map_batches(
        ParserActor,
        fn_constructor_args=(backend,),
        concurrency=concurrency,
        batch_format="pyarrow",
        **extra,
    )


def paraphrase_stage(
    tagged_with_deps: ray.data.Dataset, temperature: float = 1.0
) -> ray.data.Dataset:
    """'para' stage (paraphrase_model.py:74-112): entity chunks merge into
    units via combine_tag, units reorder by seeded tree projection over a
    unit-level tree (unit head = head of its first token mapped to units),
    output realigned (tokens, tags) with variant_id=0; identity
    permutations are dropped (M15)."""
    import hashlib

    from ner_pytorch_ray.functions.paraphrase import combine_tag

    def rewrite(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        tokens = batch.column("tokens").to_pylist()
        tags = batch.column("tags").to_pylist()
        deps = batch.column("deps").to_pylist()
        parent_vids = (
            batch.column("variant_id").to_pylist()
            if "variant_id" in batch.column_names
            else [None] * len(batch)
        )
        o_url, o_sid, o_vid, o_toks, o_tags = [], [], [], [], []
        for u, sid, pvid, toks, tgs, dp in zip(
            urls, sids, parent_vids, tokens, tags, deps
        ):
            if len(toks) < 2:
                continue
            units, unit_tags, _, _ = combine_tag(toks, tgs)
            # map token index -> unit index
            tok2unit = []
            for ui, unit in enumerate(units):
                tok2unit.extend([ui] * len(unit.split(" ")))
            # unit-level tree from the first token of each unit
            heads, deprels, upos = [], [], []
            start = 0
            for ui, unit in enumerate(units):
                d = dp[start]
                h_tok = int(d["head"])  # 1-based, 0=root
                if h_tok == 0:
                    heads.append(0)
                else:
                    hu = tok2unit[h_tok - 1]
                    heads.append(0 if hu == ui else hu + 1)
                deprels.append(d["deprel"])
                upos.append(d["upos"])
                start += len(unit.split(" "))
            seed_key = (
                f"{u}|{sid}|para" if pvid is None else f"{u}|{sid}|{pvid}|para"
            )
            seed = int.from_bytes(
                hashlib.blake2b(seed_key.encode(), digest_size=4).digest(),
                "little",
            )
            order = reorder_sentence(
                heads, deprels, upos, seed, temperature=temperature
            )
            if order == sorted(order):
                continue  # identity filter (M15)
            new_toks: list[str] = []
            new_tags: list[str] = []
            for ui in order:
                new_toks.extend(units[ui].split(" "))
                new_tags.extend(unit_tags[ui].split(" "))
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

    return tagged_with_deps.map_batches(rewrite, batch_format="pyarrow")
