"""Paraphrase-machinery pure functions (SURVEY.md §2.2 M9-M12, §2.1 S4/D4).

Faithful re-expressions of the reference's unit transforms:

  * ``check_single_quote``   — /root/reference/paraphrase_model.py:16-19
  * ``combine_tag``          — /root/reference/paraphrase_model.py:43-63
  * ``convert_span``         — /root/reference/paraphrase_model.py:143-166
  * ``handle_pair_punct``    — /root/reference/paraphrase_model.py:168-191
    (the reference's ``if not span: text_list, tags_list`` is a missing
    ``return`` that happens to be harmless — the copy loop below produces
    the identity anyway; we return early, same observable behavior)
  * ``convert_to_string``    — /root/reference/gen_adv_pipline.py:187-191
  * ``parse_ppdb`` / ``clean_paraphrases`` — /root/reference/ppdb.py:36-76,
    12-26: keep `Equivalence` rows whose phrase AND paraphrase are fully
    in-vocab, drop pairs with equal stems (D4), symmetric dict of sets.
  * ``gen_paraphrases``      — /root/reference/ppdb.py:78-117 with two
    deliberate divergences, both documented: the reference's bigram is
    ``tokens[i] + " " + tokens[i]`` (a latent bug, ppdb.py:89 — we build
    the INTENDED ``tokens[i] + " " + tokens[i+1]``), and its
    ``random.sample`` is unseeded (we seed per call — SURVEY §4 keyed
    determinism).

Stemming: SnowballStemmer is not available in this sandbox; ``simple_stem``
is a deterministic suffix-stripping stand-in with the same *role* (block
trivial inflection pairs), clearly NOT porter/snowball-exact.
"""

from __future__ import annotations

import random
import re
import string
from collections import Counter

_SINGLE_QUOTE = re.compile(r"'\w+")

_SUFFIXES = (
    "ational", "iveness", "fulness", "ousness",
    "ization", "ations", "ingly", "ation",
    "ings", "edly", "ing", "ed", "ies", "ly", "es", "s",
)


def check_single_quote(word: str) -> bool:
    """Contraction detector ('s, 've, ...) — paraphrase_model.py:16-19."""
    return bool(_SINGLE_QUOTE.match(word))


def combine_tag(
    tokens: list[str], tags: list[str]
) -> tuple[list[str], list[str], list[str], Counter]:
    """Merge I-/E--tagged continuations and '-contractions into multiword
    units (paraphrase_model.py:43-63). Returns (units, unit_tags,
    true_order, punct_counter) where punct_counter counts O-tagged
    punctuation tokens."""
    units: list[str] = []
    unit_tags: list[str] = []
    true_order: list[str] = []
    punct_counter: Counter = Counter()
    for w, tg in zip(tokens, tags):
        true_order.append(w)
        if w in string.punctuation and tg == "O":
            punct_counter[w] += 1
        if units and (
            tg.startswith("I") or tg.startswith("E") or check_single_quote(w)
        ):
            units[-1] = units[-1] + " " + w
            unit_tags[-1] = unit_tags[-1] + " " + tg
        else:
            units.append(w)
            unit_tags.append(tg)
    return units, unit_tags, true_order, punct_counter


def convert_span(text_list: list[str], punct: str) -> list[list[int]]:
    """Matched-bracket spans with interval union
    (paraphrase_model.py:143-166). ``punct`` is '(' or '['."""
    punct_map = {"(": ")", "[": "]"}
    left: list[int] = []
    res: list[list[int]] = []
    for i, t in enumerate(text_list):
        if t == punct:
            left.append(i)
        elif t == punct_map[punct]:
            if left:
                res.append([left.pop(), i])
    if not res:
        return []
    if len(res) == 1:
        return res
    res.sort()
    span = [res[0]]
    for lo, hi in res[1:]:
        if lo > span[-1][-1]:
            span.append([lo, hi])
        else:
            span[-1][-1] = max(hi, span[-1][-1])
    return span


def handle_pair_punct(
    text_list: list[str], tags_list: list[str], punct: str
) -> tuple[list[str], list[str]]:
    """Merge bracketed spans into single units
    (paraphrase_model.py:168-191)."""
    span = convert_span(text_list, punct)
    if not span:
        return list(text_list), list(tags_list)
    span = span[::-1]
    texts: list[str] = []
    tags: list[str] = []
    i = 0
    while i < len(text_list):
        if span and i == span[-1][0]:
            lo, hi = span.pop()
            texts.append(" ".join(text_list[lo : hi + 1]))
            tags.append(" ".join(tags_list[lo : hi + 1]))
            i = hi + 1
        else:
            texts.append(text_list[i])
            tags.append(tags_list[i])
            i += 1
    return texts, tags


def convert_to_string(tokens: list[str]) -> str:
    """Detokenize: join, lowercase, strip the space before punctuation
    (gen_adv_pipline.py:187-191)."""
    s = " ".join(tokens).lower()
    return re.sub(r" ([^A-Za-z0-9])", r"\1", s)


def simple_stem(word: str) -> str:
    """Deterministic suffix-stripping stand-in for SnowballStemmer (absent
    in this sandbox). Longest matching suffix stripped once, stem kept at
    >= 3 chars."""
    w = word.lower()
    for suf in _SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)]
            break
    # collapse a trailing doubled consonant (runn -> run), porter-style
    if (
        len(w) >= 4
        and w[-1] == w[-2]
        and w[-1] not in "aeiou"
    ):
        w = w[:-1]
    return w


def parse_ppdb(
    lines, vocab: set[str], stem=simple_stem
) -> dict[str, set[str]]:
    """PPDB `... ||| phrase ||| paraphrase ||| ... ||| entailment` lines ->
    symmetric phrase->paraphrase-set dict (ppdb.py:36-76): keep
    `Equivalence`; every word of both sides must be in ``vocab`` (lowered
    membership test); equal-stem pairs dropped (D4)."""
    out: dict[str, set[str]] = {}
    for line in lines:
        parts = [p.strip() for p in line.strip().split("|||")]
        if len(parts) < 4:
            continue
        phrase, paraphrase, entailment = parts[1], parts[2], parts[-1]
        if entailment != "Equivalence":
            continue
        if any(w.lower() not in vocab for w in phrase.split()):
            continue
        if any(w.lower() not in vocab for w in paraphrase.split()):
            continue
        if stem(phrase) == stem(paraphrase):
            continue
        out.setdefault(phrase, set()).add(paraphrase)
        out.setdefault(paraphrase, set()).add(phrase)
    return out


def clean_paraphrases(
    paraphrase_dict: dict[str, set[str]], stem=simple_stem
) -> dict[str, set[str]]:
    """Second-pass stem cleanup (ppdb.py:12-26)."""
    out: dict[str, set[str]] = {}
    for phrase, paraphrases in paraphrase_dict.items():
        keep = {p for p in paraphrases if stem(phrase) != stem(p)}
        if keep:
            out[phrase] = keep
    return out


def gen_paraphrases(
    text: str, paraphrase_dict: dict[str, set[str]], seed: int = 0
) -> set[str]:
    """O-run paraphrase generation (ppdb.py:78-117): greedy bigram-then-
    unigram dict hits over whitespace tokens; one paraphrase per rank via
    seeded sampling; string-level replace like the reference."""
    rng = random.Random(seed)
    tokens = text.split()
    replaced: list[str] = []
    replacement: list[list[str]] = []
    i = 0
    while i < len(tokens):
        bigram = (
            tokens[i] + " " + tokens[i + 1] if i < len(tokens) - 1 else None
        )
        if bigram and bigram in paraphrase_dict:
            replaced.append(bigram)
            replacement.append(sorted(paraphrase_dict[bigram]))
            i += 1
        elif tokens[i] in paraphrase_dict:
            replaced.append(tokens[i])
            replacement.append(sorted(paraphrase_dict[tokens[i]]))
        i += 1
    if not replaced:
        return set()
    n = min([len(replaced)] + [len(opts) for opts in replacement])
    picks = [rng.sample(opts, n) for opts in replacement]
    out: set[str] = set()
    for k in range(n):
        new_text = text
        for target, opts in zip(replaced, picks):
            new_text = new_text.replace(target, opts[k])
        out.add(new_text)
    return out


def ppdb_orun_rewrite(
    tokens: list[str],
    tags: list[str],
    paraphrase_dict: dict[str, set[str]],
    seed: int = 0,
) -> tuple[list[str], list[str], bool]:
    """C4 (ppdb.py:119-144): walk the sentence; contiguous O-tagged runs are
    lowered, paraphrased as a phrase (first generated paraphrase), and
    re-emitted with 'O' tags; entity-tagged tokens pass through untouched.
    Returns (new_tokens, new_tags, changed)."""
    out_toks: list[str] = []
    out_tags: list[str] = []
    changed = False
    run: list[str] = []

    def flush(run_idx: int) -> None:
        nonlocal changed
        if not run:
            return
        paras = sorted(
            gen_paraphrases(" ".join(run), paraphrase_dict, seed + run_idx)
        )
        words = run
        if paras:
            changed = True
            words = paras[0].split()
        out_toks.extend(words)
        out_tags.extend(["O"] * len(words))
        run.clear()

    run_idx = 0
    for w, tg in zip(tokens, tags):
        if tg == "O":
            run.append(w.lower())
        else:
            flush(run_idx)
            run_idx += 1
            out_toks.append(w)
            out_tags.append(tg)
    flush(run_idx)
    return out_toks, out_tags, changed
