"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash). Ray is initialised by
the driver BEFORE this module is imported: nothing here calls ``ray.init()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Shared SQL fragments for the gazetteer-KG oracles (frozen semantics:
# sentences = 12-token windows; gazetteer = ner_pytorch_ray.stages.gazetteer)
# ---------------------------------------------------------------------------
_URL_EXPR = (
    "'https://doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.example.test/page'"
)

_KG_MENTIONS_CTE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
tok AS (
  SELECT doc_id, pos, w,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM (
    SELECT doc_id,
           CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS pos,
           unnest(t) AS w
    FROM toks
  )
),
gaz(word, tag_type, ent) AS (
  VALUES ('spark', 'ORG', 'org:spark'),
         ('customer', 'PER', 'per:customer'),
         ('stream', 'LOC', 'loc:stream'),
         ('table', 'LOC', 'loc:table'),
         ('vector', 'MISC', 'misc:vector')
),
men AS (
  SELECT tok.doc_id, tok.pos // 12 AS sent, g.ent, g.tag_type,
         g.word AS surface
  FROM tok JOIN gaz g ON tok.w = g.word
  UNION ALL
  SELECT doc_id, pos // 12 AS sent, 'org:hash_join', 'ORG', 'hash join'
  FROM tok
  WHERE w = 'hash' AND w2 = 'join' AND (pos // 12) = ((pos + 1) // 12)
)
"""


def entry() -> Any:
    """Flagship KG pipeline on sf0.001: pages -> ... -> sorted edges."""
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    edges, _nodes = kg_from_documents(SF0001)
    return edges


def _q_kg_edges(sf_dir: str):
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    edges, _ = kg_from_documents(sf_dir)
    return edges


def _q_kg_nodes(sf_dir: str):
    from ner_pytorch_ray.pipelines.kg import kg_from_documents

    _, nodes = kg_from_documents(sf_dir)
    return nodes


def _q_kg_sentence_counts(sf_dir: str):
    import pyarrow as pa
    from ner_pytorch_ray.sources.pages import pages_from_documents
    from ner_pytorch_ray.stages.extract import extract_stage
    from ner_pytorch_ray.stages.sentences import sentences_stage

    sents = sentences_stage(extract_stage(pages_from_documents(sf_dir)))
    counts = sents.groupby("url").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["url", "n_sentences"]),
        batch_format="pyarrow",
    )


def _q_vocab_count(sf_dir: str):
    from ner_pytorch_ray.pipelines.analysis import vocab_count

    return vocab_count(sf_dir)


def _q_doc_token_stats(sf_dir: str):
    from ner_pytorch_ray.pipelines.analysis import doc_token_stats

    return doc_token_stats(sf_dir)


def _q_lang_counts(sf_dir: str):
    from ner_pytorch_ray.pipelines.analysis import lang_counts

    return lang_counts(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {
        "kg_edges": _q_kg_edges,
        "kg_nodes": _q_kg_nodes,
        "kg_sentence_counts": _q_kg_sentence_counts,
        "vocab_count": _q_vocab_count,
        "doc_token_stats": _q_doc_token_stats,
        "lang_counts": _q_lang_counts,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names, same values)."""
    return {
        "kg_edges": _KG_MENTIONS_CTE
        + f"""
, pairs AS (
  SELECT DISTINCT m1.doc_id, m1.sent, m1.ent AS a, m2.ent AS b
  FROM men m1
  JOIN men m2 ON m1.doc_id = m2.doc_id AND m1.sent = m2.sent
  WHERE m1.ent < m2.ent
)
SELECT a AS subj,
       'co_occurs_with' AS pred,
       b AS obj,
       COUNT(*) AS weight,
       MIN('https://doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
           || '.example.test/page') AS sample_url
FROM pairs
GROUP BY 1, 2, 3
ORDER BY subj, pred, obj
""",
        "kg_nodes": _KG_MENTIONS_CTE
        + """
SELECT ent AS entity_id, tag_type, surface, COUNT(*) AS n_mentions
FROM men
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
        "kg_sentence_counts": f"""
SELECT {_URL_EXPR} AS url,
       CAST(ceil(len(string_split(text, ' ')) / 12.0) AS BIGINT) AS n_sentences
FROM documents
""",
        "vocab_count": """
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token
""",
        "doc_token_stats": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS text_chars
FROM documents
""",
        "lang_counts": """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
""",
    }
