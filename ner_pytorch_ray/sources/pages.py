"""Pages sources: read a pages parquet, or synthesize pages from `documents`.

The engine's native input is a Parquet table of Common-Crawl-style pages
``(url:string, warc_ts:timestamp[us], html:binary, text:large_string,
lang:string)``. The sandbox testdata ships a ``documents`` table instead
(doc_id, text, lang, source, n_chars) — ``pages_from_documents`` lifts it
into the pages shape **deterministically** (url/warc_ts derived from doc_id,
html rendered by the canonical generator), so every scale factor has a pages
table without external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.functions.html import page_html

# Tokens per synthetic sentence when lifting flat document text into
# sentence-per-line page text. Frozen: the SQL oracles depend on it.
SENT_TOKENS = 12

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def doc_url(doc_id: int) -> str:
    return f"https://doc-{doc_id:08d}.example.test/page"


def _documents_to_pages(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang")

    urls = [doc_url(int(d)) for d in doc_ids]
    ts = pa.array(EPOCH_US + doc_ids.astype(np.int64), type=pa.int64()).cast(
        pa.timestamp("us")
    )

    page_texts: list[str] = []
    htmls: list[bytes] = []
    for d, t in zip(doc_ids, texts):
        toks = t.split(" ") if t else []
        lines = [
            " ".join(toks[i : i + SENT_TOKENS])
            for i in range(0, len(toks), SENT_TOKENS)
        ]
        text = "\n".join(lines)
        page_texts.append(text)
        htmls.append(page_html(f"doc {int(d)}", text))

    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            ts,
            pa.array(htmls, type=pa.binary()),
            pa.array(page_texts, type=pa.large_string()),
            langs.cast(pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def pages_from_documents(
    sf_dir: str,
    langs: list[str] | None = None,
    replicate: int = 1,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Deterministic pages table derived from ``{sf_dir}/documents.parquet``.

    Column-pruned read (only what the pages shape needs); the html render is
    a stateless vectorized-ish map_batches (string building dominates).

    ``replicate=R`` emits R deterministic copies of each document with
    distinct doc_ids (benchmark-scale corpus synthesis — the scaling
    criterion needs enough work to amortize fixed overheads). The
    replicated read is SHARDED: ``override_num_blocks`` (default 128)
    independent tasks each read + slice their own logical row range, the
    way a many-file 100 TB corpus parallelizes naturally — a single read
    task emitting many blocks is paced serially by the streaming-generator
    buffer and caps the whole pipeline.
    """
    path = f"{sf_dir}/documents.parquet"
    if replicate > 1:
        import pyarrow.parquet as pq

        n_rows = pq.read_metadata(path).num_rows
        base_cache: dict[str, pa.Table] = {}  # per worker process
        n_shards = int(override_num_blocks or 128)
        total = replicate * n_rows
        shards = ray.data.range(n_shards, override_num_blocks=n_shards)

        def load_shard(batch: pa.Table) -> pa.Table:
            base = base_cache.get(path)
            if base is None:
                base = pq.read_table(path, columns=["doc_id", "text", "lang"])
                base_cache[path] = base
            ids = base.column("doc_id").to_numpy()
            parts = []
            for s in batch.column("id").to_pylist():
                lo = s * total // n_shards
                hi = (s + 1) * total // n_shards
                # logical row L = copy * n_rows + base_row
                L = lo
                while L < hi:
                    copy, row = divmod(L, n_rows)
                    take = min(hi - L, n_rows - row)
                    t = base.slice(row, take)
                    t = t.set_column(
                        t.schema.get_field_index("doc_id"),
                        "doc_id",
                        pa.array(
                            ids[row : row + take] * replicate + copy,
                            type=pa.int64(),
                        ),
                    )
                    parts.append(t)
                    L += take
            return pa.concat_tables(parts)

        ds = shards.map_batches(
            load_shard, batch_size=1, batch_format="pyarrow"
        )
    else:
        ds = ray.data.read_parquet(
            path,
            columns=["doc_id", "text", "lang"],
            **(
                {"override_num_blocks": override_num_blocks}
                if override_num_blocks
                else {}
            ),
        )
    if langs is not None:
        allowed = set(langs)
        ds = ds.filter(
            expr=f"lang in {sorted(allowed)!r}"
        )
    return ds.map_batches(_documents_to_pages, batch_format="pyarrow")


def read_pages(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a pages parquet directory/file with column pruning."""
    return ray.data.read_parquet(path, columns=columns)
