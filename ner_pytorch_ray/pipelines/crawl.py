"""Crawl-level URL curation — the step BEFORE any text-level dedup in a
Common-Crawl-style pipeline: the same page arrives under many raw URL
spellings (tracking query params, fragments, host-case jitter, trailing
slashes) across crawl snapshots, and the corpus must collapse to one
record per CANONICAL url, keeping the freshest capture.

Operators:

- :func:`crawl_records` — deterministic synthetic crawl log derived from
  ``documents`` (the ``pages_from_documents`` precedent: no external
  data): each doc yields ``1 + doc_id % 3`` crawl records whose raw URLs
  cycle through the classic spelling variants and whose ``warc_ts``
  advance one day per recrawl.
- :func:`canonical_url` — vectorized RE2 canonicalization (Arrow
  ``replace_substring_regex`` / ``extract_regex``; DuckDB's
  ``regexp_replace`` runs the SAME RE2 engine, so the SQL oracle
  reproduces it byte-for-byte): strip fragment, drop ``utm_*``/``ref``
  tracking params (fixing dangling ``?``/``&``), lowercase scheme+host,
  strip one trailing slash off a non-root path.
- :func:`crawl_url_dedup` — one grouped aggregate per canonical url:
  (canonical_url, n_crawls, latest_ts_us). The shuffle carries one row
  per crawl RECORD (url + 2 ints), never page payloads; at 10^12 pages
  this is the classic first-pass crawl join key. Everything is a
  distributive count/max, so combiners pre-fold and hot URLs (a page
  recrawled in every snapshot) never concentrate payload in one task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.sources.pages import EPOCH_US, doc_url

DAY_US = 86_400_000_000

_VARIANT_SUFFIX = ["", "?utm_source=feed&ref=rss", "#section-2"]


def _records_batch(batch: pa.Table) -> pa.Table:
    """One block of the deterministic synthetic crawl log (see
    :func:`crawl_records`)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    urls: list[str] = []
    ts: list[int] = []
    for d in ids:
        d = int(d)
        base = doc_url(d)
        for k in range(1 + d % 3):
            v = (d + k) % 3
            if v == 2:
                head, _, path = base.partition("//")
                host, slash, rest = path.partition("/")
                raw = f"{head.upper()}//{host.upper()}/{rest}/"
            else:
                raw = base + _VARIANT_SUFFIX[v]
            urls.append(raw)
            ts.append(EPOCH_US + d + k * DAY_US)
    return pa.table(
        {
            "raw_url": pa.array(urls, type=pa.string()),
            "ts_us": pa.array(ts, type=pa.int64()),
        }
    )


def crawl_records(sf_dir: str) -> ray.data.Dataset:
    """Deterministic synthetic crawl log: (raw_url, ts_us) — one row per
    (doc, recrawl k in 0..doc_id%3); raw spelling cycles variants by
    (doc_id + k) % 3, with variant 2 additionally upper-casing the host
    and adding a trailing slash."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return docs.map_batches(_records_batch, batch_format="pyarrow")


def canonical_url(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized URL canonicalization (all-RE2, oracle-reproducible)."""
    u = urls
    # 1. strip fragment
    u = pc.replace_substring_regex(u, pattern="#.*$", replacement="")
    # 2. drop utm_* / ref tracking params (global replace). Replace with
    # "&" — NOT "?" — so a tracked param mid-query ("a?x=1&utm_s=2&q=3")
    # doesn't plant a second "?" in the string; then repair the runs the
    # replacement may leave ("&&" -> "&"), promote the first separator
    # back to "?" when the original "?" was itself consumed (a query that
    # STARTED with a tracking param), and strip a dangling trailer.
    u = pc.replace_substring_regex(
        u, pattern="[?&](utm_[a-z]+|ref)=[^&#]*", replacement="&"
    )
    u = pc.replace_substring_regex(u, pattern="&&+", replacement="&")
    u = pc.replace_substring_regex(
        u, pattern="^([^?]*)&", replacement="\\1?", max_replacements=1
    )
    u = pc.replace_substring_regex(u, pattern="[?&]+$", replacement="")
    # 3. lowercase scheme + host (the part before the path)
    ex = pc.extract_regex(u, pattern="^(?P<head>[^/]*//[^/]*)(?P<rest>.*)$")
    head = pc.utf8_lower(pc.struct_field(ex, "head"))
    rest = pc.struct_field(ex, "rest")
    u = pc.binary_join_element_wise(head, rest, "")
    # 4. strip ONE trailing slash off a non-root path
    u = pc.replace_substring_regex(
        u, pattern="(//[^/]*/.+)/$", replacement="\\1"
    )
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    return u


def crawl_url_dedup(sf_dir: str) -> ray.data.Dataset:
    """One row per canonical URL across all crawl records:
    (canonical_url, n_crawls, latest_ts_us), sorted by canonical_url."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    recs = crawl_records(sf_dir)

    def canon(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonical_url(batch.column("raw_url")),
                "n_crawls": pa.array(
                    np.ones(len(batch), dtype=np.int64)
                ),
                "latest_ts_us": batch.column("ts_us"),
            }
        )

    out = grouped_sum(
        recs.map_batches(canon, batch_format="pyarrow"),
        keys=["canonical_url"],
        sum_cols=["n_crawls"],
        max_cols=["latest_ts_us"],
    )
    return out.sort("canonical_url")
