"""Web link graph: outlink extraction from page HTML -> host-level graph.

Common-Crawl-style pages carry hyperlinks; the crawl's host-level link
graph (who links to whom, how often) drives frontier scheduling, spam/host
authority scoring and corpus weighting.  The reference has no web-graph
path (it consumes pre-extracted CoNLL text, loader.py:21-42); this module
adds the family a web-scale KG-construction engine needs on top of it:

    linked_pages      pages (url, warc_ts, html, text, lang) whose html
                      embeds a deterministic <nav> outlink block --
                      byte-identity of extract_text(html) == text is
                      PRESERVED (nav sits outside every <p>)
    web_link_edges    href extraction from the html bytes -> host-level
                      (src_host, dst_host, n_links) edge table
    web_host_stats    per-host crawl stats (pages, out/in link mass,
                      distinct destination hosts) in ONE grouped fold
    web_host_pagerank exact-integer weighted PageRank over the symmetric
                      host graph (graph_ops.pagerank_over_edges)

Determinism contract (frozen -- the SQL oracles mirror it exactly):
every doc d gets host ``h(d) = u64(md5("{d}:host")) % N_HOSTS`` and
K_LINKS outlinks to docs ``t(d,j) = u64(md5("{d}:link:{j}")) % n_docs``
(u64 = first 8 md5 digest bytes little-endian, masked to 63 bits ==
DuckDB ``md5_number_upper(s) & 9223372036854775807``, the same
convention pipelines/multimodal.py:51-55 established).

Scale notes: the html render/extract stages are stateless map_batches
over the pages stream (html is dropped as soon as hrefs are out, like
stages/extract.py); per-batch pre-aggregation shrinks edge partials to
<= N_HOSTS^2 rows per block before the ONE keyed shuffle; the host
tables that reach the driver-visible result are N_HOSTS-sized.
``n_docs`` comes from parquet row-group statistics (metadata-only, no
data scan).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_pytorch_ray.functions.html import (
    extract_links,
    page_html_linked,
)
from ner_pytorch_ray.sources.pages import EPOCH_US, PAGES_SCHEMA, SENT_TOKENS
from ner_pytorch_ray.stages.groupby_utils import grouped_sum

# Frozen constants -- the SQL oracles depend on them.
N_HOSTS = 64
K_LINKS = 3


def _u64(s: str) -> int:
    # == dedup._stable_u64 / multimodal convention: md5-based,
    # SQL-expressible (md5_number_upper(s) & (2^63-1))
    v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
    return v & 0x7FFFFFFFFFFFFFFF


def host_index(doc_id: int) -> int:
    return _u64(f"{doc_id}:host") % N_HOSTS


def host_name(h: int) -> str:
    return f"host-{h:02d}.example.test"


def linked_url(doc_id: int) -> str:
    return f"https://{host_name(host_index(doc_id))}/doc-{doc_id:08d}"


def host_of_url(url: str) -> str:
    # https://HOST/path -> HOST (pure string parse: the extraction path
    # reads hosts out of the urls it finds, never recomputes hashes)
    return url.split("/", 3)[2]


def link_targets(doc_id: int, n_docs: int) -> list[int]:
    return [
        _u64(f"{doc_id}:link:{j}") % n_docs for j in range(K_LINKS)
    ]


def corpus_size(sf_dir: str) -> int:
    """max(doc_id) + 1 from parquet row-group statistics (metadata-only)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    mx = 0
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        if st is None or not st.has_min_max:
            raise ValueError("documents.parquet lacks doc_id statistics")
        mx = max(mx, int(st.max))
    return mx + 1


def _documents_to_linked_pages(batch: pa.Table, n_docs: int) -> pa.Table:
    doc_ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang")

    urls, ts, page_texts, htmls = [], [], [], []
    for d, t in zip(doc_ids, texts):
        d = int(d)
        toks = t.split(" ") if t else []
        lines = [
            " ".join(toks[i : i + SENT_TOKENS])
            for i in range(0, len(toks), SENT_TOKENS)
        ]
        text = "\n".join(lines)
        hrefs = [linked_url(t_) for t_ in link_targets(d, n_docs)]
        urls.append(linked_url(d))
        ts.append(EPOCH_US + d)
        page_texts.append(text)
        htmls.append(page_html_linked(f"doc {d}", text, hrefs))

    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array(page_texts, type=pa.large_string()),
            langs.cast(pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def linked_pages(sf_dir: str) -> ray.data.Dataset:
    """Pages table with deterministic outlinks in the html.

    Same shape and extract_text byte-identity invariant as
    ``sources.pages.pages_from_documents``; urls follow the host scheme
    above and each page's html carries K_LINKS <nav> hrefs.
    """
    n_docs = corpus_size(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        lambda b: _documents_to_linked_pages(b, n_docs),
        batch_format="pyarrow",
    )


def _edge_partials(batch: pa.Table) -> pa.Table:
    """(src_host, dst_host, n_links) pre-aggregated within the batch.

    Hrefs are parsed out of the html BYTES (the real extraction path),
    hosts out of the url strings; the wide html column dies here.  The
    within-batch combine caps the partial at N_HOSTS^2 rows per block,
    so the global shuffle moves host-table-sized data only.
    """
    srcs: list[str] = []
    dsts: list[str] = []
    for url, html in zip(
        batch.column("url").to_pylist(), batch.column("html").to_pylist()
    ):
        sh = host_of_url(url)
        for href in extract_links(html):
            srcs.append(sh)
            dsts.append(host_of_url(href))
    t = pa.table(
        {
            "src_host": pa.array(srcs, type=pa.string()),
            "dst_host": pa.array(dsts, type=pa.string()),
            "n_links": pa.array([1] * len(srcs), type=pa.int64()),
        }
    )
    return t.group_by(["src_host", "dst_host"]).aggregate(
        [("n_links", "sum")]
    ).rename_columns(["src_host", "dst_host", "n_links"])


def web_link_edges(
    sf_dir: str, pages: ray.data.Dataset | None = None
) -> ray.data.Dataset:
    """Host-level link graph: (src_host, dst_host, n_links), sorted.

    One stateless extraction map (html -> hrefs -> host pairs, combined
    per batch) then ONE grouped-sum shuffle over <= N_HOSTS^2 keys.
    """
    ds = pages if pages is not None else linked_pages(sf_dir)
    partials = ds.select_columns(["url", "html"]).map_batches(
        _edge_partials, batch_format="pyarrow"
    )
    return grouped_sum(
        partials, keys=["src_host", "dst_host"], sum_cols=["n_links"]
    ).sort(["src_host", "dst_host"])


def web_host_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-host crawl stats: (host, n_pages, out_links, in_links,
    n_dst_hosts), sorted by host.

    Three tagged partial streams (page counts from the pages stream;
    out/in link mass and distinct-destination counts from the edge
    table) unioned into ONE grouped fold -- the union-tag pattern
    relational.fk_integrity_report uses, not three sequential jobs.
    """
    pgs = linked_pages(sf_dir)

    def page_partials(batch: pa.Table) -> pa.Table:
        hosts = [host_of_url(u) for u in batch.column("url").to_pylist()]
        t = pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "n_pages": pa.array([1] * len(hosts), type=pa.int64()),
            }
        )
        t = (
            t.group_by(["host"])
            .aggregate([("n_pages", "sum")])
            .rename_columns(["host", "n_pages"])
        )
        z = pa.array([0] * len(t), type=pa.int64())
        return t.append_column("out_links", z).append_column(
            "in_links", z
        ).append_column("n_dst_hosts", z)

    edges = web_link_edges(sf_dir, pages=pgs)

    def edge_partials(batch: pa.Table) -> pa.Table:
        n = len(batch)
        z = pa.array([0] * n, type=pa.int64())
        one = pa.array([1] * n, type=pa.int64())
        w = batch.column("n_links")
        out_side = pa.table(
            {
                "host": batch.column("src_host"),
                "n_pages": z,
                "out_links": w,
                "in_links": z,
                "n_dst_hosts": one,  # edges table is distinct per pair
            }
        )
        in_side = pa.table(
            {
                "host": batch.column("dst_host"),
                "n_pages": z,
                "out_links": z,
                "in_links": w,
                "n_dst_hosts": z,
            }
        )
        return pa.concat_tables([out_side, in_side])

    tagged = pgs.select_columns(["url"]).map_batches(
        page_partials, batch_format="pyarrow"
    ).union(edges.map_batches(edge_partials, batch_format="pyarrow"))
    return grouped_sum(
        tagged,
        keys=["host"],
        sum_cols=["n_pages", "out_links", "in_links", "n_dst_hosts"],
    ).sort("host")


def authority_weighted_docs(
    sf_dir: str, mult: int = 16
) -> ray.data.Dataset:
    """(doc_id, host, rank): corpus selection weighted by host authority
    -- keep a document with probability proportional to its host's
    PageRank (the host-graph analog of CCNet-style quality-weighted
    sampling), made exact and deterministic:

        keep d  iff  u64(md5("{d}:samp")) % 10^12  <  rank(host(d)) * mult

    so a host at the uniform rank (10^12 / N_HOSTS) keeps mult/N_HOSTS
    of its documents in expectation, and every keep decision is a pure
    function of (doc_id, final ranks) -- reproducible across runs and
    partitionings.  The rank table is N_HOSTS rows BY CONSTRUCTION, so
    it rides into the filter as a task-closure broadcast, never a
    shuffle side."""
    ranks = {
        r["host"]: int(r["rank"])
        for r in web_host_pagerank(sf_dir).take_all()  # <= N_HOSTS rows
    }
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def pick(batch: pa.Table) -> pa.Table:
        ids, hosts, rnk = [], [], []
        for d in batch.column("doc_id").to_pylist():
            h = host_name(host_index(int(d)))
            r = ranks.get(h, 0)
            if _u64(f"{d}:samp") % (10**12) < r * mult:
                ids.append(int(d))
                hosts.append(h)
                rnk.append(r)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "host": pa.array(hosts, type=pa.string()),
                "rank": pa.array(rnk, type=pa.int64()),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow").sort("doc_id")


def kg_triple_authority(sf_dir: str) -> ray.data.Dataset:
    """(subj, pred, obj, n_evidence, authority_i): KG triple confidence
    weighted by source-host authority -- each distinct evidence row
    (page sentence asserting the triple, ``kg_analytics.kg_evidence``)
    contributes its host's PageRank, so a triple asserted by many
    high-authority hosts outranks one repeated on a single spam host.
    ``authority_i`` is the exact integer sum of host ranks (rank 1.0 ==
    10^12); summation-order independent, bit-identical under any
    partitioning.

    The rank table is N_HOSTS rows by construction and rides in the
    task closure; evidence rows pre-aggregate per batch before the one
    (subj, pred, obj)-keyed shuffle.

    Overflow guard: each contribution is < 10^12 (a host's rank is
    bounded by the total PageRank mass), so the int64 sum is exact up
    to (2^63-1) // 10^12 ~ 9.2e6 evidence rows per triple.  A hotter
    triple (plausible at 10^12-document scale) RAISES after the fold
    instead of degrading silently — the caps-that-raise stance the
    banded dedup detectors take.
    """
    from ner_pytorch_ray.pipelines.kg_analytics import kg_evidence

    ranks = {
        r["host"]: int(r["rank"])
        for r in web_host_pagerank(sf_dir).take_all()  # <= N_HOSTS rows
    }
    ev = kg_evidence(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        rank_col = []
        for u in batch.column("url").to_pylist():
            # evidence urls follow sources.pages.doc_url:
            # https://doc-{doc_id:08d}.example.test/page
            d = int(u.split("doc-")[1].split(".")[0])
            rank_col.append(ranks[host_name(host_index(d))])
        t = pa.table(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj"),
                "n_evidence": pa.array([1] * len(batch), type=pa.int64()),
                "authority_i": pa.array(rank_col, type=pa.int64()),
            }
        )
        return (
            t.group_by(["subj", "pred", "obj"])
            .aggregate([("n_evidence", "sum"), ("authority_i", "sum")])
            .rename_columns(
                ["subj", "pred", "obj", "n_evidence", "authority_i"]
            )
        )

    folded = grouped_sum(
        ev.map_batches(score, batch_format="pyarrow"),
        keys=["subj", "pred", "obj"],
        sum_cols=["n_evidence", "authority_i"],
    )

    _SAFE_EVIDENCE = (2**63 - 1) // 10**12  # ~9.2e6 rows per triple

    def guard(batch: pa.Table) -> pa.Table:
        mx = pc.max(batch.column("n_evidence")).as_py()
        if mx is not None and mx > _SAFE_EVIDENCE:
            raise ValueError(
                f"a triple has {mx} evidence rows; int64 authority sums "
                f"are exact only up to {_SAFE_EVIDENCE} — shard the triple "
                "key (salt) or pre-scale ranks before summing"
            )
        return batch

    return folded.map_batches(guard, batch_format="pyarrow").sort(
        ["subj", "pred", "obj"]
    )


def web_crawl_frontier(
    sf_dir: str,
    seed_host: str = "host-00.example.test",
    max_hops: int = 16,
) -> ray.data.Dataset:
    """(host, dist): DIRECTED BFS hop distance from ``seed_host`` along
    outlinks -- the crawl-frontier schedule (which hosts a crawler
    starting at the seed reaches, and in how many link hops).  Reuses
    ``graph_ops.bfs_hops_over_edges`` (one keyed-collect round per
    frontier level, monotone-fingerprint early stop); edges stay
    directed because a crawler follows hrefs, not backlinks."""
    from ner_pytorch_ray.pipelines.graph_ops import bfs_hops_over_edges

    edges = web_link_edges(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch.column("src_host"), "b": batch.column("dst_host")}
        )

    seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([seed_host], type=pa.string())})
    )
    out = bfs_hops_over_edges(
        edges.map_batches(directed, batch_format="pyarrow"),
        seeds,
        node_type=pa.string(),
        max_iters=max_hops,
    )
    # bfs_hops_over_edges already sorts by node; renaming keeps the order
    return out.rename_columns(["host", "dist"])


def web_host_freshness(sf_dir: str) -> ray.data.Dataset:
    """(host, n_pages, first_ts, last_ts): per-host crawl freshness from
    the pages stream's ``warc_ts`` -- the recrawl-scheduling digest (which
    hosts have stale coverage). Per-batch min/max pre-aggregation, ONE
    grouped fold over <= N_HOSTS keys; timestamps stay Arrow
    ``timestamp[us]`` end to end."""
    pgs = linked_pages(sf_dir).select_columns(["url", "warc_ts"])

    def partials(batch: pa.Table) -> pa.Table:
        hosts = [host_of_url(u) for u in batch.column("url").to_pylist()]
        t = pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "n_pages": pa.array([1] * len(hosts), type=pa.int64()),
                "first_ts": batch.column("warc_ts"),
                "last_ts": batch.column("warc_ts"),
            }
        )
        return (
            t.group_by(["host"])
            .aggregate(
                [("n_pages", "sum"), ("first_ts", "min"), ("last_ts", "max")]
            )
            .rename_columns(["host", "n_pages", "first_ts", "last_ts"])
        )

    return grouped_sum(
        pgs.map_batches(partials, batch_format="pyarrow"),
        keys=["host"],
        sum_cols=["n_pages"],
        min_cols=["first_ts"],
        max_cols=["last_ts"],
    ).sort("host")


def web_reciprocal_pairs(sf_dir: str) -> ray.data.Dataset:
    """(host_a, host_b, fwd_links, bwd_links): host pairs linked in BOTH
    directions (mutual-citation signal; reciprocity is a classic web-spam
    / community indicator). Edge rows fold onto the canonical (min, max)
    pair with direction-tagged counts -- one grouped sum over the
    <= N_HOSTS² pair keyspace, self-loops excluded."""
    edges = web_link_edges(sf_dir)

    def canonical(batch: pa.Table) -> pa.Table:
        a, b, fwd, bwd = [], [], [], []
        for s, d, n in zip(
            batch.column("src_host").to_pylist(),
            batch.column("dst_host").to_pylist(),
            batch.column("n_links").to_pylist(),
        ):
            if s == d:
                continue
            lo, hi = (s, d) if s < d else (d, s)
            a.append(lo)
            b.append(hi)
            fwd.append(n if s < d else 0)
            bwd.append(n if s > d else 0)
        return pa.table(
            {
                "host_a": pa.array(a, type=pa.string()),
                "host_b": pa.array(b, type=pa.string()),
                "fwd_links": pa.array(fwd, type=pa.int64()),
                "bwd_links": pa.array(bwd, type=pa.int64()),
            }
        )

    folded = grouped_sum(
        edges.map_batches(canonical, batch_format="pyarrow"),
        keys=["host_a", "host_b"],
        sum_cols=["fwd_links", "bwd_links"],
    )
    return folded.filter(
        expr="fwd_links > 0 and bwd_links > 0"
    ).sort(["host_a", "host_b"])


def web_host_walks(
    sf_dir: str, walks_per_node: int = 2, steps: int = 3
) -> ray.data.Dataset:
    """(start, walk_idx, step, node): deterministic weighted random-walk
    corpus over the symmetrized host graph -- the node2vec/DeepWalk input
    for host embeddings (spam/topic host clustering), reusing
    ``kg_analytics.random_walks_over_edges`` (md5-threshold hop choice,
    bit-reproducible and SQL-oracle-able). Parallel (a, b) rows from
    symmetrization are merged first so the cumulative-weight neighbor
    pick sees one row per neighbor."""
    from ner_pytorch_ray.pipelines.kg_analytics import (
        random_walks_over_edges,
    )

    edges = web_link_edges(sf_dir)

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {
                "a": batch.column("src_host"),
                "b": batch.column("dst_host"),
                "w": batch.column("n_links"),
            }
        )
        rev = pa.table(
            {
                "a": batch.column("dst_host"),
                "b": batch.column("src_host"),
                "w": batch.column("n_links"),
            }
        )
        return pa.concat_tables([fwd, rev])

    merged = grouped_sum(
        edges.map_batches(symmetrize, batch_format="pyarrow"),
        keys=["a", "b"],
        sum_cols=["w"],
    )
    return random_walks_over_edges(
        merged,
        walks_per_node=walks_per_node,
        steps=steps,
        node_type=pa.string(),
        weight_col="w",
    )


def web_host_langs(sf_dir: str) -> ray.data.Dataset:
    """(host, lang, n_docs): per-host language composition -- the crawl
    language-routing digest (which hosts feed which language pipelines).
    Column-pruned read (doc_id, lang only), per-batch combine, ONE
    grouped fold over <= N_HOSTS x |langs| keys."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        hosts = [
            host_name(host_index(int(d)))
            for d in batch.column("doc_id").to_pylist()
        ]
        t = pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "lang": batch.column("lang").cast(pa.string()),
                "n_docs": pa.array([1] * len(hosts), type=pa.int64()),
            }
        )
        return (
            t.group_by(["host", "lang"])
            .aggregate([("n_docs", "sum")])
            .rename_columns(["host", "lang", "n_docs"])
        )

    return grouped_sum(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys=["host", "lang"],
        sum_cols=["n_docs"],
    ).sort(["host", "lang"])


def web_host_hits(sf_dir: str, iters: int = 2) -> ray.data.Dataset:
    """(host, hub_i, auth_i): HITS hubs & authorities (Kleinberg 1999 --
    the web-graph algorithm this graph was made for) over the DIRECTED
    host link graph, link counts as weights, exact scaled integers
    (``graph_ops.hits_over_edges``: int64 raw sums, arbitrary-precision
    L1 normalization, bit-identical under any partitioning). Good hubs
    (directory hosts) and good authorities (linked-to hosts) separate
    here where PageRank conflates them.

    Scale bound (inherited from the kernel): raw sums stay exact while
    max single-edge weight x scale < 2^63 — i.e. up to ~9.2e9 links
    between one host pair at scale=1e9. A trillion-document crawl
    funneling more than that through one host pair needs ``scale``
    shrunk (kernel parameter) or the pair key salted."""
    from ner_pytorch_ray.pipelines.graph_ops import hits_over_edges

    edges = web_link_edges(sf_dir)

    def ab(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("src_host"),
                "b": batch.column("dst_host"),
                "weight": batch.column("n_links"),
            }
        )

    out = hits_over_edges(
        edges.map_batches(ab, batch_format="pyarrow"),
        iters=iters,
        node_type=pa.string(),
        weight_col="weight",
    )
    return out.rename_columns(["host", "hub_i", "auth_i"]).sort("host")


def web_host_pagerank(sf_dir: str, iters: int = 3) -> ray.data.Dataset:
    """(host, rank): exact-integer weighted PageRank (damping 0.85,
    rank 1.0 == 10^12) over the SYMMETRIZED host link graph, link
    counts as weights -- the same update kg_pagerank runs, so the SQL
    oracle is the same unrolled kernel-independent form."""
    from ner_pytorch_ray.pipelines.graph_ops import pagerank_over_edges

    edges = web_link_edges(sf_dir)

    def symmetrize(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {
                "a": batch.column("src_host"),
                "b": batch.column("dst_host"),
                "w": batch.column("n_links"),
            }
        )
        rev = pa.table(
            {
                "a": batch.column("dst_host"),
                "b": batch.column("src_host"),
                "w": batch.column("n_links"),
            }
        )
        return pa.concat_tables([fwd, rev])

    sym = edges.map_batches(symmetrize, batch_format="pyarrow")
    pr = pagerank_over_edges(
        sym,
        iters=iters,
        node_type=pa.string(),
        weight_col="w",
    )
    return pr.rename_columns(["host", "rank"]).sort("host")
