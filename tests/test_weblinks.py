"""Web link graph (pipelines/weblinks.py): linked-html round-trip, the
frozen extraction invariant on linked pages, and conservation laws of
the host graph. The exact SQL-oracle comparison for all three queries
(web_link_edges / web_host_stats / web_host_pagerank) runs through
tools/check_oracles.py and the driver gate; these tests pin the library
surface and the invariants the oracles cannot see (that links really are
EXTRACTED from html bytes, not recomputed)."""

import os

import pyarrow.parquet as pq

from ner_pytorch_ray.functions.html import (
    extract_links,
    extract_text,
    page_html,
    page_html_linked,
)

SF = "/root/testdata/sf0.001"


def test_linked_html_roundtrip():
    """Text byte-identity survives the nav block; hrefs round-trip in
    order, with entity escaping."""
    text = "a & b <tag>\nsecond & line"
    hrefs = ["https://h-01.example.test/doc-1", "https://x/?a=1&b=<2>"]
    html = page_html_linked("t & t", text, hrefs)
    assert extract_text(html) == text
    assert extract_links(html) == hrefs
    # plain pages have no links; empty href list renders the plain page
    assert extract_links(page_html("t", text)) == []
    assert page_html_linked("t", text, []) == page_html("t", text)


def test_links_are_extracted_from_html_bytes():
    """The edge stage's inputs come out of the html column: corrupting
    the html (dropping the nav) changes the extracted links while url /
    text stay identical -- proves no hash recomputation shortcut."""
    from ner_pytorch_ray.pipelines.weblinks import (
        K_LINKS,
        corpus_size,
        host_of_url,
        link_targets,
        linked_url,
    )

    n = corpus_size(SF)
    assert n == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    hrefs = [linked_url(t) for t in link_targets(7, n)]
    assert len(hrefs) == K_LINKS
    html = page_html_linked("doc 7", "some text", hrefs)
    assert extract_links(html) == hrefs
    stripped = html.replace(
        html[html.index(b"<nav>") : html.index(b"</nav>") + 6], b""
    )
    assert extract_links(stripped) == []
    assert extract_text(stripped) == extract_text(html)
    assert host_of_url("https://host-03.example.test/doc-00000001") == (
        "host-03.example.test"
    )


def test_linked_pages_keep_extract_invariant(ray_session):
    """extract_text(html) == text per row, distributed, on linked pages
    (the same invariant stages/extract.py enforces on plain pages)."""
    from ner_pytorch_ray.pipelines.weblinks import linked_pages
    from ner_pytorch_ray.stages.extract import extract_stage

    pages = linked_pages(SF)
    out = extract_stage(pages)  # raises on any byte mismatch
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert out.count() == n_docs
    assert "html" not in out.schema().names


def test_host_graph_conservation(ray_session):
    """Link mass is conserved: sum(n_links) == K_LINKS * n_docs on the
    edge table and on both stats sides; page counts cover the corpus."""
    from ner_pytorch_ray.pipelines.weblinks import (
        K_LINKS,
        N_HOSTS,
        web_host_stats,
        web_link_edges,
    )

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = web_link_edges(SF).materialize()
    assert edges.sum("n_links") == K_LINKS * n_docs
    stats = web_host_stats(SF).take_all()
    assert len(stats) <= N_HOSTS
    assert sum(r["n_pages"] for r in stats) == n_docs
    assert sum(r["out_links"] for r in stats) == K_LINKS * n_docs
    assert sum(r["in_links"] for r in stats) == K_LINKS * n_docs
    assert all(1 <= r["n_dst_hosts"] <= N_HOSTS for r in stats)
    # n_dst_hosts counts distinct destination pairs == edge rows per src
    assert sum(r["n_dst_hosts"] for r in stats) == edges.count()


def test_crawl_frontier_directed(ray_session):
    """Seed sits at dist 0; every other reached host's dist is 1 + the
    min dist over some in-linking host (directed relaxation witness)."""
    from ner_pytorch_ray.pipelines.weblinks import (
        web_crawl_frontier,
        web_link_edges,
    )

    dist = {
        r["host"]: r["dist"]
        for r in web_crawl_frontier(SF, seed_host="host-00.example.test")
        .take_all()
    }
    assert dist["host-00.example.test"] == 0
    preds: dict[str, list[str]] = {}
    for r in web_link_edges(SF).take_all():
        preds.setdefault(r["dst_host"], []).append(r["src_host"])
    for h, d in dist.items():
        if d == 0:
            continue
        assert d == 1 + min(
            dist[p] for p in preds[h] if p in dist
        ), h


def test_authority_weighted_selection(ray_session):
    """Every kept doc satisfies the keep inequality against the final
    rank table; no doc failing it is kept; kept fraction is in the
    plausible band around mult/N_HOSTS."""
    from ner_pytorch_ray.pipelines.weblinks import (
        N_HOSTS,
        _u64,
        authority_weighted_docs,
        host_index,
        host_name,
        web_host_pagerank,
    )

    mult = 16
    ranks = {
        r["host"]: r["rank"] for r in web_host_pagerank(SF).take_all()
    }
    kept = authority_weighted_docs(SF, mult=mult).take_all()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    kept_ids = set()
    for r in kept:
        assert r["host"] == host_name(host_index(r["doc_id"]))
        assert r["rank"] == ranks[r["host"]]
        assert _u64(f"{r['doc_id']}:samp") % 10**12 < r["rank"] * mult
        kept_ids.add(r["doc_id"])
    for d in range(n_docs):
        if d not in kept_ids:
            h = host_name(host_index(d))
            assert _u64(f"{d}:samp") % 10**12 >= ranks.get(h, 0) * mult
    frac = len(kept) / n_docs
    assert 0.5 * mult / N_HOSTS < frac < 2.0 * mult / N_HOSTS


def test_triple_authority_composition(ray_session):
    """authority_i of every triple equals the sum of its evidence hosts'
    ranks recomputed independently from kg_evidence + the rank table;
    n_evidence totals match the evidence row count."""
    from ner_pytorch_ray.pipelines.kg_analytics import kg_evidence
    from ner_pytorch_ray.pipelines.weblinks import (
        host_index,
        host_name,
        kg_triple_authority,
        web_host_pagerank,
    )

    ranks = {
        r["host"]: r["rank"] for r in web_host_pagerank(SF).take_all()
    }
    expect: dict[tuple, list[int]] = {}
    for r in kg_evidence(SF).take_all():
        d = int(r["url"].split("doc-")[1].split(".")[0])
        k = (r["subj"], r["pred"], r["obj"])
        expect.setdefault(k, []).append(ranks[host_name(host_index(d))])
    got = kg_triple_authority(SF).take_all()
    assert len(got) == len(expect)
    for r in got:
        k = (r["subj"], r["pred"], r["obj"])
        assert r["n_evidence"] == len(expect[k])
        assert r["authority_i"] == sum(expect[k])


def test_weblinks_incremental_resume(ray_session, tmp_path):
    """Interrupted ingest resumes at delta granularity: ingest 2 of 3
    deltas, reopen the state dir, retry delta 1 (exactly-once no-op),
    ingest the last — final edges bit-match the batch build; a changed
    fingerprint for an ingested delta raises."""
    import pytest

    from ner_pytorch_ray.pipelines.incremental import (
        final_web_edges,
        ingest_weblinks_delta,
        weblinks_incremental_from_documents,
    )
    from ner_pytorch_ray.pipelines.weblinks import (
        _documents_to_linked_pages,
        corpus_size,
        web_link_edges,
    )
    from ner_pytorch_ray.state import manifests as mf
    import ray

    sd = str(tmp_path / "state")
    n_docs = corpus_size(SF)

    def delta_pages(d):
        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        return mf.filter_shard(docs, 3, d).map_batches(
            lambda b: _documents_to_linked_pages(b, n_docs),
            batch_format="pyarrow",
        )

    for d in (0, 1):
        ingest_weblinks_delta(delta_pages(d), sd, f"delta={d}/3", f"fp{d}")
    # retry of an ingested delta with the SAME fingerprint: no-op
    v = ingest_weblinks_delta(delta_pages(1), sd, "delta=1/3", "fp1")
    assert v == 2
    # a DIFFERENT fingerprint for the same delta id must raise
    with pytest.raises(ValueError):
        ingest_weblinks_delta(delta_pages(1), sd, "delta=1/3", "fpX")
    ingest_weblinks_delta(delta_pages(2), sd, "delta=2/3", "fp2")

    batch = web_link_edges(SF).take_all()
    assert final_web_edges(sd).take_all() == batch
    # convenience wrapper agrees and cleans up after itself
    before = set(os.listdir("/tmp"))
    assert (
        weblinks_incremental_from_documents(SF, n_deltas=3).take_all()
        == batch
    )
    leaked = {
        d for d in set(os.listdir("/tmp")) - before
        if d.startswith("weblinks_incremental_")
    }
    assert not leaked


def test_host_freshness_and_reciprocity(ray_session):
    """Freshness spans recompute from doc_ids (warc_ts = EPOCH + doc_id);
    reciprocal pairs are exactly the edge pairs present in BOTH
    directions, with direction-tagged counts."""
    from ner_pytorch_ray.pipelines.weblinks import (
        host_index,
        host_name,
        web_host_freshness,
        web_link_edges,
        web_reciprocal_pairs,
    )
    from ner_pytorch_ray.sources.pages import EPOCH_US

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    span: dict[str, list[int]] = {}
    for d in range(n_docs):
        span.setdefault(host_name(host_index(d)), []).append(d)
    fresh = web_host_freshness(SF).take_all()
    assert len(fresh) == len(span)
    for r in fresh:
        ds = span[r["host"]]
        assert r["n_pages"] == len(ds)
        us = int(r["first_ts"].timestamp() * 1e6) if hasattr(
            r["first_ts"], "timestamp"
        ) else r["first_ts"]
        assert us == EPOCH_US + min(ds)

    ew = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in web_link_edges(SF).take_all()
    }
    expect = sorted(
        (a, b)
        for (a, b) in ew
        if a < b and (b, a) in ew
    )
    got = web_reciprocal_pairs(SF).take_all()
    assert [(r["host_a"], r["host_b"]) for r in got] == expect
    for r in got:
        assert r["fwd_links"] == ew[(r["host_a"], r["host_b"])]
        assert r["bwd_links"] == ew[(r["host_b"], r["host_a"])]


def test_host_walks_follow_edges(ray_session):
    """Every consecutive walk hop is a real neighbor in the symmetric
    host graph; shape = nodes x walks x (steps+1) positions."""
    from ner_pytorch_ray.pipelines.weblinks import (
        web_host_walks,
        web_link_edges,
    )

    nbrs: dict[str, set] = {}
    for r in web_link_edges(SF).take_all():
        nbrs.setdefault(r["src_host"], set()).add(r["dst_host"])
        nbrs.setdefault(r["dst_host"], set()).add(r["src_host"])
    rows = web_host_walks(SF, walks_per_node=2, steps=3).take_all()
    assert len(rows) == len(nbrs) * 2 * 4
    pos = {}
    for r in rows:
        pos[(r["start"], r["walk_idx"], r["step"])] = r["node"]
    for (start, wi, step), node in pos.items():
        if step == 0:
            assert node == start
        else:
            assert node in nbrs[pos[(start, wi, step - 1)]]


def test_host_langs_cover_corpus(ray_session):
    """(host, lang) doc counts partition the corpus exactly."""
    from ner_pytorch_ray.pipelines.weblinks import web_host_langs

    rows = web_host_langs(SF).take_all()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert len({(r["host"], r["lang"]) for r in rows}) == len(rows)


def test_host_hits_l1_mass(ray_session):
    """Hub and authority vectors are L1-normalized to ~scale (floor
    truncation < 1 ulp per node) and non-negative; hubs differ from
    authorities (the graph is directed)."""
    rows = __import__(
        "ner_pytorch_ray.pipelines.weblinks", fromlist=["web_host_hits"]
    ).web_host_hits(SF, iters=2).take_all()
    scale = 10**9
    hub = sum(r["hub_i"] for r in rows)
    auth = sum(r["auth_i"] for r in rows)
    assert 0 <= scale - hub < len(rows)
    assert 0 <= scale - auth < len(rows)
    assert all(r["hub_i"] >= 0 and r["auth_i"] >= 0 for r in rows)
    assert any(r["hub_i"] != r["auth_i"] for r in rows)


def test_host_pagerank_mass(ray_session):
    """Ranks are positive ints summing to ~scale. Every floor division
    truncates < 1 ulp, and there is one per symmetric edge row plus one
    base term per node per iteration, plus the initial scale // N."""
    from ner_pytorch_ray.pipelines.weblinks import (
        web_host_pagerank,
        web_link_edges,
    )

    iters = 3
    rows = web_host_pagerank(SF, iters=iters).take_all()
    n_edge_rows = web_link_edges(SF).count()
    total = sum(r["rank"] for r in rows)
    scale = 10**12
    max_loss = len(rows) + iters * (2 * n_edge_rows + len(rows))
    assert 0 < scale - total < max_loss
    assert all(r["rank"] > 0 for r in rows)
