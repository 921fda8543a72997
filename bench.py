#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

    python bench.py                  # one JSON line with per-query seconds
    python bench.py --scaling        # same job at num_cpus=8 and 32 in fresh
                                     # processes -> throughput + efficiency

Env:
    GRAFT_SF_DIR    input dir (default /root/testdata/sf0.1)
    RAY_GRAFT_CPUS  parallelism (default 32)

This script OWNS its Ray session (init+shutdown); library code never does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # At low CPU counts the per-operator reservation splits a small CPU
    # budget across ~6 operators and starves the hot stage; the bench wants
    # whole-pool sharing (measured: 16s -> ~8.6s at 8 CPUs on the KG DAG).
    ctx.op_resource_reservation_enabled = False
    return ray


def _corpus_stats(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return {
        "n_docs": md.num_rows,
        "n_chars": int(sum(t.column("n_chars").to_pylist())),
    }


def run_queries(sf_dir: str) -> tuple[dict, dict]:
    """Headline pipelines; returns (per-query seconds, aux counts)."""
    import __ray_entry__ as entrymod

    timings: dict[str, float] = {}
    aux: dict[str, int] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        aux[name + "_rows"] = n

    # warm the worker pool once so the first timed query doesn't carry the
    # session's import/spawn cost (a steady-state cluster is the target)
    import ray.data

    ray.data.range(1000, override_num_blocks=8).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    # flagship: full KG DAG -> materialized sorted edges
    def kg():
        from ner_pytorch_ray.sources.pages import pages_from_documents
        from ner_pytorch_ray.pipelines.kg import linked_mentions
        from ner_pytorch_ray.stages.graph import edges_from_linked

        pages = pages_from_documents(sf_dir, override_num_blocks=64)
        return edges_from_linked(linked_mentions(pages)).count()

    timed("kg_edges", kg)

    def kg_nodes():
        from ner_pytorch_ray.sources.pages import pages_from_documents
        from ner_pytorch_ray.pipelines.kg import linked_mentions
        from ner_pytorch_ray.stages.graph import nodes_from_linked

        pages = pages_from_documents(sf_dir, override_num_blocks=64)
        return nodes_from_linked(linked_mentions(pages)).count()

    timed("kg_nodes", kg_nodes)

    def kg_relations():
        from ner_pytorch_ray.pipelines.kg import relations_from_documents

        return relations_from_documents(sf_dir).count()

    timed("kg_relations", kg_relations)

    def neural():
        from ner_pytorch_ray.pipelines.neural import neural_mentions

        men, _, _ = neural_mentions(
            sf_dir, concurrency=(1, NUM_CPUS), batch_size=256
        )
        return men.count()

    timed("neural_mentions", neural)

    def minhash():
        from ner_pytorch_ray.pipelines.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(sf_dir, tau=0.5).count()

    timed("minhash_lsh", minhash)

    def knn():
        from ner_pytorch_ray.pipelines.similarity import knn_topk

        return knn_topk(sf_dir, n_queries=10, k=5).count()

    timed("knn_topk", knn)

    def pricing():
        from ner_pytorch_ray.pipelines.relational import lineitem_pricing

        return lineitem_pricing(sf_dir).count()

    timed("lineitem_pricing", pricing)

    return timings, aux


def run_extras(sf_dir: str) -> dict:
    """Round-2 operator timings, reported OUTSIDE the headline total so the
    headline stays comparable across rounds. Includes the ANN query-scaling
    demonstration: bucket-native ann_lsh_topk at 10 vs 1000 queries — the
    per-query cost must not scale with n_queries x corpus (the r1 version
    rescanned every corpus row per query)."""
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        fn()
        extras[name] = round(time.perf_counter() - t0, 3)

    from ner_pytorch_ray.pipelines.similarity import ann_lsh_topk, ivf_topk
    from ner_pytorch_ray.pipelines.windows import (
        asof_error_attribution,
        user_sessions,
    )
    from ner_pytorch_ray.pipelines.neural import adv_nll_topk

    timed("ann_lsh_q10", lambda: ann_lsh_topk(sf_dir, n_queries=10, k=5).count())
    timed(
        "ann_lsh_q1000",
        lambda: ann_lsh_topk(sf_dir, n_queries=1000, k=5).count(),
    )
    extras["ann_perquery_ratio"] = round(
        (extras["ann_lsh_q1000"] / 1000.0) / max(extras["ann_lsh_q10"] / 10.0, 1e-9),
        3,
    )
    timed("ivf_topk", lambda: ivf_topk(sf_dir, n_queries=10, k=5).count())

    from ner_pytorch_ray.pipelines.similarity import pq_topk

    timed("pq_topk", lambda: pq_topk(sf_dir, n_queries=10, k=5).count())
    timed("user_sessions", lambda: user_sessions(sf_dir).count())
    timed("asof_attribution", lambda: asof_error_attribution(sf_dir).count())
    timed("adv_nll_topk", lambda: adv_nll_topk(sf_dir).count())

    # round 3: two distributed training epochs (feature-cache pass + two
    # integer-exact gradient passes + dev-F1 evals)
    from ner_pytorch_ray.pipelines.training import train_loop

    timed("train_2epochs", lambda: train_loop(sf_dir, n_epochs=2).num_rows)

    # round 4: FULL-MODEL training (every parameter steps — char/word
    # embeddings, char CNN, BiLSTM, CRF; sparse embedding-gradient
    # transport), two epochs = encode/label pass + three fused passes
    from ner_pytorch_ray.pipelines.training_full import train_loop_full

    timed(
        "train_full_2epochs",
        lambda: train_loop_full(sf_dir, n_epochs=2).num_rows,
    )

    # round 3: iterative graph ops (dup-cluster canonicalization + weighted
    # entity PageRank over the constructed KG)
    from ner_pytorch_ray.pipelines.graph_ops import (
        connected_components,
        kg_pagerank,
    )

    timed("graph_components", lambda: connected_components(sf_dir).count())
    timed("kg_pagerank", lambda: kg_pagerank(sf_dir, iters=3).count())

    # late round 3: corpus-level webtext curation (composed quality gate =
    # pure streaming scan; sentence dedup = 3 metadata-row shuffles;
    # sequence packing = distributed prefix sum)
    from ner_pytorch_ray.pipelines.webtext import (
        corpus_filter,
        sentence_dedup,
        sequence_pack,
    )

    timed("corpus_filter", lambda: corpus_filter(sf_dir).count())
    timed("sentence_dedup", lambda: sentence_dedup(sf_dir).count())
    timed("sequence_pack", lambda: sequence_pack(sf_dir).count())

    # round 4: corpus hygiene, bounded-state sketches, KG deepeners
    from ner_pytorch_ray.pipelines.graph_ops import kg_bfs_hops
    from ner_pytorch_ray.pipelines.kg_embed import kg_transe_curve
    from ner_pytorch_ray.pipelines.scrub import decontaminate, pii_scrub
    from ner_pytorch_ray.pipelines.sketches import (
        approx_distinct_users,
        heavy_bigrams,
    )

    timed("decontaminate", lambda: decontaminate(sf_dir).count())
    timed("pii_scrub", lambda: pii_scrub(sf_dir).count())
    timed("hll_distinct", lambda: approx_distinct_users(sf_dir).count())
    timed("heavy_bigrams", lambda: heavy_bigrams(sf_dir).count())
    timed("kg_bfs_hops", lambda: kg_bfs_hops(sf_dir).count())
    timed(
        "kg_transe_5ep",
        lambda: kg_transe_curve(sf_dir, dim=16, epochs=5).num_rows,
    )

    # round-4 continuation: KG analytics layer (2-hop metapath self-join,
    # exact-integer lift with two partitioned marginal joins, weighted-LPA
    # communities, personalized PageRank)
    from ner_pytorch_ray.pipelines.kg_analytics import (
        edge_lift,
        kg_communities,
        kg_ppr,
        kg_random_walks,
        metapaths_2hop,
    )

    timed("kg_paths_2hop", lambda: metapaths_2hop(sf_dir).count())
    timed("kg_edge_lift", lambda: edge_lift(sf_dir).count())
    timed("kg_communities", lambda: kg_communities(sf_dir).count())
    timed("kg_ppr", lambda: kg_ppr(sf_dir).count())
    timed("kg_random_walks", lambda: kg_random_walks(sf_dir).count())
    from ner_pytorch_ray.pipelines.kg_analytics import kg_skipgram_pairs

    timed("kg_skipgram_pairs", lambda: kg_skipgram_pairs(sf_dir).count())
    from ner_pytorch_ray.pipelines.kg_analytics import validated_triples

    timed(
        "kg_validated_triples", lambda: validated_triples(sf_dir).count()
    )
    from ner_pytorch_ray.pipelines.kg_analytics import (
        kg_evidence,
        sparsify_edges,
    )

    timed("kg_sparsified_edges", lambda: sparsify_edges(sf_dir).count())
    timed("kg_evidence", lambda: kg_evidence(sf_dir).count())

    # round-4 continuation 3: relation-property mining, inverted-index
    # search, distributed window functions, entity resolution
    from ner_pytorch_ray.pipelines.entity_resolution import (
        part_entity_resolution,
    )
    from ner_pytorch_ray.pipelines.kg_analytics import inverse_relations
    from ner_pytorch_ray.pipelines.relational import (
        customer_running_revenue,
        nation_balance_rank,
    )
    from ner_pytorch_ray.pipelines.search import (
        conjunctive_search,
        term_postings,
    )

    timed("kg_inverse_relations", lambda: inverse_relations(sf_dir).count())
    timed("term_postings", lambda: term_postings(sf_dir, k=3).count())
    timed(
        "search_conjunctive",
        lambda: conjunctive_search(sf_dir, ["dup", "scan", "merge"], k=10).count(),
    )
    timed(
        "nation_balance_rank", lambda: nation_balance_rank(sf_dir).count()
    )
    timed(
        "customer_running_revenue",
        lambda: customer_running_revenue(sf_dir).count(),
    )
    timed(
        "part_entity_resolution",
        lambda: part_entity_resolution(sf_dir).count(),
    )

    # round-4 continuation 4: fuzzy matching, bucketed storage layout
    # (co-located join / bucket-local aggregate / zone-map skipping),
    # Bloom semijoin, distributed pivot
    from ner_pytorch_ray.pipelines.fuzzy import surface_fuzzy_pairs
    from ner_pytorch_ray.pipelines.relational import pivot_events
    from ner_pytorch_ray.pipelines.sketches import bloom_semijoin_orders
    from ner_pytorch_ray.sources.bucketed import (
        bucketed_join_orders,
        zonemap_time_range,
    )

    timed(
        "surface_fuzzy_pairs",
        lambda: surface_fuzzy_pairs(sf_dir, max_dist=2).count(),
    )
    timed(
        "bucketed_join_orders",
        lambda: bucketed_join_orders(sf_dir).count(),
    )
    timed(
        "zonemap_time_range", lambda: zonemap_time_range(sf_dir).count()
    )
    timed(
        "bloom_semijoin_orders",
        lambda: bloom_semijoin_orders(sf_dir).count(),
    )
    timed("pivot_events", lambda: pivot_events(sf_dir).count())

    # round-4 continuation 5: CDC upsert, KG crawl diff, distributed PCA,
    # table checksum, profiling, grouped median
    from ner_pytorch_ray.pipelines.analysis import profile_table
    from ner_pytorch_ray.pipelines.kg import kg_crawl_diff
    from ner_pytorch_ray.pipelines.relational import grouped_median_value
    from ner_pytorch_ray.pipelines.similarity import pca_components
    from ner_pytorch_ray.pipelines.sketches import table_checksum
    from ner_pytorch_ray.sources.bucketed import cdc_latest_events

    timed("cdc_latest_events", lambda: cdc_latest_events(sf_dir).count())
    timed("kg_crawl_diff", lambda: kg_crawl_diff(sf_dir).count())
    timed("pca_components", lambda: pca_components(sf_dir).count())
    timed("table_checksum", lambda: table_checksum(sf_dir).count())
    timed("profile_orders", lambda: profile_table(sf_dir).count())
    timed(
        "grouped_median_value", lambda: grouped_median_value(sf_dir).count()
    )

    from ner_pytorch_ray.pipelines.similarity import ivfpq_topk

    timed(
        "ivfpq_topk", lambda: ivfpq_topk(sf_dir, n_queries=10, k=5).count()
    )

    # late round-4 operators
    from ner_pytorch_ray.pipelines.bpe import bpe_encoded_lengths
    from ner_pytorch_ray.pipelines.crawl import crawl_url_dedup
    from ner_pytorch_ray.pipelines.dsir import dsir_select
    from ner_pytorch_ray.pipelines.graph_ops import kg_link_ra
    from ner_pytorch_ray.pipelines.relational import (
        event_lead_lag,
        grouped_quartiles,
    )
    from ner_pytorch_ray.pipelines.search import bm25_search
    from ner_pytorch_ray.pipelines.semdedup import semdedup
    from ner_pytorch_ray.pipelines.sketches import bloom_antijoin_customers

    timed("semdedup", lambda: semdedup(sf_dir, n_centroids=8).count())
    timed("dsir_selected", lambda: dsir_select(sf_dir).count())
    timed(
        "bpe_encoded_lengths", lambda: bpe_encoded_lengths(sf_dir).count()
    )
    timed("crawl_url_dedup", lambda: crawl_url_dedup(sf_dir).count())
    timed(
        "search_bm25",
        lambda: bm25_search(sf_dir, ["dup", "scan", "merge"], k=10).count(),
    )
    timed("event_lead_lag", lambda: event_lead_lag(sf_dir).count())

    from ner_pytorch_ray.pipelines.weblinks import (
        kg_triple_authority,
        web_host_hits,
        web_host_pagerank,
        web_link_edges,
    )

    timed("web_link_edges", lambda: web_link_edges(sf_dir).count())
    timed(
        "web_host_pagerank", lambda: web_host_pagerank(sf_dir).count()
    )
    timed("web_host_hits", lambda: web_host_hits(sf_dir).count())
    timed(
        "kg_triple_authority",
        lambda: kg_triple_authority(sf_dir).count(),
    )
    timed(
        "bloom_antijoin",
        lambda: bloom_antijoin_customers(sf_dir).count(),
    )
    timed("kg_link_ra", lambda: kg_link_ra(sf_dir).count())
    timed(
        "grouped_quartiles", lambda: grouped_quartiles(sf_dir).count()
    )

    from ner_pytorch_ray.pipelines.graph_ops import kg_hits
    from ner_pytorch_ray.pipelines.incremental import (
        crawl_incremental_from_documents,
    )
    from ner_pytorch_ray.pipelines.relational import (
        orders_cube,
        regional_supplier_revenue,
    )
    from ner_pytorch_ray.pipelines.scrub import (
        corpus_mixture,
        doc_chunks,
        span_corruption_stats,
    )
    from ner_pytorch_ray.pipelines.windows import (
        event_transitions,
        funnel_conversion,
        retention_cohorts,
        window_anomalies,
    )

    timed("kg_hits", lambda: kg_hits(sf_dir).count())
    timed("window_anomalies", lambda: window_anomalies(sf_dir).count())
    timed(
        "crawl_dedup_incremental",
        lambda: crawl_incremental_from_documents(sf_dir).count(),
    )
    timed("corpus_mixture", lambda: corpus_mixture(sf_dir).count())
    timed("doc_chunks", lambda: doc_chunks(sf_dir).count())

    from ner_pytorch_ray.pipelines.webtext import retrieval_corpus_build

    timed(
        "retrieval_corpus_build",
        lambda: retrieval_corpus_build(sf_dir).count(),
    )
    timed("orders_cube", lambda: orders_cube(sf_dir).count())
    timed(
        "span_corruption_stats",
        lambda: span_corruption_stats(sf_dir).count(),
    )
    timed(
        "regional_supplier_revenue",
        lambda: regional_supplier_revenue(sf_dir).count(),
    )
    timed(
        "funnel_conversion", lambda: funnel_conversion(sf_dir).count()
    )
    timed(
        "retention_cohorts", lambda: retention_cohorts(sf_dir).count()
    )
    timed(
        "event_transitions", lambda: event_transitions(sf_dir).count()
    )

    from ner_pytorch_ray.pipelines.graph_ops import (
        kg_eccentricity,
        kg_katz,
        kg_node_jaccard,
        kg_sssp,
    )
    from ner_pytorch_ray.pipelines.similarity import ann_recall

    timed("kg_sssp", lambda: kg_sssp(sf_dir).count())
    timed("kg_node_jaccard", lambda: kg_node_jaccard(sf_dir).count())
    timed("kg_katz", lambda: kg_katz(sf_dir).count())
    timed("kg_eccentricity", lambda: kg_eccentricity(sf_dir).count())

    from ner_pytorch_ray.pipelines.analysis import (
        collocations,
        doc_keywords,
        lang_top_tokens,
    )

    timed("collocations", lambda: collocations(sf_dir).count())
    timed("doc_keywords", lambda: doc_keywords(sf_dir).count())
    timed("lang_top_tokens", lambda: lang_top_tokens(sf_dir).count())

    from ner_pytorch_ray.pipelines.relational import (
        customer_skyline,
        fk_integrity_report,
        grouped_mad_outliers,
    )

    timed(
        "grouped_mad_outliers",
        lambda: grouped_mad_outliers(sf_dir).count(),
    )
    timed(
        "fk_integrity_report",
        lambda: fk_integrity_report(sf_dir).count(),
    )
    timed("customer_skyline", lambda: customer_skyline(sf_dir).count())

    from ner_pytorch_ray.pipelines.relational import nation_revenue_share

    timed(
        "nation_revenue_share",
        lambda: nation_revenue_share(sf_dir).count(),
    )

    from ner_pytorch_ray.pipelines.dedup import (
        dedup_consensus,
        doc_cosine_pairs,
    )

    timed(
        "doc_cosine_pairs", lambda: doc_cosine_pairs(sf_dir).count()
    )
    timed("dedup_consensus", lambda: dedup_consensus(sf_dir).count())
    timed(
        "ann_recall",
        lambda: ann_recall(sf_dir, n_queries=10, k=5).count(),
    )
    return extras


def single_run(num_cpus: int, sf_dir: str) -> dict:
    ray = _init_ray(num_cpus)
    try:
        t0 = time.perf_counter()
        timings, aux = run_queries(sf_dir)
        total = round(time.perf_counter() - t0, 3)
        # GRAFT_SKIP_EXTRAS=1: headline-only run (quick environmental
        # A/B without the ~80-operator extras sweep)
        if os.environ.get("GRAFT_SKIP_EXTRAS"):
            extras = {}
        else:
            extras = run_extras(sf_dir)
    finally:
        ray.shutdown()
    stats = _corpus_stats(sf_dir)
    kg_secs = timings.get("kg_edges", 0.0) or 1e-9
    # Key order matters: the driver's recorder keeps the TAIL of a long
    # stdout line (BENCH_r04.json lost the leading headline keys to the
    # ~130-entry extras map), so the bulky extras/aux go first and the
    # headline metric / per-query timings / throughput go LAST.
    return {
        "extras": extras,
        "aux": aux,
        "metric": "headline pipelines wall-time (kg construct, neural tag, dedup, knn, agg)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs_per_sec_kg": round(stats["n_docs"] / kg_secs, 2),
        "n_docs": stats["n_docs"],
    }


# Scaling criterion configuration. The job is the neural KG path (BiLSTM-CRF
# tagging -> mention extraction — the reference's model pipeline) over a
# sharded replicated corpus: per-doc model compute dominates, so the measured
# ratio reflects pipeline scaling, not Ray's fixed session costs.
#
# Methodology (in-sandbox substitute for an N-node vs 4N-node cluster):
#   * fresh process per leg, `ray.init(num_cpus=n)`;
#   * the leg is PINNED to n physical cores (sched_setaffinity before
#     ray.init, inherited by every Ray worker) — without pinning, the
#     "small" leg silently borrows idle cores via kernel/Arrow/raylet
#     threads and turbo headroom, understating true scaling;
#   * 2 vs 8 cores: raw CPU-bound Ray tasks scale at ~1.0 efficiency on
#     this span (measured); above ~8-16 active cores this host's per-core
#     throughput drops (frequency/membw), which would be a hardware
#     artifact, not a pipeline property.
SCALING_REPLICATE = int(os.environ.get("GRAFT_SCALING_REPLICATE", "32"))
SCALING_LOW = int(os.environ.get("GRAFT_SCALING_LOW", "2"))
SCALING_HIGH = int(os.environ.get("GRAFT_SCALING_HIGH", "8"))
# job = neural (BiLSTM-CRF tagging, the default / r1-comparable) or kg
# (gazetteer triple construction — the north-star "triples/sec" pipeline;
# lighter per-doc compute, so it needs a larger replicate to amortize
# fixed executor costs: default 128)
SCALING_JOB = os.environ.get("GRAFT_SCALING_JOB", "neural")
SCALING_KG_REPLICATE = int(os.environ.get("GRAFT_SCALING_KG_REPLICATE", "128"))


def neural_scaling_job(num_cpus: int, sf_dir: str, replicate: int) -> dict:
    """pages -> sentences -> encode -> BiLSTM-CRF actor pool -> mentions,
    fixed shard count (128) at every parallelism level."""
    os.sched_setaffinity(0, range(num_cpus))
    ray = _init_ray(num_cpus)
    try:
        from ner_pytorch_ray.pipelines.neural import neural_mentions

        # warm the worker pool before timing (same as the headline bench):
        # cold python-worker spawn is a per-SESSION cost, identical in
        # seconds on both legs, and a steady-state cluster is the target —
        # leaving it in deflates the wide leg's measured efficiency
        import ray.data as _rd

        _rd.range(1000, override_num_blocks=8).map_batches(
            lambda b: b, batch_format="pyarrow"
        ).count()

        t0 = time.perf_counter()
        men, _, _ = neural_mentions(
            sf_dir,
            replicate=replicate,
            override_num_blocks=128,
            concurrency=(max(1, num_cpus - 2), 32),
        )
        n_mentions = men.count()
        secs = time.perf_counter() - t0
    finally:
        ray.shutdown()
    n_docs = _corpus_stats(sf_dir)["n_docs"] * replicate
    return {
        "seconds": round(secs, 3),
        "n_docs": n_docs,
        "n_mentions": n_mentions,
        "docs_per_sec": round(n_docs / secs, 2),
        "num_cpus": num_cpus,
    }


def kg_scaling_job(num_cpus: int, sf_dir: str, replicate: int) -> dict:
    """pages -> extract -> sentences -> tag -> mentions -> link -> edges:
    the end-to-end triple pipeline, sharded replicated corpus."""
    os.sched_setaffinity(0, range(num_cpus))
    ray = _init_ray(num_cpus)
    try:
        from ner_pytorch_ray.sources.pages import pages_from_documents
        from ner_pytorch_ray.pipelines.kg import linked_mentions
        from ner_pytorch_ray.stages.graph import edges_from_linked

        import ray.data as _rd

        _rd.range(1000, override_num_blocks=8).map_batches(
            lambda b: b, batch_format="pyarrow"
        ).count()

        t0 = time.perf_counter()
        pages = pages_from_documents(
            sf_dir, replicate=replicate, override_num_blocks=128
        )
        rows = edges_from_linked(linked_mentions(pages)).take_all()
        secs = time.perf_counter() - t0
        n_pairs = sum(r["weight"] for r in rows)
    finally:
        ray.shutdown()
    n_docs = _corpus_stats(sf_dir)["n_docs"] * replicate
    return {
        "seconds": round(secs, 3),
        "n_docs": n_docs,
        "n_pair_instances": int(n_pairs),
        "docs_per_sec": round(n_docs / secs, 2),
        "triples_per_sec": round(n_pairs / secs, 2),
        "num_cpus": num_cpus,
    }


def scaling_run(
    sf_dir: str, low: int = SCALING_LOW, high: int = SCALING_HIGH
) -> dict:
    """Same job at two parallelism levels in FRESH pinned processes (the
    in-sandbox substitute for N vs 4N nodes; BASELINE.md scaling criterion)."""
    results = {}
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))
    for n in (low, high):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(n)
        env["GRAFT_SF_DIR"] = sf_dir
        best = None
        # best-of-N on BOTH legs (min over trials = the standard
        # least-contention estimate): executor scheduling jitter is large
        # on the wide leg (30-42 s spread at 8 cores in round 2), and on a
        # busy shared host the narrow leg jitters too (125-155 s spread
        # observed in round 3, vs +/-2% on an idle host) — an asymmetric
        # protocol would let one slow narrow trial flatter the ratio.
        leg_trials = trials
        for _ in range(leg_trials):
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-worker"],
                capture_output=True,
                text=True,
                env=env,
                cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            if best is None or r["seconds"] < best["seconds"]:
                best = r
        results[n] = best
    thr_low = results[low]["docs_per_sec"]
    thr_high = results[high]["docs_per_sec"]
    eff = (thr_high / thr_low) / (high / low)
    job_desc = (
        "kg_edges (extract -> tag -> mention -> link -> triples)"
        if SCALING_JOB == "kg"
        else "neural_mentions (BiLSTM-CRF tag -> mention extract)"
    )
    return {
        "metric": "scaling efficiency (throughput ratio / cpu ratio)",
        "value": round(eff, 4),
        "unit": "ratio",
        "sf": sf_dir,
        "job": job_desc,
        "replicate": SCALING_KG_REPLICATE if SCALING_JOB == "kg" else SCALING_REPLICATE,
        "pinned": True,
        "low": results[low],
        "high": results[high],
    }


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        if SCALING_JOB == "kg":
            print(json.dumps(kg_scaling_job(NUM_CPUS, SF_DIR, SCALING_KG_REPLICATE)))
        else:
            print(json.dumps(neural_scaling_job(NUM_CPUS, SF_DIR, SCALING_REPLICATE)))
    elif "--scaling" in sys.argv:
        print(json.dumps(scaling_run(SF_DIR)))
    else:
        print(json.dumps(single_run(NUM_CPUS, SF_DIR)))
