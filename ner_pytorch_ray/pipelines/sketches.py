"""Mergeable sketches: HyperLogLog count-distinct over Ray Data.

``distinct_users_by_type`` (relational.py) is the EXACT two-level distinct —
its shuffle moves every distinct (type, user) pair. At 10^12 events with
10^9 distinct users that exchange is the bottleneck; the sketch path below
moves a FIXED 2^p-register summary per (block, type) instead, independent of
cardinality. Flajolet et al. 2007 (HyperLogLog) with the standard
small-range linear-counting correction; estimates are deterministic —
register values are maxima of per-key hashes (order-free), and the fold is
evaluated once over the merged registers — so the result is bit-identical
under any partitioning, which the tests assert.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

import ray.data

_P = 12  # 2^12 = 4096 registers; rel. error ~1.04/sqrt(m) ~ 1.6%
_M = 1 << _P


def _hash64(vals: np.ndarray) -> np.ndarray:
    """Stable vectorized 64-bit mix of int keys (splitmix64 finalizer —
    platform-independent, no per-row Python loop, well-distributed even for
    sequential ids)."""
    with np.errstate(over="ignore"):
        x = vals.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _register_rows(keys: np.ndarray, groups: np.ndarray) -> pa.Table:
    """(group, register, rho) rows, max-combined within the block."""
    h = _hash64(keys)
    reg = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = h << np.uint64(_P)  # top 64-p suffix bits, left-aligned
    # rho = position of the first 1-bit in the suffix (1-based); all-zero
    # suffix -> 64-p+1
    nz = rest != 0
    rho = np.full(len(h), 64 - _P + 1, dtype=np.int64)
    if nz.any():
        # count leading zeros via float log2 is unsafe near 2^63; use
        # bit-twiddling on uint64 instead
        x = rest[nz]
        lz = np.zeros(x.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        rho[nz] = lz + 1
    t = pa.table(
        {
            "grp": pa.array(groups.tolist(), type=pa.string()),
            "reg": pa.array(reg),
            # store NEGATIVE rho so the engine-wide grouped_sum(min) helper
            # realizes the register max
            "neg_rho": pa.array(-rho),
        }
    )
    g = t.group_by(["grp", "reg"]).aggregate([("neg_rho", "min")])
    return g.rename_columns(["grp", "reg", "neg_rho"])


def _estimate(rhos: np.ndarray) -> int:
    """HLL estimate from the 2^p register maxima (0 = never touched)."""
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-rhos.astype(np.float64))))
    zeros = int(np.sum(rhos == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting (small range)
    return int(round(e))


def hll_distinct(
    ds: ray.data.Dataset, key_col: str, group_col: str
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT key) per group. Output:
    (``group_col``: string, n_distinct_approx: int64)."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    def partial(batch: pa.Table) -> pa.Table:
        return _register_rows(
            batch.column(key_col).to_numpy(),
            np.asarray(batch.column(group_col).to_pylist(), dtype=object),
        )

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["grp", "reg"],
        sum_cols=[],
        min_cols=["neg_rho"],
    )

    def fold_partial(batch: pa.Table) -> pa.Table:
        """Pack each block's register rows into one dense row per group so
        the final fold sees O(groups) rows regardless of block count."""
        grp = np.asarray(batch.column("grp").to_pylist(), dtype=object)
        reg = batch.column("reg").to_numpy()
        rho = -batch.column("neg_rho").to_numpy()
        out_g, out_v = [], []
        for g in np.unique(grp):
            sel = grp == g
            dense = np.zeros(_M, dtype=np.int64)
            dense[reg[sel]] = rho[sel]
            out_g.append(str(g))
            out_v.append(dense.tolist())
        return pa.table(
            {
                "grp": pa.array(out_g, type=pa.string()),
                "regs": pa.array(out_v, type=pa.list_(pa.int64())),
            }
        )

    dense = merged.map_batches(fold_partial, batch_format="pyarrow")

    def finish(key, items) -> pa.Table:
        empty = pa.schema(
            [(group_col, pa.string()), ("n_distinct_approx", pa.int64())]
        )
        if items is None or not items:
            return empty.empty_table()
        (g,) = key
        regs = np.zeros(_M, dtype=np.int64)
        for (r,) in items:
            regs = np.maximum(regs, np.asarray(r, dtype=np.int64))
        return pa.Table.from_pydict(
            {
                group_col: pa.array([g], type=pa.string()),
                "n_distinct_approx": pa.array([_estimate(regs)], type=pa.int64()),
            }
        )

    from ner_pytorch_ray.stages.groupby_utils import collect_tuples, flat_map_groups

    collected = collect_tuples(
        dense, ["grp"], ["regs"], name="sketches", shuffle_blocks="auto"
    )
    out = flat_map_groups(collected, finish, ["grp"], items_col="sketches")
    return out.sort(group_col)


def approx_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """HLL count-distinct users per event_type (sketch twin of the exact
    ``distinct_users_by_type``). No SQL oracle: DuckDB's approx_count_distinct
    uses a different HLL variant; correctness is pytest-gated instead —
    partitioning-invariance (bit-exact) and <=2% error vs the exact count."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_distinct(ds, key_col="user_id", group_col="event_type")


# ---------------------------------------------------------------------------
# Guaranteed heavy hitters: Misra-Gries candidate sketch + exact verify pass
# ---------------------------------------------------------------------------

_TOTAL_SENTINEL = "\x00total"  # cannot collide with a real token/ngram


def _mg_compress(terms: np.ndarray, counts: np.ndarray, k: int):
    """Closed-form Misra-Gries compression of a counted multiset to <= k
    counters: subtract d = the (k+1)-th largest count from every counter and
    keep the positive ones. Each decrement round removes k+1 occurrences, so
    d * (k+1) <= n_block and every surviving estimate undercounts its true
    block frequency by at most n_block/(k+1) (Misra & Gries 1982)."""
    if len(terms) <= k:
        return terms, counts
    d = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > d
    return terms[keep], counts[keep] - d


def _ngrams_of_block(texts: list[str], n: int) -> np.ndarray:
    grams: list[str] = []
    if n == 1:
        for t in texts:
            grams.extend(t.split(" "))
    else:
        for t in texts:
            toks = t.split(" ")
            grams.extend(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
    return np.asarray(grams, dtype=object)


def heavy_ngrams(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n: int = 2,
    denom: int = 700,
) -> ray.data.Dataset:
    """EXACT heavy hitters with sketch-bounded intermediate state: every
    n-gram whose corpus frequency f satisfies f * denom > N (N = total
    n-gram occurrences), with its exact count. Output (term, cnt) sorted.

    Two streaming passes:
    1. per-block Misra-Gries(k = 2*denom - 1) summaries -> grouped-sum
       merge. Summing per-block MG estimates undercounts any term by at
       most sum_b n_b/(k+1) = N/(2*denom), so every true heavy hitter
       (f > N/denom) survives with merged estimate > N/(2*denom); pruning
       at that bound leaves a GUARANTEED superset of <= 2*denom candidates
       (estimates sum to <= N) — bounded independent of corpus size,
       vocabulary, and block count.
    2. exact count of candidate n-grams only (candidate set broadcast via
       ``ray.put``, np.isin per block, int64 grouped sum), then the exact
       threshold f * denom > N.

    The shuffles move <= blocks x k sketch rows (pass 1) and <= 2*denom
    candidate rows (pass 2) — never the n-gram space itself."""
    from ner_pytorch_ray.stages.groupby_utils import grouped_sum

    k = 2 * denom - 1

    def sketch_partial(batch: pa.Table) -> pa.Table:
        grams = _ngrams_of_block(batch.column(text_col).to_pylist(), n)
        terms, counts = np.unique(grams, return_counts=True)
        n_block = int(counts.sum())
        terms, counts = _mg_compress(terms, counts, k)
        return pa.table(
            {
                "term": pa.array(
                    list(terms) + [_TOTAL_SENTINEL], type=pa.string()
                ),
                "est": pa.array(
                    list(counts.astype(np.int64)) + [n_block],
                    type=pa.int64(),
                ),
            }
        )

    merged = grouped_sum(
        ds.map_batches(sketch_partial, batch_format="pyarrow"),
        ["term"],
        sum_cols=["est"],
    ).materialize()

    import pyarrow.compute as pc

    total_rows = merged.map_batches(
        lambda b: b.filter(pc.equal(b.column("term"), _TOTAL_SENTINEL)),
        batch_format="pyarrow",
    ).take_all()
    total = int(total_rows[0]["est"]) if total_rows else 0
    if total == 0:
        return ray.data.from_arrow(
            pa.schema([("term", pa.string()), ("cnt", pa.int64())]).empty_table()
        )

    # guaranteed-superset prune: est > N/(2*denom) (see proof above)
    def prune(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(pc.multiply(b.column("est"), 2 * denom), total),
            pc.not_equal(b.column("term"), _TOTAL_SENTINEL),
        )
        return b.filter(keep)

    cand_rows = merged.map_batches(prune, batch_format="pyarrow").take_all()
    candidates = np.asarray(
        sorted(r["term"] for r in cand_rows), dtype=object
    )
    cand_ref = ray.put(candidates)

    class _ExactCount:
        """Exact candidate counts per block; candidate array fetched once
        per actor."""

        def __init__(self, ref):
            self.cand = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            grams = _ngrams_of_block(batch.column(text_col).to_pylist(), n)
            hits = grams[np.isin(grams, self.cand)]
            terms, counts = np.unique(hits, return_counts=True)
            return pa.table(
                {
                    "term": pa.array(list(terms), type=pa.string()),
                    "cnt": pa.array(counts.astype(np.int64), type=pa.int64()),
                }
            )

    exact = grouped_sum(
        ds.map_batches(
            _ExactCount,
            fn_constructor_args=(cand_ref,),
            concurrency=(1, 8),
            batch_format="pyarrow",
        ),
        ["term"],
        sum_cols=["cnt"],
    )
    def threshold(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater(pc.multiply(b.column("cnt"), denom), total)
        )

    return exact.map_batches(threshold, batch_format="pyarrow").sort("term")


def heavy_bigrams(sf_dir: str, denom: int = 700) -> ray.data.Dataset:
    """Corpus bigrams with frequency > N/denom (exact counts; sketch-bounded
    discovery). Oracle: plain GROUP BY ... HAVING over the same bigrams."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return heavy_ngrams(ds, text_col="text", n=2, denom=denom)


# ---------------------------------------------------------------------------
# Bloom-filter semijoin: broadcast-compressed filtering for big-vs-small joins
# ---------------------------------------------------------------------------

_BF_SEED = np.uint64(0x9E3779B97F4A7C15)


def bloom_build(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Set-membership bitmap (as uint64 words) over int64 keys — the
    block-local partial. Double hashing (Kirsch & Mitzenmacher 2006):
    k probe positions from two splitmix64-derived hashes."""
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    if len(keys) == 0:
        return words
    h1 = _hash64(keys.astype(np.int64))
    h2 = _hash64(keys.astype(np.int64) ^ np.int64(0x5851F42D4C957F2D)) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    return words


def bloom_contains(
    words: np.ndarray, keys: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """Vectorized membership probe: True for every inserted key (no false
    negatives by construction), True for ~fp-rate of absent keys."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h1 = _hash64(keys.astype(np.int64))
    h2 = _hash64(keys.astype(np.int64) ^ np.int64(0x5851F42D4C957F2D)) | np.uint64(1)
    m = np.uint64(m_bits)
    out = np.ones(len(keys), dtype=bool)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) % m
        bit = (
            words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        out &= bit.astype(bool)
    return out


def bloom_from_dataset(
    ds: ray.data.Dataset, col: str, m_bits: int = 1 << 20, k: int = 7
) -> np.ndarray:
    """Distributed build: one bitmap partial per block, OR-merged. The
    partials are fixed-size (m_bits/8 bytes) regardless of key count —
    at 1e9 dim keys the broadcastable filter is ~0.15 GB where the raw
    key set is 8 GB. The driver fold is O(#blocks x words); past ~1e4
    blocks insert one tree-fold level (the sequence_pack precedent)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False)
        return pa.table(
            {"bf": pa.array([bloom_build(keys, m_bits, k).tobytes()],
                            type=pa.binary())}
        )

    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        words |= np.frombuffer(row["bf"], dtype=np.uint64)
    return words


def bloom_semijoin_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    m_bits: int = 1 << 20,
    k: int = 7,
) -> ray.data.Dataset:
    """Orders whose customer is in ``segment``, via the two-stage
    big-vs-small semijoin a 100 TB fact table needs:

    1. **Bloom prune (no exchange on the fact side)** — build the filter
       over the dim keys distributively, ``ray.put`` it once, and drop
       ~all non-matching fact rows inside ``map_batches``. No false
       negatives, so nothing is lost; survivors = matches + ~fp-rate.
    2. **Exact verify (exchange on SURVIVORS only)** — the survivors
       LEFT-SEMI join the dim keys through Ray Data's native hash join
       (both sides stream, the Arrow-native build replaces a Python
       co-group verify that measured ~2.5x slower at sf0.1). False
       positives die here, so the result is exact while the all-to-all
       only ever carries the pruned rows.
    """
    import pyarrow.parquet as pq_meta

    from ner_pytorch_ray.pipelines.relational import _cents

    dim = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).filter(
        expr=f"c_mktsegment == '{segment}'"
    )
    bf = bloom_from_dataset(dim, "c_custkey", m_bits, k)
    bf_ref = ray.put(bf)

    class BloomPrune:
        def __init__(self, ref):
            self._bf = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            mask = bloom_contains(self._bf, keys, m_bits, k)
            t = batch.filter(pa.array(mask))
            return pa.table(
                {
                    "o_custkey": t.column("o_custkey"),
                    "o_orderkey": t.column("o_orderkey"),
                    "o_cents": _cents(t.column("o_totalprice")),
                }
            )

    facts = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        BloomPrune,
        fn_constructor_args=(bf_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def dim_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch.column("c_custkey")})

    n_rows = pq_meta.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_parts = int(min(64, max(2, n_rows // 250_000)))
    verified = facts.join(
        dim.map_batches(dim_keys, batch_format="pyarrow"),
        join_type="left_semi",
        num_partitions=n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return verified.sort(["o_custkey", "o_orderkey"])


# ---------------------------------------------------------------------------
# Bottom-k sample quantile sketch: mergeable, deterministic, fixed-size
# ---------------------------------------------------------------------------


def _md5_u63(s: str) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.md5(s.encode()).digest()[:8], "little"
    ) & 0x7FFFFFFFFFFFFFFF


def bottomk_quantile_sketch(
    sf_dir: str, k: int = 512, pcts: tuple = (10, 25, 50, 75, 90)
) -> ray.data.Dataset:
    """Approximate quantiles of the event value from a DETERMINISTIC
    bottom-k sample: keep the k rows whose md5(row id) is smallest —
    a uniform sample without replacement that is

    - **mergeable**: bottom-k of a union == bottom-k of the merged
      per-block bottom-ks, so each block contributes at most k rows and
      the exchange is k x #blocks rows no matter the corpus size
      (`token_count_quantiles` is the EXACT path — it shuffles every
      distinct value; this is the fixed-size-summary path, rank error
      O(1/sqrt(k)) with high probability);
    - **deterministic**: no RNG state, stable under partitioning and
      retries, and SQL-expressible (the oracle draws the identical
      sample via the same md5, so the gate is bit-exact, not
      statistical).

    Output: one row per percentile, value = sample element at integer
    rank ``(pct * (n-1)) // 100`` of the cents-sorted sample."""
    from ner_pytorch_ray.pipelines.relational import _cents

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        h = np.array([_md5_u63(f"q:{i}") for i in ids], dtype=np.int64)
        cents = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            h, cents = h[idx], cents[idx]
        return pa.table({"h": pa.array(h), "cents": pa.array(cents)})

    # partials are <= k rows/block; the global bottom-k over the reduced
    # set is one small sort + limit
    sample = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort("h")
        .limit(k)
        .take_all()
    )
    cents_sorted = np.sort(np.array([r["cents"] for r in sample], np.int64))
    n = len(cents_sorted)
    return ray.data.from_arrow(
        pa.table(
            {
                "pct": pa.array(list(pcts), type=pa.int64()),
                "cents": pa.array(
                    [int(cents_sorted[(p * (n - 1)) // 100]) for p in pcts],
                    type=pa.int64(),
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# Order-insensitive table checksum: the anti-entropy / migration-check
# ---------------------------------------------------------------------------


def table_checksum(sf_dir: str, table: str = "orders") -> ray.data.Dataset:
    """One (n_rows, xor_hash) row for a whole table: per row an md5 of
    the canonicalized row text, XOR-folded — XOR is commutative and
    associative, so the checksum is independent of row order, block
    structure, and fold order. This is how replicas / migrated copies /
    re-partitioned layouts are compared WITHOUT moving the data: ship
    two 16-byte summaries, not two tables. Per-block partials fold
    driver-side (O(#blocks), same note as the bloom fold)."""
    import hashlib

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")

    def canon(col: pa.ChunkedArray) -> list:
        # canonical value text: timestamps as epoch micros, floats as
        # exact cents — integer forms both engines print identically
        # (raw float/timestamp printing differs between Arrow and SQL)
        t = col.type
        if pa.types.is_timestamp(t):
            col = pc.cast(col, pa.int64())
        elif pa.types.is_floating(t):
            col = pc.cast(
                pc.round(
                    pc.multiply(col, pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        return pc.cast(col, pa.string()).to_pylist()

    def partial(batch: pa.Table) -> pa.Table:
        # canonical row text: '|'-joined canonicalized column values in
        # column-name order
        cols = sorted(batch.column_names)
        parts = [canon(batch.column(c)) for c in cols]
        acc = 0
        n = len(batch)
        for row in zip(*parts):
            h = int.from_bytes(
                hashlib.md5("|".join("" if v is None else v for v in row).encode()).digest()[:8],
                "little",
            ) & 0x7FFFFFFFFFFFFFFF
            acc ^= h
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "x": pa.array([acc], pa.int64()),
            }
        )

    n = 0
    x = 0
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += row["n_rows"]
        x ^= row["x"]
    return ray.data.from_arrow(
        pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "xor_hash": pa.array([x], pa.int64()),
            }
        )
    )


def bloom_antijoin_customers(
    sf_dir: str,
    priority: str = "1-URGENT",
    m_bits: int = 1 << 20,
    k: int = 7,
) -> ray.data.Dataset:
    """Customers with NO ``priority`` order — the ANTI-join dual of
    :func:`bloom_semijoin_orders`, with the Bloom filter's one-sided
    error pointing the other way:

    1. **Bloom prune (no exchange on misses)** — build the filter over
       the fact side's join keys (block-local distinct inside the
       partial, so the build ships bitmaps, not keys), ``ray.put`` it
       once. A probe row whose key MISSES the bloom is DEFINITELY
       unmatched (no false negatives) and passes straight through with
       zero exchange.
    2. **Exact verify (exchange on HITS only)** — bloom hits are only
       *maybe* matched; they LEFT-ANTI join the fact side's block-local
       distinct keys through Ray Data's native hash join (the
       Arrow-native build replaces a Python co-group verify, same
       trade as :func:`bloom_semijoin_orders`). False positives die
       here, so the result is exact while the all-to-all carries only
       matched-or-fp probe rows plus O(#blocks)-bounded fact keys.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_meta

    from ner_pytorch_ray.pipelines.relational import _cents

    fact_keys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        )
        .filter(expr=f"o_orderpriority == '{priority}'")
        .select_columns(["o_custkey"])
    )
    bf = bloom_from_dataset(fact_keys, "o_custkey", m_bits, k)
    bf_ref = ray.put(bf)

    probe = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    class SplitOnBloom:
        """(key, nation, cents, src=0) rows; ``hit`` marks maybe-matched."""

        def __init__(self, ref):
            self._bf = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("c_custkey").to_numpy(zero_copy_only=False)
            mask = bloom_contains(self._bf, keys, m_bits, k)
            return pa.table(
                {
                    "c_custkey": batch.column("c_custkey"),
                    "c_nationkey": batch.column("c_nationkey"),
                    "acctbal_cents": _cents(batch.column("c_acctbal")),
                    "hit": pa.array(mask),
                }
            )

    tagged_probe = probe.map_batches(
        SplitOnBloom,
        fn_constructor_args=(bf_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).materialize()

    out_cols = ["c_custkey", "c_nationkey", "acctbal_cents"]
    misses = tagged_probe.map_batches(
        lambda t: t.filter(pc.invert(t.column("hit"))).select(out_cols),
        batch_format="pyarrow",
    )
    hits = tagged_probe.map_batches(
        lambda t: t.filter(t.column("hit")).select(out_cols),
        batch_format="pyarrow",
    )

    def fact_distinct(batch: pa.Table) -> pa.Table:
        # block-local distinct: a combiner for the join's shuffle input
        return pa.table({"o_custkey": pc.unique(batch.column("o_custkey"))})

    n_rows = pq_meta.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_parts = int(min(64, max(2, n_rows // 250_000)))
    survivors = hits.join(
        fact_keys.map_batches(fact_distinct, batch_format="pyarrow"),
        join_type="left_anti",
        num_partitions=n_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return misses.union(survivors).sort("c_custkey")
