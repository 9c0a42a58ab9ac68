"""Product quantization (PQ) for embedding compression + ADC search.

PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search") splits each d-dim vector into ``m`` subvectors and vector-
quantizes each subspace against its own ``k``-centroid codebook: a
64-dim float32 embedding (256 bytes) compresses to ``m`` small codes
(8 bytes at m=8, k=16) — a 32× reduction, which is what makes
100-TB-scale embedding stores queryable: the codes fit in memory where
the raw vectors do not.

Everything follows the repo's deterministic-ANN contract
(functions/similarity.py): md5-ordered init, per-round half-up
re-quantization of centroids to 6 dp, sequential-fold distances —
so the DuckDB oracle (plans/ann_sql.py:pq_codes_sql) replays the full
fit + encode bit-for-bit.

Scale shape: the fit's driver-side state is the codebook (m×k×(d/m)
floats — bounded, never the corpus); encoding is pure codegen'd
expressions (no shuffle, no UDF); ADC search probes a literal
per-query distance table, again map-side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extract_permits_spark.functions.similarity import (
    _py_round_half_up,
    unit_normalized,
)

Codebook = list[list[list[float]]]  # [sub][cid][coord]


def _sub_dists(sv: Column, centroids: list[list[float]]) -> Column:
    """Array of squared-L2 distances from ``sv`` to each literal centroid
    (one literal matrix + one shared sequential-fold lambda — the same
    shape contract as similarity._nearest_by_l2). The matrix is ONE
    nested-list F.lit — one py4j call instead of k×(d/m) per-element
    calls, which dominated per-query plan-build time (r9)."""
    mat = F.lit([[float(x) for x in c] for c in centroids])
    return F.transform(
        mat,
        lambda c: F.aggregate(
            F.zip_with(sv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )


def _subvector(e: Column, sub: int, sub_dim: int) -> Column:
    return F.slice(e, sub * sub_dim + 1, sub_dim)


def pq_fit(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    rounds: int = 1,
    dim: int = 64,
) -> Codebook:
    """Deterministic per-subspace Lloyd fit. Returns the codebook
    ``[m][k][d/m]`` with coords half-up-rounded to 6 dp per round.

    One exploded (id, sub, subvector) frame feeds all m subspaces in a
    single DAG per round: assignment is an m-branch CASE over literal
    per-subspace centroid matrices, the mean step one narrow
    (sub, cid, pos) groupBy. Collected state per round is m×k×(d/m)
    means — bounded."""
    sub_dim = dim // m
    n = unit_normalized(vectors, id_col, vec_col)
    subs = n.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[_subvector(F.col("e"), j, sub_dim) for j in range(m)])
        ).alias("_sub", "sv"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_sub").orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    init_rows = (
        subs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("_sub", (F.col("_rn") - 1).alias("_cid"), "sv")
        .collect()
    )
    book: Codebook = [[None] * k for _ in range(m)]  # type: ignore[list-item]
    for r in init_rows:
        book[int(r["_sub"])][int(r["_cid"])] = [float(x) for x in r["sv"]]
    for _ in range(rounds):
        assigned = subs.withColumn("_cid", _assign_expr(book))
        means = (
            assigned.select("_sub", "_cid", F.posexplode("sv").alias("_pos", "_x"))
            .groupBy("_sub", "_cid", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new: dict[tuple[int, int], list[float]] = {}
        for r in means:
            key = (int(r["_sub"]), int(r["_cid"]))
            new.setdefault(key, [0.0] * sub_dim)[int(r["_pos"])] = _py_round_half_up(
                float(r["_m"]), 6
            )
        book = [
            [new.get((j, c), book[j][c]) for c in range(k)] for j in range(m)
        ]
    return book


def _assign_expr(book: Codebook) -> Column:
    expr = None
    for j, cents in enumerate(book):
        d_arr = _sub_dists(F.col("sv"), cents)
        nj = (F.array_position(d_arr, F.array_min(d_arr)) - 1).cast("int")
        expr = F.when(F.col("_sub") == j, nj) if expr is None else expr.when(
            F.col("_sub") == j, nj
        )
    return expr


def pq_encode(
    vectors: DataFrame,
    book: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(id, codes, recon_mse): per-subspace nearest-centroid codes (joined
    ``-``-separated, lowest cid on ties) and the per-coordinate squared
    reconstruction error. One Arrow-batched kernel, zero shuffle —
    encoding 100 TB of vectors is a narrow map whose parallelism follows
    the scan (write paths that need it pinned use the same rule as
    write_ivfpq_index). The kernel replaced the expression spelling for
    the same measured reason as _assign_codes_arrow: 1,024 fused
    multiply-adds per row is past the codegen/HOF break-even (~0.8 ms/row
    interpreted vs ~1 µs/row vectorized), with bitwise parity to the
    DuckDB fold replay kept by the shared numpy helpers."""
    kern = _encode_arrow(book)
    return vectors.select(
        F.col(id_col), kern(F.col(vec_col)).alias("_e")
    ).select(
        F.col(id_col),
        F.array_join(
            F.transform("_e.code_arr", lambda c: c.cast("string")), "-"
        ).alias("codes"),
        (F.col("_e.err_sum") / F.lit(float(dim))).alias("recon_mse"),
        F.col("_e.code_arr").alias("_code_arr"),
    )


def _assign_codes_arrow(
    book: Codebook, centroids: list[list[float]]
) -> Column:
    """Arrow-batched kernel computing BOTH the IVF cluster assignment and
    the PQ code array per vector — the hot map of IVFADC. The same math
    as codegen expressions was tried twice and lost both times: the
    transform/aggregate HOF spelling is interpreted per element (~8 µs
    per multiply-add ⇒ ~80 s CPU per 5k rows), and an unrolled 2048-term
    SQL chain produced a 12.6 MiB task binary whose codegen/GC pathology
    ran 27–82 s per query. This kernel does the identical arithmetic in
    ~10 ms per 10k-row batch.

    BITWISE PARITY with the sequential folds (which the DuckDB oracle
    twin replays — plans/ann_sql.py:ivfpq_topk_sql) is preserved the same
    way as similarity._plane_dots_arrow: accumulation uses ``np.cumsum``
    over the dim axis (the same left-to-right adds with the same per-step
    rounding as the fold; the fold's leading ``0.0 +`` is exact to drop
    because every term is a non-negative square), differences are squared
    with an explicit ``d*d`` (not ``**2``), and normalization replays
    unit_normalized's op order exactly: cast→/norm→×1e9→+0.5→floor→/1e9,
    each a single IEEE op elementwise. Ties → first min (np.argmin),
    matching array_position(d, array_min(d)) and the twin's
    ``ORDER BY dist, cid``."""
    import numpy as np
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)  # (K, dim)
    sub_books = [np.asarray(b, dtype=np.float64) for b in book]
    sub_dim = sub_books[0].shape[1]

    # no inline type hints: `from __future__ import annotations` defers
    # them to strings that can't resolve (pd is function-local), which
    # pandas_udf's hint parser rejects (same note as _plane_dots_arrow)
    def _kernel(s):
        vals = s.to_numpy()
        if len(vals) == 0:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype="int32"),
                    "code_arr": pd.Series([], dtype=object),
                }
            )
        e = _normalize_np(np, vals)
        cid = np.argmin(_fold_dists_np(np, e, cent), axis=1).astype(np.int32)
        codes = np.stack(
            [
                np.argmin(
                    _fold_dists_np(
                        np, e[:, j * sub_dim : (j + 1) * sub_dim], sb
                    ),
                    axis=1,
                ).astype(np.int32)
                for j, sb in enumerate(sub_books)
            ],
            axis=1,
        )
        return pd.DataFrame(
            {"cluster_id": cid, "code_arr": list(codes.tolist())}
        )

    _kernel.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(
        _kernel, "struct<cluster_id:int, code_arr:array<int>>"
    )


def _fold_dists_np(np, x, mat):
    """(n, d) vs (k, d) -> (n, k) squared-L2 with sequential-fold parity:
    np.cumsum over the dim axis performs the same left-to-right adds with
    the same per-step rounding as the aggregate fold (the fold's leading
    ``0.0 +`` is exact to drop — every term is a non-negative square);
    differences squared with an explicit ``d*d``. k is small, so loop k
    to bound temporaries."""
    cols = []
    for c in mat:
        d = x - c[None, :]
        sq = d * d
        cols.append(np.cumsum(sq, axis=1)[:, -1])
    return np.stack(cols, axis=1)


def _normalize_np(np, vals):
    """unit_normalized's op order replayed elementwise: sequential x*x
    fold for the norm, then cast→/norm→×1e9→+0.5→floor→/1e9 — each a
    single IEEE op, so values are bitwise-equal to the Column spelling."""
    v = np.asarray(
        [np.asarray(x, dtype=np.float64) for x in vals]
    )  # (n, dim); float32→float64 cast is exact
    acc = np.zeros(len(v))
    for i in range(v.shape[1]):  # sequential fold: acc + x*x per dim
        acc = acc + v[:, i] * v[:, i]
    norm = np.sqrt(acc)
    return np.floor(v / norm[:, None] * 1e9 + 0.5) / 1e9


def _encode_arrow(book: Codebook) -> Column:
    """Encode-only Arrow kernel: PQ code array + summed per-subspace min
    distance (the recon_mse numerator) per vector — the hot map of
    pq_encode. Same bitwise-parity contract as _assign_codes_arrow
    (shared _normalize_np/_fold_dists_np); the error sum accumulates
    left-to-right over subspaces exactly like the Column ``+`` chain it
    replaces, and np.min over the fold-parity distances equals
    array_min over the same values."""
    import numpy as np
    import pandas as pd

    sub_books = [np.asarray(b, dtype=np.float64) for b in book]
    sub_dim = sub_books[0].shape[1]

    def _kernel(s):
        vals = s.to_numpy()
        if len(vals) == 0:
            return pd.DataFrame(
                {
                    "code_arr": pd.Series([], dtype=object),
                    "err_sum": pd.Series([], dtype="float64"),
                }
            )
        e = _normalize_np(np, vals)
        code_cols = []
        err = np.zeros(len(e))
        for j, sb in enumerate(sub_books):
            d = _fold_dists_np(np, e[:, j * sub_dim : (j + 1) * sub_dim], sb)
            code_cols.append(np.argmin(d, axis=1).astype(np.int32))
            err = err + np.min(d, axis=1)
        codes = np.stack(code_cols, axis=1)
        return pd.DataFrame(
            {"code_arr": list(codes.tolist()), "err_sum": err}
        )

    _kernel.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(
        _kernel, "struct<code_arr:array<int>, err_sum:double>"
    )


def _normalized_query(query_vec: list[float]) -> list[float]:
    """The query normalized exactly as unit_normalized does (same IEEE
    ops: /norm then half-up 9dp)."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    return [_py_round_half_up(float(x) / qnorm, 9) for x in query_vec]


def _probe_clusters(
    qn: list[float], centroids: list[list[float]], num_probes: int
) -> list[int]:
    """Driver-side probe selection: num_clusters sqdists — bounded state
    (ties → lowest cid, matching the oracle's ``ORDER BY dist, cid``)."""
    dists = [sum((a - b) * (a - b) for a, b in zip(qn, c)) for c in centroids]
    return sorted(range(len(centroids)), key=lambda i: (dists[i], i))[
        :num_probes
    ]


def _adc_rank(
    assigned: DataFrame,
    book: Codebook,
    qn: list[float],
    dim: int,
    topk: int,
    id_col: str,
    code_col: str,
) -> DataFrame:
    """Rank probed members by ADC distance: per-subspace query→centroid
    distance tables as literals (m × k doubles — tiny), the per-row cost
    is m array lookups + adds. The left-associated + chain matches the
    oracle's ascending-subspace list_sum fold."""
    m = len(book)
    sub_dim = dim // m
    dist: Column | None = None
    for j, cents in enumerate(book):
        q_sub = qn[j * sub_dim : (j + 1) * sub_dim]
        table = [
            sum(
                (float(q_sub[i]) - float(c[i])) * (float(q_sub[i]) - float(c[i]))
                for i in range(sub_dim)
            )
            for c in cents
        ]
        lookup = F.element_at(
            F.lit(table), F.element_at(code_col, j + 1) + 1
        )
        dist = lookup if dist is None else dist + lookup
    return (
        assigned.withColumn("adc_dist", dist)
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(topk)
        .select(
            id_col,
            "cluster_id",
            F.array_join(
                F.transform(code_col, lambda c: c.cast("string")), "-"
            ).alias("codes"),
            "adc_dist",
        )
    )


def ivfpq_adc_topk(
    vectors: DataFrame,
    book: Codebook,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_probes: int = 6,
    topk: int = 20,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §V): the composed production ANN path —
    an IVF coarse quantizer prunes the corpus to ``num_probes`` clusters,
    then ADC ranks the survivors through their PQ codes only. This is the
    FAISS ``IndexIVFPQ`` shape, and the one that holds at 100 TB: the
    coarse assignment is written once (partition/bucket by cluster_id →
    partition pruning at read), codes are ~3% of the raw vectors, and a
    query touches num_probes/num_clusters of the code table.

    Plan shape: ONE Arrow-batched kernel over ONE scan computes both the
    cluster assignment and the PQ code array (``_assign_codes_arrow`` —
    see its docstring for why this beats codegen here and how bitwise
    oracle parity is kept), the probe filter cuts before anything wide,
    and the only exchanges are the parallelism-pinning repartition and
    the final TakeOrdered top-k. No joins; driver state is the bounded
    codebook + centroid list."""
    qn = _normalized_query(query_vec)
    probe = _probe_clusters(qn, centroids, num_probes)
    # Pin parallelism before the heavy per-row map (SCALE.md engine rule:
    # CPU-bound stages must not inherit byte-based partitioning). A
    # single-file fixture scan (or an AQE-coalesced upstream) would run
    # the whole assignment+encode map on one core. The explicit count
    # tracks cluster size via spark.sql.shuffle.partitions; the shuffle
    # moves one narrow vector per row, once.
    n_part = int(
        vectors.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    kern = _assign_codes_arrow(book, centroids)
    assigned = (
        vectors.repartition(n_part)
        .select(F.col(id_col), kern(F.col(vec_col)).alias("_a"))
        .select(
            F.col(id_col),
            F.col("_a.cluster_id").alias("cluster_id"),
            F.col("_a.code_arr").alias("_code_arr"),
        )
        .where(F.col("cluster_id").isin(*probe))
    )
    return _adc_rank(assigned, book, qn, dim, topk, id_col, "_code_arr")


def write_ivfpq_index(
    vectors: DataFrame,
    book: Codebook,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The write-once side of the IVFADC contract (FAISS IndexIVFPQ on
    disk): ``(id, code_arr)`` partitioned by ``cluster_id``. The index is
    pruned AND compressed — a 64-dim float32 vector (256 B) becomes 8
    small ints, so a query reads num_probes/num_clusters of a table
    that is itself a fraction of the raw corpus. At 100 TB that is the
    difference between scanning vectors and scanning ~3% worth of codes
    in ~40% of partitions. Same Arrow kernel as the in-memory path, so a
    persisted index serves bitwise-identical rankings
    (tests/test_plan_quality.py pins equality + PartitionFilters)."""
    n_part = int(
        vectors.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    kern = _assign_codes_arrow(book, centroids)
    (
        vectors.repartition(n_part)
        .select(F.col(id_col), kern(F.col(vec_col)).alias("_a"))
        .select(
            F.col(id_col),
            F.col("_a.cluster_id").alias("cluster_id"),
            F.col("_a.code_arr").alias("code_arr"),
        )
        # Cluster the CODES (not the vectors — they never shuffle) so each
        # partition directory holds one file instead of one per upstream
        # task × cluster: without this, n_part tasks each open every
        # cluster's writer and a query pays a small-files penalty
        # proportional to n_part (measured 2.6 s → see tools/probe_ivfpq).
        # The shuffle moves 8 ints + an id per row — ~3% of vector bytes.
        # At a scale where one file per cluster is too coarse, salt this
        # repartition; the layout contract (read num_probes directories)
        # is unchanged.
        .repartition(F.col("cluster_id"))
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(path)
    )


def ivfpq_batch_topk(
    vectors: DataFrame,
    book: Codebook,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_probes: int = 6,
    topk: int = 20,
) -> DataFrame:
    """Batched IVFADC — the serving shape (retrieval runs a BATCH of
    queries per corpus pass, never one scan per query) composed with the
    index structure: each query's probe set and asymmetric distance
    table are computed driver-side (bounded: num_probes rows × m×k
    doubles per query), broadcast as a tiny frame keyed on cluster_id,
    and ONE kernel scan of the corpus equi-joins it — a corpus row fans
    out only to the queries that probe its cluster, so the join is the
    probe pruning. Per-query top-k is a rank-limit window that Spark
    executes as WindowGroupLimit: per-partition heaps BEFORE the
    exchange, shuffling ~n_queries × topk rows, never the scored fan-out.

    Same IEEE contract as the single-query path (_normalized_query /
    Python-float distance tables / left-associated adds), so the DuckDB
    twin (plans/ann_sql.py:ivfpq_batch_topk_sql) hash-matches adc_dist
    bitwise."""
    from pyspark.sql import Window

    m = len(book)
    sub_dim = dim // m
    rows = []
    for qid, qv in queries:
        qn = _normalized_query(qv)
        dt = [
            [
                sum(
                    (float(qn[j * sub_dim + i]) - float(c[i]))
                    * (float(qn[j * sub_dim + i]) - float(c[i]))
                    for i in range(sub_dim)
                )
                for c in cents
            ]
            for j, cents in enumerate(book)
        ]
        for p in _probe_clusters(qn, centroids, num_probes):
            rows.append((int(qid), int(p), dt))
    spark = vectors.sparkSession
    qdf = spark.createDataFrame(
        rows, "query_id long, cluster_id int, dt array<array<double>>"
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    kern = _assign_codes_arrow(book, centroids)
    assigned = (
        vectors.repartition(n_part)
        .select(F.col(id_col), kern(F.col(vec_col)).alias("_a"))
        .select(
            F.col(id_col),
            F.col("_a.cluster_id").alias("cluster_id"),
            F.col("_a.code_arr").alias("_code_arr"),
        )
    )
    joined = assigned.join(F.broadcast(qdf), "cluster_id")
    dist: Column | None = None
    for j in range(m):
        lookup = F.element_at(
            F.element_at("dt", j + 1), F.element_at("_code_arr", j + 1) + 1
        )
        dist = lookup if dist is None else dist + lookup
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("adc_dist", dist)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("query_id", id_col, "adc_dist")
    )


def ivfpq_batch_topk_from_table(
    vectors: DataFrame,
    book: Codebook,
    centroids: list[list[float]],
    n_queries: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_probes: int = 6,
    topk: int = 20,
) -> DataFrame:
    """ivfpq_batch_topk with the query batch drawn from the corpus itself
    (ids < n_queries). The collect here is the batch's query vectors —
    n_queries × dim floats of bounded driver state, the same class as
    the codebook/centroid lists (plans/analytics.py bans collect() so
    bounded probes live here)."""
    queries = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in vectors.where(F.col(id_col) < n_queries)
        .select(id_col, vec_col)
        .collect()
    ]
    return ivfpq_batch_topk(
        vectors,
        book,
        centroids,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        num_probes=num_probes,
        topk=topk,
    )


def ivfpq_topk_from_index(
    spark,
    path: str,
    book: Codebook,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str = "vec_id",
    dim: int = 64,
    num_probes: int = 6,
    topk: int = 20,
) -> DataFrame:
    """Query a persisted IVFPQ index (write_ivfpq_index): probe selection
    is a driver-side argmin over the bounded centroid list, the scan reads
    ONLY the probed clusters' partition directories (PartitionFilters),
    and ranking is m array lookups per row against the literal distance
    tables. No vector arithmetic against the corpus anywhere — the
    embedding column never leaves the index build."""
    qn = _normalized_query(query_vec)
    probe = _probe_clusters(qn, centroids, num_probes)
    idx = spark.read.parquet(path).where(F.col("cluster_id").isin(*probe))
    return _adc_rank(idx, book, qn, dim, topk, id_col, "code_arr")


def pq_adc_topk(
    vectors: DataFrame,
    book: Codebook,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    topk: int = 20,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays a raw vector, the
    corpus is only touched through its PQ codes. The per-query distance
    table (m×k literal doubles) indexes by code — a map-side array lookup
    per subspace, no vector arithmetic against the corpus at all. This is
    the memory-bound scan PQ exists for: at 100 TB the code table is
    ~3% the size of the raw vectors."""
    m = len(book)
    sub_dim = dim // m
    encoded = pq_encode(vectors, book, id_col, vec_col, dim)
    dist: Column | None = None
    for j, cents in enumerate(book):
        q_sub = query_vec[j * sub_dim : (j + 1) * sub_dim]
        table = [
            sum(
                (float(q_sub[i]) - float(c[i])) * (float(q_sub[i]) - float(c[i]))
                for i in range(sub_dim)
            )
            for c in cents
        ]
        lookup = F.element_at(
            F.array(*[F.lit(x) for x in table]),
            F.element_at("_code_arr", j + 1) + 1,
        )
        dist = lookup if dist is None else dist + lookup
    return (
        encoded.withColumn("adc_dist", dist)
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(topk)
        .select(id_col, "codes", "adc_dist")
    )
