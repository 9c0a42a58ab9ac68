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
    shape contract as similarity._nearest_by_l2)."""
    mat = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
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
    reconstruction error. Pure expressions — encoding 100 TB of vectors
    is a narrow map with zero shuffle."""
    m = len(book)
    sub_dim = dim // m
    n = unit_normalized(vectors, id_col, vec_col)
    code_cols: list[Column] = []
    err: Column | None = None
    for j, cents in enumerate(book):
        d_arr = _sub_dists(_subvector(F.col("e"), j, sub_dim), cents)
        code_cols.append(
            (F.array_position(d_arr, F.array_min(d_arr)) - 1).cast("int")
        )
        md = F.array_min(d_arr)
        err = md if err is None else err + md
    return n.select(
        F.col(id_col),
        F.concat_ws("-", *[c.cast("string") for c in code_cols]).alias("codes"),
        (err / F.lit(float(dim))).alias("recon_mse"),
        F.array(*code_cols).alias("_code_arr"),
    )


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
