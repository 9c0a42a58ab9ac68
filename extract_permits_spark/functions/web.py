"""URL canonicalization + URL-level dedup for crawl corpora.

The first dedup pass every large-scale pretraining pipeline runs (CCNet,
RefinedWeb, Dolma) is *URL-level*: canonicalize the crawl URL and keep one
document per canonical URL, before any content hashing — it removes the
bulk of trivial duplicates (http/https twins, ``www.`` twins, tracking-
parameter variants, fragment variants) at the cost of one hash shuffle on
a short string key.

Everything here is ``pyspark.sql.functions`` expressions — no UDFs, fully
whole-stage-codegen'd, and the dedup itself is a single hash shuffle on
the canonical key. At 100 TB the key is a short string with near-uniform
hash distribution (hosts × paths), so the shuffle is skew-safe without
salting; the window per key touches only the handful of variant rows that
share a canonical URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters dropped during canonicalization: the standard
# UTM family plus the common click-id / mailing-id params. Kept as one
# case-insensitive alternation so the filter is a single regex probe
# per parameter.
TRACKING_PARAM_RE = r"(?i)^(utm_[a-z]+|ref|fbclid|gclid|msclkid|mc_cid|mc_eid)="


def canonicalize_url(col: Column | str) -> Column:
    """Canonical dedup key for a crawl URL, as one expression tree.

    Steps (the CCNet/RefinedWeb convention):
      1. strip the scheme (``http://``/``https://``, case-insensitive);
      2. strip the fragment (``#...``);
      3. lowercase the host and strip a leading ``www.`` (paths keep
         their case — they are case-sensitive in general);
      4. strip trailing slashes from the path;
      5. drop tracking query parameters (``utm_*``, ``ref``, click ids),
         sort the survivors for order-independence, and reattach.

    Empty/NULL input canonicalizes to NULL so downstream grouping can
    drop it explicitly.
    """
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"(?i)^https?://", "")
    u = F.regexp_replace(u, r"#.*$", "")
    host = F.lower(F.regexp_extract(u, r"^([^/?]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(u, r"^[^/?]+", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
    return F.when((u.isNull()) | (F.trim(u) == ""), F.lit(None)).otherwise(canonical)


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    quality_col: str,
    out_canonical: str = "canonical_url",
) -> DataFrame:
    """Keep-best-per-canonical-URL: flag one survivor per canonical URL
    (highest ``quality_col``, then lowest ``id_col`` for determinism) and
    count the variant group size.

    One hash shuffle on the canonical key; the per-key window only sees
    the few rows that collide. Returns the full frame (audit-friendly)
    with ``n_dups`` and ``is_canonical`` — the production filter is
    ``where(is_canonical)``.
    """
    w = Window.partitionBy(out_canonical)
    keyed = df.withColumn(out_canonical, canonicalize_url(url_col))
    ranked = keyed.withColumn(
        "_rn",
        F.row_number().over(
            w.orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        ),
    )
    return (
        ranked.withColumn("n_dups", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col("_rn") == 1)
        .drop("_rn")
    )
