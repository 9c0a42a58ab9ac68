"""DuckDB oracle-SQL generators for the approximate ANN / simhash family.

These produce REAL twins — the oracle replays the full approximate
computation (hyperplane signatures, Lloyd k-means rounds, banded simhash)
rather than just spot-checking an invariant — so a candidate-generation
bug, a banding bug, or a centroid drift all hash-mismatch at the driver's
correctness gate.

Cross-engine determinism contract (shared with functions/similarity.py):

- hyperplanes are embedded as 16-bit ints and expanded with
  ``k/65535.0 - 0.5`` (two IEEE double ops — bitwise identical to the
  Python floats the Spark side embeds via ``F.lit``);
- multi-probe at Hamming ≤ 2 over b-bit signatures is expressed as
  ``bit_count(xor(sig, qsig)) <= 2`` (equivalent to enumerating the probe
  set, which is exactly the radius-2 Hamming ball);
- all dot products / norms / distances fold sequentially over the array on
  every engine (Spark ``aggregate``, DuckDB ``list_sum``, Python ``sum``);
- k-means rounds re-quantize centroids to 6 dp and normalized coords to 9
  dp via the floor(x*f + 0.5)/f half-up spelling, so float summation-order
  drift between engines is erased at every round boundary.

The generated SQL is sizeable (unrolled planes / Lloyd rounds) but runs in
single-digit seconds on the sf0.01 fixture; it exists for correctness
checking, not production.
"""

from __future__ import annotations

from extract_permits_spark.functions.similarity import lsh_plane_ints

EMB = "embeddings"


def _v_cte(dim: int) -> str:
    return (
        f"v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"AS e FROM {EMB})"
    )


def _dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1,{dim + 1}), i -> {a}[i] * {b}[i]))"
    )


def _cosine(e: str, qe: str, dim: int) -> str:
    return (
        f"{_dot(e, qe, dim)} / (sqrt({_dot(e, e, dim)}) * sqrt({_dot(qe, qe, dim)}))"
    )


def _exact_topk_cte(dim: int, k: int, query_id: int) -> str:
    """exactk: the brute-force cosine top-k vec_ids (same shape as the
    proven ann_cosine_topk oracle)."""
    return f"""
    q AS (SELECT e AS qe FROM v WHERE vec_id = {query_id}),
    exact_scored AS (
      SELECT v.vec_id, {_cosine('v.e', 'q.qe', dim)} AS sim FROM v, q
    ),
    exactk AS (
      SELECT vec_id FROM exact_scored ORDER BY sim DESC, vec_id LIMIT {k}
    )"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (twin of similarity.lsh_bucketed_topk)
# ---------------------------------------------------------------------------


def _lsh_sig_expr(ecol: str, table: int, dim: int, num_planes: int, seed: int) -> str:
    # Unrolled flat multiply-add chain, NOT list_transform lambdas: DuckDB
    # evaluates list HOFs with a per-element allocation that made the
    # 128-dot signature CTE ~60s at sf0.01; the unrolled form is <1s.
    # Coefficients are emitted as repr(float) literals — repr round-trips
    # the exact IEEE double of k/65535.0 - 0.5, and the left-associated
    # `+` chain reproduces the Spark side's sequential fold order, so the
    # signatures stay bitwise identical across engines.
    cases = []
    for p in range(num_planes):
        ints = lsh_plane_ints(seed, table, p, dim)
        coefs = [(k / 0xFFFF) - 0.5 for k in ints]
        dot = " + ".join(
            f"{ecol}[{i + 1}]*{coefs[i]!r}" for i in range(dim)
        )
        cases.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(cases) + ")"


def _lsh_cand_ctes(
    dim: int,
    num_tables: int,
    num_planes: int,
    max_probe_distance: int,
    seed: int,
    query_id: int,
) -> str:
    sig_cols = ", ".join(
        f"{_lsh_sig_expr('e', t, dim, num_planes, seed)} AS s{t}"
        for t in range(num_tables)
    )
    qsig_cols = ", ".join(
        f"{_lsh_sig_expr('qe', t, dim, num_planes, seed)} AS qs{t}"
        for t in range(num_tables)
    )
    probe_cond = " OR ".join(
        f"bit_count(xor(s.s{t}, qs.qs{t})) <= {max_probe_distance}"
        for t in range(num_tables)
    )
    return f"""
    lq AS (SELECT e AS qe FROM v WHERE vec_id = {query_id}),
    sigs AS (SELECT vec_id, e, {sig_cols} FROM v),
    qsigs AS (SELECT {qsig_cols} FROM lq),
    lsh_scored AS (
      SELECT s.vec_id, {_cosine('s.e', 'lq.qe', dim)} AS sim
      FROM sigs s, qsigs qs, lq
      WHERE {probe_cond}
    )"""


def lsh_topk_sql(
    dim: int = 64,
    k: int = 20,
    num_tables: int = 8,
    num_planes: int = 8,
    max_probe_distance: int = 2,
    seed: int = 42,
    query_id: int = 0,
) -> str:
    return f"""
    WITH {_v_cte(dim)},
    {_lsh_cand_ctes(dim, num_tables, num_planes, max_probe_distance, seed, query_id)}
    SELECT vec_id, round(sim, 6) AS cosine_sim
    FROM lsh_scored ORDER BY sim DESC, vec_id LIMIT {k}
    """


def lsh_recall_sql(
    dim: int = 64,
    k: int = 20,
    num_tables: int = 8,
    num_planes: int = 8,
    max_probe_distance: int = 2,
    seed: int = 42,
    query_id: int = 0,
) -> str:
    return f"""
    WITH {_v_cte(dim)},
    {_exact_topk_cte(dim, k, query_id)},
    {_lsh_cand_ctes(dim, num_tables, num_planes, max_probe_distance, seed, query_id)},
    approxk AS (
      SELECT vec_id FROM lsh_scored ORDER BY sim DESC, vec_id LIMIT {k}
    )
    SELECT {k} AS k,
           CAST((SELECT count(*) FROM exactk
                 WHERE vec_id IN (SELECT vec_id FROM approxk)) AS DOUBLE)
           / {k} AS recall
    """


# ---------------------------------------------------------------------------
# IVF with deterministic Lloyd k-means (twin of similarity.ivf_topk)
# ---------------------------------------------------------------------------


def _sqdist(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1,{dim + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _kmeans_ctes(dim: int, num_clusters: int, rounds: int) -> list[str]:
    """CTEs n, c0..c{rounds}, afinal — the deterministic Lloyd fit plus the
    final nearest-centroid assignment (twin of similarity.kmeans_fit +
    _nearest_by_l2). Shared by the IVF and SemDeDup oracles."""
    mean_list = ", ".join(
        f"floor(avg(e[{i + 1}]) * 1000000.0 + 0.5)/1000000.0" for i in range(dim)
    )
    ctes = [
        # unit-normalize + round to 9 dp (twin of unit_normalized)
        "n AS (SELECT vec_id, list_transform(e, x -> "
        "floor((x / sqrt(list_sum(list_transform(e, y -> y*y)))) * 1000000000.0"
        " + 0.5)/1000000000.0) AS e FROM v)",
        # init: k vectors with smallest (md5(id), id) — twin of kmeans_fit init
        f"""c0 AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
               AS cid, e AS c
      FROM (SELECT vec_id, e FROM n
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {num_clusters})
    )""",
    ]
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        ctes.append(
            f"""a{r} AS (
      SELECT vec_id, e, cid FROM (
        SELECT n.vec_id, n.e, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {_sqdist('n.e', 'c.c', dim)}, c.cid) AS rn
        FROM n, {prev} c
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{r} AS (
      SELECT p.cid, COALESCE(m.c, p.c) AS c
      FROM {prev} p LEFT JOIN (
        SELECT cid, [{mean_list}] AS c FROM a{r} GROUP BY cid
      ) m ON p.cid = m.cid
    )"""
        )
    final_c = f"c{rounds}"
    ctes.append(
        f"""afinal AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {_sqdist('n.e', 'c.c', dim)}, c.cid) AS rn
        FROM n, {final_c} c
      ) WHERE rn = 1
    )"""
    )
    return ctes


def _ivf_ctes(
    dim: int, num_clusters: int, num_probes: int, rounds: int, query_id: int
) -> str:
    final_c = f"c{rounds}"
    ctes = _kmeans_ctes(dim, num_clusters, rounds)
    ctes.append(f"qn AS (SELECT e AS qe FROM n WHERE vec_id = {query_id})")
    ctes.append(
        f"""probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY {_sqdist('q.qe', 'c.c', dim)}, c.cid)
                 AS rn
        FROM {final_c} c, qn q
      ) WHERE rn <= {num_probes}
    )"""
    )
    ctes.append(
        f"""ivf_scored AS (
      SELECT a.vec_id, {_cosine('v.e', 'q.qe', dim)} AS sim
      FROM afinal a
      JOIN v ON a.vec_id = v.vec_id
      CROSS JOIN (SELECT e AS qe FROM v WHERE vec_id = {query_id}) q
      WHERE a.cid IN (SELECT cid FROM probes)
    )"""
    )
    return ",\n    ".join(ctes)


def ivf_topk_sql(
    dim: int = 64,
    k: int = 20,
    num_clusters: int = 16,
    num_probes: int = 4,
    rounds: int = 3,
    query_id: int = 0,
) -> str:
    return f"""
    WITH {_v_cte(dim)},
    {_ivf_ctes(dim, num_clusters, num_probes, rounds, query_id)}
    SELECT vec_id, round(sim, 6) AS cosine_sim
    FROM ivf_scored ORDER BY sim DESC, vec_id LIMIT {k}
    """


def ivf_recall_sql(
    dim: int = 64,
    k: int = 20,
    num_clusters: int = 16,
    num_probes: int = 4,
    rounds: int = 3,
    query_id: int = 0,
) -> str:
    return f"""
    WITH {_v_cte(dim)},
    {_exact_topk_cte(dim, k, query_id)},
    {_ivf_ctes(dim, num_clusters, num_probes, rounds, query_id)},
    approxk AS (
      SELECT vec_id FROM ivf_scored ORDER BY sim DESC, vec_id LIMIT {k}
    )
    SELECT {k} AS k,
           CAST((SELECT count(*) FROM exactk
                 WHERE vec_id IN (SELECT vec_id FROM approxk)) AS DOUBLE)
           / {k} AS recall
    """


def semdedup_sql(
    dim: int = 64,
    num_clusters: int = 16,
    rounds: int = 3,
    threshold: float = 0.35,
) -> str:
    """Twin of similarity.semdedup_flags (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the corpus, compute pairwise cosine
    ONLY within each cluster, and greedily drop every vector that has a
    lower-id neighbour above the threshold in its own cluster. The oracle
    replays the full deterministic Lloyd fit (same CTEs as the IVF twin),
    so a centroid drift or an assignment bug hash-mismatches — not just a
    wrong dup flag. Cosine over the 9-dp unit-normalized coords is a plain
    sequential-fold dot product on both engines."""
    ctes = _kmeans_ctes(dim, num_clusters, rounds)
    ctes.append(
        f"""pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_dot('na.e', 'nb.e', dim)} AS sim
      FROM afinal a
      JOIN afinal b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN n na ON na.vec_id = a.vec_id
      JOIN n nb ON nb.vec_id = b.vec_id
    )""",
    )
    ctes.append(
        f"dropped AS (SELECT DISTINCT id_b FROM pairs WHERE sim >= {threshold!r})"
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_v_cte(dim)},
    {body}
    SELECT a.vec_id, CAST(a.cid AS INT) AS cluster_id,
           a.vec_id IN (SELECT id_b FROM dropped) AS is_semdup
    FROM afinal a
    """


def prototypicality_sql(
    dim: int = 64,
    num_clusters: int = 16,
    rounds: int = 3,
    prune_frac: float = 0.1,
) -> str:
    """Twin of similarity.prototypicality_flags (the SSL-prototypes half
    of D4, Tirumala et al. 2023, arXiv:2308.12284): cosine of each vector
    to its OWN cluster centroid, ranked within the cluster; the top
    ``prune_frac`` most prototypical (most redundant) are flagged for
    pruning. Replays the full Lloyd fit like the IVF/SemDeDup twins."""
    final_c = f"c{rounds}"
    ctes = _kmeans_ctes(dim, num_clusters, rounds)
    ctes.append(
        f"""scored AS (
      SELECT a.vec_id, a.cid,
             {_dot('n.e', 'c.c', dim)}
               / sqrt({_dot('c.c', 'c.c', dim)}) AS proto_sim
      FROM afinal a
      JOIN n ON n.vec_id = a.vec_id
      JOIN {final_c} c ON c.cid = a.cid
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_v_cte(dim)},
    {body}
    SELECT vec_id, CAST(cid AS INT) AS cluster_id,
           round(proto_sim, 6) AS proto_sim,
           rnk <= CAST(ceil({prune_frac!r} * csize) AS BIGINT) AS is_pruned
    FROM (
      SELECT vec_id, cid, proto_sim,
             row_number() OVER (PARTITION BY cid
                                ORDER BY proto_sim DESC, vec_id) AS rnk,
             COUNT(*) OVER (PARTITION BY cid) AS csize
      FROM scored
    )
    """


# ---------------------------------------------------------------------------
# Embedding near-dup pairs via LSH buckets (twin of
# similarity.lsh_neardup_pairs + top-N ranking)
# ---------------------------------------------------------------------------


def lsh_neardup_pairs_sql(
    dim: int = 64,
    topn: int = 25,
    num_tables: int = 8,
    num_planes: int = 16,
    pair_hamming: int = 1,
    seed: int = 42,
) -> str:
    """Pairwise replay of the bucketed pair generation: a pair is a
    candidate iff its per-table signatures agree within ``pair_hamming``
    bits in ANY table — the Spark side realizes this as a Hamming-ball
    bucket join, the oracle as the equivalent pairwise bit_count
    condition (identical result set when no bucket exceeds the cap,
    which holds on every fixture: 500–2000 vectors < cap 1000 per
    bucket... buckets are per (table, signature), far smaller)."""
    sig_cols = ", ".join(
        f"{_lsh_sig_expr('e', t, dim, num_planes, seed)} AS s{t}"
        for t in range(num_tables)
    )
    pair_cond = " OR ".join(
        f"bit_count(xor(a.s{t}, b.s{t})) <= {pair_hamming}"
        for t in range(num_tables)
    )
    return f"""
    WITH {_v_cte(dim)},
    sigs AS (SELECT vec_id, e, {sig_cols} FROM v),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cosine('a.e', 'b.e', dim)} AS sim
      FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
      WHERE {pair_cond}
    )
    SELECT id_a, id_b, round(sim, 6) AS cosine_sim
    FROM pairs ORDER BY sim DESC, id_a, id_b LIMIT {topn}
    """


def lsh_neardup_components_sql(
    dim: int = 64,
    num_tables: int = 8,
    num_planes: int = 16,
    pair_hamming: int = 1,
    seed: int = 42,
    min_cosine: float = 0.35,
) -> str:
    """Components over the embedding near-dup graph WITH exact-vector
    collapse — the oracle twin of emb_neardup_components. Identical
    construction both engines: collapse identical vectors to their
    min-id representative, run the LSH pair condition + cosine verify
    over REPRESENTATIVES only (pairwise bit_count here; Hamming-ball
    bucket join on the Spark side), re-attach exact twins as star edges
    rep→twin, then min-label transitive closure. The collapsed graph's
    components equal the full pair graph's exactly: an exact twin has
    the identical signature AND identical cosine to every other vector
    as its rep, so twin↔twin and twin↔other edges are implied (same
    argument as the text-side _COMPONENT_EDGES_SQL collapse)."""
    sig_cols = ", ".join(
        f"{_lsh_sig_expr('e', t, dim, num_planes, seed)} AS s{t}"
        for t in range(num_tables)
    )
    pair_cond = " OR ".join(
        f"bit_count(xor(a.s{t}, b.s{t})) <= {pair_hamming}"
        for t in range(num_tables)
    )
    return f"""
    WITH RECURSIVE {_v_cte(dim)},
    mem AS MATERIALIZED (
      SELECT vec_id, e, MIN(vec_id) OVER (PARTITION BY e) AS rep FROM v
    ),
    sigs AS MATERIALIZED (
      SELECT vec_id, e, {sig_cols} FROM mem WHERE vec_id = rep
    ),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
      WHERE ({pair_cond})
        AND round({_cosine('a.e', 'b.e', dim)}, 6) >= {min_cosine}
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT rep AS u, vec_id AS v FROM mem WHERE vec_id <> rep
    ),
    sym AS MATERIALIZED (
      SELECT u, v FROM edges
      UNION
      SELECT v AS u, u AS v FROM edges
    ),
    reach(id, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
        SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
    )
    SELECT id AS vec_id, MIN(comp) AS component FROM reach GROUP BY id
    """


def lsh_cross_decon_sql(
    dim: int = 64,
    num_tables: int = 8,
    num_planes: int = 16,
    pair_hamming: int = 1,
    seed: int = 42,
    min_cosine: float = 0.35,
) -> str:
    """Twin of similarity.lsh_cross_hits over the eval/train vec_id%10
    split (semantic decontamination): a train vector's n_hits counts the
    eval vectors whose signatures agree within ``pair_hamming`` bits in
    ANY table AND whose 6-dp-rounded cosine clears ``min_cosine``. The
    Spark side realizes the candidate step as a probe-side Hamming-ball
    bucket join; the oracle as the equivalent pairwise bit_count
    condition. Since r11 the Spark gate is UNCAPPED by default (no corpus
    bucket is ever dropped), so this pairwise replay is exact
    unconditionally — the bucket-cap caveat applies only when a caller
    passes an explicit ``max_bucket_size`` (throughput triage, never a
    correctness gate); hot buckets are handled by salting, a pure key
    refinement that leaves per-pair candidates unchanged."""
    sig_cols = ", ".join(
        f"{_lsh_sig_expr('e', t, dim, num_planes, seed)} AS s{t}"
        for t in range(num_tables)
    )
    pair_cond = " OR ".join(
        f"bit_count(xor(a.s{t}, b.s{t})) <= {pair_hamming}"
        for t in range(num_tables)
    )
    return f"""
    WITH {_v_cte(dim)},
    sigs AS (SELECT vec_id, e, {sig_cols} FROM v),
    tr AS (SELECT * FROM sigs WHERE vec_id % 10 <> 0),
    ev AS (SELECT * FROM sigs WHERE vec_id % 10 = 0),
    hits AS (
      SELECT a.vec_id AS vec_id, COUNT(*) AS n
      FROM tr a JOIN ev b ON ({pair_cond})
      WHERE round({_cosine('a.e', 'b.e', dim)}, 6) >= {min_cosine!r}
      GROUP BY a.vec_id
    )
    SELECT a.vec_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n, 0) > 0 AS is_contaminated
    FROM tr a LEFT JOIN hits h ON h.vec_id = a.vec_id
    """


# ---------------------------------------------------------------------------
# Portable banded SimHash (twin of similarity.simhash_pairs with
# token_hash=md5_long60, n_bits=60, band_bits=10, max_hamming=5)
# ---------------------------------------------------------------------------


def simhash_pairs_sql(
    n_bits: int = 60, band_bits: int = 10, max_hamming: int = 5
) -> str:
    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1
    vote_cols = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(n_bits)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(n_bits)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, (sim >> {b * band_bits}) & {mask} "
        f"AS band_hash FROM sims"
        for b in range(n_bands)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) AS t
      FROM documents
      WHERE trim(lower(COALESCE(text,''))) <> ''
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(t),1,15))::BIGINT AS h FROM toks),
    votes AS (SELECT doc_id, {vote_cols} FROM h GROUP BY doc_id),
    sims AS (SELECT doc_id, CAST({sim_expr} AS BIGINT) AS sim FROM votes),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(sa.sim, sb.sim)) AS INTEGER) AS hamming
    FROM cand c
    JOIN sims sa ON c.id_a = sa.doc_id
    JOIN sims sb ON c.id_b = sb.doc_id
    WHERE bit_count(xor(sa.sim, sb.sim)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Product quantization (twin of functions/pq.py) — per-subspace Lloyd fit,
# encode, and ADC search, replayed in full. Same determinism contract:
# md5-ordered init, half-up 6-dp centroid re-quantization per round,
# sequential-fold distances; the ADC per-vector distance folds in
# ascending-subspace order via list_sum(list(... ORDER BY sub)) to mirror
# the Spark side's left-associated + chain.
# ---------------------------------------------------------------------------


def _pq_ctes(
    dim: int, m: int, k: int, rounds: int, prefix: str = "",
    include_norm: bool = True,
) -> str:
    """PQ fit + encode CTEs. ``prefix`` renames every CTE this block
    defines (for composition with the k-means block, whose ``afinal``
    would otherwise collide); ``include_norm=False`` skips the ``n``
    normalization CTE when a composing query already defines an
    identical one (the k-means block's ``n`` is byte-for-byte the same
    expression)."""
    p = prefix
    sd = dim // m
    mean_list = ", ".join(
        f"floor(avg(sv[{i + 1}]) * 1000000.0 + 0.5)/1000000.0" for i in range(sd)
    )
    ctes = []
    if include_norm:
        ctes.append(
            "n AS (SELECT vec_id, list_transform(e, x -> "
            "floor((x / sqrt(list_sum(list_transform(e, y -> y*y)))) * 1000000000.0"
            " + 0.5)/1000000000.0) AS e FROM v)"
        )
    ctes += [
        f"""{p}subs AS (
      SELECT vec_id, j.sub AS sub, e[j.sub*{sd}+1 : j.sub*{sd}+{sd}] AS sv
      FROM n, (SELECT unnest(range(0, {m})) AS sub) j
    )""",
        f"""{p}cb0 AS (
      SELECT sub, cid, sv AS c FROM (
        SELECT sub,
               row_number() OVER (PARTITION BY sub
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
               sv
        FROM {p}subs
      ) WHERE cid < {k}
    )""",
    ]
    for r in range(1, rounds + 1):
        prev = f"{p}cb{r - 1}"
        ctes.append(
            f"""{p}a{r} AS (
      SELECT vec_id, sub, sv, cid FROM (
        SELECT s.vec_id, s.sub, s.sv, cb.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_sqdist('s.sv', 'cb.c', sd)}, cb.cid) AS rn
        FROM {p}subs s JOIN {prev} cb ON s.sub = cb.sub
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""{p}cb{r} AS (
      SELECT p.sub, p.cid, COALESCE(mm.c, p.c) AS c
      FROM {prev} p LEFT JOIN (
        SELECT sub, cid, [{mean_list}] AS c FROM {p}a{r} GROUP BY sub, cid
      ) mm ON p.sub = mm.sub AND p.cid = mm.cid
    )"""
        )
    ctes.append(
        f"""{p}afinal AS (
      SELECT vec_id, sub, cid, d FROM (
        SELECT s.vec_id, s.sub, cb.cid,
               {_sqdist('s.sv', 'cb.c', sd)} AS d,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                 ORDER BY {_sqdist('s.sv', 'cb.c', sd)}, cb.cid) AS rn
        FROM {p}subs s JOIN {p}cb{rounds} cb ON s.sub = cb.sub
      ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(ctes)


def pq_codes_sql(dim: int = 64, m: int = 8, k: int = 16, rounds: int = 1) -> str:
    return f"""
    WITH {_v_cte(dim)},
    {_pq_ctes(dim, m, k, rounds)}
    SELECT vec_id,
           string_agg(CAST(cid AS VARCHAR), '-' ORDER BY sub) AS codes,
           SUM(d) / {float(dim)} AS recon_mse
    FROM afinal GROUP BY vec_id
    """


def pq_adc_sql(
    dim: int = 64, m: int = 8, k: int = 16, rounds: int = 1,
    query_id: int = 0, topk: int = 20,
) -> str:
    sd = dim // m
    return f"""
    WITH {_v_cte(dim)},
    {_pq_ctes(dim, m, k, rounds)},
    qsubs AS (
      SELECT j.sub AS sub, e[j.sub*{sd}+1 : j.sub*{sd}+{sd}] AS qsv
      FROM n, (SELECT unnest(range(0, {m})) AS sub) j
      WHERE vec_id = {query_id}
    ),
    dt AS (
      SELECT cb.sub, cb.cid, {_sqdist('q.qsv', 'cb.c', sd)} AS qd
      FROM cb{rounds} cb JOIN qsubs q ON cb.sub = q.sub
    ),
    scored AS (
      SELECT a.vec_id,
             list_sum(list(dt.qd ORDER BY a.sub)) AS adc_dist
      FROM afinal a JOIN dt ON a.sub = dt.sub AND a.cid = dt.cid
      GROUP BY a.vec_id
    ),
    codes AS (
      SELECT vec_id, string_agg(CAST(cid AS VARCHAR), '-' ORDER BY sub) AS codes
      FROM afinal GROUP BY vec_id
    )
    SELECT s.vec_id, c.codes, s.adc_dist
    FROM scored s JOIN codes c ON s.vec_id = c.vec_id
    ORDER BY s.adc_dist, s.vec_id LIMIT {topk}
    """


def _ivfpq_ctes(
    dim: int,
    m: int,
    k_sub: int,
    pq_rounds: int,
    num_clusters: int,
    num_probes: int,
    km_rounds: int,
    query_id: int,
) -> str:
    """The full IVFADC replay as a CTE block (everything after the ``v``
    CTE): k-means coarse fit, probe selection, PQ fit/encode under a
    ``pq_`` prefix, the per-query asymmetric distance table, and the
    ``scored``/``members`` relations the callers rank. Shared by
    ivfpq_topk_sql and ivfpq_recall_sql so the approximate path in the
    recall oracle is byte-identical to the one the top-k oracle proves."""
    sd = dim // m
    km = _kmeans_ctes(dim, num_clusters, km_rounds)
    km.append(f"qn AS (SELECT e AS qe FROM n WHERE vec_id = {query_id})")
    km.append(
        f"""probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY {_sqdist('q.qe', 'c.c', dim)}, c.cid)
                 AS rn
        FROM c{km_rounds} c, qn q
      ) WHERE rn <= {num_probes}
    )"""
    )
    pq = _pq_ctes(dim, m, k_sub, pq_rounds, prefix="pq_", include_norm=False)
    km_joined = ",\n    ".join(km)
    return f"""
    {km_joined},
    {pq},
    qsubs AS (
      SELECT j.sub AS sub, e[j.sub*{sd}+1 : j.sub*{sd}+{sd}] AS qsv
      FROM n, (SELECT unnest(range(0, {m})) AS sub) j
      WHERE vec_id = {query_id}
    ),
    dt AS (
      SELECT cb.sub, cb.cid, {_sqdist('q.qsv', 'cb.c', sd)} AS qd
      FROM pq_cb{pq_rounds} cb JOIN qsubs q ON cb.sub = q.sub
    ),
    members AS (
      SELECT k.vec_id, CAST(k.cid AS INT) AS cluster_id
      FROM afinal k WHERE k.cid IN (SELECT cid FROM probes)
    ),
    scored AS (
      SELECT a.vec_id,
             list_sum(list(dt.qd ORDER BY a.sub)) AS adc_dist,
             string_agg(CAST(a.cid AS VARCHAR), '-' ORDER BY a.sub) AS codes
      FROM pq_afinal a
      JOIN members mb ON a.vec_id = mb.vec_id
      JOIN dt ON a.sub = dt.sub AND a.cid = dt.cid
      GROUP BY a.vec_id
    )"""


def ivfpq_topk_sql(
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    pq_rounds: int = 1,
    num_clusters: int = 16,
    num_probes: int = 6,
    km_rounds: int = 3,
    query_id: int = 0,
    topk: int = 20,
) -> str:
    """Twin of pq.ivfpq_adc_topk (FAISS IVFADC): the k-means coarse
    quantizer selects probe clusters, PQ codes + an asymmetric distance
    table rank only their members. Composes the proven k-means CTEs
    (names n/c*/afinal) with the PQ CTEs under a ``pq_`` prefix."""
    body = _ivfpq_ctes(
        dim, m, k_sub, pq_rounds, num_clusters, num_probes, km_rounds, query_id
    )
    return f"""
    WITH {_v_cte(dim)},
    {body}
    SELECT s.vec_id, mb.cluster_id, s.codes, s.adc_dist
    FROM scored s JOIN members mb ON s.vec_id = mb.vec_id
    ORDER BY s.adc_dist, s.vec_id LIMIT {topk}
    """


def ivfpq_recall_sql(
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    pq_rounds: int = 1,
    num_clusters: int = 16,
    num_probes: int = 6,
    km_rounds: int = 3,
    query_id: int = 0,
    k: int = 20,
) -> str:
    """recall@k of the doubly-approximate IVFADC path (probe pruning AND
    lossy PQ codes) vs exact cosine top-k — same shape as ivf_recall_sql,
    with the approximate side the byte-identical ``scored`` block
    ivfpq_topk_sql proves. The ``q``/``exactk`` CTE names don't collide:
    the IVFADC block uses ``qn``/``qsubs``."""
    body = _ivfpq_ctes(
        dim, m, k_sub, pq_rounds, num_clusters, num_probes, km_rounds, query_id
    )
    return f"""
    WITH {_v_cte(dim)},
    {_exact_topk_cte(dim, k, query_id)},
    {body},
    approxk AS (
      SELECT vec_id FROM scored ORDER BY adc_dist, vec_id LIMIT {k}
    )
    SELECT {k} AS k,
           CAST((SELECT count(*) FROM exactk
                 WHERE vec_id IN (SELECT vec_id FROM approxk)) AS DOUBLE)
           / {k} AS recall
    """


def ivfpq_batch_topk_sql(
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    pq_rounds: int = 1,
    num_clusters: int = 16,
    num_probes: int = 6,
    km_rounds: int = 3,
    n_queries: int = 5,
    topk: int = 20,
) -> str:
    """Twin of pq.ivfpq_batch_topk: the IVFADC replay generalized over a
    query BATCH (vec_id < n_queries) — per-query probe selection via a
    partitioned rank, per-query distance tables, ADC ranking, and a
    per-query rank-limit. The fits (k-means + PQ) are shared across the
    batch exactly as the Spark side shares its cached artifacts."""
    sd = dim // m
    km = _kmeans_ctes(dim, num_clusters, km_rounds)
    pq = _pq_ctes(dim, m, k_sub, pq_rounds, prefix="pq_", include_norm=False)
    km_joined = ",\n    ".join(km)
    return f"""
    WITH {_v_cte(dim)},
    {km_joined},
    {pq},
    qs AS (SELECT vec_id AS query_id, e AS qe FROM n WHERE vec_id < {n_queries}),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_sqdist('q.qe', 'c.c', dim)}, c.cid) AS rn
        FROM c{km_rounds} c, qs q
      ) WHERE rn <= {num_probes}
    ),
    qsubs AS (
      SELECT query_id, j.sub AS sub,
             qe[j.sub*{sd}+1 : j.sub*{sd}+{sd}] AS qsv
      FROM qs, (SELECT unnest(range(0, {m})) AS sub) j
    ),
    dt AS (
      SELECT q.query_id, cb.sub, cb.cid, {_sqdist('q.qsv', 'cb.c', sd)} AS qd
      FROM pq_cb{pq_rounds} cb JOIN qsubs q ON cb.sub = q.sub
    ),
    members AS (
      SELECT p.query_id, k.vec_id
      FROM afinal k JOIN probes p ON k.cid = p.cid
    ),
    scored AS (
      SELECT mb.query_id, a.vec_id,
             list_sum(list(dt.qd ORDER BY a.sub)) AS adc_dist
      FROM pq_afinal a
      JOIN members mb ON a.vec_id = mb.vec_id
      JOIN dt ON dt.query_id = mb.query_id
             AND a.sub = dt.sub AND a.cid = dt.cid
      GROUP BY mb.query_id, a.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, adc_dist FROM ranked WHERE rn <= {topk}
    """


def ivfpq_codes_sql(
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    pq_rounds: int = 1,
    num_clusters: int = 16,
    km_rounds: int = 3,
) -> str:
    """Twin of the IVFPQ index CONTENT (batch write_ivfpq_index and the
    streaming ann_index_ingest drain identically): every vector's coarse
    cluster assignment + PQ code string — the ivfpq CTE block without a
    query (no probes, no distance table)."""
    km = _kmeans_ctes(dim, num_clusters, km_rounds)
    pq = _pq_ctes(dim, m, k_sub, pq_rounds, prefix="pq_", include_norm=False)
    km_joined = ",\n    ".join(km)
    return f"""
    WITH {_v_cte(dim)},
    {km_joined},
    {pq}
    SELECT a.vec_id, CAST(k.cid AS INT) AS cluster_id,
           string_agg(CAST(a.cid AS VARCHAR), '-' ORDER BY a.sub) AS codes
    FROM pq_afinal a JOIN afinal k ON a.vec_id = k.vec_id
    GROUP BY a.vec_id, k.cid
    """


# ---------------------------------------------------------------------------
# Greedy k-center coreset (twin of similarity.kcenter_select)
# ---------------------------------------------------------------------------


def kcenter_sql(dim: int = 64, k: int = 8) -> str:
    """Unrolled greedy farthest-point selection + nearest-center
    assignment — the oracle twin of emb_kcenter_coreset. Each step i is a
    chained CTE: n{i} picks the unselected row maximizing the running
    LEAST-chain of squared-L2 distances (ties by min vec_id), exactly the
    Spark side's max(struct(dmin, -id)) reduce; distances are the same
    left-to-right double folds (_sqdist), so the greedy picks are
    bit-identical. Same unrolled-rounds pattern as _kmeans_ctes."""
    parts = [
        _v_cte(dim),
        "s0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)",
        f"d0 AS MATERIALIZED (SELECT v.vec_id, v.e,"
        f" {_sqdist('v.e', 's0.e', dim)} AS dmin FROM v, s0)",
    ]
    sel_union = "SELECT vec_id FROM s0"
    for i in range(1, k):
        parts.append(
            f"n{i} AS (SELECT vec_id FROM d{i - 1}"
            f" WHERE vec_id NOT IN ({sel_union})"
            " ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED"
            f" (SELECT v.vec_id, v.e FROM v JOIN n{i} USING (vec_id))"
        )
        if i < k - 1:
            # MATERIALIZED is load-bearing: d{i} and s{i} are each
            # referenced twice, and inlining the chain re-evaluates
            # d{i-1} exponentially (~200 s at k=8; <2 s materialized)
            parts.append(
                f"d{i} AS MATERIALIZED (SELECT d.vec_id, d.e,"
                f" LEAST(d.dmin, {_sqdist('d.e', f's{i}.e', dim)}) AS dmin"
                f" FROM d{i - 1} d, s{i})"
            )
        sel_union += f" UNION ALL SELECT vec_id FROM s{i}"
    centers = " UNION ALL ".join(
        f"SELECT vec_id, e FROM s{i}" for i in range(k)
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes},
    centers AS ({centers}),
    assign AS (
      SELECT v.vec_id, c.vec_id AS center_id, {_sqdist('v.e', 'c.e', dim)} AS d,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_sqdist('v.e', 'c.e', dim)}, c.vec_id
             ) AS rn
      FROM v, centers c
    )
    SELECT a.vec_id, a.center_id,
           ROUND(a.d, 6) AS dist_sq,
           a.vec_id = a.center_id AS is_center
    FROM assign a WHERE rn = 1
    """


def kcenter_batch_sql(dim: int = 64, k: int = 8, batch: int = 4) -> str:
    """Unrolled BATCHED farthest-point selection + nearest-center
    assignment — the oracle twin of emb_kcenter_batch
    (similarity.kcenter_select_batched). Each round's CTE picks the
    round's top-b unselected rows by (dmin DESC, vec_id) in one ORDER BY
    ... LIMIT b (exactly the Spark side's TakeOrdered), then the next
    distance CTE folds LEAST(dmin, MIN over the batch) — MIN of exact
    doubles, order-insensitive, matching the Spark LEAST-chain. Same
    MATERIALIZED discipline as kcenter_sql (each d{r}/n{r} is referenced
    twice; inlining re-evaluates the chain exponentially)."""
    parts = [
        _v_cte(dim),
        "s0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)",
        f"d0 AS MATERIALIZED (SELECT v.vec_id, v.e,"
        f" {_sqdist('v.e', 's0.e', dim)} AS dmin FROM v, s0)",
    ]
    sel_union = "SELECT vec_id FROM s0"
    sizes = []
    remaining = k - 1
    while remaining > 0:
        sizes.append(min(batch, remaining))
        remaining -= sizes[-1]
    for r, b in enumerate(sizes, start=1):
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT vec_id, e FROM d{r - 1}"
            f" WHERE vec_id NOT IN ({sel_union})"
            f" ORDER BY dmin DESC, vec_id LIMIT {b})"
        )
        if r < len(sizes):
            parts.append(
                f"d{r} AS MATERIALIZED (SELECT d.vec_id, d.e,"
                f" LEAST(d.dmin, MIN({_sqdist('d.e', 'n.e', dim)})) AS dmin"
                f" FROM d{r - 1} d, n{r} n GROUP BY d.vec_id, d.e, d.dmin)"
            )
        sel_union += f" UNION ALL SELECT vec_id FROM n{r}"
    centers = " UNION ALL ".join(
        ["SELECT vec_id, e FROM s0"]
        + [f"SELECT vec_id, e FROM n{r}" for r in range(1, len(sizes) + 1)]
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes},
    centers AS ({centers}),
    assign AS (
      SELECT v.vec_id, c.vec_id AS center_id, {_sqdist('v.e', 'c.e', dim)} AS d,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_sqdist('v.e', 'c.e', dim)}, c.vec_id
             ) AS rn
      FROM v, centers c
    )
    SELECT a.vec_id, a.center_id,
           ROUND(a.d, 6) AS dist_sq,
           a.vec_id = a.center_id AS is_center
    FROM assign a WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Power-iteration PCA (twin of similarity.pca_power_fit)
# ---------------------------------------------------------------------------


def pca_power_sql(dim: int = 64, iters: int = 8, scale: int = 10**6) -> str:
    """Unrolled power iteration over the exact integer scatter matrix —
    the oracle twin of emb_pca_project. Every float op replays the Spark
    side's order exactly: quantize (round half-away), HUGEINT sums
    (exact, associative), M = n·Σqq − Σq·Σqᵀ cast to DOUBLE, then
    ``iters`` rounds of left-to-right fold M·v, floor-half-up 9-dp
    normalize — the kmeans-oracle recipe applied to an eigenvector
    recurrence. Sign convention and the centering constant replay too,
    so the projected pc1 scores hash-match bit-for-bit."""
    d1 = dim + 1
    gs = f"generate_series(1, {dim})"
    parts = [
        _v_cte(dim),
        f"q AS (SELECT vec_id, list_transform(e, x -> "
        f"CAST(round(x * {scale}.0) AS BIGINT)) AS ql FROM v)",
        "nn AS (SELECT COUNT(*) AS n FROM q)",
        f"sq AS (SELECT i.i, SUM(CAST(ql[i.i] AS HUGEINT)) AS s "
        f"FROM q, {gs} AS i(i) GROUP BY i.i)",
        f"sqq AS (SELECT i.i, j.j, SUM(CAST(ql[i.i] * ql[j.j] AS HUGEINT)) AS s "
        f"FROM q, {gs} AS i(i), {gs} AS j(j) GROUP BY i.i, j.j)",
        "m AS (SELECT qq.i, qq.j, "
        "CAST(nn.n * qq.s - s1.s * s2.s AS DOUBLE) AS md "
        "FROM sqq qq JOIN sq s1 ON qq.i = s1.i JOIN sq s2 ON qq.j = s2.i "
        "CROSS JOIN nn)",
        "mrow AS MATERIALIZED (SELECT i, list(md ORDER BY j) AS mr "
        "FROM m GROUP BY i)",
        f"v0 AS (SELECT list_transform(range(1, {d1}), x -> "
        f"1.0 / sqrt({dim}.0)) AS vv)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT i, "
            f"list_sum(list_transform(range(1, {d1}), j -> mr[j] * vv[j])) AS wv "
            f"FROM mrow, v{t - 1})"
        )
        parts.append(
            f"wl{t} AS (SELECT list(wv ORDER BY i) AS wl FROM w{t})"
        )
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT list_transform(wl, x -> "
            f"floor(x / sqrt(list_sum(list_transform(wl, y -> y * y))) "
            f"* 1000000000.0 + 0.5) / 1000000000.0) AS vv FROM wl{t})"
        )
    parts.append(
        f"vf AS (SELECT CASE WHEN vv[1] < 0 THEN "
        f"list_transform(vv, x -> -x) ELSE vv END AS vv FROM v{iters})"
    )
    parts.append(
        "sqrow AS (SELECT list(CAST(s AS DOUBLE) ORDER BY i) AS sa FROM sq)"
    )
    parts.append(
        f"cst AS (SELECT list_sum(list_transform(range(1, {d1}), i -> "
        f"sa[i] / (nn.n * {scale}.0) * vv[i])) AS c "
        f"FROM sqrow, vf, nn)"
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT v.vec_id,
           round(list_sum(list_transform(range(1, {d1}), i -> e[i] * vv[i]))
                 - cst.c, 6) AS pc1
    FROM v, vf, cst
    """


def _power_chain_ctes(mat_cte: str, pfx: str, dim: int, iters: int) -> list[str]:
    """Power-iteration CTE chain over a (i, mr) matrix CTE — shared by
    both components of the top-2 PCA oracle. Emits {pfx}v0..{pfx}v{iters}
    and the sign-fixed {pfx}f, with the same fold orders / floor-half-up
    9-dp rounding as similarity._pca_power_iterate."""
    d1 = dim + 1
    parts = [
        f"{pfx}v0 AS (SELECT list_transform(range(1, {d1}), x -> "
        f"1.0 / sqrt({dim}.0)) AS vv)"
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"{pfx}w{t} AS MATERIALIZED (SELECT i, "
            f"list_sum(list_transform(range(1, {d1}), j -> mr[j] * vv[j])) AS wv "
            f"FROM {mat_cte}, {pfx}v{t - 1})"
        )
        parts.append(
            f"{pfx}wl{t} AS (SELECT list(wv ORDER BY i) AS wl FROM {pfx}w{t})"
        )
        parts.append(
            f"{pfx}v{t} AS MATERIALIZED (SELECT list_transform(wl, x -> "
            f"floor(x / sqrt(list_sum(list_transform(wl, y -> y * y))) "
            f"* 1000000000.0 + 0.5) / 1000000000.0) AS vv FROM {pfx}wl{t})"
        )
    parts.append(
        f"{pfx}f AS (SELECT CASE WHEN vv[1] < 0 THEN "
        f"list_transform(vv, x -> -x) ELSE vv END AS vv FROM {pfx}v{iters})"
    )
    return parts


def pca_power2_sql(dim: int = 64, iters: int = 8, scale: int = 10**6) -> str:
    """Top-2 PCA oracle — twin of similarity.pca_power_fit2: the PC1
    chain, then Hotelling deflation (λ₁ = v₁ᵀMv₁, M₂ = M − λ₁·v₁v₁ᵀ with
    the exact driver-side op order: mr[j] − (λ·v[i])·v[j]), then the PC2
    chain, then both centered projections."""
    d1 = dim + 1
    gs = f"generate_series(1, {dim})"
    parts = [
        _v_cte(dim),
        f"q AS (SELECT vec_id, list_transform(e, x -> "
        f"CAST(round(x * {scale}.0) AS BIGINT)) AS ql FROM v)",
        "nn AS (SELECT COUNT(*) AS n FROM q)",
        f"sq AS (SELECT i.i, SUM(CAST(ql[i.i] AS HUGEINT)) AS s "
        f"FROM q, {gs} AS i(i) GROUP BY i.i)",
        f"sqq AS (SELECT i.i, j.j, SUM(CAST(ql[i.i] * ql[j.j] AS HUGEINT)) AS s "
        f"FROM q, {gs} AS i(i), {gs} AS j(j) GROUP BY i.i, j.j)",
        "m AS (SELECT qq.i, qq.j, "
        "CAST(nn.n * qq.s - s1.s * s2.s AS DOUBLE) AS md "
        "FROM sqq qq JOIN sq s1 ON qq.i = s1.i JOIN sq s2 ON qq.j = s2.i "
        "CROSS JOIN nn)",
        "mrow AS MATERIALIZED (SELECT i, list(md ORDER BY j) AS mr "
        "FROM m GROUP BY i)",
    ]
    parts += _power_chain_ctes("mrow", "a", dim, iters)
    parts += [
        f"mv AS MATERIALIZED (SELECT i, "
        f"list_sum(list_transform(range(1, {d1}), j -> mr[j] * vv[j])) AS wv "
        f"FROM mrow, af)",
        "mvl AS (SELECT list(wv ORDER BY i) AS mva FROM mv)",
        f"lam AS (SELECT list_sum(list_transform(range(1, {d1}), i -> "
        f"vv[i] * mva[i])) AS l FROM mvl, af)",
        f"m2row AS MATERIALIZED (SELECT mrow.i, "
        f"list_transform(range(1, {d1}), j -> "
        f"mr[j] - (lam.l * vv[mrow.i]) * vv[j]) AS mr "
        f"FROM mrow, af, lam)",
    ]
    parts += _power_chain_ctes("m2row", "b", dim, iters)
    parts += [
        "sqrow AS (SELECT list(CAST(s AS DOUBLE) ORDER BY i) AS sa FROM sq)",
        f"c1 AS (SELECT list_sum(list_transform(range(1, {d1}), i -> "
        f"sa[i] / (nn.n * {scale}.0) * vv[i])) AS c FROM sqrow, af, nn)",
        f"c2 AS (SELECT list_sum(list_transform(range(1, {d1}), i -> "
        f"sa[i] / (nn.n * {scale}.0) * vv[i])) AS c FROM sqrow, bf, nn)",
    ]
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT v.vec_id,
           round(list_sum(list_transform(range(1, {d1}), i -> e[i] * af.vv[i]))
                 - c1.c, 6) AS pc1,
           round(list_sum(list_transform(range(1, {d1}), i -> e[i] * bf.vv[i]))
                 - c2.c, 6) AS pc2
    FROM v, af, bf, c1, c2
    """
