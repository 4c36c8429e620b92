"""As-of join and connected-components clustering — operators Spark's
DataFrame API lacks natively, built as compositions of existing ops
(the engine-extension class SURVEY.md §2 anticipates for the 100 TB
tier; the reference's SQL surface has neither).

**As-of join** (``asof_join``): for every left row, the single most
recent right row of the same key at-or-before the left timestamp.
Implemented with the union + running-last-value trick:

    union(tagged right, tagged left)
      → window last_value(right cols, ignorenulls) over
        (partition by key order by ts, tie rows unbounded preceding)
      → keep left rows

ONE shuffle (the window partition), no range-explosion join, no
per-key skew beyond the key's own row count — the scalable shape at
10^12 events (a naive ``l.ts >= r.ts`` range join explodes to the
pairwise product inside each key).

**Connected components** (``connected_components``): min-label
propagation over an undirected edge list — the clustering step a
production dedup cascade runs AFTER pair generation (pairs → clusters
→ keep one representative per cluster). Each iteration is one
join + one min-aggregation and labels travel one hop, so ``max_iter``
must be ≥ the component diameter (dedup clusters are shallow — near-dup
graphs are cliques-of-copies, diameter 1-2). At 10^12 nodes each
iteration is a pair of key-partitioned shuffles; on deep topologies
use ``connected_components_star`` below — the alternating
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC 2014), which converges in
O(log^2 n) rounds regardless of component diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of-backward join: each ``left`` row gains the columns of
    the latest ``right`` row with the same ``key`` and
    ``right_ts <= left_ts`` (NULLs if none). Ties on the timestamp
    break toward the greater right-side first column (deterministic).

    ``tolerance_seconds`` drops matches older than the window (the
    pandas ``merge_asof`` tolerance semantic).

    ``right_cols`` must not collide with ``left`` column names (the
    output carries both sets unrenamed; pandas would suffix — here the
    caller aliases explicitly, so collisions raise upfront).
    """
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns; alias one side"
        )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at equal ts (__side 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row (<=);
    # equal-(ts,side) right rows tie-break to the greatest payload
    # (ascending sort + running last() = max)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        w2 = w
        unioned = unioned.withColumn(
            "__match_ts",
            F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w2),
        ).withColumn(
            "__match",
            F.when(
                F.col("__match_ts")
                >= F.col("__ts") - F.make_interval(secs=F.lit(tolerance_seconds)),
                F.col("__match"),
            ),
        )
    out = unioned.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in right_cols],
    )
    return out


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 5,
) -> DataFrame:
    """``nodes(id)`` + undirected ``edges(src, dst)`` →
    ``(id, label)`` with label = MIN node id of the connected
    component. Labels travel ONE hop per round, so components are
    fully labeled only when ``max_iter`` ≥ the component diameter
    (pinned by tests/test_asof_cc.py); dedup graphs are shallow
    cliques — see the module docstring for the O(log n) alternative
    if deep chains ever appear."""
    # Symmetrize in ONE pass over the edges subtree: a union of the
    # edge set with its flipped self evaluates the (often expensive —
    # the MinHash verify pipeline) edges plan once PER BRANCH when the
    # cache materializes; exploding both orientations out of a single
    # scan halves that first-round cost (measured 2x on
    # dedup_best_representative at sf0.1).
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Iterate over edge ENDPOINTS only: a node with no edge can never
    # receive a foreign label, so carrying the corpus-wide node set
    # through every propagation round (VERDICT r3 #5: a shuffle per
    # round over ALL docs — 26.5 s at 6k docs) only re-derives
    # label = id. The propagation graph is the verified-pairs graph —
    # cluster-bounded, orders of magnitude smaller than the corpus at
    # real dup rates — and isolated nodes join back once at the end.
    sym = sym.persist()
    lab = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
    )
    prev_sum = None
    for _ in range(max_iter):
        prop = (
            sym.join(lab, sym.src == lab.id)
            .select(F.col("dst").alias("id"), "label")
            .unionByName(lab)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # Lineage truncation, not just caching: each round references
        # `lab` TWICE (join + union), so composing rounds as plain
        # lineage doubles the LOGICAL plan per round — Catalyst
        # re-analysis OOMs the driver near round ~25 on deep graphs
        # (found by tests/test_cc_star.py's equivalence sweep; persist
        # caches data but does NOT shrink the plan tree). Non-eager
        # localCheckpoint keeps ONE action per round: the label-sum agg
        # below both materializes the checkpoint (truncating the plan
        # the next join analyzes) and decides the early exit.
        # Failure-semantics tradeoff: localCheckpoint blocks are
        # executor-local with NO lineage, so on a real multi-executor
        # cluster losing an executor mid-query fails the query instead
        # of recomputing (GraphFrames' CC makes the same tradeoff);
        # use reliable checkpoint() + a checkpoint dir if executor
        # churn is expected.
        nxt = prop.localCheckpoint(eager=False)
        # min-label propagation is monotone — every node's label can
        # only decrease — so the exact (decimal-128, no bigint overflow
        # at 10^12 ids) label sum is strictly decreasing until the
        # fixpoint; an unchanged sum IS stability, with no per-round
        # old⋈new comparison join. A stable fixpoint makes every later
        # round a no-op, so exiting is label-identical
        # (one-hop-per-round semantics unchanged, pinned by
        # test_connected_components_*). Superseded round blocks are
        # freed by the ContextCleaner when their Python refs drop.
        cur_sum = nxt.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        lab = nxt
        if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
            break  # empty endpoint set, or fixpoint reached
        prev_sum = cur_sum
    sym.unpersist()
    # isolated nodes keep their own id; ONE corpus-wide join total
    # (AQE broadcasts the label side when it is small enough)
    return nodes.join(lab, "id", "left").select(
        "id", F.coalesce("label", "id").alias("label")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. 2014): every node's
    strictly-LARGER neighbors re-point at the minimum of its closed
    neighborhood. Input/output are undirected edge SETS (orientation
    free); symmetrization happens here so callers hold one copy."""
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least(F.col("mn"), F.col("src")).alias("m"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge (larger → smaller),
    then each node and its smaller neighbors all re-point at the
    minimum of that closed smaller-neighborhood. Output edges are
    oriented src > dst (parent pointers)."""
    o = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
    )
    j = o.join(o.groupBy("src").agg(F.min("dst").alias("m")), "src")
    # (v, m) for every smaller neighbor v != m, plus (u, m) for the
    # center itself (m < u always: m <= every smaller neighbor < u)
    return (
        j.filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(j.select("src", F.col("m").alias("dst")))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 12,
    stats: dict | None = None,
) -> DataFrame:
    """``nodes(id)`` + undirected ``edges(src, dst)`` → ``(id, label)``
    with label = MIN node id of the connected component — identical
    contract to :func:`connected_components`, different round bound:
    alternating large-star/small-star (Kiveris et al., SOCC 2014)
    converges in O(log^2 n) rounds on ANY topology, where one-hop
    min-label propagation needs diameter-many rounds. Use this variant
    when the pair graph can contain long chains (e.g. near-dup edges
    from sliding/shingled similarity, where A~B~C chains without A~C).

    Scale shape: every round touches only the current edge set —
    candidate-pairs-bounded, never corpus-wide — with two
    key-partitioned hash shuffles (groupBy min + self-equijoin) and a
    `distinct`. Each round ends in a ``localCheckpoint``: both
    stars reference their input twice (aggregate + self-equijoin), so
    composing rounds lineage-style grows the LOGICAL plan 4^rounds —
    Catalyst re-analysis OOMs the driver near round 8 even on a
    64-node toy graph (measured; the plan-blowup class of VERDICT r3
    #1, hit in the analyzer instead of the executor). Truncating
    lineage per round keeps every plan one-round deep; blocks are
    executor-local and edge-graph-sized (GraphFrames' CC checkpoints
    for the same reason). Failure semantics: no lineage means losing
    an executor mid-query fails the query instead of recomputing —
    use reliable checkpoint() + a checkpoint dir on clusters with
    expected executor churn. Stability is an EXACT set compare of
    consecutive outputs (count + one-sided exceptAll on checkpointed
    frames); a stable small-star output is a fixed point of both
    stars, so early exit is label-identical. Isolated nodes join back
    once at the end (same single corpus-wide join as
    ``connected_components``, pinned by tests/test_cc_star.py)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # Round 1 reads `e` up to four times (each star references its
    # input twice: aggregate + self-equijoin), and `e` is typically
    # the OUTPUT of an expensive pair pipeline (MinHash verify, hash
    # self-join) — without this cache that upstream evaluates once per
    # reference (same class as the propagation variant's sym.persist).
    # Rounds ≥2 read checkpointed frames, so only round 1 needs it.
    e = e.persist()
    first_input = e
    prev: DataFrame | None = None
    prev_cnt: int | None = None
    rounds = 0
    for _ in range(max_iter):
        # non-eager: the count below materializes the checkpoint, so
        # each round is ONE action (+ a conditional exceptAll probe on
        # two already-checkpointed, edge-graph-sized frames)
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur_cnt = nxt.count()
        rounds += 1
        if prev is not None and cur_cnt == prev_cnt:
            if nxt.exceptAll(prev).isEmpty():
                e = nxt
                break
        prev, prev_cnt, e = nxt, cur_cnt, nxt
    first_input.unpersist()
    if stats is not None:
        # observability for the round-count contract: callers assert
        # clique-shaped graphs (the dedup-cluster case) close in ≤3
        # rounds including the stability-detect round
        stats["rounds"] = rounds
    # converged star state: every non-min node points at its component
    # min (groupBy-min collapses any multi-parent rows). Component
    # minima never appear as src at convergence, so synthesize their
    # (m, m) self-rows — but ONLY for labels not already present as
    # ids: on the max_iter cutoff path a node can still be src with a
    # stale label while also being some other node's label, and an
    # unconditional roots-union would emit that id twice with
    # conflicting labels. With the anti-join, cutoff degrades to
    # stale-but-unique labels — one row per id, same contract as the
    # propagation variant (pinned by tests/test_cc_star.py).
    lab = (
        e.groupBy("src")
        .agg(F.min("dst").alias("label"))
        .select(F.col("src").alias("id"), "label")
    )
    roots = (
        lab.select(F.col("label").alias("id"))
        .distinct()
        .join(lab.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("label"))
    )
    lab = lab.unionByName(roots)
    # the final round's localCheckpoint blocks belong to the returned
    # plan; superseded rounds' blocks are freed when their Python refs
    # drop (py4j finalizer → ContextCleaner). NOTE:
    # spark.catalog.clearCache() does NOT free checkpoint RDD blocks —
    # only InMemoryRelations — so long sessions reclaim them via GC,
    # not the registry's between-query cache clear.
    return nodes.join(lab, "id", "left").select(
        "id", F.coalesce("label", "id").alias("label")
    )
