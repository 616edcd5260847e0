"""Graph analytics over relational co-occurrence graphs (round 8;
LLM-pipeline + ETL extension — no reference analog: the reference joins
tables, it never derives a graph from them).

Two classic operators a 100 TB pipeline reaches for once entities are
resolved (connected components live in operators/dedup.py):

- TRIANGLE COUNTING — the clustering-coefficient numerator; integer
  output, so cross-engine determinism is free.
- PAGERANK — influence scoring over the co-occurrence graph. Iterative
  float PageRank is NOT oracle-checkable (per-engine summation order
  drifts and the error compounds per iteration), so this is FIXED-POINT
  PageRank: ranks are integer nano-units (scale 1e9), per-node
  contributions are floor divisions, and sums are exact integer sums —
  order-free, bit-exact in both engines, the kmeans integer-quantization
  determinism contract (operators/similarity.py::_kmeans_assignments)
  applied to graph iteration. The fixed-point values sit within
  iters × (1/scale + degree rounding) of true float PageRank; what the
  engine guarantees is that BOTH engines compute the SAME number.

Scale shape: triangle counting is two self-joins on the (src < dst)
edge list with map-side degree pruning available; PageRank is one keyed
shuffle per iteration (contributions grouped by destination) over an
edge list annotated with out-degrees once, lineage cut per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**9
PAGERANK_DAMPING_PCT = 85  # d = 0.85 as an exact rational
PAGERANK_ITERS = 10
# Convergence-driven stop (round 9, VERDICT r8 #3): iterate until the
# L1 delta between successive iterates is <= PAGERANK_TOL_Q rank
# nano-units (2e5 = 0.0002 of total rank mass), capped at
# PAGERANK_MAX_ITERS.  Measured on the co-purchase graph: stops at
# iter 4 (sf0.01) and iter 9 (sf0.1) — the rule adapts to the graph
# instead of trusting a fixed count.
PAGERANK_TOL_Q = 200_000
PAGERANK_MAX_ITERS = 16


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Distinct undirected co-occurrence edges (src < dst): two items
    are connected iff they appear in the same order. One groupBy(order)
    + in-row pair expansion (the capped-bucket machinery is not needed:
    an order's line count is schema-bounded at 7 in TPC-H-shaped data,
    so per-group pair counts are tiny) + one distinct."""
    from pos_pipeline_core_etl_spark.operators.dedup import upper_triangle_pairs

    grouped = (
        lineitem.select(
            F.col(order_col).alias("g"), F.col(item_col).alias("item")
        )
        .groupBy("g")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
        .where(F.size("items") > 1)
    )
    pairs = upper_triangle_pairs(
        ids_col="items",
        build=lambda x, y: F.struct(x.alias("src"), y.alias("dst")),
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles) for every node of the (src < dst) edge list
    that participates in at least one triangle. Classic ordered
    three-way self-join: (a<b) ⋈ (b<c) ⋈ (a<c) enumerates each triangle
    exactly once; each triangle credits its three corners. Integer
    output — the determinism-free-by-construction graph statistic."""
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def triangle_counts_oriented(edges: DataFrame) -> DataFrame:
    """Degree-ordered triangle counting (VERDICT r8 #4) — same output
    as :func:`triangle_counts`, different join geometry.

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to its higher one; in the resulting DAG every triangle
    {x, y, z} with x < y < z in that total order appears exactly once
    as the wedge x->y, x->z closed by y->z.  The wedge join therefore
    enumerates sum_u C(outdeg+(u), 2) candidates where outdeg+ is the
    ORIENTED out-degree — bounded by O(m^1.5) overall (the standard
    compact-forward bound) — instead of the plain ordered join's
    sum_v |{a < v}| x |{c > v}|, which degenerates quadratically when
    a high-degree hub sits mid-way in the id order (a power-law graph
    with arbitrary ids).  On TPC-H-shaped co-purchase graphs the
    degree cap saturates and both forms are dim-bounded; the oriented
    form is the one that survives the 100x power-law case
    (equality is test-pinned, the blowup ladder-measured).

    One degree aggregation + one broadcast-or-shuffle annotate join,
    then the same three-relation equi-join shape as the plain form —
    no new shuffle class."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = (
        edges.join(deg.select(F.col("src"), F.col("deg").alias("deg_s")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("deg_d")),
            "dst",
        )
    )
    ks = F.struct(F.col("deg_s").alias("d"), F.col("src").alias("i"))
    kd = F.struct(F.col("deg_d").alias("d"), F.col("dst").alias("i"))
    fwd = ks < kd  # total order: ties in degree break by node id
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, kd).otherwise(ks).alias("vkey"),
    )
    o1 = oriented.select("u", F.col("v"), F.col("vkey"))
    o2 = oriented.select(
        "u", F.col("v").alias("w"), F.col("vkey").alias("wkey")
    )
    wedges = o1.join(o2, "u").where(F.col("vkey") < F.col("wkey")).select(
        "u", "v", "w"
    )
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"])
    corners = tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping_pct: int = PAGERANK_DAMPING_PCT,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """(node, rank_q): fixed-point PageRank after ``iters`` synchronous
    iterations over the symmetrized (src < dst) edge list. rank_q is the
    rank in integer ``1/scale`` units.

    Update rule (all integer, both engines):
        contrib(u)  = rank_q(u) DIV outdeg(u)
        rank_q'(v)  = base_q + (damping_pct * Σ_{u→v} contrib(u)) DIV 100
        base_q      = ((100 - damping_pct) * scale) DIV (100 * n)

    Every node has outdeg >= 1 (the node set IS the edge endpoints of an
    undirected graph), so there is no dangling mass to redistribute;
    floor division leaks a deterministic dust of rank mass instead —
    documented, identical cross-engine. The node count n is a bounded
    scalar (one count over the node set — graph-dimension-sized, the
    bounded-scalar class of collect).

    Per iteration: one join of the degree-annotated edge list with the
    current ranks + one keyed sum by destination; the edge list is
    checkpointed once, ranks lineage-cut per round (the
    connected_components loop discipline)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    annotated, nodes, n = _pagerank_setup(edges)
    if n == 0:
        # an empty edge list must yield an empty rank table, not a
        # ZeroDivisionError in the base-term arithmetic (second-pass
        # re-read, SELFREVIEW_r8)
        return nodes.withColumn("rank_q", F.lit(0).cast("long"))
    ranks = nodes.withColumn("rank_q", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        ranks = _pagerank_step(annotated, nodes, ranks, n, damping_pct, scale)
    return ranks


def _pagerank_setup(edges: DataFrame):
    """Shared iteration setup: symmetrized + degree-annotated edge list
    (checkpointed once), the node set, and its bounded count.

    r12 note (measured, guide §1): caching the annotated list
    HASH-PARTITIONED on ``src`` (SQL cache preserves partitioning, so
    the probed loop's per-round edge exchange disappears) was TRIED
    and REVERTED — the per-round InMemoryTableScan columnar decode of
    the 2E-row cache cost far more than the small exchange it removed
    (graph_part_pagerank_tol executor time 0.7 → 14.9 s, wall
    3.5 → 4.9 s).  The checkpoint (serialized row blocks) stays the
    cheapest per-round source at bench scale; at cluster scale the
    lazy loops pay the exchange once per ACTION via ReuseExchange
    anyway."""
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    annotated = sym.join(deg, "src").localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node")).localCheckpoint(eager=True)
    return annotated, nodes, nodes.count()


def _pagerank_step(
    annotated: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    n: int,
    damping_pct: int,
    scale: int,
) -> DataFrame:
    """ONE synchronous fixed-point iteration (see update rule above)."""
    base_q = ((100 - damping_pct) * scale) // (100 * n)
    contrib = annotated.join(ranks, annotated.src == ranks.node).select(
        F.col("dst").alias("node"),
        F.expr("rank_q DIV outdeg").alias("c"),
    )
    sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
    return (
        nodes.join(sums, "node", "left")
        .select(
            "node",
            (
                F.lit(base_q)
                + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100")
            )
            .cast("long")
            .alias("rank_q"),
        )
        .localCheckpoint(eager=False)
    )


def _pagerank_step_delta(
    annotated: DataFrame,
    ranks: DataFrame,
    n: int,
    damping_pct: int,
    scale: int,
) -> DataFrame:
    """:func:`_pagerank_step` fused with its own convergence probe
    input: returns the lazily-checkpointed ``(node, prev_q, rank_q)``
    iterate (r12, guide §2.4 — remove shuffles outright).

    The convergence loops previously re-joined ``ranks`` against the
    new iterate just to pair old and new rank per node — one extra
    node-sized shuffle join PER ROUND whose only purpose was the
    |delta| aggregate.  ``ranks`` carries exactly the node set (every
    iterate is produced by a left join FROM the node frame), so joining
    ``ranks`` (instead of ``nodes``) with the contribution sums yields
    the same rank_q while the previous rank rides along as ``prev_q``
    for free; the probe then aggregates the checkpointed frame with no
    join at all.  Per round this deletes one join + two node-sized
    exchange sides at ANY scale — the 100 TB win is proportional to
    the node count, the local win is the per-round stage/planning
    overhead (profile: graph_part_pagerank_tol was 90 jobs with 0.7
    executor-seconds — pure per-round fixed cost)."""
    base_q = ((100 - damping_pct) * scale) // (100 * n)
    contrib = annotated.join(ranks, annotated.src == ranks.node).select(
        F.col("dst").alias("node"),
        F.expr("rank_q DIV outdeg").alias("c"),
    )
    sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
    return (
        ranks.join(sums, "node", "left")
        .select(
            "node",
            F.col("rank_q").alias("prev_q"),
            (
                F.lit(base_q)
                + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100")
            )
            .cast("long")
            .alias("rank_q"),
        )
        .localCheckpoint(eager=False)
    )


def pagerank_converged(
    edges: DataFrame,
    tol_q: int = PAGERANK_TOL_Q,
    max_iters: int = PAGERANK_MAX_ITERS,
    damping_pct: int = PAGERANK_DAMPING_PCT,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """(node, rank_q, stop_iter): fixed-point PageRank iterated UNTIL
    the L1 distance between successive iterates is <= ``tol_q`` rank
    nano-units, capped at ``max_iters`` — the composition of the rank
    loop with its own convergence audit (``pagerank_l1_trajectory``),
    whose docstring calls fixed iteration counts "an act of faith"
    (VERDICT r8 #3).

    Every quantity stays integer, so the STOPPING ITERATION itself is
    bit-exact cross-engine: both engines walk the same integer
    trajectory and therefore stop at the same iteration, which is why
    stop_iter can sit in the oracle-checked output.  The per-iteration
    convergence check is one bounded 1-row aggregate (sum of |delta|
    over the node set — the same dimension class as the setup's node
    count); iteration cost is otherwise identical to
    ``pagerank_fixedpoint``.  A healthy damped walk contracts roughly
    geometrically until the integer-dust floor (~nodes x rounding), so
    ``tol_q`` must sit above that floor for the graph dimension at
    hand — at the floor the delta plateaus instead of shrinking."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    annotated, nodes, n = _pagerank_setup(edges)
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_q"),
            F.lit(0).cast("long").alias("stop_iter"),
        )
    from pos_pipeline_core_etl_spark.operators.dedup import _release_checkpoint

    ranks = nodes.withColumn("rank_q", F.lit(scale // n).cast("long"))
    prev_ckpt: DataFrame | None = None
    stop = max_iters
    # r12 (guide §1 profile: 65 jobs, 0.57 executor-seconds — the loop's
    # wall is per-ACTION driver overhead, not executor work): after the
    # first two rounds, iterates are probed in PAIRS — one collect
    # returns both rounds' L1 deltas (each iterate carries its own
    # prev_q, so the probe is still join-free).  stop_iter stays
    # bit-exact: the batch's per-round deltas are the same integers the
    # one-probe-per-round loop computed, the first delta <= tol_q wins,
    # and the RETURNED ranks are that round's iterate (both batch
    # iterates are checkpointed; the loser is released).  Cost: at most
    # one wasted round, only when the walk stops on the first round of
    # a pair — against half the driver round-trips on the long tail of
    # a converging walk.
    delta_agg = lambda df: df.agg(  # noqa: E731
        F.sum(F.abs(F.col("rank_q") - F.col("prev_q"))).alias("d")
    )
    i = 0
    while i < max_iters:
        batch = 1 if i < 2 else min(2, max_iters - i)
        iterates = []
        cur = ranks
        for _ in range(batch):
            nxt = _pagerank_step_delta(annotated, cur, n, damping_pct, scale)
            iterates.append(nxt)
            cur = nxt.select("node", "rank_q")
        # explicit round-index literal per aggregate (ADVICE r12): the
        # deltas are read by index, not by Union child order
        probe = delta_agg(iterates[0]).select(F.lit(0).alias("j"), "d")
        for jdx, it in enumerate(iterates[1:], 1):
            probe = probe.unionByName(
                delta_agg(it).select(F.lit(jdx).alias("j"), "d")
            )
        by_j = {r["j"]: r["d"] for r in probe.collect()}
        deltas = [by_j[j] for j in range(len(iterates))]
        # every iterate in the batch is now materialized — the previous
        # round's blocks can never be read again (connected_components
        # discipline — don't leak one node-sized frame per round)
        if prev_ckpt is not None:
            _release_checkpoint(prev_ckpt)
        hit = next(
            (j for j, d in enumerate(deltas) if d <= tol_q), None
        )
        if hit is not None:
            stop = i + hit + 1
            keep = iterates[hit]
            for it in iterates:
                if it is not keep:
                    _release_checkpoint(it)
            ranks = keep.select("node", "rank_q")
            return ranks.withColumn("stop_iter", F.lit(stop).cast("long"))
        for it in iterates[:-1]:
            _release_checkpoint(it)
        prev_ckpt = iterates[-1]
        ranks = prev_ckpt.select("node", "rank_q")
        i += batch
    return ranks.withColumn("stop_iter", F.lit(stop).cast("long"))


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping_pct: int = PAGERANK_DAMPING_PCT,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """(node, rank_q): personalized (seeded) fixed-point PageRank —
    the random walk restarts only at ``seeds`` (one column ``node``),
    so ranks measure proximity TO THE SEED SET rather than global
    influence: "parts co-purchased near THESE parts", the
    recommendation / expansion primitive. Same integer contract as
    :func:`pagerank_fixedpoint` (nano-unit ranks, floor-division
    contributions, order-free integer sums — bit-exact cross-engine);
    the only change is the restart term: base_q(v) =
    ((100-d)·scale) DIV (100·n_seeds) for seed nodes, 0 elsewhere,
    and the walk starts from the seed distribution (scale DIV n_seeds
    on seeds, 0 elsewhere). Seeds outside the node set are ignored
    (their mass never enters). Per-iteration cost identical to the
    global loop."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    annotated, nodes, n = _pagerank_setup(edges)
    seed_nodes = nodes.join(
        seeds.select(F.col("node")).distinct(), "node", "left_semi"
    ).localCheckpoint(eager=True)
    n_seeds = seed_nodes.count()
    if n == 0 or n_seeds == 0:
        return nodes.withColumn("rank_q", F.lit(0).cast("long"))
    base_q = ((100 - damping_pct) * scale) // (100 * n_seeds)
    init_q = scale // n_seeds
    seeded = seed_nodes.withColumn("is_seed", F.lit(True))
    annot_nodes = nodes.join(seeded, "node", "left").select(
        "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
    ).localCheckpoint(eager=True)
    ranks = annot_nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(init_q))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_q"),
    )
    for _ in range(iters):
        contrib = annotated.join(ranks, annotated.src == ranks.node).select(
            F.col("dst").alias("node"),
            F.expr("rank_q DIV outdeg").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            annot_nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), F.lit(base_q)).otherwise(F.lit(0))
                    + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100")
                )
                .cast("long")
                .alias("rank_q"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


KCORE_K = 3
KCORE_MAX_ROUNDS = 12


def kcore_nodes(
    edges: DataFrame, k: int = KCORE_K, max_rounds: int = KCORE_MAX_ROUNDS
) -> DataFrame:
    """(node, core_deg, stop_round): the k-core of the undirected
    (src < dst) edge list — the maximal subgraph where every node has
    degree >= k — by iterative peeling: drop nodes of degree < k,
    recompute degrees in the induced subgraph, repeat until stable.

    Determinism contract: everything is integer set algebra, so both
    engines walk the same peel sequence.  The live set shrinks
    monotonically, so "stable" == "this round's survivor count equals
    last round's" — ONE bounded scalar per round (the connected-
    components loop discipline).  The cap makes the output exact-equal
    to an oracle unrolled to the same cap REGARDLESS of where the
    fixpoint lands: if peeling stabilizes at round s <= cap the later
    unrolled rounds are no-ops; if it hasn't stabilized by the cap both
    engines agree on the round-cap set (stop_round then reads cap).
    core_deg is the node's degree within the final subgraph.

    Scale shape: each round is the symmetric edge list semi-joined to
    the live set on both endpoints + one keyed count — live shrinks
    every round, and real peel depths are small (measured 2-4 on the
    co-purchase graph); lineage cut per round."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    live = sym.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n_prev = live.count()
    stop = max_rounds
    deg = None
    for i in range(1, max_rounds + 1):
        kept = (
            sym.join(live.withColumnRenamed("node", "src"), "src")
            .join(live.withColumnRenamed("node", "dst"), "dst")
        )
        deg = (
            kept.groupBy("src")
            .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
            .where(F.col("core_deg") >= k)
            .localCheckpoint(eager=True)
        )
        n_now = deg.count()
        live = deg.select(F.col("src").alias("node"))
        if n_now == n_prev:
            stop = i
            break
        n_prev = n_now
    return deg.select(
        F.col("src").alias("node"),
        "core_deg",
        F.lit(stop).cast("long").alias("stop_round"),
    )


# Wedge-generation cap (round 10 — VERDICT r9 #4): a shared neighbor of
# degree d generates C(d, 2) wedges, so one power-law hub degenerates the
# wedge join quadratically.  Neighbors with degree > WEDGE_CAP are
# excluded from wedge GENERATION (they are the graph analog of
# stop-shingles: a hub everyone touches carries no similarity signal),
# and :func:`wedge_overflow` is the standing audit of what was skipped —
# the same cap + observability contract as LSH_MAX_BUCKET /
# CONTAIN_MAX_BUCKET / the fuzzy-blocking stop keys.
WEDGE_CAP = 4


def neighbor_jaccard_pairs(
    edges: DataFrame, threshold: float = 0.5, wedge_cap: int | None = None
) -> DataFrame:
    """(node_a, node_b, n_shared, jaccard): node pairs whose NEIGHBOR
    SETS overlap — structural near-duplicates in the graph (two items
    bought alongside the same basket-mates are interchangeable even if
    never co-purchased themselves; the graph-side analog of the
    document near-dup families).

    jaccard = |N(a) ∩ N(b)| / (deg(a) + deg(b) - |N(a) ∩ N(b)|),
    candidates generated by the wedge join (pairs sharing >= 1
    neighbor), so disjoint-neighborhood pairs are never materialized.

    ``wedge_cap`` (round 10): with a cap, only shared neighbors of
    degree <= cap generate wedges — the stop-key discipline every
    blocking family here carries, closing the power-law-hub hole the
    round-9 docstring named.  n_shared then counts capped wedges only
    while the denominator keeps TRUE degrees, so the capped jaccard is
    a LOWER BOUND of the exact one: every emitted pair is real
    (precision preserved), pairs whose overlap lives only on hubs are
    missed (recall capped — :func:`wedge_overflow` is the audit).
    With ``wedge_cap=None`` (or any cap >= the max degree) the output
    is exactly the uncapped form — equality test-pinned.
    hround(6) on the single final ratio (integer numerator and
    denominator, no accumulated-float risk)."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    wedge_src = sym
    if wedge_cap is not None:
        if wedge_cap < 1:
            raise ValueError(f"wedge_cap must be >= 1, got {wedge_cap}")
        ok = deg.where(F.col("deg") <= wedge_cap).select("src")
        wedge_src = sym.join(ok, "src")
    w1 = wedge_src.select(F.col("src").alias("n"), F.col("dst").alias("node_a"))
    w2 = wedge_src.select(F.col("src").alias("n"), F.col("dst").alias("node_b"))
    shared = (
        w1.join(w2, "n")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    from pos_pipeline_core_etl_spark.functions.rounding import hround

    da = deg.select(F.col("src").alias("node_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("node_b"), F.col("deg").alias("deg_b"))
    jac = F.col("n_shared") / (
        F.col("deg_a") + F.col("deg_b") - F.col("n_shared")
    )
    return (
        shared.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "n_shared",
            hround(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def wedge_overflow(edges: DataFrame, wedge_cap: int = WEDGE_CAP) -> DataFrame:
    """(node, deg, wedges_skipped): the standing audit for the capped
    wedge join — every hub :func:`neighbor_jaccard_pairs` excluded from
    wedge generation, with the C(deg, 2) wedge count the cap saved.
    Empty output == the cap never bound == capped ≡ exact; non-empty
    rows quantify the recall trade exactly (the fuzzy_phonetic_overflow
    / dedup_containment_overflow observability contract).  One degree
    agg + one filter — no join at all."""
    if wedge_cap < 1:
        raise ValueError(f"wedge_cap must be >= 1, got {wedge_cap}")
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return deg.where(F.col("deg") > wedge_cap).select(
        F.col("src").alias("node"),
        "deg",
        (F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("wedges_skipped"),
    )


def pagerank_l1_trajectory(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping_pct: int = PAGERANK_DAMPING_PCT,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """(iter, l1_delta_q): the L1 distance (in rank nano-units) between
    successive fixed-point iterates — the standing CONVERGENCE AUDIT for
    the PageRank loop. Fixed iteration counts without a convergence
    check are an act of faith; this audit makes the trajectory a
    first-class, exactly-checkable artifact (all quantities integers, so
    the cross-engine comparison is exact). A healthy damped walk
    contracts geometrically (factor ≈ damping); a regression in the
    update rule — wrong degree join, dropped base term, oscillation —
    shows up as a non-shrinking tail. Same per-iteration cost as the
    rank loop plus one tiny join + agg per step."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    annotated, nodes, n = _pagerank_setup(edges)
    if n == 0:
        return nodes.sparkSession.createDataFrame(
            [], "iter long, l1_delta_q long"
        )
    ranks = nodes.withColumn("rank_q", F.lit(scale // n).cast("long"))
    out = None
    for i in range(1, iters + 1):
        # fused iterate (r12): prev_q rides in the checkpointed frame,
        # so the per-iteration L1 delta is a plain agg — the old
        # ranks ⨝ nxt re-pair join (one node-sized shuffle per round)
        # is gone; see _pagerank_step_delta
        nxt = _pagerank_step_delta(annotated, ranks, n, damping_pct, scale)
        delta = nxt.agg(
            F.lit(i).cast("long").alias("iter"),
            F.sum(F.abs(F.col("rank_q") - F.col("prev_q")))
            .cast("long")
            .alias("l1_delta_q"),
        )
        out = delta if out is None else out.unionByName(delta)
        ranks = nxt.select("node", "rank_q")
    return out
