"""Graph operators over edge-list DataFrames (SURVEY.md 2.2/2.4/2.7).

The reference's Graph wraps a sparse COO tensor collapsed to a scipy
adjacency (/root/reference/spartan/tensor/graph.py:14-37); the
relational encoding of that COO is simply an edge DataFrame
(src, dst, props..., value), and every graph op becomes a composition:

- adjacency collapse  graph.py:32 / cpu_backend/tensor.py:596-601
- degrees + histogram graph.py:123-145
- subgraph            graph.py:60-121 (semi-joins)
- graph difference    util/geneutil.py (anti-join)
- dictionary encoding basicutil.py:150-160 (dense ids via dimension table)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from spartan2_spark.operators.barrier import barrier

__all__ = [
    "adjacency",
    "degrees",
    "degree_histogram",
    "subgraph",
    "graph_minus",
    "encode_ids",
    "kcore",
    "connected_components",
    "triangle_counts",
    "clustering_coeff",
    "pagerank_fixedpoint",
    "ppr_fixedpoint",
    "label_propagation",
    "neighbor_jaccard",
    "degree_assortativity",
    "graph_reciprocity",
]


def adjacency(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    value: str | None = None,
    weighted: bool = True,
    bipartite: bool = True,
) -> DataFrame:
    """Collapse multi-edges to (src, dst, weight); binarize if
    unweighted; symmetrize if non-bipartite (graph.py:35-37)."""
    w = F.sum(value) if value else F.count(F.lit(1))
    adj = edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst")).agg(
        w.cast("double").alias("weight")
    )
    if not weighted:
        adj = adj.withColumn("weight", F.lit(1.0))
    if not bipartite:
        rev = adj.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        adj = (
            adj.unionByName(rev)
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
    return adj


def degrees(edges: DataFrame, node: str = "src", distinct_to: str | None = None) -> DataFrame:
    """Out-degree per node; ``distinct_to`` counts distinct neighbours."""
    agg = (
        F.countDistinct(distinct_to) if distinct_to else F.count(F.lit(1))
    ).alias("degree")
    return edges.groupBy(F.col(node).alias("node")).agg(agg)


def degree_histogram(deg: DataFrame) -> DataFrame:
    """np.bincount analogue (graph.py:139-145)."""
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def subgraph(
    edges: DataFrame, rows: DataFrame, cols: DataFrame, src="src", dst="dst"
) -> DataFrame:
    """Edges whose endpoints fall in the given node sets (semi-joins)."""
    rows = rows.withColumnRenamed(rows.columns[0], src).select(src)
    cols = cols.withColumnRenamed(cols.columns[0], dst).select(dst)
    return edges.join(rows, src, "left_semi").join(cols, dst, "left_semi")


def graph_minus(a: DataFrame, b: DataFrame, src="src", dst="dst") -> DataFrame:
    """Edges of a not present in b (anti-join on endpoints)."""
    return a.join(b.select(src, dst), [src, dst], "left_anti")


def kcore(
    edges: DataFrame, k: int, src: str = "src", dst: str = "dst", max_rounds: int = 50
) -> DataFrame:
    """k-core of an undirected multigraph: iteratively drop nodes with
    degree < k until fixpoint — the distributed batch analogue of the
    reference's MinTree-driven greedy peeling (util/MinTree.py:5-43;
    fraudar/greedy.py:173-244 removes one min-degree node at a time;
    the k-core rounds remove all of them at once, O(log n) rounds).

    Returns (node, degree) of surviving nodes. Each round is one
    groupBy + two semi-joins; ``barrier()`` truncates the
    iterative lineage (same discipline as densest_subgraph_peel).
    """
    cur = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).transform(barrier)
    prev_n = cur.count()
    converged = False
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("s").alias("n"))
            .unionAll(cur.select(F.col("d").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("degree"))
            .transform(barrier)
        )
        keep = deg.filter(F.col("degree") >= k).select("n")
        nxt = (
            cur.join(keep.withColumnRenamed("n", "s"), "s", "left_semi")
            .join(keep.withColumnRenamed("n", "d"), "d", "left_semi")
            .transform(barrier)
        )
        n = nxt.count()
        if n == prev_n:
            cur = nxt
            converged = True
            break
        cur, prev_n = nxt, n
    if not converged:
        # a silent partial peel would report a k-core for graphs whose
        # true k-core is empty (e.g. long paths peel two nodes/round)
        raise RuntimeError(
            f"kcore did not reach a fixpoint within {max_rounds} rounds; "
            "raise max_rounds (each round strictly shrinks the edge set)"
        )
    return (
        cur.select(F.col("s").alias("n"))
        .unionAll(cur.select(F.col("d").alias("n")))
        .groupBy(F.col("n").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def encode_ids(
    edges: DataFrame, col: str, shared_with: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Deterministic dense id assignment for a node column — the
    relational analogue of the reference's StringMapper (insertion order
    replaced by sort order, which is the deterministic choice in a
    distributed setting). ``shared_with`` contributes additional rows
    to the key universe — the shared-mapper semantics for homogeneous
    graphs (basicutil.py:128-134), so both edge sets encode against one
    id space. Returns (encoded edges, dimension table).

    The dimension join is left to the planner: with AQE on, a small
    dimension broadcasts; an unbounded one (10^9 distinct nodes) sort-
    merge-joins instead of OOMing the driver with a forced broadcast.
    """
    from spartan2_spark.operators.partitioning import global_dense_ids

    keys = edges.select(F.col(col).alias("node_key"))
    if shared_with is not None:
        keys = keys.unionByName(
            shared_with.select(F.col(col).alias("node_key"))
        )
    dim = global_dense_ids(keys.distinct(), "node_key", "node_id")
    enc = (
        edges.join(dim, edges[col] == dim.node_key)
        .drop("node_key", col)
        .withColumnRenamed("node_id", col)
    )
    return enc, dim


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    dedup_edges: bool = True,
) -> DataFrame:
    """Connected components of an undirected graph, labeled by the
    minimum node id in the component — frontier (delta) min-label
    propagation with pointer jumping over the symmetrized edge set
    (one scalar action + two barrier()s per round, the same
    iterative-plan discipline as :func:`kcore`).

    Deterministic: labels are min ids, independent of partitioning and
    join order — any SQL engine's transitive closure lands on the same
    labels, which is what makes downstream canonical-document picks
    twin-checkable. Returns (node, component).

    Plan shape (r5 rework, labels proven identical to the full-label
    formulation on the sf0.1 pair graph and the chain/clique pytests):

    * round-1 propagate is FUSED into label init — ``min(node, min
      neighbor)`` is one map-side-combinable agg over the partitioned
      edge relation, replacing a distinct-shuffle init plus a full
      propagate round;
    * each subsequent propagate joins the edges against the FRONTIER
      (labels whose component changed last round) instead of all
      labels. Min-propagation is monotone, so a node can only improve
      via a neighbor whose label improved since it last looked — the
      delta join is exact, and in the convergence tail (frontiers of a
      handful of rows) AQE broadcasts the frontier instead of
      shuffling a node-sized relation;
    * the change flag is folded into the pointer-jump projection, so
      a round checkpoints twice (stepped + jumped), not three times.

    ``dedup_edges=False`` skips the pre-loop ``distinct`` shuffle for
    callers whose edge list is unique by construction (e.g. minhash
    pair output with id_a < id_b): duplicate edges would only inflate
    propagate-join volume, never change labels.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if dedup_edges:
        e = e.distinct()
    # partition the (static) edge relation on its join key ONCE: the
    # checkpoint preserves the hash partitioning, so the per-round
    # propagate join reshuffles only the (small, moving) frontier —
    # at web scale the edge side is the bulk
    e = e.repartition(F.col("v")).transform(barrier)
    # fused init: component_0 = min(node, min neighbor) — exactly the
    # result of one propagate round over identity labels
    labels = (
        e.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("nbr"))
        .select("node", F.least(F.col("node"), F.col("nbr")).alias("component"))
        .transform(barrier)
    )
    frontier = labels
    for _ in range(max_rounds):
        prop = (
            e.join(frontier.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr"))
        )
        stepped = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nbr", "component")).alias(
                    "component"
                ),
                F.col("component").alias("prev"),
            )
            # consumed twice below (label side + parent side of the
            # jump join) — materialize once
            .transform(barrier)
        )
        # pointer jumping: component <- label(component). Labels are
        # always node ids, so the self-join resolves each node's label
        # one hop further — the frontier doubles per round and the
        # loop converges in O(log diameter) rounds instead of
        # O(diameter). Min semantics are unchanged (labels only ever
        # decrease toward the component min), so the fixpoint — and
        # the recursive-CTE oracle twin — is identical.
        parents = stepped.select(
            F.col("node").alias("component"), F.col("component").alias("pcomp")
        )
        nxt = (
            stepped.join(parents, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("pcomp", "component")
                ).alias("component"),
                "prev",
            )
            .withColumn("chg", F.col("component") != F.col("prev"))
            .drop("prev")
            .transform(barrier)
        )
        # convergence check is a scan of the just-checkpointed result
        # (no join, no extra shuffle)
        changed = nxt.filter(F.col("chg")).count()
        labels = nxt.drop("chg")
        if changed == 0:
            return labels
        frontier = nxt.filter(F.col("chg")).drop("chg")
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(component diameter exceeds max_rounds); raise it"
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation on an undirected simple graph —
    the clustering/cohesion primitive (Watts-Strogatz family metrics,
    spam-farm detection).

    Canonical-orientation algorithm: orient every edge low->high, then
    one self-join builds wedges (a<b<c via a-b, b-c) and a second
    semi-checks the closing a-c edge — each triangle is found exactly
    once, no post-dedup. Two shuffle joins on node ids; the classic
    skew control at scale is degree-ordering (orient by (degree, id)
    instead of id) so hubs fan out less — id-orientation is kept here
    for engine-portable determinism.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .transform(barrier)
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    ).distinct()
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
    damping_num: int = 85,
    damping_den: int = 100,
    scale_bits: int = 30,
) -> DataFrame:
    """PageRank in pure integer arithmetic: rank mass starts at
    2^scale_bits per node and each round moves
    floor(x_u / outdeg_u) along every edge, damped rationally:
    x'_v = (teleport*S) DIV den + (num * in_mass) DIV den.

    Integer DIV (not float division + floor: at rank masses beyond
    2^44 a double quotient's ulp exceeds 1/outdeg and the floor can
    disagree with exact integer division) makes every round bit-exact
    on any SQL engine. Dangling-node mass decays to teleport (the
    standard simplification; redistribute it with one extra agg if the
    strict random surfer is needed). Size scale_bits so
    n_nodes * 2^scale_bits * damping_num < 2^63.

    One join + agg per round, barrier() lineage truncation —
    the same iterative discipline as kcore/peels. Returns
    (node, rank_mass) after ``rounds`` rounds.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).transform(barrier)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .transform(barrier)
    )
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    scale = 1 << scale_bits
    teleport = (damping_den - damping_num) * scale
    x = nodes.withColumn("rank_mass", F.lit(scale).cast("long"))
    for _ in range(rounds):
        contrib = (
            e.join(x.withColumnRenamed("node", "u"), "u")
            .join(outdeg.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                F.expr("rank_mass div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        x = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.lit(damping_num) * F.coalesce("in_mass", F.lit(0))
                ).alias("num"),
            )
            .select("node", F.expr(f"num div {damping_den}").alias("rank_mass"))
            .transform(barrier)
        )
    return x


def ppr_fixedpoint(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
    damping_num: int = 85,
    damping_den: int = 100,
    scale_bits: int = 30,
) -> DataFrame:
    """Personalized PageRank from a seed set, in the same pure-integer
    fixed-point discipline as ``pagerank_fixedpoint``: rank mass starts
    at 2^scale_bits on each SEED node (0 elsewhere) and the teleport
    term re-injects (den-num)*2^scale_bits ONLY at seeds each round —
    x'_v = ([v in S] * teleport + num * in_mass_v) div den. After
    ``rounds`` rounds the mass concentrates in the seeds' neighborhood:
    the "similar nodes to this fraud cluster" expansion probe
    (HoloScope's reference seed-propagation, holoscopeFraudDect.py,
    re-expressed as the standard PPR recurrence). Per-seed-uniform
    normalization is a constant factor (n_seeds), irrelevant to ranking.

    Exactness: identical to pagerank_fixedpoint — integer DIV per
    round, so every round is bit-exact on any engine; a fixed-unroll
    SQL twin replays it value-exactly.

    Plan shape per round: one equi-join edges x ranks (only nodes with
    mass > 0 carry rows after the first round filter), one hash
    aggregate, one broadcast-able seed flag join; lineage truncated
    through barrier() like every iterative op here.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).transform(barrier)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .transform(barrier)
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    seeded = nodes.join(
        s.withColumn("__is_seed", F.lit(1)), "node", "left"
    ).select("node", F.coalesce("__is_seed", F.lit(0)).alias("is_seed"))
    seeded = seeded.transform(barrier)
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    scale = 1 << scale_bits
    teleport = (damping_den - damping_num) * scale
    x = seeded.select(
        "node", (F.col("is_seed") * scale).cast("long").alias("rank_mass")
    )
    for _ in range(rounds):
        contrib = (
            e.join(
                x.filter(F.col("rank_mass") > 0).withColumnRenamed("node", "u"),
                "u",
            )
            .join(outdeg.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                F.expr("rank_mass div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        x = (
            seeded.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.col("is_seed") * F.lit(teleport).cast("long")
                    + F.lit(damping_num) * F.coalesce("in_mass", F.lit(0))
                ).alias("num"),
            )
            .select("node", F.expr(f"num div {damping_den}").alias("rank_mass"))
            .transform(barrier)
        )
    return x.filter(F.col("rank_mass") > 0)


def label_propagation(
    edges: DataFrame, src: str = "src", dst: str = "dst", rounds: int = 4
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), determinized: every node simultaneously adopts the most
    frequent label among its neighbours, ties broken by the SMALLEST
    label — a total order, so the evolution is identical in any engine
    and at any parallelism (async LPA's visit-order dependence is what
    makes the classic algorithm irreproducible).

    Fixed ``rounds`` (synchronous LPA can 2-cycle on bipartite
    structures, so a fixpoint test alone may never fire; bounded
    rounds + the deterministic tie-break give a well-defined result).
    One join + count + argmax window per round, barrier()
    lineage truncation. Returns (node, label).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .transform(barrier)
    )
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(barrier)
    )
    pick = W.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(rounds):
        votes = (
            e.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .transform(barrier)
        )
    return labels


def clustering_coeff(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node on the undirected simple
    graph: cc = 2T / (d(d-1)) — triangles from triangle_counts, degree
    from the deduplicated edge set; nodes of degree < 2 report 0 (no
    possible wedge). Watts-Strogatz's per-node cohesion metric; low cc
    with high degree is the hub-spammer signature EigenSpokes-family
    detectors look for.

    Exact integers + one division. Reuses triangle_counts' two-join
    plan plus one degree aggregation.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tri = triangle_counts(edges, src, dst)
    cc = F.when(
        F.col("degree") >= 2,
        2 * F.col("n_triangles")
        / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(0.0)
    return tri.join(deg, "node").select(
        "node",
        "degree",
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.round(cc, 8).alias("clustering_coeff"),
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support on an oriented (u < v) distinct edge
    set: triangle (a < b < c) contributes one support unit to each of
    its three edges (a,b), (b,c), (a,c) — all already in canonical
    orientation, so the attribution is a plain unionAll + groupBy with
    no re-orientation. Returns (u, v, support), triangle-free edges
    absent (support joins back as 0).
    """
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    return (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """k-truss of an undirected simple graph: the maximal subgraph in
    which every edge participates in at least k-2 triangles — the
    EDGE-cohesion dual of :func:`kcore`'s node peel, and the standard
    community-core extractor (a k-truss is always inside the (k-1)-core
    but prunes bridge/hub edges kcore keeps). Same batch-peel analogue
    of the reference's one-at-a-time MinTree peeling
    (util/MinTree.py:5-43): each round drops ALL under-supported edges
    at once, converging in O(log n) rounds on real graphs.

    Each round is triangle_counts' two-join wedge plan plus one
    aggregation; ``barrier()`` truncates the iterative lineage
    and two scalar counts per round drive convergence (the engine-wide
    iterative-plan discipline). Deterministic — the fixpoint is unique
    (the k-truss is a closure operator), so any engine's replay lands
    on the same edge set, which makes the fixed-unroll SQL twin
    value-exact: running MORE rounds than needed is the identity.

    Returns surviving edges (u, v, support) with support measured on
    the final fixpoint subgraph.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    cur = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .transform(barrier)
    )
    prev_n = cur.count()
    converged = prev_n == 0
    for _ in range(max_rounds):
        if converged:
            break
        keep = (
            _edge_support(cur)
            .filter(F.col("support") >= k - 2)
            .select("u", "v")
        )
        # inner semi-join: triangle-free edges (absent from support)
        # drop whenever k > 2
        if k > 2:
            nxt = cur.join(keep, ["u", "v"], "left_semi").transform(barrier)
        else:
            nxt = cur
        n = nxt.count()
        if n == prev_n:
            cur = nxt
            converged = True
            break
        cur, prev_n = nxt, n
    if not converged:
        raise RuntimeError(
            f"ktruss did not reach a fixpoint within {max_rounds} rounds; "
            "raise max_rounds (each round strictly shrinks the edge set)"
        )
    sup = _edge_support(cur)
    return cur.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def adamic_adar(
    edges: DataFrame,
    top_k: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Adamic–Adar link prediction on an undirected simple graph:
    for every NON-edge pair (u, v) with at least one common neighbor,
    score = sum over common neighbors z of 1/ln(deg(z)), returning the
    top_k candidates. The missing-link dual of `triangle_counts` /
    `clustering_coeff` (reference builds the co-occurrence graphs these
    run on via graph.py:30-88's STGraph; link scoring itself is an
    extension from Adamic & Adar 2003).

    Exactness discipline (same as clustering_coeff / zipf_slope): each
    1/ln(deg) term is quantized to round(1e6/ln(deg)) BIGINT BEFORE the
    cross-wedge sum, so the reduction is an order-independent integer
    sum; degree-1 nodes cannot be wedge centers (one neighbor => no
    pair), so ln's argument is always >= 2.

    Plan shape: symmetrize, one degree aggregate (broadcast onto the
    wedge join), the wedge self-equi-join on the center z (shuffle on
    z; fan-out is bounded upstream by the caller's degree cap, exactly
    like triangle_counts), an anti-join against the existing edge set,
    one hash aggregate on (u, v), and a global top-k (TakeOrdered —
    no single-partition sort).
    """
    e = edges.select(src, dst).unionAll(
        edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("d"))
    # degree-1 nodes cannot be wedge centers (one neighbor => no pair),
    # but under ANSI mode the 1/ln(d) expression must never be
    # EVALUATED at d=1 either — filter before projecting the weight
    wz = deg.filter(F.col("d") >= 2).select(
        F.col(src).alias("z"),
        F.round(F.lit(1000000.0) / F.log(F.col("d"))).cast("long").alias(
            "w"
        ),
    )
    half = e.select(F.col(src).alias("z"), F.col(dst).alias("nbr"))
    wedges = (
        half.alias("a")
        .join(half.alias("b"), "z")
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .join(F.broadcast(wz), "z")
        .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"), "w")
    )
    non_edges = wedges.join(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        ),
        ["u", "v"],
        "left_anti",
    )
    scored = non_edges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("w").cast("long").alias("score_q"),
    )
    return (
        scored.orderBy(F.desc("score_q"), F.asc("u"), F.asc("v"))
        .limit(top_k)
        .select(
            "u", "v", "n_common", (F.col("score_q") / 1000000.0).alias("aa_score")
        )
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of an undirected
    simple graph: the Pearson correlation of the degrees at the two
    ends of every edge — positive when hubs link to hubs (social
    shape), negative when hubs link to leaves (web/infrastructure
    shape). The one-number structural summary that tells a crawl
    whether its outlink graph looks organic or like a link farm
    (complements `clustering_coeff`'s local view and `zipf_slope`'s
    degree-tail view).

    Exactness: over the SYMMETRIZED edge list the x and y degree
    marginals are identical, so Pearson r collapses to
    ``(m*Sxy - Sx^2) / (m*Sxx - Sx^2)`` — numerator and denominator
    are EXACT BIGINT sums of products of integer degrees, emitted as
    columns, and the coefficient is ONE IEEE divide of the two: no
    sqrt, no float accumulation, bit-identical on any engine.
    (Bound: m*Sxy must stay under 2^63 — holds for any graph whose
    degree cap and edge count fit a production wedge-capped sample;
    at the full 100 TB graph, pre-aggregate per (du, dv) degree pair
    first, which keeps the same integers.)

    Plan shape: canonical-orientation dedup (one distinct), one degree
    aggregate, two broadcast joins of the O(nodes) degree relation onto
    the edge list, one global aggregate — a single pass over edges.
    """
    und = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).distinct()
    e = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = e.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    both = (
        e.join(F.broadcast(deg), "u")
        .withColumnRenamed("d", "du")
        .join(
            F.broadcast(deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
    )
    agg = both.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("du").cast("long").alias("sx"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("sxy"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("sxx"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "m",
        "sx",
        "sxy",
        "sxx",
        num.cast("long").alias("r_num"),
        den.cast("long").alias("r_den"),
        (num.cast("double") / den.cast("double")).alias("assortativity"),
    )


def graph_reciprocity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Reciprocity of a directed simple graph: the fraction of
    (deduped, loop-free) directed edges whose reverse edge also exists
    — the one-number mutuality summary that separates broadcast-shaped
    link graphs (news sites linking out, near-zero reciprocity) from
    exchange-shaped ones (blogrolls, link farms trading links) next to
    ``degree_assortativity``'s hub-mixing view.

    Exactness: counts are BIGINT (reciprocal membership via a
    self-semi-join on the swapped key); ``reciprocity`` is ONE IEEE
    divide of the two.

    Plan shape: one distinct on (src, dst), one self-join on the
    swapped equi-key (same exchange footprint as the distinct), one
    global count aggregate — a single data-sized shuffle family on the
    edge key.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    rec = e.join(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")),
        ["u", "v"],
        "left_semi",
    )
    agg = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        rec.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    return agg.select(
        "n_edges",
        "n_reciprocal",
        (
            F.col("n_reciprocal").cast("double") / F.col("n_edges").cast("double")
        ).alias("reciprocity"),
    )


def neighbor_jaccard(
    edges: DataFrame,
    top_k: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Neighbor-set Jaccard similarity for node pairs sharing at least
    one common neighbor — the set-overlap sibling of
    :func:`adamic_adar` (AA weights rare hubs; Jaccard normalizes by
    the union, so a pair of low-degree twins can outrank a pair glued
    together by one mega-hub). Returns the top_k pairs; unlike AA this
    scores ALL co-neighbor pairs, edges included (it is a node-
    similarity measure, not a missing-link ranker).

    Exactness: ``n_common`` and ``n_union = deg(u) + deg(v) - common``
    are exact BIGINTs; ``jaccard`` is the single IEEE divide of exact
    sub-2^53 integers (correctly rounded, bit-identical cross-engine);
    the top-k cut orders by the TOTAL order (jaccard DESC, u, v) so
    the returned set is engine-deterministic even at score ties.

    Plan shape: symmetrize, wedge self-equi-join on the center
    (shuffle on z, fan-out bounded by the caller's degree cap exactly
    as in ``triangle_counts``), one (u, v) hash aggregate, degrees
    broadcast onto the bounded pair relation (drop the hint for a
    shuffle join if a full-corpus degree table outgrows the broadcast
    budget — same caveat as ``adamic_adar``), global top-k via
    TakeOrderedAndProject — never a full sort.
    """
    e = edges.select(src, dst).unionAll(
        edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )
    deg = e.groupBy(F.col(src).alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    half = e.select(F.col(src).alias("z"), F.col(dst).alias("nbr"))
    pairs = (
        half.alias("a")
        .join(half.alias("b"), "z")
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    scored = (
        pairs.join(
            F.broadcast(deg.select(F.col("n").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
        .select(
            "u",
            "v",
            "n_common",
            (F.col("du") + F.col("dv") - F.col("n_common")).alias("n_union"),
            (
                F.col("n_common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("u"), F.col("v")
    ).limit(top_k)


def hits_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    scale_bits: int = 20,
) -> DataFrame:
    """HITS (Kleinberg 1999) hub/authority scores in pure integer
    arithmetic — the bipartite-flavored centrality PageRank can't
    express (a crawl frontier wants authorities; a seed list wants
    hubs). Each round: authority = sum of in-neighbor hub mass, then
    integer-rescale so max(authority) == 2^scale_bits; hubs likewise
    from the rescaled authorities. The max-rescale replaces the
    textbook L2 normalization: it is order-free integer arithmetic
    (DIV by the scalar max), preserves the RANKING exactly (the only
    thing HITS scores mean), and keeps every intermediate bounded by
    max_degree * 2^(2*scale_bits) — size scale_bits so that stays
    under 2^63 (degree < 2^23 at the default 20).

    Bit-exact on any engine: sums of longs + integer DIV, no floats
    anywhere (the pagerank_fixedpoint discipline,
    reference parity: spartan2 ships eigen-centrality via SVD —
    model/eigenspokes; HITS is its directed-graph sibling).

    Plan shape per round: two (edge join + agg) passes + a scalar max
    via an unpartitioned window over the NODE census; barrier()
    truncates lineage each round like kcore/pagerank.
    """
    if rounds < 1:
        raise ValueError("hits_fixedpoint needs rounds >= 1")
    scale = 1 << scale_bits
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).transform(barrier)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .transform(barrier)
    )
    glob = W.partitionBy()
    h = nodes.withColumn("h", F.lit(scale).cast("long"))
    a = None
    for _ in range(rounds):
        in_mass = (
            e.join(h.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("h").alias("m"))
        )
        a_raw = nodes.join(in_mass, "node", "left").select(
            "node", F.coalesce("m", F.lit(0)).cast("long").alias("a")
        )
        a = a_raw.select(
            "node",
            F.expr(
                f"(a * {scale}) div greatest(1L, max(a) over ())"
            ).alias("a"),
        ).transform(barrier)
        out_mass = (
            e.join(a.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("a").alias("m"))
        )
        h_raw = nodes.join(out_mass, "node", "left").select(
            "node", F.coalesce("m", F.lit(0)).cast("long").alias("h")
        )
        h = h_raw.select(
            "node",
            F.expr(
                f"(h * {scale}) div greatest(1L, max(h) over ())"
            ).alias("h"),
        ).transform(barrier)
    return a.withColumnRenamed("a", "auth_mass").join(
        h.withColumnRenamed("h", "hub_mass"), "node"
    )


def modularity_score(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity of a community assignment, in EXACT integer
    arithmetic — the quality score that says whether
    :func:`label_propagation`'s communities are real structure or
    noise. Per community c: intra-edge count ``e_in``, degree mass
    ``d_sum``, and the exact BIGINT numerator

        num_c = 4*m*e_in - d_sum^2        (Q_c = num_c / (4*m^2))

    so the GLOBAL Q is sum(num_c) / (4 m^2) — consumers sum the exact
    integers and divide once; summing per-community floats would be
    order-dependent. ``q_contrib`` is each community's single-divide
    share for direct reading.

    Input contract: ``edges`` is the undirected simple graph as one
    row per edge with src < dst (no self loops); ``labels`` assigns
    every edge endpoint a community.

    Plan shape: one symmetrized degree aggregate, two broadcast-able
    label joins (labels is node-sized), one intra-edge aggregate, one
    community aggregate, scalar m broadcast. Nothing is ever
    edge x edge.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("community")
    )
    m_rel = e.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    ein = (
        e.join(lab.withColumnsRenamed({"node": "u", "community": "cu"}), "u")
        .join(lab.withColumnsRenamed({"node": "v", "community": "cv"}), "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    dsum = (
        lab.join(deg, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("d_sum"),
        )
    )
    out = (
        dsum.join(ein, "community", "left")
        .crossJoin(F.broadcast(m_rel))
        .select(
            "community",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "d_sum",
            "m_edges",
        )
    )
    num = (
        F.lit(4) * F.col("m_edges") * F.col("e_in")
        - F.col("d_sum") * F.col("d_sum")
    )
    q_contrib = (
        num.cast("double")
        / (F.lit(4) * F.col("m_edges") * F.col("m_edges")).cast("double")
    )
    return out.select(
        "community",
        "n_nodes",
        "e_in",
        "d_sum",
        "m_edges",
        num.cast("long").alias("num"),
        q_contrib.alias("q_contrib"),
    )


def rich_club(
    edges: DataFrame,
    degree_cuts: tuple[int, ...] = (2, 4, 8, 16),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragon 2004) at a ladder of
    degree cuts — "do the hubs preferentially link to each other?",
    the elite-connectivity complement of :func:`degree_assortativity`
    (which averages over ALL edges): for each cut k, the nodes with
    degree > k and the exact density of the subgraph they induce,

        phi(k) = 2 * e_k / (n_k * (n_k - 1))

    A crawl hostgraph with phi rising toward 1 at high k has a
    tightly-coupled hub core (link farms / CDN clusters); a flat phi
    is hub-egalitarian.

    Input contract: one row per undirected edge with src < dst, no
    self loops (the :func:`modularity_score` contract).

    Exactness: node and induced-edge counts are exact BIGINTs; phi is
    ONE IEEE divide per cut. n_k < 2 emits NULL (no pairs to close).

    Plan shape: one symmetrized degree aggregate (barriered — every
    cut reuses it), then per cut two broadcast-able semi-joins of the
    edge list against the (tiny) rich-node set + 1-row counts; the
    cuts relation unions. Nothing is ever edge x edge.
    """
    if not degree_cuts:
        raise ValueError("need at least one degree cut")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).transform(
        barrier
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .transform(barrier)
    )
    out = None
    for k in degree_cuts:
        rich = deg.filter(F.col("deg") > int(k)).select("node")
        nk = rich.agg(F.count(F.lit(1)).cast("long").alias("n_k"))
        ek = (
            e.join(rich.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(rich.withColumnRenamed("node", "v"), "v", "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
        )
        row = nk.crossJoin(ek).select(
            F.lit(int(k)).cast("long").alias("k"),
            "n_k",
            "e_k",
            F.when(
                F.col("n_k") >= 2,
                (F.lit(2) * F.col("e_k")).cast("double")
                / (F.col("n_k") * (F.col("n_k") - 1)).cast("double"),
            ).alias("phi"),
        )
        out = row if out is None else out.unionByName(row)
    return out
