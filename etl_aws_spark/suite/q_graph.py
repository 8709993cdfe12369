"""Graph-analytics queries over derived co-occurrence graphs.

The dedup closure (`text_dedup_connected_components`, q_text.py) covers the
pairs→groups primitive; this module covers iterative *scoring* on a graph —
PageRank over the parts-bought-together graph, the classic recommendation
centrality. The SQL oracle replays the fixed iteration count as unrolled
CTEs, so the driver gate checks the actual propagation arithmetic, not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_aws_spark.operators import graph
from etl_aws_spark.registry import load, query
from etl_aws_spark.suite._util import rnd


def _duck_pr_round(prev: str, cur: str) -> str:
    """One unrolled PageRank iteration as a pair of CTEs."""
    return f"""
    i{cur} AS (
      SELECT p.d AS id, sum(r.rank / g.outdeg) AS m
      FROM pairs p JOIN r{prev} r ON p.s = r.id JOIN deg g ON p.s = g.s
      GROUP BY p.d
    ), r{cur} AS (
      SELECT v.s AS id, (1.0 - 0.85) / n.nv + 0.85 * coalesce(i{cur}.m, 0.0) AS rank
      FROM deg v CROSS JOIN n LEFT JOIN i{cur} ON v.s = i{cur}.id
    )"""


@query(
    "graph_pagerank_parts",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), deg AS (
      SELECT s, count(*) AS outdeg FROM pairs GROUP BY s
    ), n AS (
      SELECT CAST(count(*) AS DOUBLE) AS nv FROM deg
    ), r0 AS (
      SELECT s AS id, 1.0 / n.nv AS rank FROM deg CROSS JOIN n
    ),{_duck_pr_round('0', '1')},{_duck_pr_round('1', '2')},{_duck_pr_round('2', '3')}
    SELECT CAST(id AS BIGINT) AS p_partkey, round(rank, 8) + 0.0 AS rank
    FROM r3
    ORDER BY round(rank, 8) DESC, id ASC
    LIMIT 20
    """,
    category="graph",
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality on the bought-together parts graph: parts are
    linked when they share an order, three damped propagation rounds, top
    20. The pair expansion is bounded (≤ lines-per-order² per order, a
    small constant in this schema), so the edge build is one equi-join
    shuffle on orderkey; each round then moves only (src, dst, rank/deg) —
    the graph layer's iterative-scoring twin to the connected-components
    closure. Ranking on the *rounded* score (both engines) keeps the top-20
    cut deterministic across engines' float summation orders."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    ranks = graph.pagerank(edges, damping=0.85, n_iter=3, undirected=False)
    return (
        ranks.select(
            F.col("id").cast("long").alias("p_partkey"),
            rnd(F.col("rank"), 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("p_partkey"))
        .limit(20)
    )


@query(
    "graph_triangle_clustering",
    oracle="""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS MATERIALIZED (
      SELECT id, count(*) AS degree FROM (
        SELECT s AS id FROM pairs UNION ALL SELECT d AS id FROM pairs
      ) GROUP BY id
    ), oriented AS MATERIALIZED (
      SELECT CASE WHEN ds.degree < dd.degree
                    OR (ds.degree = dd.degree AND p.s < p.d)
                  THEN p.s ELSE p.d END AS u,
             CASE WHEN ds.degree < dd.degree
                    OR (ds.degree = dd.degree AND p.s < p.d)
                  THEN p.d ELSE p.s END AS v
      FROM pairs p JOIN deg ds ON p.s = ds.id JOIN deg dd ON p.d = dd.id
    ), adj AS MATERIALIZED (
      -- r11: sorted-adjacency intersection never materializes
      -- non-closing wedges (the shape that spilled >70 GB at sf1).
      -- r12 closes the REMAINING sf1 spill (>49 GB): CTEs are pinned
      -- MATERIALIZED so the planner sees exact cardinalities and builds
      -- every hash join on the 200k-row adjacency, not the 12M-edge
      -- probe stream; edges drop to only those with a non-empty
      -- intersection BEFORE tri_ab materializes; and the corner count
      -- reads tri_ab ONCE (a/b corners fold as len(cs), only the
      -- closing c vertices unnest) instead of three inlined replays.
      -- sf1 replay now completes in ~380 s within a 20 GB budget.
      SELECT u, list(v) AS nbrs FROM oriented GROUP BY u
    ), tri_ab AS MATERIALIZED (
      SELECT o.u AS a, o.v AS b, list_intersect(na.nbrs, nb.nbrs) AS cs
      FROM oriented o
      JOIN adj na ON o.u = na.u
      JOIN adj nb ON o.v = nb.u
      WHERE len(list_intersect(na.nbrs, nb.nbrs)) > 0
    ), corners AS (
      SELECT id, sum(n) AS n_triangles FROM (
        SELECT UNNEST([x.a, x.b]) AS id, len(x.cs) AS n
        FROM (SELECT a, b, cs FROM tri_ab) x
        UNION ALL
        SELECT UNNEST(cs) AS id, 1 AS n FROM tri_ab
      ) GROUP BY id
    )
    SELECT CAST(deg.id AS BIGINT) AS p_partkey,
           CAST(deg.degree AS BIGINT) AS degree,
           CAST(coalesce(c.n_triangles, 0) AS BIGINT) AS n_triangles,
           round(2.0 * coalesce(c.n_triangles, 0)
                 / nullif(CAST(deg.degree AS DOUBLE) * (deg.degree - 1), 0.0), 6)
             + 0.0 AS clustering
    FROM deg LEFT JOIN corners c USING (id)
    """,
    category="graph",
)
def graph_triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts and local clustering coefficients on the
    bought-together graph — the cohesion metric beside PageRank's
    centrality. Degree-ordered orientation (operators/graph.py
    triangle_stats) makes every triangle materialize exactly once and
    caps wedge-join fan-out at O(sqrt(|E|)) per vertex even under hub
    skew. Exact integer counting — the oracle replays the identical
    orientation rule."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # co-purchase pairs per order via ONE groupBy + combination explode
    # instead of a lineitem self-join: the per-order part set is tiny
    # (avg ~4), so Σk² explode output equals the join output, but the
    # plan drops the SMJ's two 600k-row sorts — measured 10-27% off the
    # whole query at sf0.1 (interleaved A/B), identical pair set.
    # No `.distinct()` (r12): triangle_stats' widened contract dedups
    # cross-order duplicates inside its one edge repartition for free.
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("pk")
    )
    # x != y emits BOTH directions of every co-purchase pair in one
    # Generate, so the operator skips its internal doubling
    # (symmetric=True) — one less 2.4M-struct explode
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(pk, x -> transform("
                "filter(pk, y -> y != x), "
                "y -> struct(x as s, y as d))))"
            )
        ).alias("p")
    ).select("p.s", "p.d")
    out = graph.triangle_stats(pairs, symmetric=True)
    return out.select(
        F.col("id").cast("long").alias("p_partkey"),
        "degree",
        "n_triangles",
        "clustering",
    )


@query(
    "basket_association_rules",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM b
    ), item AS (
      SELECT l_partkey, count(*) AS n_item FROM b GROUP BY l_partkey
    ), pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, count(*) AS n_ab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT part_a, part_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           round(n_ab / n.n_orders, 8) + 0.0 AS support,
           round(n_ab / CAST(ia.n_item AS DOUBLE), 6) + 0.0 AS confidence_ab,
           round(n_ab * n.n_orders / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 4)
             + 0.0 AS lift
    FROM pair
    JOIN item ia ON pair.part_a = ia.l_partkey
    JOIN item ib ON pair.part_b = ib.l_partkey
    CROSS JOIN n
    """,
    category="graph",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift) for
    part pairs co-purchased in ≥2 orders — the Apriori 2-itemset data
    product behind 'customers also bought'. Scale shape: the basket
    self-join is an ORDERKEY equi-join whose fan-out is bounded by
    lines-per-order² (a schema constant), the min-support HAVING cut
    runs inside the pair aggregate BEFORE any further join, and the
    item-frequency joins attach to the (already tiny) surviving rule
    set; the order-count scalar rides a 1-row broadcast. Nothing in the
    plan is ever |parts|² — the classic a-priori pruning argument,
    relationally."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a, c = li.alias("a"), li.alias("c")
    pair = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            rnd(F.col("n_ab") / F.col("n_orders"), 8).alias("support"),
            rnd(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias("confidence_ab"),
            rnd(
                F.col("n_ab") * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


@query(
    "graph_link_prediction_jaccard",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT a.l_partkey AS s, c.l_partkey AS d
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ), sym AS (
      SELECT s AS u, d AS v FROM e UNION ALL SELECT d AS u, s AS v FROM e
    ), deg AS (
      SELECT u, count(*) AS dg FROM sym GROUP BY u
    ), wedge AS (
      SELECT a.v AS x, b.v AS y, count(*) AS common
      FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
      GROUP BY 1, 2
    ), cand AS (
      SELECT w.x, w.y, w.common, da.dg AS dx, db.dg AS dy
      FROM wedge w
      JOIN deg da ON w.x = da.u
      JOIN deg db ON w.y = db.u
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.s = w.x AND e.d = w.y)
    )
    SELECT part_a, part_b, n_common, jaccard
    FROM (
      SELECT x AS part_a, y AS part_b,
             CAST(common AS BIGINT) AS n_common,
             round(common / CAST(dx + dy - common AS DOUBLE), 6) + 0.0
               AS jaccard,
             row_number() OVER (
               ORDER BY round(common / CAST(dx + dy - common AS DOUBLE), 6)
                          DESC, x, y) AS rk
      FROM cand
    ) WHERE rk <= 20
    """,
    category="graph",
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard on the repeat-co-purchase
    graph (edges = part pairs bought together in ≥2 orders): for every
    NON-adjacent pair sharing at least one neighbor, score
    |N(a)∩N(b)| / |N(a)∪N(b)| and keep the top 20 — the classic
    'products likely to be bought together next' recommender signal.
    Common-neighbor counting is ONE wedge self-join keyed on the shared
    middle vertex (fan-out Σdeg² of the SPARSE min-support graph, not
    the raw co-purchase graph — the same a-priori cut as
    `basket_association_rules` keeps degrees small); adjacency is
    removed by an anti-join on the edge list, and the global top-20
    ranks a frame already reduced to candidate pairs. Ranking on the
    ROUNDED score keeps the cut engine-deterministic."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, c = li.alias("a"), li.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("s"), F.col("c.l_partkey").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
        .select("s", "d")
        .localCheckpoint(eager=True)
    )
    sym = e.select(F.col("s").alias("u"), F.col("d").alias("v")).unionAll(
        e.select(F.col("d").alias("u"), F.col("s").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("dg"))
    wa, wb = sym.alias("wa"), sym.alias("wb")
    wedge = (
        wa.join(
            wb,
            (F.col("wa.u") == F.col("wb.u")) & (F.col("wa.v") < F.col("wb.v")),
        )
        .groupBy(F.col("wa.v").alias("x"), F.col("wb.v").alias("y"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = (
        wedge.join(
            e,
            (wedge["x"] == e["s"]) & (wedge["y"] == e["d"]),
            "left_anti",
        )
        .join(deg.select(F.col("u").alias("x"), F.col("dg").alias("dx")), "x")
        .join(deg.select(F.col("u").alias("y"), F.col("dg").alias("dy")), "y")
    )
    scored = cand.select(
        F.col("x").alias("part_a"),
        F.col("y").alias("part_b"),
        F.col("common").cast("long").alias("n_common"),
        rnd(
            F.col("common") / (F.col("dx") + F.col("dy") - F.col("common")).cast("double"),
            6,
        ).alias("jaccard"),
    )
    # top-20 via orderBy().limit() (TakeOrderedAndProject) — never a
    # single-partition row_number over the Σdeg²-sized candidate frame
    return (
        scored.orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(20)
        .select("part_a", "part_b", "n_common", "jaccard")
    )


_BFS_HOPS = 3


def _duck_bfs_round(t: int) -> str:
    return f"""
    r{t} AS (
      SELECT id, min(hops) AS hops FROM (
        SELECT id, hops FROM r{t - 1}
        UNION ALL
        SELECT s.v AS id, r.hops + 1 AS hops
        FROM r{t - 1} r JOIN sym s ON r.id = s.u
      ) GROUP BY id
    )"""


@query(
    "graph_khop_reachability",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT a.l_partkey AS s, c.l_partkey AS d
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ), sym AS (
      SELECT s AS u, d AS v FROM e UNION ALL SELECT d AS u, s AS v FROM e
    ), r0 AS (
      SELECT min(u) AS id, 0 AS hops FROM sym
    ),{','.join(_duck_bfs_round(t) for t in range(1, _BFS_HOPS + 1))}
    SELECT CAST(id AS BIGINT) AS p_partkey, CAST(hops AS INT) AS hops
    FROM r{_BFS_HOPS}
    """,
    category="graph",
)
def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop BFS ({_BFS_HOPS} rounds) from the lowest-numbered vertex of
    the repeat-co-purchase graph: every reached part with its minimum
    hop count — the bounded-depth reachability primitive behind 'related
    products within N steps' and blast-radius queries. Each round is ONE
    frontier-edge equi-join + a min aggregate on (id, hops) scalar rows
    (`localCheckpoint` keeps per-round lineage flat — the
    connected-components pattern); fixed depth keeps the oracle an exact
    unrolled-CTE replay. Hop counts are exact integers — no rounding
    bridge anywhere."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, c = li.alias("a"), li.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("s"), F.col("c.l_partkey").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
        .select("s", "d")
    )
    sym = (
        e.select(F.col("s").alias("u"), F.col("d").alias("v"))
        .unionAll(e.select(F.col("d").alias("u"), F.col("s").alias("v")))
        .localCheckpoint(eager=True)
    )
    src = sym.agg(F.min("u").alias("id")).select("id", F.lit(0).alias("hops"))
    dist = src.localCheckpoint(eager=True)
    for _ in range(_BFS_HOPS):
        expanded = (
            dist.join(sym, dist["id"] == sym["u"])
            .select(F.col("v").alias("id"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist.select(
        F.col("id").cast("long").alias("p_partkey"),
        F.col("hops").cast("int").alias("hops"),
    )


@query(
    "graph_degree_powerlaw",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT id, count(*) AS degree FROM (
        SELECT s AS id FROM pairs UNION ALL SELECT d AS id FROM pairs
      ) GROUP BY id
    ), hist AS (
      SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
    ), pts AS (
      SELECT ln(CAST(degree AS DOUBLE)) AS x, ln(CAST(n_nodes AS DOUBLE)) AS y
      FROM hist
    ), mom AS (
      SELECT count(*) AS n_pts, avg(x) AS mx, avg(y) AS my,
             avg(x * y) AS mxy, avg(x * x) AS mxx, avg(y * y) AS myy
      FROM pts
    ), fit AS (
      SELECT n_pts,
             (mxy - mx * my) / (mxx - mx * mx) AS slope,
             my - (mxy - mx * my) / (mxx - mx * mx) * mx AS icept,
             (mxy - mx * my) * (mxy - mx * my)
               / ((mxx - mx * mx) * (myy - my * my)) AS r2
      FROM mom
    ), mle AS (
      SELECT count(*) AS n_nodes, sum(ln(CAST(degree AS DOUBLE))) AS sum_ln_d,
             min(degree) AS dmin, max(degree) AS dmax
      FROM deg
    )
    SELECT CAST(mle.n_nodes AS BIGINT) AS n_nodes,
           CAST(mle.dmin AS BIGINT) AS min_degree,
           CAST(mle.dmax AS BIGINT) AS max_degree,
           CAST(fit.n_pts AS INT) AS n_hist_points,
           round(fit.slope, 4) + 0.0 AS loglog_slope,
           round(fit.icept, 4) + 0.0 AS loglog_intercept,
           round(fit.r2, 6) + 0.0 AS r_squared,
           round(1.0 + mle.n_nodes / mle.sum_ln_d, 4) + 0.0 AS alpha_mle
    FROM fit CROSS JOIN mle
    """,
    category="graph",
)
def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law audit of the bought-together graph:
    log-log OLS over the degree histogram (slope ≈ −α, with r² as the
    goodness gauge) plus the Clauset-Shalizi-Newman continuous MLE
    α = 1 + n/Σln(d/d_min) at d_min = 1 — the structural diagnostic that
    decides whether hub-skew mitigations (degree-ordered orientation in
    `graph_triangle_clustering`, salting in `join_skew_salted_replicated`)
    are load-bearing on a given graph.

    Shape: the same one-shuffle degree computation as every graph query
    here, collapsed to a |distinct degrees|-row histogram; both fits are
    closed-form moment expressions over that tiny frame. The log-sum in
    the MLE crosses the rounding bridge (unordered float sum), everything
    before it is exact integers."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("pk")
    )
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(pk, (x, i) -> transform("
                    "slice(pk, i + 2, size(pk) - i - 1), "
                    "y -> struct(x as s, y as d))))"
                )
            ).alias("p")
        )
        .select("p.s", "p.d")
        .distinct()
    )
    deg = (
        pairs.select(F.col("s").alias("id"))
        .unionAll(pairs.select(F.col("d").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    pts = hist.select(
        F.log(F.col("degree").cast("double")).alias("x"),
        F.log(F.col("n_nodes").cast("double")).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    fit = mom.select(
        "n_pts",
        slope.alias("slope"),
        (F.col("my") - slope * F.col("mx")).alias("icept"),
        (
            (F.col("mxy") - F.col("mx") * F.col("my"))
            * (F.col("mxy") - F.col("mx") * F.col("my"))
            / (
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                * (F.col("myy") - F.col("my") * F.col("my"))
            )
        ).alias("r2"),
    )
    mle = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.log(F.col("degree").cast("double"))).alias("sum_ln_d"),
        F.min("degree").alias("dmin"),
        F.max("degree").alias("dmax"),
    )
    return fit.crossJoin(F.broadcast(mle)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("dmin").cast("long").alias("min_degree"),
        F.col("dmax").cast("long").alias("max_degree"),
        F.col("n_pts").cast("int").alias("n_hist_points"),
        rnd(F.col("slope"), 4).alias("loglog_slope"),
        rnd(F.col("icept"), 4).alias("loglog_intercept"),
        rnd(F.col("r2"), 6).alias("r_squared"),
        rnd(F.lit(1.0) + F.col("n_nodes") / F.col("sum_ln_d"), 4).alias("alpha_mle"),
    )


_HITS_ROUNDS = 2
_HITS_FP = 100000000  # 1e8 fixed-point normalization scale


def _duck_hits_round(k: int) -> str:
    """One unrolled HITS round in exact fixed point: authority sums over
    in-edges, L1-normalize to 1e8 integer units (floor(x/total·1e8+0.5) —
    exact longs both engines), then hub sums over out-edges, same
    normalization."""
    p = k - 1
    return f"""
    asum{k} AS (
      SELECT e.p, sum(h.hfp) AS s FROM e JOIN h{p} h ON e.c = h.c GROUP BY e.p
    ), atot{k} AS (SELECT sum(s) AS t FROM asum{k}),
    a{k} AS MATERIALIZED (
      SELECT p, CAST(floor(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
                           * {_HITS_FP}.0 + 0.5) AS BIGINT) AS afp
      FROM asum{k} CROSS JOIN atot{k}
    ), hsum{k} AS (
      SELECT e.c, sum(a.afp) AS s FROM e JOIN a{k} a ON e.p = a.p GROUP BY e.c
    ), htot{k} AS (SELECT sum(s) AS t FROM hsum{k}),
    h{k} AS MATERIALIZED (
      SELECT c, CAST(floor(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
                           * {_HITS_FP}.0 + 0.5) AS BIGINT) AS hfp
      FROM hsum{k} CROSS JOIN htot{k}
    )"""


@query(
    "graph_hits_hubs_authorities",
    oracle=f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), h0 AS (
      SELECT c, CAST({_HITS_FP} AS BIGINT) AS hfp FROM (SELECT DISTINCT c FROM e)
    ),{','.join(_duck_hits_round(k) for k in range(1, _HITS_ROUNDS + 1))},
    top_a AS (
      SELECT 'authority' AS role, p AS node_id, afp FROM a{_HITS_ROUNDS}
      ORDER BY afp DESC, p ASC LIMIT 10
    ), top_h AS (
      SELECT 'hub' AS role, c AS node_id, hfp AS afp FROM h{_HITS_ROUNDS}
      ORDER BY afp DESC, c ASC LIMIT 10
    ), u AS (
      SELECT * FROM top_a UNION ALL SELECT * FROM top_h
    )
    SELECT role, node_id,
           round(CAST(afp AS DOUBLE) / {_HITS_FP}.0, 6) + 0.0 AS score,
           CAST(row_number() OVER (PARTITION BY role
                ORDER BY afp DESC, node_id ASC) AS INT) AS rank
    FROM u
    """,
    category="graph",
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on the customer→part
    purchase bipartite graph: authority parts are bought by strong-hub
    customers and hub customers buy strong-authority parts — the mutual
    reinforcement that plain degree centrality misses, and the third
    iterative-scoring member of the graph layer beside PageRank
    (teleporting random walk) and triangle clustering (cohesion).

    Scale shape: the edge list builds from ONE orderkey equi-join +
    distinct and is the only corpus-sized frame; each of the
    {_HITS_ROUNDS} rounds moves (node, score) pairs along edges — two
    keyed aggregates, nothing wider. Determinism: scores live in 1e8
    fixed-point integers — every propagation sum is an exact BIGINT
    (order-free), and the L1 normalization floor(x/total·1e8+0.5) is one
    identical IEEE expression per round, so both engines replay every
    iterate bit-exactly (the same fixed-point discipline as the stump
    booster). Top-10 per role via orderBy().limit() (mergeable top-k),
    rank attached on the 20-row frame, window partitioned by role."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _norm(sums: DataFrame, key: str, out: str) -> DataFrame:
        tot = sums.agg(F.sum("s").alias("t"))
        return sums.crossJoin(F.broadcast(tot)).select(
            key,
            F.floor(
                F.col("s").cast("double") / F.col("t").cast("double")
                * F.lit(float(_HITS_FP)) + F.lit(0.5)
            ).cast("long").alias(out),
        )

    h = e.select("c").distinct().select("c", F.lit(_HITS_FP).cast("long").alias("hfp"))
    a = None
    for _ in range(_HITS_ROUNDS):
        asum = e.join(h, "c").groupBy("p").agg(F.sum("hfp").alias("s"))
        a = _norm(asum, "p", "afp").localCheckpoint(eager=True)
        hsum = e.join(a, "p").groupBy("c").agg(F.sum("afp").alias("s"))
        h = _norm(hsum, "c", "hfp").localCheckpoint(eager=True)

    top_a = (
        a.orderBy(F.desc("afp"), F.asc("p"))
        .limit(10)
        .select(F.lit("authority").alias("role"), F.col("p").alias("node_id"),
                F.col("afp").alias("fp"))
    )
    top_h = (
        h.orderBy(F.desc("hfp"), F.asc("c"))
        .limit(10)
        .select(F.lit("hub").alias("role"), F.col("c").alias("node_id"),
                F.col("hfp").alias("fp"))
    )
    u = top_a.unionByName(top_h)
    wr = Window.partitionBy("role").orderBy(F.desc("fp"), F.asc("node_id"))
    return u.select(
        "role",
        "node_id",
        rnd(F.col("fp").cast("double") / F.lit(float(_HITS_FP)), 6).alias("score"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


@query(
    "graph_degree_assortativity",
    # Pearson correlation of endpoint degrees over the symmetric directed
    # edge list: every moment is an exact integer sum (degrees are ints),
    # so the statistic is deterministic regardless of summation order —
    # doubles appear only in the final closed form.
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), sym AS (
      SELECT s AS u, d AS v FROM pairs
      UNION ALL SELECT d AS u, s AS v FROM pairs
    ), deg AS (
      SELECT u AS id, count(*) AS degree FROM sym GROUP BY u
    ), ed AS (
      SELECT du.degree AS x, dv.degree AS y
      FROM sym JOIN deg du ON sym.u = du.id
               JOIN deg dv ON sym.v = dv.id
    ), mom AS (
      SELECT count(*) AS m, sum(x) AS sx, sum(x * x) AS sxx,
             sum(x * y) AS sxy
      FROM ed
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(m / 2 AS BIGINT) AS n_edges,
           round((CAST(sxy AS DOUBLE) / m
                  - (CAST(sx AS DOUBLE) / m) * (CAST(sx AS DOUBLE) / m))
                 / (CAST(sxx AS DOUBLE) / m
                    - (CAST(sx AS DOUBLE) / m) * (CAST(sx AS DOUBLE) / m)),
                 6) + 0.0 AS assortativity
    FROM mom
    """,
    category="graph",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree ASSORTATIVITY of the bought-together graph — the Pearson
    correlation of endpoint degrees over the symmetric edge list
    (Newman 2002): positive means hubs link to hubs (social-network
    shape), negative means hubs link to leaves (dependency/star shape).
    This single scalar decides which skew mitigation matters: a
    disassortative graph concentrates wedge fan-out at hub cores
    (degree-ordered orientation wins), an assortative one spreads it.
    Because both endpoint marginals are identical on a symmetric edge
    list, the formula collapses to (E[xy]-E[x]^2)/(E[x^2]-E[x]^2) with
    every moment an exact INTEGER sum — no fold ordering, no rounding
    bridge, deterministic by arithmetic.

    Scale shape (100 TB): degrees come from one map-side-combined count;
    attaching them to edges is two hash joins on node id (the same
    shuffle key), and the moment aggregate is a 1-row combine. Nothing
    quadratic, nothing sorted."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("s"), F.col("b.l_partkey").alias("d"))
        .distinct()
    )
    sym = pairs.select(F.col("s").alias("u"), F.col("d").alias("v")).unionAll(
        pairs.select(F.col("d").alias("u"), F.col("s").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    ed = (
        sym.join(deg.select(F.col("id").alias("u"), F.col("degree").alias("x")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("y")), "v")
        .select("x", "y")
    )
    mom = ed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    mx = F.col("sx").cast("double") / F.col("m")
    r = (F.col("sxy").cast("double") / F.col("m") - mx * mx) / (
        F.col("sxx").cast("double") / F.col("m") - mx * mx
    )
    return mom.crossJoin(F.broadcast(n_nodes)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        (F.col("m") / F.lit(2)).cast("long").alias("n_edges"),
        (F.round(r, 6) + F.lit(0.0)).alias("assortativity"),
    )


_KCORE_KS = (2, 3)
_KCORE_ROUNDS = 6


def _duck_kcore_round(k: int, t: int) -> str:
    """One peeling round: restrict edges to surviving endpoints, recount
    degrees, keep nodes with degree >= k."""
    return f"""
    k{k}n{t} AS MATERIALIZED (
      SELECT u AS id FROM sym
      WHERE u IN (SELECT id FROM k{k}n{t - 1})
        AND v IN (SELECT id FROM k{k}n{t - 1})
      GROUP BY u HAVING count(*) >= {k}
    )"""


@query(
    "graph_kcore_decomposition",
    oracle=f"""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), sym AS MATERIALIZED (
      SELECT s AS u, d AS v FROM pairs
      UNION ALL SELECT d AS u, s AS v FROM pairs
    ), k2n0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym),
    k3n0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym),
    {','.join(_duck_kcore_round(k, t) for k in _KCORE_KS
              for t in range(1, _KCORE_ROUNDS + 1))}
    SELECT k, n_core_nodes, n_core_edges FROM (
      {' UNION ALL '.join(
        f'''SELECT {k} AS k,
               CAST((SELECT count(*) FROM k{k}n{_KCORE_ROUNDS}) AS BIGINT)
                 AS n_core_nodes,
               CAST((SELECT count(*) / 2 FROM sym
                     WHERE u IN (SELECT id FROM k{k}n{_KCORE_ROUNDS})
                       AND v IN (SELECT id FROM k{k}n{_KCORE_ROUNDS}))
                    AS BIGINT) AS n_core_edges'''
        for k in _KCORE_KS)}
    )
    """,
    category="graph",
)
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE decomposition of the bought-together graph (k = 2, 3 after
    {r} fixed peeling rounds): iteratively remove nodes with in-subgraph
    degree < k until the k-core remains — the standard coreness filter a
    dedup/community pipeline runs to separate tight clusters from chain
    noise before expensive per-cluster work. Fixed round count keeps the
    oracle an exact unrolled-CTE replay (the BFS/CC discipline); on this
    graph the peel converges well inside {r} rounds, and the round count
    is a documented contract, not a convergence guess.

    Scale shape (100 TB): each round is one semi-join of the edge list
    against the surviving-node set plus a map-side-combined degree
    count — scalar (u, v) rows only, localCheckpoint flattening lineage
    per round (the `graph_khop_reachability` pattern). Peeling touches
    Σ|edges| per round with a fixed round budget — linear, never
    quadratic. Counts are exact integers; no rounding bridge.""".format(
        r=_KCORE_ROUNDS
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("s"), F.col("b.l_partkey").alias("d"))
        .distinct()
    )
    sym = (
        pairs.select(F.col("s").alias("u"), F.col("d").alias("v"))
        .unionAll(pairs.select(F.col("d").alias("u"), F.col("s").alias("v")))
        .localCheckpoint(eager=True)
    )
    out = []
    for k in _KCORE_KS:
        nodes = sym.select("u").distinct().withColumnRenamed("u", "id")
        nodes = nodes.localCheckpoint(eager=True)
        for _ in range(_KCORE_ROUNDS):
            sub = sym.join(
                nodes.withColumnRenamed("id", "u"), "u"
            ).join(nodes.withColumnRenamed("id", "v"), "v")
            nodes = (
                sub.groupBy("u")
                .agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= k)
                .select(F.col("u").alias("id"))
                .localCheckpoint(eager=True)
            )
        core_edges = (
            sym.join(nodes.withColumnRenamed("id", "u"), "u")
            .join(nodes.withColumnRenamed("id", "v"), "v")
            .agg((F.count(F.lit(1)) / F.lit(2)).cast("long").alias("n_core_edges"))
        )
        n_nodes = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_core_nodes"))
        out.append(
            n_nodes.crossJoin(core_edges).select(
                F.lit(k).cast("int").alias("k"), "n_core_nodes", "n_core_edges"
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
