"""Link-graph analytics over corpus-derived edges.

The web-pipeline quality signal this serves: CCNet/RefinedWeb-style
corpora weight and filter documents by the authority of their host
domain (CommonCrawl publishes harmonic centrality / PageRank for
exactly this use). ``domain_link_edges`` derives the citation graph
from the corpus itself — document source → every domain its text links
to — and ``pagerank`` scores it.

Determinism recipe (the module-wide convention): ranks are BIGINT
micro-units and every step is integer arithmetic — ``DIV`` for the
out-degree normalization and the damping factor 85/100 — so iteration
``i``'s ranks are bit-identical on every engine and partitioning, and
the full iterative algorithm hash-gates against unrolled SQL CTE
layers. Floors lose a few micro-units of rank mass per step; that is a
documented property of the quantization, identical everywhere.

Shape at scale: edges aggregate to (src_domain, dst_domain, weight) —
domain-pair-sized, orders of magnitude below the corpus. Each
iteration is one join of the node-sized rank frame with the edge list
(shuffle on src) plus one dst aggregation; dangling mass and N are
one-row broadcast frames. Rank frames are localCheckpoint()ed per
iteration (the ``duplicate_groups`` pattern) so the logical plan stays
iteration-deep, not 3^n-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# host of every http(s) URL — identical string to pii.domain_stats, and
# RE2-safe so the DuckDB oracle runs it verbatim
HOST_PATTERN = r"https?://([^/\s:]+)"


def domain_link_edges(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The corpus citation graph: one weighted edge per (document
    source, linked domain) pair, weight = number of links. Hosts are
    lowercased with a leading ``www.`` stripped (the
    ``url_canonical_dedup`` canonical form, host part).

    Per-row extraction inside the scan, one explode, one combinable
    aggregation — corpus-linear; hot domains are aggregate keys, never
    join keys."""
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(HOST_PATTERN), 1)
    dst = F.regexp_replace(F.lower(F.col("_h")), r"^www\.", "")
    return (
        df.select(F.col(source_col).alias("src"), F.explode(hosts).alias("_h"))
        .select("src", dst.alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 10**12,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank with damping 0.85 over ``(src, dst, w)`` edges,
    all-integer: ranks are micro-units of ``scale``, a node passes
    ``(r * w) DIV wout`` along each out-edge, dangling mass (nodes with
    no out-edges) is redistributed uniformly, and the update is

        r' = (15 * (scale DIV N)) DIV 100
           + (85 * inflow) DIV 100 + (85 * (dang DIV N)) DIV 100

    — every operand BIGINT, so the result is exact and hash-stable.
    Returns ``(node, rank_micro)`` for every node.

    At 100 TB the edge frame is domain-pair-sized and each iteration is
    one shuffle on src plus one on dst; the two scalars (N, dangling
    mass) broadcast. n_iter is typically <= 10 (power iteration
    converges geometrically at rate 0.85).

    ``init_ranks``: optional ``(node, rank_micro)`` frame (e.g. the
    persisted output of a previous run) to resume from — the
    incremental-maintenance path after edge appends: power iteration
    restarted from last round's (nearly-converged) ranks needs only a
    couple of rounds to absorb the new edges instead of starting cold.
    Nodes absent from ``init_ranks`` (newly appeared) start at the
    uniform base ``scale DIV N`` over the CURRENT node count."""
    edges = edges.select(
        F.col("src"), F.col("dst"), F.col("w").cast("long")
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = (
        edges.groupBy("src").agg(F.sum("w").alias("wout"))
        .localCheckpoint(eager=True)
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    if init_ranks is None:
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .select("node", F.expr(f"{scale}L DIV n").alias("r"))
            .localCheckpoint(eager=True)
        )
    else:
        prev = init_ranks.select(
            F.col("node"), F.col("rank_micro").cast("long").alias("_pr")
        )
        ranks = (
            nodes.join(prev, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.coalesce(
                    F.col("_pr"), F.expr(f"{scale}L DIV n")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    for _ in range(n_iter):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
            .join(out, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * w) DIV wout").alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("fin"))
        dang = (
            ranks.join(out, ranks.node == out.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dg"))
        )
        ranks = (
            ranks.select("node")
            .join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.expr(
                    f"(15 * ({scale}L DIV n)) DIV 100"
                    " + (85 * coalesce(fin, 0L)) DIV 100"
                    " + (85 * (dg DIV n)) DIV 100"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over ``(src, dst, w)``
    edges, all-integer: authority(v) = sum of hub scores over in-edges,
    hub(u) = sum of authority scores over out-edges, each side L1-
    renormalized to ``scale`` micro-units per round via
    ``x * scale DIV total``, with the product carried in DECIMAL(38,0)
    (the repo's big-counter convention — BIGINT would overflow at
    micro-units x micro-units) — every step exact and hash-stable (the
    PageRank determinism recipe applied to the alternating update).
    Edge weights multiply contributions.

    On the corpus citation graph (source → domain) this lands exactly
    on Kleinberg's bipartite case: sources score as hubs (how well a
    source's links cover authoritative domains), domains as
    authorities. Returns ``(node, hub_micro, auth_micro)`` — a node
    missing from a side scores 0 there.

    Shape at scale: per round one shuffle keyed by dst (authority
    gather) and one by src (hub gather) over the domain-pair-sized edge
    frame, plus two one-row normalization broadcasts; score frames are
    localCheckpoint()ed per round like ``pagerank``'s."""
    if n_iter < 1:
        raise ValueError("hits: n_iter must be >= 1")
    edges = edges.select(
        F.col("src"), F.col("dst"), F.col("w").cast("long")
    ).localCheckpoint(eager=True)
    srcs = edges.select(F.col("src").alias("node")).distinct()
    dsts = edges.select(F.col("dst").alias("node")).distinct()
    nodes = srcs.union(dsts).distinct().localCheckpoint(eager=True)
    hubs = srcs.withColumn("h", F.lit(scale).cast("long")).localCheckpoint(
        eager=True
    )
    auths = None
    for _ in range(n_iter):
        araw = (
            edges.join(hubs, edges.src == hubs.node)
            .select(
                F.col("dst").alias("node"),
                # decimal gather: micro-unit scores x unbounded link
                # weights overflow BIGINT long before they overflow (38,0)
                (F.col("h").cast("decimal(38,0)") * F.col("w")).alias("_a"),
            )
            .groupBy("node")
            .agg(F.sum("_a").cast("decimal(38,0)").alias("_a"))
        )
        atot = araw.agg(F.sum("_a").cast("decimal(38,0)").alias("_t"))
        auths = (
            araw.crossJoin(F.broadcast(atot))
            .select(
                "node",
                F.expr(f"CAST((_a * {scale}) DIV _t AS BIGINT)").alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        hraw = (
            edges.join(auths, edges.dst == auths.node)
            .select(
                F.col("src").alias("node"),
                (F.col("a").cast("decimal(38,0)") * F.col("w")).alias("_h"),
            )
            .groupBy("node")
            .agg(F.sum("_h").cast("decimal(38,0)").alias("_h"))
        )
        htot = hraw.agg(F.sum("_h").cast("decimal(38,0)").alias("_t"))
        hubs = (
            hraw.crossJoin(F.broadcast(htot))
            .select(
                "node",
                F.expr(f"CAST((_h * {scale}) DIV _t AS BIGINT)").alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub_micro"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth_micro"),
        )
    )


def cocitation_edges(link_edges: DataFrame) -> DataFrame:
    """Domain co-citation graph from the (src, dst, w) link edges: an
    undirected edge between two domains whenever some source links
    BOTH (the bibliometric co-citation coupling). Returns
    ``(u, v, n_src)`` with u < v, weight = number of co-citing sources.

    Shape at scale: self-join keyed on src — fan-out is (per-source
    distinct domains)², the classic co-occurrence bound; cap a source's
    domain list upstream if a pathological source links everything."""
    d = link_edges.select("src", "dst").distinct()
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, (F.col("a.src") == F.col("b.src"))
               & (F.col("a.dst") < F.col("b.dst")))
        .select(F.col("a.dst").alias("u"), F.col("b.dst").alias("v"),
                F.col("a.src").alias("_s"))
        .groupBy("u", "v")
        .agg(F.count_distinct("_s").alias("n_src"))
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph
    (``(u, v)`` rows, u != v, one row per edge either order) — the
    clustering-structure measurement behind community/spam detection on
    link graphs. Returns ``(node, degree, triangles)``.

    Algorithm: degree orientation (Suri & Vassilvitskii WWW 2011 /
    Cohen's MR-triangle): orient every edge from the (degree, node)-
    smaller endpoint to the larger, enumerate wedges at each apex over
    its oriented out-edges, close them against the oriented edge list.
    Every triangle is counted exactly once at its smallest-rank vertex,
    and the wedge fan-out per apex is bounded by its ORIENTED
    out-degree ≤ O(sqrt(edges)) — the skew bound that makes the
    classic algorithm scale where naive neighbor-set intersection
    explodes on hubs. Ties break on the node id, so the orientation
    (and the count) is deterministic on every engine.

    Shape at scale: two shuffle joins over the edge frame (wedge build,
    wedge close) + one explode of 3 node rows per triangle."""
    und = (
        edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .union(edges.select(F.col("v").alias("x"), F.col("u").alias("y")))
        .distinct()
    )
    deg = und.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    # oriented edge (lo, hi): (d, node) of lo precedes hi's
    e = (
        und.join(deg.withColumnRenamed("x", "x1").withColumnRenamed("d", "dx"),
                 F.col("x") == F.col("x1"))
        .join(deg.withColumnRenamed("x", "y1").withColumnRenamed("d", "dy"),
              F.col("y") == F.col("y1"))
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select(
            F.col("x").alias("lo"), F.col("y").alias("hi"),
            F.col("dy").alias("hd"),
        )
        .localCheckpoint(eager=True)
    )
    w1 = e.select(
        F.col("lo"), F.col("hi").alias("h1"), F.col("hd").alias("hd1")
    )
    w2 = e.select(
        F.col("lo"), F.col("hi").alias("h2"), F.col("hd").alias("hd2")
    )
    wedges = w1.join(w2, "lo").filter(
        (F.col("hd1") < F.col("hd2"))
        | ((F.col("hd1") == F.col("hd2")) & (F.col("h1") < F.col("h2")))
    )
    tri = wedges.join(
        e.select(F.col("lo").alias("h1"), F.col("hi").alias("h2")),
        ["h1", "h2"],
    ).select("lo", "h1", "h2")
    per_node = (
        tri.select(F.explode(F.array("lo", "h1", "h2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select(F.col("x").alias("node"), F.col("d").alias("degree"))
        .join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias(
                "triangles"
            ),
        )
    )


def hyperball_harmonic(
    edges: DataFrame,
    n_iter: int = 3,
) -> DataFrame:
    """Harmonic centrality by HyperBall (Boldi & Vigna WWW 2014) — the
    EXACT algorithm behind CommonCrawl's public domain ranking, which is
    what web-scale corpora weight domain quality by. True harmonic
    centrality needs all-pairs distances (hopeless at 1e8 nodes);
    HyperBall keeps ONE HLL counter per node whose registers are the
    ball of nodes that can reach it, and grows all balls one hop per
    round with the register-max merge:

        B_r(v) = B_{r-1}(v) ∪ ⋃_{(u→v) ∈ E} B_{r-1}(u)

    harmonic(v) = Σ_r (|B_r(v)| - |B_{r-1}(v)|) / r over estimated ball
    sizes. This repo's HLL is bit-exact (md5 hashes, integer registers,
    the dyadic estimate chain every hll gate pins), so the HyperBall
    estimates — and therefore the centrality ranking — are deterministic
    across engines and partitionings: the whole approximation hash-gates.
    Per-radius estimates are rounded to 4dp (the hll_est convention)
    before the delta sum; the result to 6dp.

    Returns ``(node, reach_est, harmonic)`` — reach_est is the final
    ball size (nodes that reach v within n_iter hops, self included).

    Shape at scale: state is ≤512 integer register rows per node —
    node-sized, never corpus- or pairs-sized; each round is one join of
    the register frame with the edge list (shuffle on dst) and one
    register-max combine. This is the 100 TB substitute for all-pairs
    BFS, exactly as published."""
    from rrdtool_1_x_spark.datapipe.sketch import (
        _estimate_from_registers,
        hll_register_cols,
    )

    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bucket, rho = hll_register_cols(F.col("node"), seed="hb")
    regs = (
        nodes.select("node", bucket, rho)
        .groupBy("node", "bucket")
        .agg(F.max("rho").alias("mr"))
        .localCheckpoint(eager=True)
    )

    def est(r, name):
        return _estimate_from_registers(r, ["node"]).select(
            "node", F.col("hll_est").alias(name)
        )

    balls = est(regs, "b0")
    for r in range(1, n_iter + 1):
        contrib = e.join(regs, regs.node == e.src).select(
            F.col("dst").alias("node"), "bucket", "mr"
        )
        regs = (
            regs.union(contrib)
            .groupBy("node", "bucket")
            .agg(F.max("mr").alias("mr"))
            .localCheckpoint(eager=True)
        )
        balls = balls.join(est(regs, f"b{r}"), "node")
    harm = None
    for r in range(1, n_iter + 1):
        term = (F.col(f"b{r}") - F.col(f"b{r - 1}")) / F.lit(float(r))
        harm = term if harm is None else harm + term
    return balls.select(
        "node",
        F.col(f"b{n_iter}").alias("reach_est"),
        F.round(harm, 6).alias("harmonic"),
    )
