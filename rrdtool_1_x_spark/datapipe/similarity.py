"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The query set is broadcast; scoring is a single scan of the corpus with
  no shuffle until the final per-query top-k (a windowed rank over
  query-partitioned scores, map-side combinable).
* ``lsh_bucketed_topk``: scale path #1 — random-hyperplane LSH confines
  scoring to matching buckets. Hyperplanes are derived deterministically
  from md5, so plans are reproducible across runs/engines. Recall is tuned
  by (num_planes, num_tables): candidates = documents sharing a bucket in
  ANY table.
* ``ivf_topk`` (+ ``ivf_centroid_model``, ``write_ivf_index``,
  ``ivf_topk_indexed``): scale path #2 — inverted-file cell probing.
  The coarse quantizer is the nlist corpus vectors with smallest md5(id)
  (deterministic, engine-portable), trained once and inlined as literals;
  assignment is a shuffle-free map and the persisted index prunes probed
  cells at scan time. nprobe/nlist is the recall-vs-cost dial
  (BASELINE.md recall sweep).

Dot products run through ``aggregate(zip_with(...))`` — JVM-side, no
Python. For 100 TB corpora the intended physical layout is: corpus
pre-bucketed (bucketBy on bucket id) so queries prune buckets at scan time.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.mat import materialize


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    kernel: str = "fold",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Returns
    (query_id, vec_id, cos_sim, rank).

    ``kernel``:
    * ``"fold"`` (default) — JVM-side sequential array folds. Bit-exact
      against the DuckDB oracles (same left-to-right summation order);
      the interpreted HOF fold is the per-row cost floor.
    * ``"arrow"`` — Arrow-batched mapInPandas: one numpy GEMM per batch
      against the broadcast query matrix. Equal results to ~1e-12
      relative, but BLAS reassociates the sums so it is NOT
      bit-identical — keep it out of hash-gated paths. Measured on 100k
      64-dim vectors, local[32]: at par with the fold at 8 queries
      (Arrow transfer dominates), 2x faster at 64 queries — the GEMM
      advantage grows with query count and dimension, which is exactly
      the batch-retrieval shape of a production ANN scorer.
    """
    from pyspark.sql import Window

    if kernel == "arrow":
        scored = _brute_force_scores_arrow(
            corpus, queries, id_col, vec_col, query_id_col
        )
    else:
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
        q = queries.select(
            F.col(query_id_col).alias("_qid"), vd.alias("_qvec"), n2.alias("_qn2")
        )
        dot = F.aggregate(
            F.zip_with(F.col("_v"), F.col("_qvec"), lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        scored = (
            corpus.select(F.col(id_col), vd.alias("_v"), n2.alias("_n2"))
            .crossJoin(F.broadcast(q))
            .select(
                F.col("_qid").alias(query_id_col),
                F.col(id_col),
                F.when(
                    (F.col("_n2") > 0) & (F.col("_qn2") > 0),
                    dot / (F.sqrt("_n2") * F.sqrt("_qn2")),
                ).alias("cos_sim"),
            )
        )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _brute_force_scores_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """(query_id, vec_id, cos_sim) via one numpy GEMM per Arrow batch.

    The query matrix rides to the executors inside the closure (queries
    are by definition small); the corpus is scanned once, each
    mapInPandas batch scoring batch_rows x num_queries in a single
    C-loop-free matmul. Emits one row per (corpus row, query) — the same
    shape the fold path's crossJoin produces — so the downstream top-k
    window is shared."""
    import numpy as np
    from pyspark.sql.types import StructField, StructType, DoubleType

    # id field types come from the inputs — hardcoding long would narrow
    # the public contract (string doc ids are legal for the fold kernel)
    qid_field = queries.schema[query_id_col]
    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            StructField(query_id_col, qid_field.dataType),
            StructField(id_col, id_field.dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        # empty query set: same empty shape the fold path's crossJoin gives
        return corpus.sparkSession.createDataFrame([], out_schema)
    qids = [r[0] for r in qrows]
    qmat = np.array([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qnorm_safe = np.where(qnorm > 0, qnorm, np.inf)  # zero query -> null sim

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            nrm = np.sqrt((m * m).sum(axis=1))
            nrm_safe = np.where(nrm > 0, nrm, np.inf)
            sims = (m @ qmat.T) / nrm_safe[:, None] / qnorm_safe[None, :]
            # zero-norm rows/queries -> NULL like the fold path's F.when.
            # NULL, not NaN: Spark sorts NaN ABOVE every double in the
            # descending rank window, so a NaN would win top-k slots.
            sims[nrm == 0, :] = np.nan
            sims[:, qnorm == 0] = np.nan
            n, q = sims.shape
            flat = sims.T.reshape(-1)
            col = pd.Series(flat, dtype="float64").astype("Float64")
            col[np.isnan(flat)] = pd.NA
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(np.asarray(qids), n),
                    id_col: np.tile(pdf[id_col].to_numpy(), q),
                    "cos_sim": col,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, out_schema)


def _seq_dot(a, b) -> float:
    """Sequential left-to-right dot — the float-op order of both engines'
    list folds (Spark ``aggregate(zip_with(...))``, DuckDB
    ``list_dot_product``). The Arrow kernels fall back to this for the rare
    rows where a vectorized BLAS result sits within the guard band of a
    decision boundary, so every DECISION (bucket bit, cell id, candidate
    survival) is bit-identical to the fold path."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _list_matrix(arr, n: int):
    """(float32 matrix, float64 matrix) from an Arrow list column — the
    values buffer reshaped, no per-row object churn (the naive
    ``np.stack([np.asarray(v) for v in series])`` costs ~1 µs/row and
    dominated the first kernel draft)."""
    flat32 = arr.flatten().to_numpy(zero_copy_only=False)
    m32 = flat32.reshape(n, -1)
    return m32, m32.astype(np.float64)


def _bucket_pairs_arrow(
    melted: DataFrame, threshold: float, max_bucket_size: int | None, id_col: str, id_ddl: str
) -> DataFrame:
    """Near-dup verification INSIDE the LSH buckets: one
    ``applyInArrow`` group task per (table, bucket) runs a bucket-local
    GEMM over at most ``max_bucket_size`` vectors, keeps pairs within
    1e-6 of the threshold, and re-scores those few with the exact
    sequential fold (``_seq_dot`` — the engines' shared float-op order),
    emitting only exact-verified (id_a, id_b, cos_sim).

    Compared to the join-based shape (candidate distinct + two id-joins
    to re-attach vectors), this runs ONE shuffle — the bucket groupBy —
    and the quadratic work never leaves the capped group. The bucket-size
    cap is enforced in-kernel (an oversized group emits nothing), the
    same anti-quadratic guard as the windowed count in the fold path.
    Output is bit-identical to the fold path before its final distinct;
    callers dedup the (small) surviving pair set."""
    import math as _math

    import pyarrow as pa

    def score(tbl: "pa.Table") -> "pa.Table":
        id_type = tbl.schema.field(id_col).type
        out_schema = pa.schema(
            [
                pa.field("id_a", id_type),
                pa.field("id_b", id_type),
                pa.field("cos_sim", pa.float64()),
            ]
        )
        n = tbl.num_rows
        if n < 2 or (max_bucket_size is not None and n > max_bucket_size):
            return pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "cos_sim": pa.array([], pa.float64()),
                },
                schema=out_schema,
            )
        m32, m = _list_matrix(tbl.column("_vec").combine_chunks(), n)
        n2 = (m * m).sum(axis=1)
        nrm = np.sqrt(np.where(n2 > 0, n2, np.inf))
        sims = (m @ m.T) / nrm[:, None] / nrm[None, :]
        iu, ju = np.triu_indices(n, 1)
        fast = sims[iu, ju]
        with np.errstate(invalid="ignore"):
            keep = fast >= threshold - 1e-6  # NaN fails, like NULL in the fold path
        ids = tbl.column(id_col).to_pylist()
        out_a, out_b, out_c = [], [], []
        for i, j in zip(iu[keep], ju[keep]):
            a_, b_ = ids[i], ids[j]
            if a_ == b_:
                continue
            va, vb = m32[i], m32[j]
            na2 = _seq_dot(va, va)
            nb2 = _seq_dot(vb, vb)
            if not (na2 > 0 and nb2 > 0):
                continue
            cs = _seq_dot(va, vb) / (_math.sqrt(na2) * _math.sqrt(nb2))
            if cs >= threshold:
                if b_ < a_:
                    a_, b_ = b_, a_
                out_a.append(a_)
                out_b.append(b_)
                out_c.append(cs)
        return pa.table(
            {
                "id_a": pa.array(out_a, id_type),
                "id_b": pa.array(out_b, id_type),
                "cos_sim": pa.array(out_c, pa.float64()),
            },
            schema=out_schema,
        )

    return melted.groupBy("_bi", "_bh").applyInArrow(
        score, f"id_a {id_ddl}, id_b {id_ddl}, cos_sim double"
    )


def _pd_bucket_strings(vec_col: Column, planes_by_table: list[list[list[float]]]) -> Column:
    """Arrow-batched LSH bucket strings for ALL tables in one pass:
    array<string>, element t = table t's sign-bit bucket. One GEMM against
    the stacked (tables*planes, dim) plane matrix replaces
    tables*planes interpreted dim-length folds per row. Dots within 1e-9
    of the sign boundary are recomputed with the sequential fold so bucket
    bits are bit-identical to ``lsh_bucket_col``."""
    from pyspark.sql.functions import pandas_udf

    pmat = np.array([p for planes in planes_by_table for p in planes], dtype=np.float64)
    plists = [p for planes in planes_by_table for p in planes]
    sizes = [len(planes) for planes in planes_by_table]

    @pandas_udf("array<string>")
    def buckets(vec: pd.Series) -> pd.Series:
        if not len(vec):
            return pd.Series([], dtype="object")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        dots = m @ pmat.T  # (rows, tables*planes)
        near = np.argwhere(np.abs(dots) < 1e-9)
        for i, j in near:
            dots[i, j] = _seq_dot(m[i], plists[j])
        bits = dots >= 0
        out = []
        for r in range(len(m)):
            row, off = [], 0
            for sz in sizes:
                row.append("".join("1" if b else "0" for b in bits[r, off : off + sz]))
                off += sz
            out.append(row)
        return pd.Series(out)

    return buckets(vec_col)


def _exact_cell(v, model) -> int:
    """Exact IVF assignment of one vector: sequential folds + the
    (s desc, cid asc) tie-break of ``_centroid_scores``/the SQL oracle."""
    import math as _math

    vn2 = 0.0
    for x in v:
        fx = float(x)
        vn2 += fx * fx
    entries = []
    for cid, cv, c2 in model:
        if c2 > 0 and vn2 > 0:
            s = _seq_dot(v, cv) / (_math.sqrt(vn2) * _math.sqrt(c2))
        else:
            s = -2.0
        entries.append((s, -cid))
    return -max(entries)[1]


def _ivf_scores_arrow(
    corpus: DataFrame,
    qitems: list[tuple],
    model: list[tuple[int, list[float], float]],
    id_col: str,
    vec_col: str,
    qid_ddl: str,
    id_ddl: str,
) -> DataFrame:
    """One ``mapInArrow`` corpus pass that fuses IVF assignment and probe
    scoring: per Arrow batch, a GEMM against the centroid matrix assigns
    cells (near-tied rows fall back to the exact fold), then each query's
    probed-cell rows are GEMM-scored against that query. Emits the SLIM
    frame (_qid, id, _sf) — the guard-band windows downstream shuffle
    24-byte rows, never vectors. ``qitems`` is the collected
    (qid, qvec_double, qn2, cell) probe list (queries are broadcast-small
    by contract — same assumption as the fold path's broadcast join)."""
    import math as _math

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_string

    cids = np.array([cid for cid, _, _ in model], dtype=np.int64)  # ascending
    cmat = np.array([cv for _, cv, _ in model], dtype=np.float64)
    cn2 = np.array([n2 for _, _, n2 in model], dtype=np.float64)
    cnorm = np.sqrt(np.where(cn2 > 0, cn2, np.inf))
    by_cell: dict = {}
    for qid, qv, qn2, cell in qitems:
        by_cell.setdefault(cell, []).append((qid, np.asarray(qv, dtype=np.float64), qn2))
    qid_type = to_arrow_type(_parse_datatype_string(qid_ddl))

    def score(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0)
            m32, m = _list_matrix(rb.column(1), n)
            vn2 = (m * m).sum(axis=1)
            vnorm = np.sqrt(np.where(vn2 > 0, vn2, np.inf))
            csims = (m @ cmat.T) / vnorm[:, None] / cnorm[None, :]
            csims = np.where(np.isfinite(csims), csims, -2.0)
            best = np.argmax(csims, axis=1)  # first max = lowest cid on ties
            cells = cids[best]
            if csims.shape[1] > 1:
                part = np.partition(csims, -2, axis=1)
                for i in np.nonzero(part[:, -1] - part[:, -2] < 1e-9)[0]:
                    cells[i] = _exact_cell(m32[i], model)
            out_schema = pa.schema(
                [
                    pa.field("_qid", qid_type),
                    pa.field(id_col, ids.type),
                    pa.field("_sf", pa.float64()),
                ]
            )
            for cell, qs in by_cell.items():
                mask = cells == cell
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                sub, sn2 = m[mask], vn2[mask]
                id_sub = ids.filter(pa.array(mask))
                for qid, qv, qn2 in qs:
                    if qn2 > 0:
                        with np.errstate(divide="ignore", invalid="ignore"):
                            s = (sub @ qv) / (np.sqrt(sn2) * _math.sqrt(qn2))
                        invalid = sn2 <= 0
                    else:
                        s = np.zeros(cnt)
                        invalid = np.ones(cnt, dtype=bool)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array([qid] * cnt, qid_type),
                            id_sub,
                            pa.array(s, mask=invalid),
                        ],
                        schema=out_schema,
                    )

    return corpus.select(id_col, vec_col).mapInArrow(
        score, f"_qid {qid_ddl}, {id_col} {id_ddl}, _sf double"
    )


def _hyperplanes(dim: int, num_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bits."""
    planes = []
    for p in range(num_planes):
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()
            for off in range(0, 16, 4):
                u = int.from_bytes(h[off : off + 4], "big")
                vals.append((u / 2**31) - 1.0)  # uniform [-1, 1)
            i += 1
        norm = math.sqrt(sum(v * v for v in vals[:dim])) or 1.0
        planes.append([v / norm for v in vals[:dim]])
    return planes


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sign-pattern of the vector against the hyperplanes."""
    bits = []
    for plane in planes:
        # one parsed literal per plane: building dim-many F.lit columns
        # costs thousands of py4j round-trips per query construction (it
        # dominated wall time before execution even started); repr() is
        # shortest-round-trip so the parsed doubles are bit-identical
        arr = F.expr(
            "array(" + ",".join(f"{float(v)!r}D" for v in plane) + ")"
        )
        dot = F.aggregate(
            F.zip_with(F.transform(vec, lambda x: x.cast("double")), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    num_planes: int = 4,
    num_tables: int = 3,
    max_bucket_size: int | None = 512,
    kernel: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-confined.

    Candidate pairs are documents sharing a random-hyperplane bucket in at
    least one table (the quadratic work is confined to bucket collisions);
    candidates are then exactly verified: (id_a, id_b, cos_sim) with
    id_a < id_b and cos_sim >= threshold. At corpus scale the bucket join
    shuffles on the bucket id only — no cross product ever forms, and
    buckets above ``max_bucket_size`` are dropped from candidate generation
    (a hot bucket of k vectors would emit k²/2 rows on one shuffle key).
    Pass ``dim`` from the catalog; the ``None`` fallback probes the first
    row (a driver-side job at plan-construction time — avoid at scale).

    ``kernel='arrow'`` (default) runs the hot loops Arrow-vectorized:
    bucket bits come from one GEMM against the stacked plane matrix, and
    pair verification happens INSIDE each (table, bucket) group — a
    bucket-local GEMM with a 1e-6 guard band whose survivors are
    re-scored by the exact sequential fold (``_bucket_pairs_arrow``).
    Output is BIT-IDENTICAL to ``kernel='fold'`` (the pure
    interpreted-fold path), but the plan has ONE shuffle (the bucket
    groupBy) instead of the fold path's cap-window + candidate-distinct +
    two vector re-join exchanges, and the per-row cost drops ~an order of
    magnitude.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes_by_table = [
        _hyperplanes(dim, num_planes, seed=f"nd{t}") for t in range(num_tables)
    ]
    if kernel == "arrow":
        melted = corpus.select(
            F.col(id_col),
            F.col(vec_col).alias("_vec"),
            _pd_bucket_strings(F.col(vec_col), planes_by_table).alias("_ba"),
        ).select(id_col, "_vec", F.posexplode("_ba").alias("_bi", "_bh"))
        id_ddl = corpus.schema[id_col].dataType.simpleString()
        pairs = _bucket_pairs_arrow(melted, threshold, max_bucket_size, id_col, id_ddl)
        # a pair sharing buckets in several tables is emitted once per
        # table with the SAME exact value — dedup runs over the tiny
        # surviving pair set, not the candidate set
        return pairs.dropDuplicates(["id_a", "id_b"])
    # long-format (id, table_idx, bucket): all tables share one self-join,
    # and bucket sizes can be counted (and capped) in one aggregation
    tbl_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("_bi"),
                lsh_bucket_col(F.col(vec_col), planes_by_table[t]).alias("_bh"),
            )
            for t in range(num_tables)
        ]
    )
    melted = (
        corpus.select(F.col(id_col), tbl_structs.alias("_ba"))
        .select(id_col, F.explode("_ba").alias("_bb"))
        .select(id_col, F.col("_bb._bi").alias("_bi"), F.col("_bb._bh").alias("_bh"))
        # materialize once: the hyperplane folds are the expensive part and
        # this frame feeds the size count AND both join sides (3 re-evals
        # otherwise); rows are (id, int, bucket-string) — tiny
        .transform(materialize)
    )
    if max_bucket_size is not None:
        # a k-vector bucket emits k²/2 candidate rows on one shuffle key;
        # oversized buckets (near-identical boilerplate embeddings, zero
        # vectors) are dropped from candidate generation. Sizes via
        # groupBy + semi join, NOT a count window: the window reused the
        # self-join's exchange but still materialized every row of a hot
        # bucket in one task BEFORE the cap filter dropped it — the very
        # buckets the cap exists for. The aggregate gets map-side partial
        # aggregation and the semi join AQE skew splitting (guide §2.5).
        small = (
            melted.groupBy("_bi", "_bh")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_bucket_size)
            .select("_bi", "_bh")
        )
        melted = melted.join(small, ["_bi", "_bh"], "left_semi")
    left = melted.select(F.col(id_col).alias("id_a"), "_bi", "_bh")
    right = melted.select(F.col(id_col).alias("id_b"), "_bi", "_bh")
    cand = (
        left.join(right, ["_bi", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        # candidate rows are tiny in BYTES but each costs a dim-length
        # interpreted fold downstream — AQE's byte-based coalescing would
        # collapse them onto a couple of tasks; an explicit user
        # repartition is exempt from coalescing and keeps the verify stage
        # parallel
        .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    )
    # squared norms are per-VECTOR, not per-pair: fold them once over the
    # corpus (the n² candidate stage then runs one dot fold per pair
    # instead of three interpreted HOF folds — same float op order, so
    # bit-identical to folding inside the pair)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    withn = corpus.select(F.col(id_col), vd.alias("_v"), n2.alias("_n2"))
    a = withn.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n2").alias("_na2")
    )
    bb = withn.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n2").alias("_nb2")
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    scored = cand.join(a, "id_a").join(bb, "id_b").select(
        "id_a",
        "id_b",
        F.when(
            (F.col("_na2") > 0) & (F.col("_nb2") > 0),
            dot / (F.sqrt("_na2") * F.sqrt("_nb2")),
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def ivf_centroid_model(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float], float]]:
    """Train the IVF coarse quantizer: the ``nlist`` corpus vectors with
    the smallest md5(id) digest are the centroids.

    Deterministic and engine-portable by construction — a Lloyd/k-means
    refinement would converge to engine-specific floats and break
    cross-engine verification; hash-sampled corpus vectors are the standard
    cheap initialization and give comparable recall at equal nlist on
    near-isotropic corpora. Runs ONE TakeOrdered job over the corpus (the
    offline "training" step every IVF index has) and returns the model as
    plain Python ``[(cid, vec_doubles, norm2), ...]`` — nlist×dim small,
    meant to be inlined as literals so that assignment is a join-free,
    shuffle-free map over the corpus. norm2 is folded left-to-right to
    match the engines' sequential list folds bit-for-bit.
    """
    rows = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(nlist)
        .collect()
    )
    model = []
    for r in rows:
        v = [float(x) for x in r["cv"]]
        n2 = 0.0
        for x in v:
            n2 += x * x
        model.append((r["cid"], v, n2))
    model.sort(key=lambda t: t[0])
    return model


def _centroid_scores(vec: Column, model: list[tuple[int, list[float], float]]) -> Column:
    """array<struct<s,nc>> of (cosine-to-centroid, -cid), one per centroid.

    ``array_max`` of this is the assignment (highest similarity, ties to the
    lowest centroid id via the negated id); a descending sort's prefix is
    the probe list. Zero vectors score -2.0 (below the cosine range) against
    every centroid, so they land deterministically in the lowest-cid cell.
    """
    vd = F.transform(vec, lambda x: x.cast("double"))
    vn2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    entries = []
    for cid, cv, cn2 in model:
        if cn2 > 0:
            arr = F.expr("array(" + ",".join(f"{v!r}D" for v in cv) + ")")
            dot = F.aggregate(
                F.zip_with(vd, arr, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
            )
            sim = F.coalesce(
                F.when(vn2 > 0, dot / (F.sqrt(vn2) * F.lit(math.sqrt(cn2)))),
                F.lit(-2.0),
            )
        else:
            sim = F.lit(-2.0)
        entries.append(F.struct(sim.alias("s"), F.lit(-cid).cast("long").alias("nc")))
    return F.array(*entries)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    model: list[tuple[int, list[float], float]] | None = None,
    kernel: str = "arrow",
) -> DataFrame:
    """IVF approximate top-k: assign every corpus vector to its nearest
    centroid cell, probe the ``nprobe`` cells nearest each query, score only
    vectors in probed cells.

    The 100-TB shape: the model is literals, so assignment is a map-only
    scan (no shuffle, no join — compare the LSH table unions); scoring joins
    the broadcast (query, probe-cell) pairs against the assigned corpus, so
    the quadratic work is confined to nprobe/nlist of the corpus per query.
    At cluster scale the cell id becomes a partition/bucket column written
    at ingest, and the probe join prunes cells at scan time.

    ``kernel='arrow'`` (default) fuses assignment and probe scoring into
    ONE ``mapInArrow`` corpus pass (``_ivf_scores_arrow``): a GEMM against
    the centroid matrix assigns cells (near-tied rows fall back to the
    exact fold), each query's probed cells are GEMM-scored in the same
    batch, and only the SLIM (_qid, id, _sf) frame is shuffled into the
    guard-band windows. Candidates within 1e-6 of the fast kth score are
    re-scored by the exact fold (a broadcast-survivor rejoin touching
    ~k rows per query) and re-ranked, so output is BIT-IDENTICAL to
    ``kernel='fold'``; query-side probe lists always use the exact
    literal fold (the query frame is tiny).
    """
    from pyspark.sql import Window

    if model is None:
        model = ivf_centroid_model(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    if kernel == "arrow":
        import math as _math

        # probe lists computed driver-side from ONE collect of the (small)
        # query frame — replicating _centroid_scores' float ops and
        # (s desc, cid asc) tie-break exactly in Python doubles (IEEE ==
        # JVM), instead of building the nlist*dim literal fold expression
        # (whose parse/py4j cost dominated construction) plus a second
        # collect job
        qrows = queries.select(query_id_col, vec_col).collect()
        qitems, qtriples = [], []
        for r in qrows:
            qv = [float(x) for x in r[1]]
            qn2 = _seq_dot(qv, qv)
            entries = []
            for cid, cv, cn2 in model:
                if cn2 > 0 and qn2 > 0:
                    s = _seq_dot(qv, cv) / (_math.sqrt(qn2) * _math.sqrt(cn2))
                else:
                    s = -2.0
                entries.append((s, -cid))
            entries.sort(reverse=True)  # (s desc, nc desc) = (s desc, cid asc)
            cells = [-nc for _, nc in entries[:nprobe]]
            for cell in cells:
                qitems.append((r[0], qv, qn2, cell))
            qtriples.append((r[0], qv, qn2))
        qid_ddl = queries.schema[query_id_col].dataType.simpleString()
        id_ddl = corpus.schema[id_col].dataType.simpleString()
        qdf = corpus.sparkSession.createDataFrame(
            qtriples, f"_qid {qid_ddl}, _qvec array<double>, _qn2 double"
        )
        slim = _ivf_scores_arrow(
            corpus, qitems, model, id_col, vec_col, qid_ddl, id_ddl
        )
        # guard-band top-k: everything within 1e-6 of the fast kth score
        # (plus NULL-score rows, which may legitimately fill a short
        # top-k) survives to the exact re-score. Fewer than k candidates
        # -> kth is NULL -> keep all.
        wr = Window.partitionBy("_qid").orderBy(F.desc("_sf"), F.asc(id_col))
        wq = Window.partitionBy("_qid")
        ranked = slim.withColumn("_rf", F.row_number().over(wr))
        kth = F.max(F.when(F.col("_rf") == k, F.col("_sf"))).over(wq)
        surv = (
            ranked.withColumn("_kth", kth)
            .filter(
                F.col("_kth").isNull()
                | F.col("_sf").isNull()
                | (F.col("_sf") >= F.col("_kth") - 1e-6)
            )
            .select("_qid", id_col)
        )
        # survivors are ~k rows per query: broadcast them back over the
        # corpus scan (map-side semi-reduction, no corpus shuffle) and
        # attach the query vectors for the exact fold re-score
        dot = F.aggregate(
            F.zip_with(vd, F.col("_qvec"), lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        scored = (
            corpus.join(F.broadcast(surv), id_col)
            .join(F.broadcast(qdf), "_qid")
            .select(
                F.col("_qid").alias(query_id_col),
                F.col(id_col),
                F.when(
                    (n2 > 0) & (F.col("_qn2") > 0),
                    dot / (F.sqrt(n2) * F.sqrt("_qn2")),
                ).alias("cos_sim"),
            )
        )
    else:
        # probe list: descending sort of the score structs = s desc, cid asc
        # (natural ascending struct order is (s asc, nc asc); reversed,
        # equal-s runs come out nc desc = cid asc — exactly the oracle's
        # row_number ORDER BY s DESC, cid ASC). Heavy arrays are projected
        # BEFORE the explode so the fold doesn't run once per generated row.
        probes = F.transform(
            F.slice(
                F.reverse(F.array_sort(_centroid_scores(F.col(vec_col), model))),
                1,
                nprobe,
            ),
            lambda t: -t["nc"],
        )
        qpre = queries.select(
            F.col(query_id_col).alias("_qid"),
            vd.alias("_qvec"),
            n2.alias("_qn2"),
            probes.alias("_cells"),
        )
        qcells = qpre.select("_qid", "_qvec", "_qn2", F.explode("_cells").alias("_cell"))
        assigned = corpus.select(
            F.col(id_col),
            vd.alias("_v"),
            n2.alias("_n2"),
            (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias("_cell"),
        )
        dot = F.aggregate(
            F.zip_with(F.col("_v"), F.col("_qvec"), lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        scored = assigned.join(F.broadcast(qcells), "_cell").select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.when(
                (F.col("_n2") > 0) & (F.col("_qn2") > 0),
                dot / (F.sqrt("_n2") * F.sqrt("_qn2")),
            ).alias("cos_sim"),
        )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    model: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus as an IVF index: parquet partitioned by the cell
    id, vectors stored with their precomputed squared norms.

    This is the cluster-scale layout the probe path wants: a query that
    probes nprobe of nlist cells reads nprobe directories — partition
    pruning happens at file-listing time, before any task launches. The
    assignment scan is shuffle-free (model is literals); the only movement
    is the partitioned write itself.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    (
        corpus.select(
            F.col(id_col),
            vd.alias("vec"),
            n2.alias("norm2"),
            (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def append_ivf_index(
    new_vectors: DataFrame,
    path: str,
    model: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a ``write_ivf_index`` index.

    The centroid model is FROZEN at build time (the standard IVF contract —
    FAISS/Milvus-style indexes retrain offline, never on append), so an
    append is a map-only assignment of the new batch plus a partitioned
    parquet append into the touched cells: appending to a 100 TB index
    costs the batch's own assignment, never a corpus rescan or an index
    rewrite. Cell partition pruning keeps working because the layout is
    unchanged."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    (
        new_vectors.select(
            F.col(id_col),
            vd.alias("vec"),
            n2.alias("norm2"),
            (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias("cell"),
        )
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    model: list[tuple[int, list[float], float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a persisted IVF index written by ``write_ivf_index``.

    The probed cells are computed from the literal model, so the cell
    filter is a literal IN-list and prunes index partitions at scan time
    (``.explain`` shows it in PartitionFilters — asserted in tests). One
    scan serves all queries: the filter is the union of every query's
    probe list; per-pair confinement happens in the broadcast-hash join on
    the cell id.
    """
    from pyspark.sql import Window

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    probes = F.transform(
        F.slice(F.reverse(F.array_sort(_centroid_scores(F.col(vec_col), model))), 1, nprobe),
        lambda t: -t["nc"],
    )
    qpre = queries.select(
        F.col(query_id_col).alias("_qid"),
        vd.alias("_qvec"),
        n2.alias("_qn2"),
        probes.alias("_cells"),
    )
    qcells = qpre.select("_qid", "_qvec", "_qn2", F.explode("_cells").alias("cell"))
    # literal probe union -> partition pruning at file listing; computed on
    # the (small) query frame, so this collect is a quantizer-sized job
    probe_union = sorted(
        {r["cell"] for r in qcells.select("cell").distinct().collect()}
    )
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probe_union))
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("_qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    scored = idx.join(F.broadcast(qcells), "cell").select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        F.when(
            (F.col("norm2") > 0) & (F.col("_qn2") > 0),
            dot / (F.sqrt("norm2") * F.sqrt("_qn2")),
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    num_planes: int = 8,
    num_tables: int = 4,
    kernel: str = "arrow",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in at least one hash table.

    ``kernel="arrow"`` (default): ONE Arrow-batched corpus projection
    computes every table's bucket string per row with a single GEMM
    (``_pd_bucket_strings`` — guard-banded, bit-identical to the fold
    path), matches them against per-table bucket→query-ids MAP LITERALS
    built from the (tiny, collected) query side, and explodes the matching
    query ids — no melt, no bucket join, no per-row interpreted plane
    folds. Scoring runs the exact fold expressions over the already-tiny
    candidate set, so cos_sim is bit-identical to the fold path and the
    SQL oracle. The only shuffle carries the candidates into the top-k
    window.

    ``kernel="fold"``: the interpreted melt + bucket-join reference path
    (each row explodes to num_tables (table, bucket) rows; the bucket
    match against the broadcast query side is map-side)."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if kernel == "arrow":
        planes_by_table = [
            _hyperplanes(dim, num_planes, seed=f"lsh{t}") for t in range(num_tables)
        ]
        qrows = queries.select(query_id_col, vec_col).collect()
        qb_by_table: list[dict[str, list]] = [{} for _ in range(num_tables)]
        for r in qrows:
            v = [float(x) for x in r[1]]
            for t, planes in enumerate(planes_by_table):
                bits = "".join("1" if _seq_dot(v, p) >= 0 else "0" for p in planes)
                qb_by_table[t].setdefault(bits, []).append(r[0])
        bks = _pd_bucket_strings(F.col(vec_col), planes_by_table)
        matches = []
        for t in range(num_tables):
            if not qb_by_table[t]:
                continue
            entries = []
            for b, qids in qb_by_table[t].items():
                entries.append(F.lit(b))
                entries.append(F.array(*[F.lit(q) for q in qids]))
            matches.append(
                F.coalesce(
                    F.create_map(*entries)[F.col("_bks").getItem(t)], F.array()
                )
            )
        if not matches:
            empty = F.array().cast("array<string>")
            matches = [empty]
        cand = (
            corpus.select(F.col(id_col), F.col(vec_col), bks.alias("_bks"))
            .select(
                id_col,
                vec_col,
                F.explode(F.array_distinct(F.concat(*matches))).alias("_qid"),
            )
            .join(
                F.broadcast(
                    queries.select(
                        F.col(query_id_col).alias("_qid"),
                        F.col(vec_col).alias("_qraw"),
                    )
                ),
                "_qid",
            )
        )
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        qd = F.transform(F.col("_qraw"), lambda x: x.cast("double"))
        n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
        qn2 = F.aggregate(qd, F.lit(0.0), lambda s, x: s + x * x)
        dot = F.aggregate(
            F.zip_with(vd, qd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
        scored = cand.select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.when((n2 > 0) & (qn2 > 0), dot / (F.sqrt(n2) * F.sqrt(qn2))).alias(
                "cos_sim"
            ),
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.desc("cos_sim"), F.asc(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    # per-vector squared norms fold once per side, not once per candidate
    # (the interpreted HOF fold is the per-row cost driver; the dot is the
    # only fold that genuinely needs the pair)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n2 = F.aggregate(vd, F.lit(0.0), lambda s, x: s + x * x)
    tbl_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("_bi"),
                lsh_bucket_col(
                    F.col(vec_col), _hyperplanes(dim, num_planes, seed=f"lsh{t}")
                ).alias("_b"),
            )
            for t in range(num_tables)
        ]
    )
    # expensive expressions are projected BEFORE the explode so the
    # generator passes them through instead of re-evaluating per output row
    cb = (
        corpus.select(
            F.col(id_col), vd.alias("_v"), n2.alias("_n2"), tbl_structs.alias("_ba")
        )
        .select(id_col, "_v", "_n2", F.explode("_ba").alias("_bb"))
        .select(
            id_col,
            "_v",
            "_n2",
            F.col("_bb._bi").alias("_bi"),
            F.col("_bb._b").alias("_b"),
        )
    )
    qb = (
        queries.select(
            F.col(query_id_col).alias("_qid"),
            vd.alias("_qvec"),
            n2.alias("_qn2"),
            tbl_structs.alias("_ba"),
        )
        .select("_qid", "_qvec", "_qn2", F.explode("_ba").alias("_bb"))
        .select(
            "_qid",
            "_qvec",
            "_qn2",
            F.col("_bb._bi").alias("_bi"),
            F.col("_bb._b").alias("_b"),
        )
    )
    cand = (
        cb.join(F.broadcast(qb), ["_bi", "_b"])
        .select("_qid", id_col, "_qvec", "_qn2", "_v", "_n2")
        .dropDuplicates(["_qid", id_col])
    )
    dot = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    scored = cand.select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        F.when(
            (F.col("_n2") > 0) & (F.col("_qn2") > 0),
            dot / (F.sqrt("_n2") * F.sqrt("_qn2")),
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_cells_arrow(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow-vectorized IVF cell assignment of the whole corpus: one GEMM
    against the centroid matrix per batch, with near-tied rows re-decided
    by the exact sequential fold (the same guard-band discipline as
    ``_ivf_scores_arrow``) — so every assignment is bit-identical to the
    ``_centroid_scores`` expression path while costing a matrix multiply
    instead of nlist interpreted folds per row. Map-only: emits
    (id, _vec, cell) straight out of the scan task."""
    import pyarrow as pa

    cids = np.array([cid for cid, _, _ in model], dtype=np.int64)
    cmat = np.array([cv for _, cv, _ in model], dtype=np.float64)
    cn2 = np.array([n2 for _, _, n2 in model], dtype=np.float64)
    cnorm = np.sqrt(np.where(cn2 > 0, cn2, np.inf))

    def assign(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids, vecs = rb.column(0), rb.column(1)
            m32, m = _list_matrix(vecs, n)
            vn2 = (m * m).sum(axis=1)
            vnorm = np.sqrt(np.where(vn2 > 0, vn2, np.inf))
            csims = (m @ cmat.T) / vnorm[:, None] / cnorm[None, :]
            csims = np.where(np.isfinite(csims), csims, -2.0)
            # the inf-norm division leaves 0.0 (finite) for zero-norm
            # centroids/rows, but the fold path scores those -2.0 — pin
            # them explicitly or a zero centroid would beat every
            # negative-cosine real centroid with a >1e-9 margin and dodge
            # the exact-fold fallback
            csims[:, cn2 <= 0] = -2.0
            csims[vn2 <= 0, :] = -2.0
            best = np.argmax(csims, axis=1)  # first max = lowest cid on ties
            cells = cids[best]
            if csims.shape[1] > 1:
                part = np.partition(csims, -2, axis=1)
                for i in np.nonzero(part[:, -1] - part[:, -2] < 1e-9)[0]:
                    cells[i] = _exact_cell(m32[i], model)
            yield pa.RecordBatch.from_arrays(
                [ids, vecs, pa.array(cells, pa.int64())],
                names=[id_col, "_vec", "cell"],
            )

    id_ddl = corpus.schema[id_col].dataType.simpleString()
    vec_ddl = corpus.schema[vec_col].dataType.simpleString()
    return corpus.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        assign, f"{id_col} {id_ddl}, _vec {vec_ddl}, cell long"
    )


def semantic_deduplicate(
    corpus: DataFrame,
    threshold: float = 0.35,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: list[tuple[int, list[float], float]] | None = None,
    max_cell_size: int = 4096,
    kernel: str = "arrow",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication confined to embedding-space clusters.

    Every vector is assigned to its nearest centroid (the same
    deterministic md5-sampled coarse quantizer as ``ivf_topk`` —
    k-means-free so the model is engine-portable), and WITHIN each cell a
    vector is a semantic duplicate iff a lower-id vector in the cell has
    cosine >= threshold. The paper keeps a per-group random/low-centroid-
    similarity representative; the keep-lowest-id rule used here is its
    deterministic, verification-friendly variant (the paper reports the
    choice of representative barely moves downstream accuracy, §4.3).

    Returns one row per corpus vector: ``(id, cell, dup_of, keep)`` where
    ``dup_of`` is the LOWEST same-cell id whose cosine clears the
    threshold (NULL when none) and ``keep = dup_of IS NULL``.

    Shape at scale: assignment is a shuffle-free map over inlined centroid
    literals; the quadratic work never leaves a cell, and cells above
    ``max_cell_size`` are split into deterministic md5-ordered shards
    first (duplicates across shards of one oversized cell are missed —
    the documented price of bounding the per-task GEMM; size nlist ~
    corpus/1000 so healthy cells stay far below the cap). One shuffle
    (the cell window + groupBy family); the per-cell kernel is a single
    Arrow GEMM with a 1e-6 guard band whose boundary rows are re-scored
    by the engines' shared sequential fold, so every keep/drop DECISION
    is bit-identical to the interpreted path.

    ``kernel='arrow'`` (default) also runs the cell ASSIGNMENT as one
    GEMM per Arrow batch (``_assign_cells_arrow``, exact-fold guard band
    on near-ties — bit-identical cells); ``'fold'`` keeps the inlined
    ``_centroid_scores`` expression path (nlist interpreted folds per
    row; the cross-engine-shared formulation the oracle mirrors).
    """
    import math as _math

    import pyarrow as pa
    from pyspark.sql import Window

    if model is None:
        model = ivf_centroid_model(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    if kernel == "arrow":
        # GEMM assignment with exact-fold guard band — bit-identical
        # cells, ~nlist x cheaper per row than the interpreted folds
        assigned = _assign_cells_arrow(corpus, model, id_col, vec_col)
    else:
        assigned = corpus.select(
            F.col(id_col),
            F.col(vec_col).alias("_vec"),
            (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"])
            .cast("long")
            .alias("cell"),
        )
    wc = Window.partitionBy("cell").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    sharded = assigned.withColumn(
        "_shard", F.floor((F.row_number().over(wc) - 1) / F.lit(max_cell_size))
    )
    id_ddl = corpus.schema[id_col].dataType.simpleString()

    def score(tbl: "pa.Table") -> "pa.Table":
        id_type = tbl.schema.field(id_col).type
        out_schema = pa.schema(
            [
                pa.field(id_col, id_type),
                pa.field("cell", pa.int64()),
                pa.field("dup_of", id_type),
            ]
        )
        n = tbl.num_rows
        ids = tbl.column(id_col).to_pylist()
        cells = tbl.column("cell").to_pylist()
        if n < 2:
            return pa.table(
                {
                    id_col: pa.array(ids, id_type),
                    "cell": pa.array(cells, pa.int64()),
                    "dup_of": pa.array([None] * n, id_type),
                },
                schema=out_schema,
            )
        m32, m = _list_matrix(tbl.column("_vec").combine_chunks(), n)
        order = sorted(range(n), key=lambda i: ids[i])
        m32, m = m32[order], m[order]
        ids = [ids[i] for i in order]
        n2 = (m * m).sum(axis=1)
        nrm = np.sqrt(np.where(n2 > 0, n2, np.inf))
        sims = (m @ m.T) / nrm[:, None] / nrm[None, :]
        dup_of: list = [None] * n
        for j in range(1, n):
            if not n2[j] > 0:
                continue
            with np.errstate(invalid="ignore"):
                cand = np.nonzero(sims[j, :j] >= threshold - 1e-6)[0]
            for i in cand:  # ascending id order: first exact hit is the min
                if not n2[i] > 0:
                    continue
                na2 = _seq_dot(m32[i], m32[i])
                nb2 = _seq_dot(m32[j], m32[j])
                if not (na2 > 0 and nb2 > 0):
                    continue
                cs = _seq_dot(m32[i], m32[j]) / (_math.sqrt(na2) * _math.sqrt(nb2))
                if cs >= threshold:
                    dup_of[j] = ids[i]
                    break
        return pa.table(
            {
                id_col: pa.array(ids, id_type),
                "cell": pa.array([cells[0]] * n, pa.int64()),
                "dup_of": pa.array(dup_of, id_type),
            },
            schema=out_schema,
        )

    out = sharded.groupBy("cell", "_shard").applyInArrow(
        score, f"{id_col} {id_ddl}, cell long, dup_of {id_ddl}"
    )
    return out.select(
        id_col, "cell", "dup_of", F.col("dup_of").isNull().alias("keep")
    )


def hashed_embedding(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "fh",
    normalize: bool = True,
) -> DataFrame:
    """Model-free document embedding by the hashing trick (Weinberger et
    al. 2009, "Feature Hashing for Large Scale Multitask Learning"):
    every token hashes to one of ``dim`` buckets with a +-1 sign (both
    md5-derived, engine-portable), bucket sums are L2-normalized, and the
    result is a dense ``array<double>`` ready for the ANN / semantic-dedup
    operators — the standard featurization when no trained encoder is in
    the pipeline (and the exact preconditioner of one: swap this column
    for model embeddings without touching the similarity plumbing).

    Returns ``(id, embedding array<double>)``; with ``normalize=False``
    the raw signed-count vector (integer-valued — exact across engines).

    Shape at scale: one explode + ONE (id, bucket)-keyed aggregation with
    map-side combine, then a per-doc map assembly — corpus-linear, no
    global state, no model artifact to broadcast.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("_tok"))
    h = F.md5(F.concat(F.lit(seed + ":"), F.col("_tok")).cast("binary"))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).alias("_b")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    cells = (
        exploded.select(F.col(id_col), bucket, sign.alias("_s"))
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    assembled = cells.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("_m")[i], F.lit(0)).cast("double"),
    )
    if not normalize:
        return assembled.select(F.col(id_col), dense.alias("embedding"))
    # the squared norm folds over the SPARSE map values (integer squares —
    # exact in any summation order, so the dense-fold oracle matches), and
    # the dense assembly divides in the SAME single transform: building
    # the array first and normalizing it in a second transform re-evaluates
    # the assembly per element downstream (a posexplode consumer measured
    # 6x slower). _n2 is referenced twice (guard + divisor), which keeps
    # CollapseProject from inlining the fold into the lambda.
    n2 = F.aggregate(
        F.map_values(F.col("_m")),
        F.lit(0.0),
        lambda s, x: s + x.cast("double") * x.cast("double"),
    )
    pre = assembled.select(F.col(id_col), F.col("_m"), n2.alias("_n2"))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.col("_n2") > 0,
            F.coalesce(F.col("_m")[i], F.lit(0)).cast("double")
            / F.sqrt(F.col("_n2")),
        ).otherwise(F.coalesce(F.col("_m")[i], F.lit(0)).cast("double")),
    )
    return pre.select(F.col(id_col), emb.alias("embedding"))


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qmax: int = 127,
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard memory/IO
    lever for corpus-scale vector search (4x smaller scans than float32,
    8x than float64; the scalar-quantization baseline of the
    Jégou/Douze PQ lineage, arXiv:1102.3828 §II).

    ``scale = max(|v|)``; ``q[i] = round(v[i] / scale * 127)`` (all
    |q| <= 127 by construction, so no clamp is needed). Returns
    ``(id, qvec array<int>, scale double)``. Cosine over ``qvec`` is
    scale-free (direction is preserved), and because dot products and
    norms become INTEGER sums it is bit-deterministic under any
    aggregation order or partitioning — unlike float folds, which pin
    the summation order to stay hash-stable.

    Map-only: per-row array arithmetic, no shuffle.

    ``qmax`` selects the level count: 127 = int8 (default); 7 = int4,
    the 8x-compression tier (2 components/byte packed on disk) whose
    recall cost the ``int4_recall`` gate measures.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.select(
        F.col(id_col),
        vd.alias("_v"),
        F.array_max(F.transform(vd, lambda x: F.abs(x))).alias("scale"),
    )
    return staged.select(
        F.col(id_col),
        _int8_qvec(F.col("_v"), F.col("scale"), qmax).alias("qvec"),
        F.col("scale"),
    )


def _int8_qvec(v: Column, scale: Column, qmax: int = 127) -> Column:
    """The int8 quantization rule — ``round(x / scale * 127)`` with the
    zero-vector guard — as a Column, the single source of truth shared by
    ``quantize_embeddings`` and ``ivfpq_topk``'s fused (cell, codes)
    projection: PQ codes, LUTs and scalar-quantized scans must all agree
    bit-for-bit or every ADC distance silently corrupts."""
    return F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale * qmax).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("int")))


def pq_codebook(
    df: DataFrame,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Product-quantization codebooks (Jégou/Douze/Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 /
    arXiv:1102.3828): the vector is split into ``m`` subspaces, each with
    its own ``codes``-entry codebook; a vector is stored as ``m`` small
    code ids instead of floats.

    Codebook entries are the subvectors of the ``codes`` corpus vectors
    with smallest md5(id) — the same deterministic, engine-portable
    "training" convention as ``ivf_centroid_model`` (a uniform corpus
    sample; real k-means iterations refine recall but break cross-engine
    exactness). Vectors are int8-quantized first so every distance
    downstream is exact integer arithmetic.

    Returns ``codebook[s][c] -> list[int]`` of length ``dim / m``.
    The whole model is ``m * codes * (dim/m) = codes * dim`` small ints —
    driver/broadcast-sized by construction.
    """
    qc = quantize_embeddings(df, id_col, vec_col)
    rows = (
        qc.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(codes)
        .select("qvec")
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebook: empty corpus")
    dim = len(rows[0]["qvec"])
    if dim % m:
        raise ValueError(f"pq_codebook: dim {dim} not divisible by m={m}")
    d = dim // m
    return [
        [[int(v) for v in r["qvec"][s * d : (s + 1) * d]] for r in rows]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors as PQ codes: per subspace, the code of the nearest
    codebook entry by squared L2 (ties to the lowest code id — matching
    ``array_position``'s first-occurrence rule and the oracle's
    ``ORDER BY d, code``). Returns ``(id, codes array<int>)``.

    Map-only and entirely JVM-side: the codebook unrolls into literal
    squared-difference expressions (codes * dim multiply-adds per row)
    inside whole-stage codegen — no UDF, no shuffle. At 100 TB this is
    the one-time compression pass; with the default 8 subspaces x 16
    codes a 64-dim float32 vector (256 B) stores as 8 nibbles (4 B) —
    64x smaller scans for every later ADC query.
    """
    qc = quantize_embeddings(df, id_col, vec_col)
    return qc.select(
        F.col(id_col), _pq_codes_col(codebook).alias("codes")
    )


def _pq_codes_col(codebook: list[list[list[int]]], qcol: str = "qvec") -> Column:
    """``array<int>`` of per-subspace PQ codes over the ``qcol`` column:
    integer squared-difference folds + first-min ``array_position`` (ties
    to the lowest code, matching the oracle's ORDER BY d, code).

    Built as ONE compact SQL expression over the nested codebook array
    literal (higher-order transform/aggregate), not an unrolled
    codes*dim tree: the unrolled form costs seconds of py4j construction
    and analyzer time per call, the expr string parses JVM-side once."""
    m = len(codebook)
    d = len(codebook[0][0])
    cb = (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(f"{int(v)}L" for v in c) + ")"
                for c in codebook[s]
            )
            + ")"
            for s in range(m)
        )
        + ")"
    )
    dists = (
        f"transform(sequence(0, {m - 1}), s -> "
        f"transform({cb}[s], cv -> "
        f"aggregate(sequence(0, {d - 1}), 0L, (acc, i) -> "
        f"acc + (CAST({qcol}[s * {d} + i] AS BIGINT) - cv[i])"
        f" * (CAST({qcol}[s * {d} + i] AS BIGINT) - cv[i]))))"
    )
    return F.expr(
        f"transform({dists}, ds ->"
        " CAST(array_position(ds, array_min(ds)) - 1 AS INT))"
    )


def _pq_lut_dist(lut: list[list[int]]) -> Column:
    """ADC distance over a ``codes`` column for one query's ``m x codes``
    integer lookup table, as one compact SQL fold over the LUT literal."""
    m = len(lut)
    lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in row) + ")"
            for row in lut
        )
        + ")"
    )
    return F.expr(
        f"aggregate(sequence(0, {m - 1}), 0L,"
        f" (acc, s) -> acc + {lit}[s][codes[s]])"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebook: list[list[list[int]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query builds an
    ``m x codes`` lookup table of exact integer squared distances to every
    codebook entry; a corpus vector's approximate distance is the sum of
    ``m`` table lookups on its stored codes — the compressed-domain scan
    of Jégou et al. §IV. Returns ``(query_id, vec_id, pq_dist, rank)``,
    ranked ascending by distance (ties to the lowest vec_id).

    Everything is integer arithmetic on int8-quantized values, so the
    ranking is bit-deterministic across engines and partitionings.

    Shape at scale: the codebook and per-query LUTs are literals (no join,
    no shuffle before the final per-query top-k window); the corpus pass
    reads only the ``m``-byte code column — the point of PQ is that this
    scan is ~64x smaller than the float scan of ``brute_force_topk``.
    The query frame must be query-batch-sized (it is collected to build
    LUTs, same contract as the other ANN entry points).
    """
    if codebook is None:
        codebook = pq_codebook(corpus, m, codes, id_col, vec_col)
    enc = pq_encode(corpus, codebook, id_col, vec_col)
    return _pq_adc_topk(
        enc, queries, codebook, k, id_col, vec_col, query_id_col
    )


def _pq_adc_topk(
    enc: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[int]]],
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """ADC top-k over an already-encoded ``(id, codes)`` frame — shared by
    the inline ``pq_topk`` and the persisted-index ``pq_index_topk`` (the
    index path reads stored codes instead of re-encoding the corpus)."""
    m = len(codebook)
    q_rows = (
        quantize_embeddings(queries, query_id_col, vec_col)
        .select(query_id_col, "qvec")
        .collect()
    )
    d = len(codebook[0][0])
    per_query = []
    for r in q_rows:
        qv = [int(x) for x in r["qvec"]]
        lut = [
            [
                sum(
                    (qv[s * d + i] - cv) ** 2
                    for i, cv in enumerate(codebook[s][c])
                )
                for c in range(len(codebook[s]))
            ]
            for s in range(m)
        ]
        per_query.append(
            F.struct(
                F.lit(r[query_id_col]).alias(query_id_col),
                _pq_lut_dist(lut).alias("pq_dist"),
            )
        )
    if not per_query:
        qid_ddl = queries.schema[query_id_col].dataType.simpleString()
        id_ddl = enc.schema[id_col].dataType.simpleString()
        return enc.sparkSession.createDataFrame(
            [],
            f"{query_id_col} {qid_ddl}, {id_col} {id_ddl},"
            " pq_dist bigint, rank int",
        )
    scored = enc.select(
        F.col(id_col), F.explode(F.array(*per_query)).alias("_q")
    ).select(
        F.col("_q")[query_id_col].alias(query_id_col),
        F.col(id_col),
        F.col("_q")["pq_dist"].alias("pq_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("pq_dist"), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[list[int]]] | None = None,
) -> list[list[list[int]]]:
    """Persist the corpus as a PQ index: the (id, codes) frame as parquet
    plus the codebook as a JSON sidecar (``model.json``) — the artifact
    pair every later query or append needs. Returns the codebook.

    This is the compressed-at-rest layout: queries scan ``m`` small ints
    per vector instead of the float column (~64x less IO at the default
    8x16 over 64 float32 dims). The codebook is FROZEN at build time
    (same contract as the IVF centroid model — retrain offline, never on
    append). At cluster scale the sidecar lives in the table metadata; a
    local JSON file stands in here.
    """
    import json
    import os

    if codebook is None:
        codebook = pq_codebook(corpus, m, codes, id_col, vec_col)
    pq_encode(corpus, codebook, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/model.json", "w") as fh:
        json.dump(codebook, fh)
    return codebook


def load_pq_codebook(path: str) -> list[list[list[int]]]:
    import json

    with open(f"{path}/model.json") as fh:
        return json.load(fh)


def append_pq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a ``write_pq_index`` index: encode ONLY
    the batch under the frozen codebook and parquet-append — appending to
    a 100 TB index costs the batch's own encode, never a corpus rescan or
    an index rewrite."""
    codebook = load_pq_codebook(path)
    pq_encode(new_vectors, codebook, id_col, vec_col).write.mode(
        "append"
    ).parquet(f"{path}/codes")


def pq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k straight off a persisted PQ index: reads the stored
    ``m``-byte codes (no re-encode, no float column) and must return
    exactly what the inline ``pq_topk`` returns for the same codebook and
    corpus — the split-append == one-shot equivalence the gate pins."""
    enc = spark.read.parquet(f"{path}/codes").select(id_col, "codes")
    codebook = load_pq_codebook(path)
    return _pq_adc_topk(
        enc, queries, codebook, k, id_col, vec_col, query_id_col
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    model: list[tuple[int, list[float], float]] | None = None,
    codebook: list[list[list[int]]] | None = None,
) -> DataFrame:
    """IVF cell pruning + PQ compressed-domain scoring — the IVFADC
    layout of Jégou et al. §V and the standard billion-scale ANN recipe:
    the coarse quantizer confines the scan to ``nprobe/nlist`` of the
    corpus, and the scan itself reads only ``m``-byte PQ codes.

    Unlike classic IVFADC the codes quantize the RAW vector, not the
    residual to the cell centroid: residual encoding refines recall but
    ties every distance to float centroid arithmetic; raw-vector codes
    keep the ranking all-integer and therefore bit-exact across engines
    (the recall cost at these code budgets is measured by ``ann_recall``).

    Returns ``(query_id, vec_id, pq_dist, rank)``, ascending distance,
    ties to the lowest id. Cell assignment follows ``ivf_topk`` exactly
    (literal float folds, ties to the lowest centroid id, zero vectors to
    the lowest cell); probe lists replicate the same float ops driver-side
    from ONE collect of the query frame.

    Shape at scale: one map-only corpus projection computes (cell, codes);
    at cluster scale both become ingest-time columns (cell = partition
    key, codes = the stored payload) and the probe filter prunes
    partitions at scan time. Scoring explodes the query batch only over
    rows whose cell is probed; the final window is per-query top-k.
    """
    if model is None:
        model = ivf_centroid_model(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    if codebook is None:
        codebook = pq_codebook(corpus, m, codes, id_col, vec_col)
    enc = _ivfraw_encode(corpus, model, codebook, id_col, vec_col)
    return _ivfraw_adc_topk(
        enc, queries, model, codebook, k, nprobe, id_col, vec_col,
        query_id_col,
    )


def _ivfraw_encode(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    codebook: list[list[list[int]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Map-only (id, cell, codes) projection for the raw-code IVFADC —
    the encode half of ``ivfpq_topk``, split out so composition gates
    can share ONE corpus scan across compared methods."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = corpus.select(
        F.col(id_col),
        vd.alias("_v"),
        F.array_max(F.transform(vd, lambda x: F.abs(x))).alias("_scale"),
        (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias(
            "_cell"
        ),
    )
    return staged.select(
        F.col(id_col),
        F.col("_cell"),
        _int8_qvec(F.col("_v"), F.col("_scale")).alias("qvec"),
    ).select(F.col(id_col), "_cell", _pq_codes_col(codebook).alias("codes"))


def _ivfraw_adc_topk(
    enc: DataFrame,
    queries: DataFrame,
    model: list[tuple[int, list[float], float]],
    codebook: list[list[list[int]]],
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Raw-code ADC scoring over an already-encoded (id, _cell, codes)
    frame — the scoring half of ``ivfpq_topk``."""
    m = len(codebook)
    d = len(codebook[0][0])
    # two tiny collects of the query frame: raw vectors for the float
    # probe-list fold (Python doubles == JVM doubles), int8 vectors for
    # the integer LUTs (quantized Spark-side so the rounding rule is the
    # engine's own)
    qraw, probes = _probe_lists(queries, model, nprobe, query_id_col, vec_col)
    qint = {r[0]: [int(x) for x in r[1]] for r in
            quantize_embeddings(queries, query_id_col, vec_col)
            .select(query_id_col, "qvec").collect()}
    per_query = []
    for qid in qraw:
        cells = probes[qid]
        qq = qint[qid]
        lut = [
            [
                sum(
                    (qq[s * d + i] - cv) ** 2
                    for i, cv in enumerate(codebook[s][c])
                )
                for c in range(len(codebook[s]))
            ]
            for s in range(m)
        ]
        ok = F.col("_cell").isin([int(c) for c in cells])
        per_query.append(
            F.struct(
                F.lit(qid).alias(query_id_col),
                # gate the ADC fold on the probe test so unprobed
                # (row, query) pairs skip the m-term LUT sum entirely —
                # that skip IS the nprobe/nlist compute confinement
                F.when(ok, _pq_lut_dist(lut)).alias("pq_dist"),
                ok.alias("_ok"),
            )
        )
    if not per_query:
        qid_ddl = queries.schema[query_id_col].dataType.simpleString()
        id_ddl = enc.schema[id_col].dataType.simpleString()
        return enc.sparkSession.createDataFrame(
            [],
            f"{query_id_col} {qid_ddl}, {id_col} {id_ddl},"
            " pq_dist bigint, rank int",
        )
    scored = (
        enc.select(F.col(id_col), F.explode(F.array(*per_query)).alias("_q"))
        .filter(F.col("_q")["_ok"])
        .select(
            F.col("_q")[query_id_col].alias(query_id_col),
            F.col(id_col),
            F.col("_q")["pq_dist"].alias("pq_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("pq_dist"), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _probe_lists(
    queries: DataFrame,
    model: list[tuple[int, list[float], float]],
    nprobe: int,
    query_id_col: str,
    vec_col: str,
) -> tuple[dict, dict]:
    """Driver-side probe lists for the IVFADC variants: ONE collect of
    the query batch, then per query the same sequential float cosine fold
    the corpus assignment runs (``_seq_dot`` — Python doubles == JVM
    doubles), sorted (similarity desc, cid asc). Returns
    ``(qraw: {qid: [float]}, probes: {qid: [cid]})`` in collect order —
    the single source of truth so the raw-code and residual-code paths
    can never probe different cells for the same query."""
    import math as _math

    qraw = {r[0]: [float(x) for x in r[1]] for r in
            queries.select(query_id_col, vec_col).collect()}
    probes: dict = {}
    for qid, qvf in qraw.items():
        qn2 = _seq_dot(qvf, qvf)
        entries = []
        for cid, cv, cn2 in model:
            if cn2 > 0 and qn2 > 0:
                s = _seq_dot(qvf, cv) / (_math.sqrt(qn2) * _math.sqrt(cn2))
            else:
                s = -2.0
            entries.append((s, -cid))
        entries.sort(reverse=True)  # (s desc, cid asc)
        probes[qid] = [-nc for _, nc in entries[:nprobe]]
    return qraw, probes


def residual_cell_scales(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, float]:
    """Per-cell residual quantization scales: for every IVF cell, the max
    |component| over the residuals (vector - assigned centroid) of its
    members. One corpus-linear pass ending in a 16-row aggregate; at
    cluster scale this is an ingest-time per-partition statistic.

    The scale is exact on both engines (elementwise double subtraction,
    abs, max — no summation), so the downstream integer quantization is
    bit-reproducible."""
    staged = corpus.select(
        _resid_col(F.col(vec_col), model).alias("_rv"),
        (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias(
            "_cell"
        ),
    )
    rows = (
        staged.groupBy("_cell")
        .agg(
            F.max(
                F.array_max(F.transform("_rv", lambda x: F.abs(x)))
            ).alias("_s")
        )
        .collect()
    )
    return {int(r["_cell"]): float(r["_s"]) for r in rows}


def _resid_col(
    vec: Column,
    model: list[tuple[int, list[float], float]],
    cell: Column | None = None,
) -> Column:
    """Residual of a vector vs its assigned IVF centroid, as a map-only
    Column: cell id from the shared cosine-assignment fold, centroid
    looked up in a cid -> array<double> map literal, elementwise double
    subtraction (single IEEE op per component — exact on both engines).

    ``cell``: the already-computed assignment column — pass it when the
    caller projects the cell anyway, so the nlist x dim centroid fold
    (the dominant per-row cost of every IVF encode) runs once per row,
    not twice."""
    if cell is None:
        cell = -F.array_max(_centroid_scores(vec, model))["nc"]
    entries = ", ".join(
        f"{cid}L, array({','.join(f'{v!r}D' for v in cv)})"
        for cid, cv, _ in model
    )
    cent = F.element_at(F.expr(f"map({entries})"), cell.cast("long"))
    vd = F.transform(vec, lambda x: x.cast("double"))
    return F.zip_with(vd, cent, lambda a, b: a - b)


def _q_resid_col(
    rv: Column,
    cell: Column,
    scales: dict[int, float],
    lim: int,
) -> Column:
    """Quantize a residual array under its cell's shared scale:
    ``round(x / scale * lim)`` (the _int8_qvec rule at ``lim`` steps).
    A shared per-cell scale — unlike the per-vector scale of the raw
    path — preserves MAGNITUDE relationships between residuals, which is
    what ADC distances on residuals measure; the wider ``lim`` (int16 by
    default) buys back the resolution a cell-max scale costs. Zero-scale
    cells (single exact-centroid member) quantize to zeros."""
    entries = ", ".join(f"{cid}L, {s!r}D" for cid, s in sorted(scales.items()))
    sc = F.element_at(F.expr(f"map({entries})"), cell.cast("long"))
    return F.when(
        sc > 0,
        F.transform(rv, lambda x: F.round(x / sc * lim).cast("long")),
    ).otherwise(F.transform(rv, lambda x: F.lit(0).cast("long")))


def residual_pq_codebook(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    scales: dict[int, float],
    m: int = 8,
    codes: int = 16,
    lim: int = 32767,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """PQ codebooks over quantized RESIDUALS: the ``codes`` corpus
    vectors with smallest md5('pq:' || id) contribute their residual
    subvectors. The salt matters: the unsalted md5 order is the IVF
    centroid sample, whose residuals are all-zero — a degenerate
    codebook (every entry the zero vector) that round 6's raw-code
    convention would silently produce here."""
    staged = corpus.select(
        F.col(id_col),
        _resid_col(F.col(vec_col), model).alias("_rv"),
        (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias(
            "_cell"
        ),
    )
    rows = (
        staged.select(
            F.col(id_col),
            _q_resid_col(F.col("_rv"), F.col("_cell"), scales, lim).alias(
                "rq"
            ),
        )
        .orderBy(
            F.md5(F.concat(F.lit("pq:"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
        .limit(codes)
        .collect()
    )
    if not rows:
        raise ValueError("residual_pq_codebook: empty corpus")
    dim = len(rows[0]["rq"])
    if dim % m:
        raise ValueError(f"residual_pq_codebook: dim {dim} % m={m} != 0")
    d = dim // m
    return [
        [[int(v) for v in r["rq"][s * d : (s + 1) * d]] for r in rows]
        for s in range(m)
    ]


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    codes: int = 16,
    lim: int = 32767,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    model: list[tuple[int, list[float], float]] | None = None,
    codebook: list[list[list[int]]] | None = None,
    scales: dict[int, float] | None = None,
) -> DataFrame:
    """Residual-encoded IVFADC (Jégou et al. §IV-V, the published IVFADC
    proper): PQ codes quantize the residual x - c(x) to the assigned
    coarse centroid, and a query probing cell c scores candidates by ADC
    on ITS residual q - c — approximating true ||q - x||^2 instead of a
    distance in the per-vector-normalized space the raw-code variant
    (``ivfpq_topk``) ranks in.

    Exactness: residuals are elementwise double subtractions (one IEEE op
    per component), quantized under a per-CELL scale at ``lim`` steps —
    every downstream distance is INTEGER, rescaled once per cell by
    scale^2 (two multiplies + one divide, identical op order in the
    oracle) and rounded to 1e-6 before ranking, so the result is
    bit-reproducible across engines and partitionings.

    When it wins: residual coding beats raw-vector coding exactly when
    the coarse quantizer captures most of the vector's energy
    (||x - c|| << ||x||) — tightly clustered corpora, the regime the
    paper measures on SIFT. On isotropic unit-norm corpora (this repo's
    synthetic embeddings: best-centroid cosine ~0.3, so ||x - c|| > ||x||)
    residuals are LARGER than the vectors and the raw-code variant
    measurably wins — both regimes are pinned by tests and recorded in
    BASELINE.md; ``residual_recall`` gates the honest comparison.

    Shape at scale: identical to ``ivfpq_topk`` — one map-only corpus
    projection to (cell, codes) plus a 16-row scale aggregate (an
    ingest-time statistic at cluster scale); probe lists and LUTs are
    driver-side on the query batch; the scan reads m small ints per row.
    """
    if model is None:
        model = ivf_centroid_model(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    if scales is None:
        scales = residual_cell_scales(corpus, model, id_col, vec_col)
    if codebook is None:
        codebook = residual_pq_codebook(
            corpus, model, scales, m, codes, lim, id_col, vec_col
        )
    enc = _resid_encode(corpus, model, scales, codebook, lim, id_col, vec_col)
    return _resid_adc_topk(
        enc, queries, model, scales, codebook, k, nprobe, lim,
        id_col, vec_col, query_id_col,
    )


def _resid_encode(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    scales: dict[int, float],
    codebook: list[list[list[int]]],
    lim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Map-only (id, cell, codes) projection under frozen residual
    artifacts — the ingest-time compression pass; at cluster scale cell
    is the partition key and codes the stored payload.

    The cell assignment is projected FIRST and the residual subtraction
    reads it (``_resid_col(cell=...)``): one nlist x dim centroid fold
    per row instead of two (the fold is the dominant per-row cost; the
    two-stage select keeps the expensive alias out of CollapseProject's
    reach because it is referenced more than once)."""
    staged = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias(
            "_cell"
        ),
    ).select(
        F.col(id_col),
        F.col("_cell"),
        _resid_col(F.col(vec_col), model, cell=F.col("_cell")).alias("_rv"),
    )
    return staged.select(
        F.col(id_col),
        F.col("_cell"),
        _q_resid_col(F.col("_rv"), F.col("_cell"), scales, lim).alias("qvec"),
    ).select(F.col(id_col), "_cell", _pq_codes_col(codebook).alias("codes"))


def _resid_adc_topk(
    enc: DataFrame,
    queries: DataFrame,
    model: list[tuple[int, list[float], float]],
    scales: dict[int, float],
    codebook: list[list[list[int]]],
    k: int,
    nprobe: int,
    lim: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Residual-ADC scoring over an already-encoded (id, _cell, codes)
    frame — shared by the inline ``ivfpq_residual_topk`` and the
    persisted-index ``residual_index_topk`` (which reads stored codes
    instead of re-encoding the corpus)."""
    m = len(codebook)
    d = len(codebook[0][0])

    # probe lists: the shared driver-side float fold (identical cells to
    # ivfpq_topk for the same query — the comparison gates rely on it)
    qraw, probes = _probe_lists(queries, model, nprobe, query_id_col, vec_col)

    # per-(query, probed cell) residuals quantized ENGINE-SIDE (a
    # query-batch x nprobe sized job), so the rounding rule is the
    # engine's own — float64 round-trips losslessly through collect
    if qraw:
        spark = enc.sparkSession
        cents = {cid: cv for cid, cv, _ in model}
        qc_rows = [
            (qid, cid, qraw[qid]) for qid in qraw for cid in probes[qid]
        ]
        qid_ddl = queries.schema[query_id_col].dataType.simpleString()
        qframe = spark.createDataFrame(
            qc_rows, f"{query_id_col} {qid_ddl}, _cell long, _v array<double>"
        )
        centries = ", ".join(
            f"{cid}L, array({','.join(f'{v!r}D' for v in cv)})"
            for cid, cv in cents.items()
        )
        cent = F.element_at(F.expr(f"map({centries})"), F.col("_cell"))
        rv = F.zip_with(F.col("_v"), cent, lambda a, b: a - b)
        qres = {
            (r[0], int(r[1])): [int(x) for x in r[2]]
            for r in qframe.select(
                query_id_col,
                "_cell",
                _q_resid_col(rv, F.col("_cell"), scales, lim).alias("rq"),
            ).collect()
        }
    per_pair = []
    denom = float(lim) * float(lim)
    for qid in qraw:
        for cid in probes[qid]:
            rq = qres[(qid, cid)]
            lut = [
                [
                    sum(
                        (rq[s * d + i] - cv) ** 2
                        for i, cv in enumerate(codebook[s][c])
                    )
                    for c in range(len(codebook[s]))
                ]
                for s in range(m)
            ]
            cs = scales.get(cid, 0.0)
            ok = F.col("_cell") == int(cid)
            dist = F.round(
                _pq_lut_dist(lut).cast("double") * F.lit(cs) * F.lit(cs)
                / F.lit(denom),
                6,
            )
            per_pair.append(
                F.struct(
                    F.lit(qid).alias(query_id_col),
                    F.when(ok, dist).alias("pq_dist"),
                    ok.alias("_ok"),
                )
            )
    if not per_pair:
        qid_ddl = queries.schema[query_id_col].dataType.simpleString()
        id_ddl = enc.schema[id_col].dataType.simpleString()
        return enc.sparkSession.createDataFrame(
            [],
            f"{query_id_col} {qid_ddl}, {id_col} {id_ddl},"
            " pq_dist double, rank int",
        )
    scored = (
        enc.select(F.col(id_col), "_cell",
                   F.explode(F.array(*per_pair)).alias("_q"))
        .filter(F.col("_q")["_ok"])
        .select(
            F.col("_q")[query_id_col].alias(query_id_col),
            F.col(id_col),
            F.col("_q")["pq_dist"].alias("pq_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("pq_dist"), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def write_residual_pq_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 8,
    codes: int = 16,
    lim: int = 32767,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list, dict, list]:
    """Persist the corpus as a residual-IVFADC index: the (id, cell,
    codes) frame as parquet plus ALL the frozen artifacts — IVF centroid
    model, per-cell residual scales, residual codebook — as a JSON
    sidecar. Returns (model, scales, codebook).

    Every artifact is FROZEN at build time, including the cell scales:
    appended vectors quantize under the build-time scales (their residual
    components may exceed the int16 range — harmless, distances stay
    integer-exact), exactly like a production index whose ingest-time
    statistics are computed once per (re)build, never per append."""
    import json
    import os

    model = ivf_centroid_model(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    scales = residual_cell_scales(corpus, model, id_col, vec_col)
    codebook = residual_pq_codebook(
        corpus, model, scales, m, codes, lim, id_col, vec_col
    )
    _resid_encode(corpus, model, scales, codebook, lim, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/model.json", "w") as fh:
        json.dump(
            {
                "model": [[cid, cv, cn2] for cid, cv, cn2 in model],
                "scales": {str(cid): s for cid, s in scales.items()},
                "codebook": codebook,
                "lim": lim,
            },
            fh,
        )
    return model, scales, codebook


def load_residual_pq_model(path: str) -> tuple[list, dict, list, int]:
    import json

    with open(f"{path}/model.json") as fh:
        d = json.load(fh)
    model = [(int(cid), [float(x) for x in cv], float(cn2))
             for cid, cv, cn2 in d["model"]]
    scales = {int(cid): float(s) for cid, s in d["scales"].items()}
    return model, scales, d["codebook"], int(d["lim"])


def append_residual_pq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch under the FROZEN artifacts (encode only the
    batch, parquet-append) — a 100 TB index grows at the cost of the
    batch's own map-only encode, never a corpus rescan."""
    model, scales, codebook, lim = load_residual_pq_model(path)
    _resid_encode(
        new_vectors, model, scales, codebook, lim, id_col, vec_col
    ).write.mode("append").parquet(f"{path}/codes")


def residual_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Residual-ADC top-k straight off the persisted index: reads the
    stored (id, cell, codes) rows — no re-encode, no float column — and
    must equal the inline ``ivfpq_residual_topk`` under the same frozen
    artifacts (the split-append == one-shot equivalence the gate pins).
    At cluster scale the probe filter prunes cell partitions at scan
    time."""
    model, scales, codebook, lim = load_residual_pq_model(path)
    enc = spark.read.parquet(f"{path}/codes").select(id_col, "_cell", "codes")
    return _resid_adc_topk(
        enc, queries, model, scales, codebook, k, nprobe, lim,
        id_col, vec_col, query_id_col,
    )


def multi_method_encode(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    scales: dict[int, float],
    raw_codebook: list[list[list[int]]],
    resid_codebook: list[list[list[int]]],
    lim: int = 32767,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE corpus scan producing every per-row artifact the three
    compared ANN methods read — IVF cell, raw-PQ codes, residual-PQ
    codes, int8 qvec + its exact norm:

    ``(id, _cell, codes_raw, codes_res, qvec, _na2)``

    The recall composition gates (``residual_recall``-style audits)
    previously ran one full corpus scan per compared method, each
    repeating the nlist x dim centroid-assignment fold and the int8
    quantization; sharing a single materialized encode frame pays those
    folds once and the per-method scorers read only the compact codes.
    Every expression here is byte-identical to the per-method encodes
    (``_ivfraw_encode`` / ``_resid_encode`` / ``quantize_embeddings``),
    so the downstream rankings cannot drift.

    Staged selects keep the multi-consumer expensive aliases (_cell,
    _v/_scale, qvec) out of CollapseProject's reach so each fold is
    evaluated once per row."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s0 = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        vd.alias("_v"),
        F.array_max(F.transform(vd, lambda x: F.abs(x))).alias("_scale"),
        (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias(
            "_cell"
        ),
    )
    s1 = s0.select(
        F.col(id_col),
        F.col("_cell"),
        _int8_qvec(F.col("_v"), F.col("_scale")).alias("qvec"),
        _q_resid_col(
            _resid_col(F.col(vec_col), model, cell=F.col("_cell")),
            F.col("_cell"),
            scales,
            lim,
        ).alias("_rq"),
    )
    return s1.select(
        F.col(id_col),
        F.col("_cell"),
        _pq_codes_col(raw_codebook, "qvec").alias("codes_raw"),
        _pq_codes_col(resid_codebook, "_rq").alias("codes_res"),
        F.col("qvec"),
        _qnorm2("qvec").alias("_na2"),
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate ANN result against an exact baseline —
    the standard quality dial for every compressed/pruned retrieval path
    (PQ code budget, IVF nprobe, LSH table count are all tuned against
    this number).

    Both inputs are ranked frames ``(query_id, vec_id, ..., rank)`` as
    produced by the top-k entry points here. Returns one row per query:
    ``(query_id, n_exact, n_hit, recall_at_k)`` where ``recall_at_k =
    n_hit / n_exact`` (exact side may return < k rows on tiny corpora).

    Shape at scale: both sides are query-batch x k sized by construction
    (the expensive scans happened upstream); the overlap join keys on
    (query, id) and aggregates per query — trivially broadcastable.
    """
    a = approx.filter(F.col("rank") <= k).select(
        F.col(query_id_col), F.col(id_col)
    )
    e = exact.filter(F.col("rank") <= k).select(
        F.col(query_id_col), F.col(id_col)
    )
    hit = a.withColumn("_h", F.lit(1))
    joined = e.join(hit, [query_id_col, id_col], "left")
    return joined.groupBy(query_id_col).agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce(F.col("_h"), F.lit(0))).alias("n_hit"),
        F.round(
            F.sum(F.coalesce(F.col("_h"), F.lit(0)))
            / F.count("*").cast("double"),
            6,
        ).alias("recall_at_k"),
    )


def _ndcg_discounts(k: int, quantize: int = 6) -> list[int]:
    """Micro-unit NDCG position discounts round(10^q / log2(i+1)) for
    ranks 1..k, computed ONCE in Python and inlined as literals on both
    engines — a runtime log2 would hang cross-engine exactness on each
    libm's last ulp."""
    import math

    return [round(10**quantize / math.log2(i + 1)) for i in range(1, k + 1)]


def ranking_metrics(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """The full ranked-retrieval quality row per query — recall@k,
    MRR@k, NDCG@k (binary gains) — for an approximate ranking judged
    against an exact baseline; the standard IR eval triple
    (Järvelin & Kekäläinen TOIS 2002 for (N)DCG) next to the plain
    recall dial of ``ann_recall``:

    - relevant = the exact top-k set (binary gain);
    - MRR = 1 / rank of the FIRST relevant item in the approx list
      (0 when none);
    - NDCG = DCG / IDCG with DCG = Σ_{relevant i} 1/log2(i+1) over
      approx positions, IDCG = the best achievable with n_rel items.
      Discounts are Python-precomputed micro-unit INTEGERS inlined in
      the plan (see ``_ndcg_discounts``) so both sums are exact; each
      final metric is one correctly-rounded division.

    Shape at scale: query-batch x k frames, one (query, id) join, one
    per-query aggregate — broadcastable by construction.
    """
    d = _ndcg_discounts(k)
    dcase = (
        "CASE _rk "
        + " ".join(f"WHEN {i + 1} THEN {d[i]}L" for i in range(k))
        + " ELSE 0L END"
    )
    # IDCG prefix sums: best DCG with n relevant items = sum of the
    # first n discounts
    pref = [0]
    for x in d:
        pref.append(pref[-1] + x)
    icase = (
        "CASE least(_nrel, " + str(k) + ") "
        + " ".join(f"WHEN {n} THEN {pref[n]}L" for n in range(1, k + 1))
        + " ELSE 0L END"
    )
    a = approx.filter(F.col("rank") <= k).select(
        F.col(query_id_col), F.col(id_col), F.col("rank").alias("_rk")
    )
    e = exact.filter(F.col("rank") <= k).select(
        F.col(query_id_col), F.col(id_col)
    )
    # EXACT-driven left join: the relevant set defines which queries
    # exist (a query with no baseline has no metrics — a full-outer
    # here would emit a spurious n_exact=0 row with NULL recall for
    # any approx-only query, which the oracle never produces)
    j = e.join(a, [query_id_col, id_col], "left")
    per = j.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("_nrel"),
        F.sum(
            F.when(F.col("_rk").isNotNull(), 1).otherwise(0)
        ).alias("n_hit"),
        F.min(F.col("_rk")).alias("_first"),
        F.sum(
            F.when(F.col("_rk").isNotNull(), F.expr(dcase)).otherwise(
                F.lit(0)
            )
        ).alias("_dcg"),
    )
    return per.select(
        query_id_col,
        F.col("_nrel").cast("long").alias("n_exact"),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round(
            F.col("n_hit") / F.col("_nrel").cast("double"), 6
        ).alias("recall_at_k"),
        F.round(
            F.when(
                F.col("_first").isNotNull(),
                F.lit(1.0) / F.col("_first"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mrr_at_k"),
        F.round(
            F.when(
                F.expr(icase) > 0,
                F.col("_dcg").cast("double") / F.expr(icase),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg_at_k"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qmax: int = 127,
) -> DataFrame:
    """Top-k by cosine over int8-quantized vectors: the scan reads 4x
    fewer bytes than the float path and every score is an INTEGER dot /
    sqrt(INTEGER norms) — exact under any order, so the ranking is
    bit-deterministic across engines and partitionings with no pinned
    fold. Returns ``(query_id, vec_id, qcos_sim, rank)``.

    Quantization error on the ranking is bounded by the per-component
    rounding (<= 0.5/127 relative); at 64 dims the quantized cosine
    tracks the float cosine to ~1e-3 — the standard recall trade of
    scalar quantization, measured in the gate against the float top-10.

    Shape at scale: quantize both sides in-scan, broadcast the (tiny)
    quantized query frame, one corpus-linear scoring pass, per-query
    top-k windows (per-key state only).
    """
    # norms hoisted per vector (one fold each side) so the n_corpus x
    # n_queries scoring rows pay one dot fold instead of five (_qnorm2)
    qc = quantize_embeddings(corpus, id_col, vec_col, qmax=qmax).withColumn(
        "_na2", _qnorm2("qvec")
    )
    return _qcos_topk(qc, queries, k, id_col, vec_col, query_id_col, qmax)


def _qcos_topk(
    qc: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    qmax: int = 127,
) -> DataFrame:
    """Exact quantized-cosine top-k over an already-quantized corpus
    frame ``qc`` = (id, qvec, _na2) — the scoring half of
    ``quantized_topk``, split out so composition gates can share ONE
    corpus scan across compared methods."""
    qq = quantize_embeddings(queries, query_id_col, vec_col, qmax=qmax).select(
        F.col(query_id_col).alias("_qid"),
        F.col("qvec").alias("_qvec"),
        _qnorm2("qvec").alias("_nb2"),
    )
    scored = (
        qc.crossJoin(F.broadcast(qq))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            _qcos_sim(na2=F.col("_na2"), nb2=F.col("_nb2")).alias("qcos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("qcos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _qnorm2(c: str) -> Column:
    """Exact integer squared norm of a quantized vector — per-VECTOR, so
    the scoring scans hoist it out of the per-PAIR cosine (guide §4: the
    interpreted HOF folds are the per-row cost; without hoisting every
    pair paid five dim-length folds — dot + both norms in the null guard
    + both again under the sqrt — instead of one dot fold). The norms
    are exact longs, so precomputing them is bit-identical."""
    return F.aggregate(
        F.transform(F.col(c), lambda x: x.cast("long") * x.cast("long")),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def _qcos_sim(
    a: str = "qvec",
    b: str = "_qvec",
    na2: Column | None = None,
    nb2: Column | None = None,
) -> Column:
    """The int8-quantized cosine — integer dot / sqrt(product of integer
    norms), NULL for a zero-norm side. The single source of truth for the
    quantized scoring rule: ``quantized_topk`` and ``hard_negative_topk``
    both rank by this column and both carry oracle gates pinned to it, so
    the convention must never fork between them. ``na2``/``nb2``: the
    sides' precomputed ``_qnorm2`` columns (exact integers — hoisting
    them is bit-identical, see _qnorm2)."""
    dot = F.aggregate(
        F.zip_with(
            F.col(a), F.col(b), lambda x, y: x.cast("long") * y.cast("long")
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    na = na2 if na2 is not None else _qnorm2(a)
    nb = nb2 if nb2 is not None else _qnorm2(b)
    return F.when(
        (na > 0) & (nb > 0),
        dot / F.sqrt(na.cast("double") * nb.cast("double")),
    )


def diverse_sample(
    corpus: DataFrame,
    per_cell: int = 5,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: list[tuple[int, list[float], float]] | None = None,
) -> DataFrame:
    """Cluster-balanced diversity sampling: assign every vector to its
    IVF cell, keep the ``per_cell`` smallest-md5(id) members of each —
    the coverage-sampling recipe for building an embedding-space-diverse
    subset (uniform sampling over-represents dense regions; per-cell
    quotas guarantee every region of the space contributes). The md5
    order is the corpus-convention deterministic "random" draw.

    Returns ``(id, cell, cell_rank)``.

    Shape at scale: cell assignment is the shuffle-free literal-fold map
    shared with every IVF path; the quota is one window over cell
    partitions (nlist partitions, each corpus/nlist-sized — at 100 TB
    raise nlist so cells stay executor-sized, which also sharpens
    coverage)."""
    if model is None:
        model = ivf_centroid_model(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    staged = corpus.select(
        F.col(id_col),
        (-F.array_max(_centroid_scores(F.col(vec_col), model))["nc"]).alias(
            "cell"
        ),
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        staged.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= per_cell)
        .select(id_col, "cell", "cell_rank")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_label_col: str = "query_label",
) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for each
    query, the k nearest corpus vectors whose LABEL DIFFERS from the
    query's (the semantically-close-but-wrong examples embedding models
    train against; easy negatives are useless, same-label neighbors are
    positives). The label filter applies BEFORE ranking, so the k slots
    are all negatives.

    Scoring is the int8-quantized cosine of ``quantized_topk`` (integer
    dot / sqrt of integer norms — bit-deterministic across engines and
    partitionings). NULL corpus labels never qualify as negatives (their
    class is unknown); NULL-labeled queries match nothing.

    Returns ``(query_id, query_label, vec_id, neg_label, qcos_sim,
    rank)``.

    Shape at scale: identical to ``quantized_topk`` — broadcast the
    query batch, one corpus-linear scan with the label filter fused in,
    per-query top-k window.
    """
    # ONE fused map-only projection per side: label carried alongside the
    # shared _int8_qvec quantization — no id re-join, no second corpus
    # scan (the label attach IS part of the scan)
    def _fused(frame, idc, labc, lab_alias, qvec_alias):
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        staged = frame.select(
            F.col(idc),
            F.col(labc).alias(lab_alias),
            vd.alias("_v"),
            F.array_max(F.transform(vd, lambda x: F.abs(x))).alias("_s"),
        )
        return staged.select(
            F.col(idc),
            lab_alias,
            _int8_qvec(F.col("_v"), F.col("_s")).alias(qvec_alias),
        )

    # norms hoisted per vector (one fold per side, exact integers) so the
    # per-pair scoring pays one dot fold instead of five (_qnorm2)
    qc = _fused(corpus, id_col, label_col, "_lab", "qvec").withColumn(
        "_na2", _qnorm2("qvec")
    )
    qq = _fused(queries, query_id_col, query_label_col, "_qlab", "_qvec").select(
        F.col(query_id_col).alias("_qid"), "_qlab", "_qvec",
        _qnorm2("_qvec").alias("_nb2"),
    )
    scored = (
        qc.crossJoin(F.broadcast(qq))
        .filter(
            F.col("_lab").isNotNull() & (F.col("_lab") != F.col("_qlab"))
        )
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_qlab").alias(query_label_col),
            F.col(id_col),
            F.col("_lab").alias("neg_label"),
            _qcos_sim(na2=F.col("_na2"), nb2=F.col("_nb2")).alias("qcos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("qcos_sim"), F.asc(id_col)
    )
    return (
        scored.filter(F.col("qcos_sim").isNotNull())  # zero-norm vectors
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, query_label_col, id_col, "neg_label",
            F.round("qcos_sim", 6).alias("qcos_sim"), "rank",
        )
    )


def centroid_model(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> list[tuple[int, list[int]]]:
    """Nearest-centroid (Rocchio) class model over int8-quantized
    vectors: per label, the element-wise mean of the quantized vectors,
    rounded back to integers. Deterministic end to end — sums and counts
    are exact integers, the one division per component is a single
    correctly-rounded float op, and round() agrees across engines on the
    int8 domain.

    One posexplode + (label, pos) aggregate; the model is
    ``n_labels x dim`` small ints, returned sorted by label for literal
    inlining.
    """
    qc = quantize_embeddings(df, id_col, vec_col)
    # labels must be non-null integers: they inline as int literals in
    # centroid_classify's expr. Null-labeled rows (routine mid-pipeline)
    # are excluded from training rather than crashing the sort below.
    lab = df.select(id_col, F.col(label_col).alias("_lbl")).filter(
        F.col("_lbl").isNotNull()
    )
    rows = (
        qc.join(lab, id_col)
        .select("_lbl", F.posexplode("qvec").alias("pos", "x"))
        .groupBy("_lbl", "pos")
        .agg(
            F.round(
                F.sum("x").cast("double") / F.count("*")
            ).cast("int").alias("c")
        )
        .collect()
    )
    by_label: dict[int, dict[int, int]] = {}
    for r in rows:
        lbl = r["_lbl"]
        if not isinstance(lbl, int):
            raise TypeError(
                "centroid_model: labels must be integers (they inline as "
                f"int literals in the classify expr), got {type(lbl).__name__}"
            )
        by_label.setdefault(lbl, {})[r["pos"]] = int(r["c"])
    return [
        (lbl, [d[p] for p in range(len(d))])
        for lbl, d in sorted(by_label.items())
    ]


def centroid_classify(
    df: DataFrame,
    model: list[tuple[int, list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Classify every vector to its nearest class centroid by integer
    squared L2 over the int8-quantized embedding (ties to the lowest
    label). Returns ``(id, label, pred, correct)`` — the standard
    nearest-class-mean eval of an embedding space.

    The model inlines as one nested array literal inside one expr (the
    PQ construction lesson); scoring is a map-only scan, no join, no
    shuffle — at 100 TB this is a pure projection pass.
    """
    if model is None:
        model = centroid_model(df, id_col, vec_col, label_col)
    if not model:
        raise ValueError(
            "centroid_classify: empty model — no non-null labels to train on"
        )
    qc = quantize_embeddings(df, id_col, vec_col)
    lab = df.select(id_col, F.col(label_col).alias("label"))
    labels = "array(" + ",".join(str(int(l)) for l, _ in model) + ")"
    cents = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in c) + ")"
            for _, c in model
        )
        + ")"
    )
    d = len(model[0][1])
    dists = (
        f"transform({cents}, cv -> aggregate(sequence(0, {d - 1}), 0L,"
        " (acc, i) -> acc + (CAST(qvec[i] AS BIGINT) - cv[i])"
        " * (CAST(qvec[i] AS BIGINT) - cv[i])))"
    )
    pred = F.expr(
        f"element_at({labels}, CAST(array_position({dists},"
        f" array_min({dists})) AS INT))"
    )
    return (
        qc.select(F.col(id_col), pred.alias("pred"))
        .join(lab, id_col)
        .select(
            id_col,
            "label",
            "pred",
            # null-safe 0/1 (a null label is "not correct", not null —
            # matches the SQL CASE WHEN ... THEN 1 ELSE 0 convention)
            F.when(F.col("pred") == F.col("label"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("correct"),
        )
    )


def _hadamard_signs(dim: int, seed: str = "rot") -> list[int]:
    """Deterministic ±1 diagonal from md5 parity — the engine-portable
    sign flip of the structured rotation (both the Spark kernel and the
    DuckDB oracle embed the same list)."""
    import hashlib

    return [
        1
        if int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1
        for j in range(dim)
    ]


def hadamard_rotate(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rot",
) -> DataFrame:
    """Structured rotation for product quantization — the deterministic
    member of the rotation family OPQ learns (Ge et al., "Optimized
    Product Quantization", CVPR 2013; Jégou et al. TPAMI 2011 §V.A use a
    random orthogonal as the baseline): r = H · D · q, with q the int8-
    quantized vector, H the Walsh-Hadamard matrix H[i][j] =
    (-1)^popcount(i AND j), and D a deterministic md5-derived ±1 diagonal
    (without the sign flip H acts near-trivially on constant-ish
    vectors). Every output coordinate mixes ALL input coordinates, which
    balances per-subspace energy — the property PQ recall depends on when
    the corpus concentrates variance in few dimensions.

    All arithmetic is INTEGER (H·D entries are ±1, q is int8), so the
    rotation is exact and order-independent — downstream PQ gates stay
    hash-deterministic. The usual 1/sqrt(dim) normalization is omitted:
    uniform scaling cannot change an L2 ranking. Requires a power-of-two
    dimension (H exists for 2^k only).

    Map-only: one numpy int64 GEMM per Arrow batch (integer matmul is
    exact — no float summation order to pin), no shuffle. Returns
    ``(id, rvec array<bigint>)``; feed it anywhere ``embedding`` goes —
    the PQ tier re-quantizes per-vector as usual.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    q = quantize_embeddings(df, id_col, vec_col).select(id_col, "qvec")
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("rvec", ArrayType(LongType())),
        ]
    )

    def rotate(batches):
        import pandas as pd

        hd = {}  # dim -> H·D int64 matrix, built once per executor batch run

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]],
                dtype=np.int64,
            )
            dim = m.shape[1]
            if dim & (dim - 1):
                raise ValueError(
                    f"hadamard_rotate: dim {dim} is not a power of two"
                )
            if dim not in hd:
                idx = np.arange(dim)
                # parity of popcount(i & j) via bit folding (dim <= 2^16)
                v = idx[:, None] & idx[None, :]
                p = np.zeros_like(v)
                while v.any():
                    p ^= v & 1
                    v = v >> 1
                h = 1 - 2 * p
                d = np.array(_hadamard_signs(dim, seed), dtype=np.int64)
                hd[dim] = h * d[None, :]  # (H·D)[i,j] = H[i,j] * d_j
            r = m @ hd[dim].T
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rvec": [row.tolist() for row in r],
                }
            )

    return q.mapInPandas(rotate, out_schema)


def opq_dim_allocation(
    df: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """LEARNED dimension-to-subspace allocation for product quantization
    — the signed-permutation member of the OPQ rotation family (Ge,
    He, Ke & Sun, "Optimized Product Quantization", CVPR 2013 §4.2:
    parametric OPQ balances per-subspace variance by REORDERING
    principal dimensions; under a diagonal covariance model the
    principal dimensions are the raw ones, and the learned orthogonal
    transform reduces to exactly this permutation matrix).

    Training: per-dimension exact integer variance of the int8-quantized
    corpus (``n·Σx² − (Σx)²``, DECIMAL(38,0) so petabyte-row counts
    cannot overflow), dimensions sorted by (variance DESC, dim ASC) and
    snake-dealt into the ``m`` subspaces — pass p of the snake fills
    slot 2p of every subspace left-to-right then slot 2p+1 right-to-
    left, the closed-form balanced allocation (no iterative argmin, so
    the whole model derivation is a window function + arithmetic and
    the DuckDB oracle reproduces it verbatim). High-variance dimensions
    spread one-per-subspace instead of bunching wherever the producer
    happened to lay them out — the imbalance that ruins PQ recall on
    variance-concentrated corpora (the measured regime in BASELINE.md;
    same precondition as ``hadamard_rotate``, but data-ADAPTIVE).

    Returns ``perm`` with ``perm[new_pos] = source_dim`` (length dim);
    apply with ``opq_permute``. The model is dim ints — broadcast-sized.

    Shape at scale: ONE corpus scan (posexplode fused into a partial
    aggregate that holds dim counters per task), a dim-row shuffle, a
    dim-row collect. No join, no corpus shuffle.
    """
    qc = quantize_embeddings(df, id_col, vec_col)
    stats = (
        qc.select(F.posexplode("qvec").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(F.col("x").cast("decimal(19,0)")).alias("sx"),
            F.sum(
                (F.col("x") * F.col("x")).cast("decimal(19,0)")
            ).alias("sxx"),
        )
        .select(
            "dim",
            (
                F.col("n") * F.col("sxx").cast("decimal(38,0)")
                - F.col("sx").cast("decimal(38,0)")
                * F.col("sx").cast("decimal(38,0)")
            ).alias("var"),
        )
        .collect()
    )
    if not stats:
        raise ValueError("opq_dim_allocation: empty corpus")
    dim = len(stats)
    if dim % m:
        raise ValueError(f"opq_dim_allocation: dim {dim} not divisible by {m}")
    d = dim // m
    ranked = sorted(stats, key=lambda r: (-int(r["var"]), int(r["dim"])))
    perm = [0] * dim
    for r, row in enumerate(ranked):
        half, pos = divmod(r, m)
        sub = pos if half % 2 == 0 else m - 1 - pos
        slot = half
        if slot >= d:
            raise AssertionError("snake deal overflow")  # dim % m == 0 holds
        perm[sub * d + slot] = int(row["dim"])
    return perm


def opq_permute(
    df: DataFrame,
    perm: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply an ``opq_dim_allocation`` permutation to the RAW float
    vectors: ``out[j] = v[perm[j]]``. Permutation commutes with the
    per-vector max-abs quantization (the scale is order-free), so
    permute-then-quantize equals quantize-then-permute exactly and every
    integer gate downstream stays bit-deterministic.

    Map-only JVM-side array gather over the literal perm (no UDF, no
    shuffle); returns ``(id, embedding)`` shaped for the PQ tier."""
    lit = "array(" + ",".join(str(int(p)) for p in perm) + ")"
    return df.select(
        F.col(id_col),
        F.expr(
            f"transform({lit}, p -> {vec_col}[p])"
        ).alias(vec_col),
    )


def ivf_assign(
    corpus: DataFrame,
    model: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Public (id, cell) IVF assignment — the clustering half of
    ``semantic_deduplicate`` without its pair stage, for consumers that
    want the cells themselves (cluster profiling, diversity sampling,
    per-cluster keyword extraction). Map-only GEMM assignment."""
    return _assign_cells_arrow(corpus, model, id_col, vec_col).select(
        id_col, "cell"
    )


def _kmeans_dists(model: list[list[int]]) -> str:
    """The per-cluster integer squared-L2 distance array as ONE SQL expr
    string over ``qvec`` (the centroid_classify construction — the model
    inlines as a nested array literal parsed once JVM-side)."""
    cents = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in c) + ")"
            for c in model
        )
        + ")"
    )
    d = len(model[0])
    return (
        f"transform({cents}, cv -> aggregate(sequence(0, {d - 1}), 0L,"
        " (acc, i) -> acc + (CAST(qvec[i] AS BIGINT) - cv[i])"
        " * (CAST(qvec[i] AS BIGINT) - cv[i])))"
    )


def kmeans_model(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Lloyd k-means over int8-quantized vectors, made cross-engine
    EXACT by construction (the determinism recipe every quantizer in
    this module shares, applied to the full iterative algorithm):

    - init: the ``k`` smallest-md5(id) vectors' qvecs, cluster index =
      md5 rank (the corpus-convention deterministic draw, same as
      ``ivf_centroid_model`` / ``pq_codebook`` sampling);
    - assign: integer squared-L2 argmin, ties to the lowest cluster
      index (``array_position`` returns the first minimum);
    - update: per-component ``round(sum/count)`` back to integers —
      sums and counts are exact integers, the one division per
      component is a single correctly-rounded float op (the
      ``centroid_model`` rounding rule), so the next iteration starts
      from identical centroids on every engine and partitioning;
    - an emptied cluster keeps its previous centroid (documented rule).

    ``n_iter`` assign+update rounds, then the caller scores with the
    returned ``k x dim`` integer model. Each round is ONE corpus scan
    (map-only argmin fused with the posexplode) feeding a
    map-side-combinable (cluster, pos) aggregate of k*dim rows — the
    driver holds only the model. At 100 TB: n_iter+1 linear passes over
    a persisted quantized scan, no join, no corpus shuffle.
    """
    qc = quantize_embeddings(df, id_col, vec_col).select(id_col, "qvec")
    qc = qc.persist()
    try:
        # smallest-md5 draw via orderBy().limit() = TakeOrdered (per-
        # partition top-k then a k-row merge on the driver), the same
        # shape as ivf_centroid_model — an unpartitioned row_number
        # window here would funnel the whole quantized corpus through
        # one task. Ordering semantics are identical.
        init = (
            qc.select(
                F.col(id_col),
                "qvec",
                F.md5(F.col(id_col).cast("string")).alias("_h"),
            )
            .orderBy("_h", id_col)
            .limit(k)
            .collect()
        )
        model = [[int(x) for x in r["qvec"]] for r in init]
        for _ in range(n_iter):
            dists = _kmeans_dists(model)
            assigned = qc.select(
                F.expr(
                    f"array_position({dists}, array_min({dists})) - 1"
                ).cast("int").alias("cluster"),
                F.posexplode("qvec").alias("pos", "x"),
            )
            rows = (
                assigned.groupBy("cluster", "pos")
                .agg(
                    F.round(F.sum("x").cast("double") / F.count("*"))
                    .cast("int")
                    .alias("c")
                )
                .collect()
            )
            upd: dict[tuple[int, int], int] = {
                (r["cluster"], r["pos"]): int(r["c"]) for r in rows
            }
            model = [
                [
                    upd.get((ci, p), model[ci][p])
                    for p in range(len(model[ci]))
                ]
                for ci in range(k)
            ]
        return model
    finally:
        qc.unpersist()


def kmeans_assign(
    df: DataFrame,
    model: list[list[int]] | None = None,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score every vector against a (trained or given) ``kmeans_model``:
    returns ``(id, cluster, dist)`` with the integer squared-L2 to the
    assigned centroid — all-integer, hash-exact. Map-only scan, no
    shuffle (the model is an inlined literal)."""
    if model is None:
        model = kmeans_model(df, k, n_iter, id_col, vec_col)
    qc = quantize_embeddings(df, id_col, vec_col)
    dists = _kmeans_dists(model)
    return qc.select(
        F.col(id_col),
        F.expr(f"array_position({dists}, array_min({dists})) - 1")
        .cast("int")
        .alias("cluster"),
        F.expr(f"array_min({dists})").alias("dist"),
    )


def truncated_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dims: int = 16,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage retrieval over dimension-truncated vectors (the
    Matryoshka / adaptive-retrieval pattern, Kusupati et al. 2022 §4.3):
    stage 1 ranks the WHOLE corpus by int8 cosine over only the first
    ``prefix_dims`` components and keeps ``candidates`` per query;
    stage 2 re-scores just those with the full-dimension int8 cosine
    and returns the top ``k``.

    At scale stage 1 is the only corpus-wide pass and reads
    ``prefix_dims/dim`` of the vector bytes (16/64 = 4x less IO with
    dimension-sliced storage; MRL-trained embeddings concentrate
    information in the prefix, which is what makes the candidate set
    trustworthy). Stage 2 touches ``candidates`` rows per query.
    Both stages are integer dots ranked by one double division — ties
    to the lowest id — so the composition is hash-deterministic.

    Returns ``(query_id, vec_id, qcos_sim, rank)``.
    """
    # prefix slices AND norms hoisted per SIDE (the crossJoin otherwise
    # re-sliced the corpus vector and re-folded both norms per pair;
    # norms are exact integers — bit-identical, see _qnorm2)
    qc = (
        quantize_embeddings(corpus, id_col, vec_col)
        .select(id_col, "qvec", F.slice("qvec", 1, prefix_dims).alias("pvec"))
        .withColumns({"_na2": _qnorm2("qvec"), "_pna2": _qnorm2("pvec")})
    )
    qq = (
        quantize_embeddings(queries, query_id_col, vec_col)
        .select(
            F.col(query_id_col).alias("_qid"),
            F.col("qvec").alias("_qvec"),
            F.slice("qvec", 1, prefix_dims).alias("_pvec"),
        )
        .withColumns({"_nb2": _qnorm2("_qvec"), "_pnb2": _qnorm2("_pvec")})
    )
    paired = qc.crossJoin(F.broadcast(qq))
    w1 = Window.partitionBy("_qid").orderBy(
        F.desc("_ps"), F.asc(id_col)
    )
    stage1 = (
        paired.withColumn(
            "_ps",
            _qcos_sim("pvec", "_pvec", na2=F.col("_pna2"), nb2=F.col("_pnb2")),
        )
        .filter(F.col("_ps").isNotNull())
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= candidates)
    )
    w2 = Window.partitionBy("_qid").orderBy(
        F.desc("qcos_sim"), F.asc(id_col)
    )
    return (
        stage1.withColumn(
            "qcos_sim", _qcos_sim(na2=F.col("_na2"), nb2=F.col("_nb2"))
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.round("qcos_sim", 6).alias("qcos_sim"),
            "rank",
        )
    )


def knn_label_propagation(
    corpus: DataFrame,
    seeds: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Propagate labels from a small labeled seed set to the whole
    corpus by k-NN majority vote over the int8 cosine — the
    semi-supervised auto-labeling step (classify every crawl document
    into quality/domain classes from a few thousand human labels)
    behind distillation-style curation classifiers.

    Each corpus vector takes the majority label of its ``k`` nearest
    NON-SELF seeds (vote-count ties to the lowest label; neighbor-rank
    ties to the lowest seed id). Null-labeled seed rows are ignored.
    Returns ``(id, pred_label, votes)``.

    Shape at scale: the seed set is human-annotation-sized —
    broadcastable by definition — so the whole pass is ONE map-only
    corpus scan with ZERO shuffles: the quantized seed matrix rides to
    the executors inside an Arrow kernel closure (the
    ``_brute_force_scores_arrow`` GEMM convention), and each batch
    scores, ranks and majority-votes its rows in numpy. The previous
    shape exploded corpus x n_seeds rows through TWO hash shuffles
    (top-k window + vote window) — at 100 TB that is 50 corpus copies
    shuffled twice for a result that is per-row local.

    Exactness: every score is the same integer dot / sqrt(product of
    exact integer norms) as ``_qcos_sim`` — int64 dots and norms are
    exact (|q| <= 127, so dot <= dim * 127^2 << 2^53), the two casts,
    multiply, sqrt and divide are single-rounded IEEE float64 ops in
    both engines, so the scores (and therefore every rank and tie) are
    bit-identical to the window form. Tie rules: np.lexsort on
    (-sim, seed id) == the old window's (desc sim, asc sid); for votes,
    np.unique returns labels sorted ascending and argmax takes the
    FIRST maximum == (desc votes, asc label).
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    qc = (
        quantize_embeddings(corpus, id_col, vec_col)
        .select(id_col, "qvec")
    )
    id_field = corpus.schema[id_col]
    lab_field = seeds.schema[label_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("pred_label", lab_field.dataType),
            StructField("votes", LongType()),
        ]
    )
    # quantize the seed side ENGINE-side (identical rounding rule), then
    # one tiny collect — the broadcast-codebook convention every index
    # family here uses. Zero-norm seeds score NULL against everything
    # (the _qcos_sim guard), so dropping them up front is bit-identical.
    qs_rows = (
        quantize_embeddings(
            seeds.filter(F.col(label_col).isNotNull()), id_col, vec_col
        )
        .join(seeds.select(id_col, label_col), id_col)
        .select(
            F.col(id_col).alias("_sid"),
            F.col("qvec").alias("_qvec"),
            F.col(label_col).alias("_slab"),
            _qnorm2("qvec").alias("_nb2"),
        )
        .collect()
    )
    qs_rows = [r for r in qs_rows if int(r["_nb2"]) > 0]
    if not qs_rows:
        return corpus.sparkSession.createDataFrame([], out_schema)
    smat = np.array([[int(x) for x in r["_qvec"]] for r in qs_rows],
                    dtype=np.int64)
    sids = np.array([r["_sid"] for r in qs_rows])
    slabs = np.array([r["_slab"] for r in qs_rows])
    snb2 = np.array([int(r["_nb2"]) for r in qs_rows], dtype=np.int64)
    kk = int(k)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]],
                dtype=np.int64,
            )
            ids = pdf[id_col].to_numpy()
            na2 = (m * m).sum(axis=1)  # exact int64 norms
            dots = m @ smat.T  # exact int64 dots, n x s
            # same op order as _qcos_sim: double(na2) * double(nb2),
            # sqrt, divide — each single-rounded IEEE float64
            denom = np.sqrt(na2.astype(np.float64)[:, None]
                            * snb2.astype(np.float64)[None, :])
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = dots.astype(np.float64) / denom
            # excluded candidates (self seed, zero-norm corpus row)
            # drop below every real cosine (>= -1)
            sims = np.where(
                (na2[:, None] > 0) & (ids[:, None] != sids[None, :]),
                sims,
                -np.inf,
            )
            out_ids, out_labs, out_votes = [], [], []
            for i in range(len(ids)):
                row = sims[i]
                valid = row > -np.inf
                nv = int(valid.sum())
                if nv == 0:
                    continue
                order = np.lexsort((sids, -row))[: min(kk, nv)]
                labs = slabs[order]
                uniq, counts = np.unique(labs, return_counts=True)
                w = int(np.argmax(counts))  # first max == lowest label
                out_ids.append(ids[i])
                out_labs.append(uniq[w])
                out_votes.append(int(counts[w]))
            yield pd.DataFrame(
                {
                    id_col: np.asarray(out_ids, dtype=ids.dtype)
                    if out_ids else np.array([], dtype=ids.dtype),
                    "pred_label": out_labs,
                    "votes": np.asarray(out_votes, dtype=np.int64),
                }
            )

    return qc.mapInPandas(score, out_schema)


def write_kmeans_model(model: list[list[int]], path: str) -> None:
    """Persist a trained ``kmeans_model`` as a JSON sidecar — the
    frozen-clustering artifact new corpus batches are assigned under
    (retraining on every append would silently relabel history; the
    persisted-model convention every index family here follows)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "kmeans_model.json"), "w") as f:
        json.dump(model, f)


def load_kmeans_model(path: str) -> list[list[int]]:
    import json
    import os

    with open(os.path.join(path, "kmeans_model.json")) as f:
        return [[int(x) for x in c] for c in json.load(f)]
