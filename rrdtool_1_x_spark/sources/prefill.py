"""``create --source`` / ``--template`` prefill: seed a new dataset from
existing ones.

Reference semantics (src/rrd_create.c):

* ``--template`` copies step + DS + RRA definitions from an existing
  dataset; explicit DS:/RRA: arguments are APPENDED, and a DS name that
  clashes with a template DS is an error (rrd_create_r2,
  src/rrd_create.c:892-930 + the duplicate-DS check at :973-978).
* ``--source`` (repeatable) prefills the new archives from the sources'
  archives, matching data sources BY NAME (or an explicit
  ``DS:new=old:...`` mapping); the new last_up becomes the max of the
  sources' last_up when no --start is given (src/rrd_create.c:1043-1076).
* Per archive row and DS, candidate source archives are those with the
  same CF or CF=AVERAGE (select_create_candidates,
  src/rrd_create.c:1991-2002), ordered: exact (CF, resolution) match
  first, then AVERAGE before other CFs, then finer resolution, then more
  rows (order_candidates, :1945-1989).
* Each target bin [end-size+1, end] accumulates candidate bins in that
  order with interval-coverage bookkeeping so overlapping candidates
  never double-count (prefill_bin + add_coverage, :2004-2127,
  :1663-1800); the bin is written only when covered seconds strictly
  exceed xff * bin size. AVERAGE accumulates v/bin*newly then rescales by
  bin/total (prefill_consolidate/prefill_finish, :1888-1943); MIN/MAX
  fold; LAST takes the latest covering value.

Spark design: candidate ROWS for a whole archive are one unioned read of
the source rollup tables (a time-range filter per candidate — partition
prunable); the per-bin sequential candidate walk is inherently ordered,
so it runs as an ``applyInPandas`` kernel grouped by (series, ds) — the
axis that actually scales. The new dataset's samples table starts empty
(the reference forgets raw inputs too); subsequent ingest goes through
the incremental streaming path which merges only touched windows and so
preserves prefilled history, exactly like ``restore``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DatasetDef, DSDef, RRADef
from rrdtool_1_x_spark.operators.cdp import BASIC_CFS
from rrdtool_1_x_spark.sources.store import DatasetStore

_PREFILL_CFS = ("AVERAGE", "MIN", "MAX", "LAST")


def template_dataset(
    template: DatasetStore,
    name: str,
    extra_ds: list[DSDef] | None = None,
    extra_rra: list[RRADef] | None = None,
    step: int | None = None,
    start: int | None = None,
) -> DatasetDef:
    """DS/RRA definitions copied from ``template``, extras appended.

    A clashing DS name errors like the reference's duplicate-DS check."""
    t = template.dataset
    ds = [DSDef(**vars(d)) for d in t.ds]
    names = {d.name for d in ds}
    for d in extra_ds or []:
        if d.name in names:
            raise ValueError(f"Duplicate DS name: {d.name}")
        names.add(d.name)
        ds.append(d)
    rra = [RRADef(cf=r.cf, xff=r.xff, pdp_cnt=r.pdp_cnt, row_cnt=r.row_cnt, params=dict(r.params)) for r in t.rra]
    rra.extend(extra_rra or [])
    return DatasetDef(
        name=name, step=step or t.step, ds=ds, rra=rra, start=start
    )


def _order_key(target_res: int, target_cf: str):
    """Sort key for candidate archives (order_candidates,
    src/rrd_create.c:1945-1989): exact (CF, resolution) match first, then
    AVERAGE CF, then finer resolution, then more rows. Python's stable
    sort preserves source order on full ties (the C qsort is applied to
    the per-source collection order)."""

    def key(cand):
        _, _, cf, res, rows = cand[:5]
        exact = cf == target_cf and res == target_res
        return (not exact, cf != "AVERAGE", res, -rows)

    return key


def _coverage_add(covered: list, s: int, e: int) -> int:
    """Add closed interval [s, e] to the merged coverage list; return the
    number of NEWLY covered seconds (add_coverage,
    src/rrd_create.c:1663-1800, minus the C's in-place splitting)."""
    if e < s:
        return 0
    newly = e - s + 1
    for cs, ce in covered:
        lo, hi = max(s, cs), min(e, ce)
        if lo <= hi:
            newly -= hi - lo + 1
    if newly <= 0:
        return 0
    covered.append((s, e))
    covered.sort()
    merged = []
    for cs, ce in covered:
        if merged and cs <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], ce))
        else:
            merged.append((cs, ce))
    covered[:] = merged
    return newly


def _prefill_kernel(bins: list[int], bin_size: int, cf: str, xff: float, cand_order: list[int], cand_bin: dict):
    """Build the per-(series, ds) pandas kernel running the reference's
    candidate walk (prefill_bin, src/rrd_create.c:2004-2127) over the
    unioned candidate rows. Float op order replicates
    prefill_consolidate/prefill_finish exactly."""

    def fill(pdf):
        import pandas as pd

        series = pdf["series_id"].iloc[0]
        ds = pdf["ds_name"].iloc[0]
        by_rank = {
            int(r): g.sort_values("ts")
            for r, g in pdf.groupby("rank")
        }
        out_ts, out_val = [], []
        for T in bins:
            lo = T - bin_size + 1
            covered: list = []
            total = 0
            est = float("nan")
            for rank in cand_order:
                g = by_rank.get(rank)
                if g is None:
                    continue
                cb = cand_bin[rank]
                for E, v in zip(g["ts"], g["value"]):
                    E = int(E)
                    if v is None or (isinstance(v, float) and math.isnan(v)):
                        continue
                    s, e = E - cb + 1, E
                    s2, e2 = max(s, lo), min(e, T)
                    if e2 < s2:
                        continue
                    newly = _coverage_add(covered, s2, e2)
                    if newly <= 0:
                        continue
                    total += newly
                    v = float(v)
                    if cf == "AVERAGE":
                        if math.isnan(est):
                            est = 0.0
                        est = est + v / bin_size * newly
                    elif cf == "MIN":
                        est = v if math.isnan(est) else min(est, v)
                    elif cf == "MAX":
                        est = v if math.isnan(est) else max(est, v)
                    else:  # LAST: latest covering value wins
                        est = v
                if total >= bin_size:
                    break
            if total > xff * bin_size:
                if cf == "AVERAGE":
                    est = est / total * bin_size
                if not math.isnan(est):
                    out_ts.append(float(T))
                    out_val.append(est)
        return pd.DataFrame(
            {
                "series_id": series,
                "ds_name": ds,
                "ts": pd.Series(out_ts, dtype="float64"),
                "value": pd.Series(out_val, dtype="float64"),
            }
        )

    return fill


def prefill_rollup(
    target_rra: RRADef,
    step: int,
    last_up: int,
    sources: list[DatasetStore],
    ds_names: list[str],
    mapping: dict[str, str | tuple[str, int]] | None = None,
    relabel: dict[int, str] | None = None,
) -> DataFrame | None:
    """(series_id, ds_name, ts, value) rows for one new archive, filled
    from the sources' archives; None when no candidate archives exist.

    ``relabel`` maps a 1-based source index to a replacement series id:
    a reference .rrd file is ONE anonymous series, so single-series
    sources merge into the target's series identity (the dump of
    ``create --source a --source b`` diffs clean against a natively
    updated file — tests/create-with-source-and-mapping-1). Multi-series
    stores (the partitioned extension) keep their ids.

    ``ds_names``: the new dataset's data sources; each pulls from the
    source DS of the same name unless ``mapping`` overrides
    ({new: old} ≙ ``DS:new=old``); names absent in the sources stay
    unknown — exactly find_matching_candidates' by-name matching."""
    if target_rra.cf not in _PREFILL_CFS:
        return None
    bin_size = step * target_rra.pdp_cnt
    last_aligned = last_up - last_up % bin_size
    window_lo = last_aligned - target_rra.row_cnt * bin_size  # exclusive
    bins = [last_aligned - j * bin_size for j in range(target_rra.row_cnt)]
    bins = [t for t in bins if t > window_lo]
    bins.reverse()  # chronological

    cands = []
    for src_idx, src in enumerate(sources, start=1):
        d = src.dataset
        src_last = src.last()
        for i, rra in enumerate(d.rra):
            if rra.cf not in BASIC_CFS:
                continue
            if not (rra.cf == target_rra.cf or rra.cf == "AVERAGE"):
                continue  # select_create_candidates
            cands.append((src, i, rra.cf, d.step * rra.pdp_cnt, rra.row_cnt, src_last, src_idx))
    if not cands:
        return None
    cands.sort(key=_order_key(bin_size, target_rra.cf))

    frames = []
    cand_bin: dict[int, int] = {}
    for rank, (src, i, _cf, res, rows, src_last, src_idx) in enumerate(cands):
        t = src._read(f"rra_{i}")
        if t is None:
            continue
        cand_bin[rank] = res
        # candidate ring retention + overlap with the target window: a
        # candidate bin [E-res+1, E] overlaps (window_lo, last_aligned]
        retention_lo = (src_last - src_last % res) - res * rows
        f = t.filter(
            (F.col("ts") > F.lit(float(max(window_lo, retention_lo))))
            & (F.col("ts") <= F.lit(float(last_aligned + res - 1)))
        ).select(
            "series_id", "ds_name", "ts", "value",
            F.lit(rank).alias("rank"), F.lit(src_idx).alias("src_idx"),
        )
        frames.append(f)
    if not frames:
        return None
    allc = frames[0]
    for f in frames[1:]:
        allc = allc.unionByName(f)
    if relabel:
        expr = F.col("series_id")
        for idx, new in relabel.items():
            expr = F.when(F.col("src_idx") == idx, F.lit(new)).otherwise(expr)
        allc = allc.withColumn("series_id", expr)
    # by-name DS matching with mapping overrides: a tiny (source name ->
    # target name) relation broadcast-joined in, relabeling as it filters
    # (two targets may pull the same source DS -> rows duplicate, which a
    # rename column could not express). A mapping value may carry a
    # 1-based source index — ``DS:new=old[3]`` — restricting the match to
    # that one --source (find_matching_candidates srcindex check,
    # src/rrd_create.c:2410-2420); NULL want_idx matches every source.
    mapping = mapping or {}
    pairs = []
    for t in ds_names:
        old = mapping.get(t, t)
        old, idx = old if isinstance(old, tuple) else (old, None)
        pairs.append((old, t, idx))
    spark = sources[0].spark
    mapdf = spark.createDataFrame(pairs, "src_ds string, tgt_ds string, want_idx int")
    allc = (
        allc.join(
            F.broadcast(mapdf),
            (allc["ds_name"] == mapdf["src_ds"])
            & (mapdf["want_idx"].isNull() | (allc["src_idx"] == mapdf["want_idx"])),
        )
        .select("series_id", F.col("tgt_ds").alias("ds_name"), "ts", "value", "rank")
    )
    kernel = _prefill_kernel(
        bins, bin_size, target_rra.cf, target_rra.xff, sorted(cand_bin), cand_bin
    )
    return allc.groupBy("series_id", "ds_name").applyInPandas(
        kernel, "series_id string, ds_name string, ts double, value double"
    )


def create_prefilled(
    spark: SparkSession,
    path: str,
    dataset: DatasetDef,
    sources: list[DatasetStore] | None = None,
    start: int | None = None,
    mapping: dict[str, str | tuple[str, int]] | None = None,
    partition_by_day: bool = False,
) -> DatasetStore:
    """``rrdtool create path [--source s]...`` — create ``dataset`` at
    ``path`` and prefill its archives from ``sources``.

    ``start=None`` with sources sets last_up to the max of the sources'
    last update (src/rrd_create.c:1070-1075). ``mapping`` renames data
    sources on the way in ({new_ds: source_ds} ≙ ``DS:new=old:...``)."""
    sources = sources or []
    if start is None and sources:
        start = max(s.last() for s in sources)
    if start is not None:
        dataset.start = start
    store = DatasetStore.create(spark, path, dataset, partition_by_day=partition_by_day)
    if sources and dataset.start:
        ds_names = [d.name for d in dataset.ds]
        # series census per source (one tiny distinct over its rollups +
        # samples): single-series sources lose their incidental label and
        # merge under the new dataset's identity, like the reference's
        # file-is-the-series model
        relabel: dict[int, str] = {}
        for si, s in enumerate(sources, start=1):
            parts = [s._read("samples")]
            parts += [s._read(f"rra_{j}") for j in range(len(s.dataset.rra))]
            parts = [p.select("series_id") for p in parts if p is not None]
            if not parts:
                continue
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            names = [r[0] for r in u.distinct().limit(2).collect()]
            if len(names) == 1:
                relabel[si] = dataset.name
        for i, rra in enumerate(dataset.rra):
            out = prefill_rollup(
                rra, dataset.step, dataset.start, sources, ds_names, mapping,
                relabel=relabel or None,
            )
            if out is not None:
                store._write(out, f"rra_{i}", mode="overwrite")
    return store
