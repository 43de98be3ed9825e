"""rrdtool dump/restore XML — the reference interchange format.

Reference: rrd_dump_opt_r (src/rrd_dump.c:56-497), rrd_restore
(src/rrd_restore.c), DTD doc/rrdtool-dump.dtd, golden test
tests/dump-restore (create → update → dump → restore → dump → diff).

Mapping notes (one .rrd file = one series):

* ``dump_xml`` writes one XML document per series, structured exactly like
  the reference: header (version/step/lastupdate), per-DS block
  (name/type/minimal_heartbeat/min/max or <cdef>, then PDP status), per-RRA
  block (cf/pdp_per_row/params/cdp_prep/database). Floats use the
  reference's %0.10e, unknowns are the literal ``NaN``, and database rows
  run oldest→newest on the archive's aligned step grid ending at
  ``lastupdate`` — byte-compatible with what ``rrdtool restore`` parses.
* PDP/CDP scratch (mid-step accumulator, mid-window CDP state): this engine
  derives archives from retained raw samples instead of carrying scratch
  registers, so dumps emit a fresh scratch (value NaN / unknown counters 0)
  and ``last_ds`` from the newest raw sample. ``rrdtool restore`` accepts
  that (it simply resumes consolidation from a clean window); the archive
  DATA round-trips exactly.
* ``restore_xml`` parses reference dumps (including real ones from
  rrdtool): header → DatasetDef, database rows → rra_<i> tables verbatim,
  plus synthetic raw samples from the finest AVERAGE archive (value at
  window end — exact for GAUGE inputs, a rate-level reconstruction for
  counter types, which is all any archive-only format can give). The exact
  ``lastupdate`` is persisted (restored.json) so fetch alignment matches
  the source file. Updates to a restored store should flow through the
  incremental streaming ingest (which merges windows); a batch rebuild()
  recomputes only from raw samples.
"""

from __future__ import annotations

import json
import math
import os
import time as _time
import xml.etree.ElementTree as ET

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DatasetDef, DSDef, RRADef
from rrdtool_1_x_spark.sources.store import DatasetStore

_BASIC = {"AVERAGE", "MIN", "MAX", "LAST"}
# params emitted per CF, in rrd_dump.c order (src/rrd_dump.c:216-280)
_HW_PARAM_ORDER = {
    "HWPREDICT": ("hw_alpha", "hw_beta", "dependent_rra_idx"),
    "MHWPREDICT": ("hw_alpha", "hw_beta", "dependent_rra_idx"),
    "SEASONAL": ("seasonal_gamma", "seasonal_smooth_idx", "smoothing_window", "dependent_rra_idx"),
    "DEVSEASONAL": ("seasonal_gamma", "seasonal_smooth_idx", "smoothing_window", "dependent_rra_idx"),
    "DEVPREDICT": ("dependent_rra_idx",),
    "FAILURES": ("delta_pos", "delta_neg", "window_len", "failure_threshold", "dependent_rra_idx"),
}
_INT_PARAMS = {"dependent_rra_idx", "seasonal_smooth_idx", "window_len", "failure_threshold"}


def _e(v: float) -> str:
    """%0.10e with the reference's NaN literal."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NaN"
    return f"{float(v):.10e}"


def _num(s: str) -> float:
    s = s.strip()
    return float("nan") if s in ("NaN", "nan", "-nan", "U") else float(s)


def _ts_comment(ts: int) -> str:
    lt = _time.localtime(ts)
    return _time.strftime("%Y-%m-%d %H:%M:%S %Z", lt)


def _resolve_series(store: DatasetStore, series_id: str | None) -> str:
    if series_id is not None:
        return series_id
    samples = store._read("samples")
    sids = [] if samples is None else [
        r["series_id"] for r in samples.select("series_id").distinct().collect()
    ]
    if len(sids) > 1:
        raise ValueError(f"store holds {len(sids)} series; pass series_id")
    return sids[0] if sids else store.dataset.name


def dump_xml(
    store: DatasetStore, out_path: str, series_id: str | None = None,
    header: str = "dtd",
) -> None:
    """Write one reference-format XML dump for ``series_id`` (auto-selected
    when the store holds a single series, like one .rrd file).

    This is the driver-side path — faithful to the reference's sequential
    writer and right for human-scale files. Archives too big to
    materialize on the driver go through ``dump_xml_distributed``."""
    d = store.dataset
    lastup = store.last()
    samples = store._read("samples")
    series_id = _resolve_series(store, series_id)
    L: list[str] = _doc_head(store, series_id, lastup, samples, header)
    data_ds = [ds for ds in d.ds if ds.dst != "COMPUTE"]
    for i, rra in enumerate(d.rra):
        res = d.step * rra.pdp_cnt
        L.extend(_rra_head(d, rra, res, len(data_ds)))
        rows: dict[tuple[float, str], float] = {}
        t = store._read(f"rra_{i}")
        if t is not None:
            for r in t.filter(F.col("series_id") == series_id).collect():
                rows[(r["ts"], r["ds_name"])] = r["value"]
        last_aligned = lastup - lastup % res
        for k in range(-(rra.row_cnt - 1), 1):
            slot = last_aligned + k * res
            vs = "".join(
                f"<v>{_e(rows.get((float(slot), ds.name), float('nan')))}</v>"
                for ds in data_ds
            )
            L.append(f"\t\t\t<!-- {_ts_comment(slot)} / {slot} --> <row>{vs}</row>")
        L.extend(_RRA_TAIL)
    L.append("</rrd>")
    with open(out_path, "w") as f:
        f.write("\n".join(L) + "\n")


_XML_PROLOGS = {
    # rrd_dump.c:102-115 opt_header variants
    "dtd": [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<!DOCTYPE rrd SYSTEM "https://oss.oetiker.ch/rrdtool/rrdtool.dtd">',
        "<!-- Round Robin Database Dump -->",
        "<rrd>",
    ],
    "xsd": [
        '<?xml version="1.0" encoding="utf-8"?>',
        "<!-- Round Robin Database Dump -->",
        '<rrd xmlns="https://oss.oetiker.ch/rrdtool/rrdtool-dump.xml" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"',
        '\txsi:schemaLocation="https://oss.oetiker.ch/rrdtool/rrdtool-dump.xml '
        'https://oss.oetiker.ch/rrdtool/rrdtool-dump.xsd">',
    ],
    "none": ["<!-- Round Robin Database Dump -->", "<rrd>"],
}


def _doc_head(
    store: DatasetStore, series_id: str, lastup: int, samples,
    header: str = "dtd",
) -> list[str]:
    """Header + DS blocks through the archives comment (shared by the
    driver-side and distributed dump paths). ``header`` selects the XML
    prolog like rrd_dump --header none|xsd|dtd / --no-header."""
    d = store.dataset
    # a store restored from a dump keeps the source's PDP-status block
    # verbatim (restored.json); it stays authoritative until newer raw
    # samples supersede the dump's lastupdate
    pdp_status: dict[str, dict] = {}
    try:
        with open(f"{store.path}/restored.json") as f:
            rdoc = json.load(f)
        if int(rdoc.get("lastupdate", -1)) >= lastup:
            pdp_status = rdoc.get("pdp_status", {})
    except (FileNotFoundError, ValueError):
        pass
    last_raw: dict[str, float] = {}
    if samples is not None:
        for r in (
            samples.filter(F.col("series_id") == series_id)
            .groupBy("ds_name")
            .agg(F.max_by("value", "ts").alias("v"))
            .collect()
        ):
            last_raw[r["ds_name"]] = r["v"]

    if header not in _XML_PROLOGS:
        raise ValueError(f"unknown dump header style {header!r}")
    L: list[str] = list(_XML_PROLOGS[header])
    L.append("\t<version>0003</version>")
    L.append(f"\t<step>{d.step}</step> <!-- Seconds -->")
    L.append(f"\t<lastupdate>{lastup}</lastupdate> <!-- {_ts_comment(lastup)} -->")
    L.append("")
    for ds in d.ds:
        L.append("\t<ds>")
        L.append(f"\t\t<name> {ds.name} </name>")
        L.append(f"\t\t<type> {ds.dst} </type>")
        if ds.dst == "COMPUTE":
            L.append(f"\t\t<cdef> {ds.cdef} </cdef>")
        else:
            L.append(f"\t\t<minimal_heartbeat>{ds.heartbeat}</minimal_heartbeat>")
            L.append(f"\t\t<min>{_e(ds.min_val if ds.min_val is not None else float('nan'))}</min>")
            L.append(f"\t\t<max>{_e(ds.max_val if ds.max_val is not None else float('nan'))}</max>")
        L.append("")
        L.append("\t\t<!-- PDP Status -->")
        if ds.name in pdp_status:
            ps = pdp_status[ds.name]
            L.append(f"\t\t<last_ds>{ps['last_ds']}</last_ds>")
            L.append(f"\t\t<value>{ps['value']}</value>")
            L.append(f"\t\t<unknown_sec> {ps['unknown_sec']} </unknown_sec>")
        else:
            lv = last_raw.get(ds.name)
            last_ds = "U" if lv is None else (f"{lv:.10g}" if lv != int(lv) else str(int(lv)))
            L.append(f"\t\t<last_ds>{last_ds}</last_ds>")
            L.append("\t\t<value>NaN</value>")
            L.append("\t\t<unknown_sec> 0 </unknown_sec>")
        L.append("\t</ds>")
        L.append("")
    L.append("\t<!-- Round Robin Archives -->")
    return L


def _rra_head(d: DatasetDef, rra: RRADef, res: int, n_data_ds: int) -> list[str]:
    L = ["\t<rra>"]
    L.append(f"\t\t<cf>{rra.cf}</cf>")
    L.append(f"\t\t<pdp_per_row>{rra.pdp_cnt}</pdp_per_row> <!-- {res} seconds -->")
    L.append("")
    L.append("\t\t<params>")
    for p in _HW_PARAM_ORDER.get(rra.cf, ()):
        if p in rra.params:
            v = rra.params[p]
            val = str(int(v)) if p in _INT_PARAMS else _e(float(v))
            L.append(f"\t\t<{p}>{val}</{p}>")
    L.append(f"\t\t<xff>{_e(rra.xff)}</xff>")
    L.append("\t\t</params>")
    L.append("\t\t<cdp_prep>")
    for _ in range(n_data_ds):
        L.append("\t\t\t<ds>")
        L.append("\t\t\t<primary_value>NaN</primary_value>")
        L.append("\t\t\t<secondary_value>NaN</secondary_value>")
        L.append("\t\t\t<value>NaN</value>")
        L.append("\t\t\t<unknown_datapoints>0</unknown_datapoints>")
        L.append("\t\t\t</ds>")
    L.append("\t\t</cdp_prep>")
    L.append("\t\t<database>")
    return L


_RRA_TAIL = ["\t\t</database>", "\t</rra>"]


def dump_xml_distributed(
    store: DatasetStore, out_dir: str, series_id: str | None = None,
    header: str = "dtd",
) -> None:
    """Cluster-scale dump: the same document as ``dump_xml``, but every
    ``<database>`` section is rendered and written by executors — the
    driver never materializes archive rows (the fix for the dump-side
    collect(); same ordered-text-parts pattern as xport.write_csv).

    Layout under ``out_dir``: numbered fragments that concatenate (in
    name order, part files within a fragment directory likewise) into the
    exact dump — ``assemble_dump`` does that for a local file, a cluster
    user cats the parts. Byte-parity caveat: the in-row timestamp comments
    format through the JVM in the session timezone, which matches the
    reference's localtime output when host TZ == session TZ (both UTC
    here)."""
    import shutil

    d = store.dataset
    lastup = store.last()
    series_id = _resolve_series(store, series_id)
    spark = store.spark
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    data_ds = [ds for ds in d.ds if ds.dst != "COMPUTE"]

    def frag(seq: int, name: str, lines: list[str]) -> None:
        with open(f"{out_dir}/{seq:03d}_{name}", "w") as f:
            f.write("\n".join(lines) + "\n")

    seq = 0
    frag(seq, "head", _doc_head(store, series_id, lastup,
                                store._read("samples"), header))
    parallelism = max(spark.sparkContext.defaultParallelism, 1)
    for i, rra in enumerate(d.rra):
        res = d.step * rra.pdp_cnt
        seq += 1
        frag(seq, f"rra{i}_head", _rra_head(d, rra, res, len(data_ds)))
        last_aligned = lastup - lastup % res
        first_slot = last_aligned - (rra.row_cnt - 1) * res
        grid = spark.range(rra.row_cnt).select(
            (F.lit(first_slot) + F.col("id") * res).cast("double").alias("ts")
        )
        t = store._read(f"rra_{i}")
        if t is not None:
            wide = (
                t.filter(F.col("series_id") == series_id)
                .groupBy("ts")
                .pivot("ds_name", [ds.name for ds in data_ds])
                .agg(F.first("value"))
            )
            grid = grid.join(wide, "ts", "left")
        else:
            for ds in data_ds:
                grid = grid.withColumn(ds.name, F.lit(None).cast("double"))
        cells = F.concat(*[
            F.concat(
                F.lit("<v>"),
                F.when(
                    F.col(ds.name).isNull() | F.isnan(ds.name), F.lit("NaN")
                ).otherwise(F.format_string("%.10e", F.col(ds.name))),
                F.lit("</v>"),
            )
            for ds in data_ds
        ])
        # the reference's per-row comment: localtime + " %Z" (here the JVM
        # session-timezone formatter; "zzz" prints the same abbreviation)
        comment = F.date_format(
            F.col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss zzz"
        )
        line = F.format_string(
            "\t\t\t<!-- %s / %d --> <row>%s</row>",
            comment, F.col("ts").cast("long"), cells,
        )
        (
            grid.repartitionByRange(parallelism, "ts")
            .sortWithinPartitions("ts")
            .select(line.alias("value"))
            .write.mode("overwrite").text(f"{out_dir}/{seq + 1:03d}_rra{i}_rows")
        )
        seq += 2
        frag(seq, f"rra{i}_tail", list(_RRA_TAIL))
    frag(seq + 1, "tail", ["</rrd>"])


def assemble_dump(out_dir: str, xml_path: str) -> None:
    """Concatenate a ``dump_xml_distributed`` directory into one local XML
    file (fragments in name order; part files within a fragment sorted by
    name, which repartitionByRange made the row order)."""
    with open(xml_path, "w") as w:
        for name in sorted(os.listdir(out_dir)):
            full = os.path.join(out_dir, name)
            if os.path.isdir(full):
                for p in sorted(os.listdir(full)):
                    if p.startswith("part-"):
                        with open(os.path.join(full, p)) as f:
                            w.write(f.read())
            else:
                with open(full) as f:
                    w.write(f.read())


def restore_xml(
    spark: SparkSession, xml_path: str, target_path: str, series_id: str | None = None
) -> DatasetStore:
    """Rebuild a dataset from a reference-format XML dump (accepts real
    ``rrdtool dump`` output)."""
    root = ET.parse(xml_path).getroot()
    step = int(root.findtext("step").strip())
    lastup = int(root.findtext("lastupdate").strip())
    name = os.path.basename(target_path.rstrip("/")) or "restored"
    series_id = series_id if series_id is not None else name

    ds_defs: list[DSDef] = []
    pdp_status: dict[str, dict] = {}
    for e in root.findall("ds"):
        dst = e.findtext("type").strip()
        pdp_status[e.findtext("name").strip()] = {
            "last_ds": (e.findtext("last_ds") or "U").strip(),
            "value": (e.findtext("value") or "NaN").strip(),
            "unknown_sec": (e.findtext("unknown_sec") or "0").strip(),
        }
        if dst == "COMPUTE":
            ds_defs.append(DSDef(name=e.findtext("name").strip(), dst=dst,
                                 cdef=e.findtext("cdef").strip()))
        else:
            mn, mx = _num(e.findtext("min")), _num(e.findtext("max"))
            ds_defs.append(
                DSDef(
                    name=e.findtext("name").strip(),
                    dst=dst,
                    heartbeat=int(e.findtext("minimal_heartbeat").strip()),
                    min_val=None if math.isnan(mn) else mn,
                    max_val=None if math.isnan(mx) else mx,
                )
            )
    data_ds = [ds for ds in ds_defs if ds.dst != "COMPUTE"]

    rra_defs: list[RRADef] = []
    rra_rows: list[list[tuple[int, list[float]]]] = []
    for e in root.findall("rra"):
        cf = e.findtext("cf").strip()
        pdp_cnt = int(e.findtext("pdp_per_row").strip())
        params_el = e.find("params")
        xff = 0.5
        params: dict[str, float] = {}
        if params_el is not None:
            for p in params_el:
                if p.tag == "xff":
                    xff = _num(p.text)
                else:
                    params[p.tag] = _num(p.text)
        db = e.find("database")
        vals = [[_num(v.text) for v in row.findall("v")] for row in db.findall("row")]
        res = step * pdp_cnt
        last_aligned = lastup - lastup % res
        n = len(vals)
        rows = [
            (last_aligned + (k - (n - 1)) * res, vals[k]) for k in range(n)
        ]
        rra_defs.append(RRADef(cf=cf, xff=xff, pdp_cnt=pdp_cnt, row_cnt=n, params=params))
        rra_rows.append(rows)

    dataset = DatasetDef(name=name, step=step, ds=ds_defs, rra=rra_defs)
    dataset.validate()
    store = DatasetStore.create(spark, target_path, dataset)
    schema = "series_id string, ds_name string, ts double, value double"
    for i, rows in enumerate(rra_rows):
        flat = [
            (series_id, ds.name, float(ts), v)
            for ts, vs in rows
            for ds, v in zip(data_ds, vs)
            if not math.isnan(v)
        ]
        store._write(spark.createDataFrame(flat or [], schema), f"rra_{i}", mode="overwrite")
    # synthetic raw samples from the finest AVERAGE archive: one reading at
    # each known window end (exact for GAUGE; rate-level for counter DSTs)
    finest = None
    for i, rra in enumerate(rra_defs):
        if rra.cf == "AVERAGE" and (finest is None or rra.pdp_cnt < rra_defs[finest].pdp_cnt):
            finest = i
    if finest is not None:
        flat = [
            (series_id, ds.name, float(ts), v)
            for ts, vs in rra_rows[finest]
            for ds, v in zip(data_ds, vs)
            if not math.isnan(v)
        ]
        if flat:
            store._write(spark.createDataFrame(flat, schema), "samples")
    with open(f"{target_path}/restored.json", "w") as f:
        json.dump(
            {"lastupdate": lastup, "series_id": series_id, "pdp_status": pdp_status}, f
        )
    store._last_cache = lastup
    return store
