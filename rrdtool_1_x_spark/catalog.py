"""Dataset catalog — the Spark-side replacement for the RRD file header.

Reference: the RRD header (src/rrd_format.h:402-414 ``rrd_t``) fixes, at
create time, the data sources (``ds_def_t``, src/rrd_format.h:161-174) and
archives (``rra_def_t``, src/rrd_format.h:267-275). We keep the same
metadata — names, DST types, heartbeats, clamps, CFs, xff, resolutions,
retention — as a plain dataclass document serialized to JSON next to the
dataset's parquet tables. Storage is NOT circular: an RRA becomes a rollup
table at resolution ``pdp_step * pdp_cnt`` with retention
``row_cnt * resolution`` seconds enforced by a time predicate instead of a
wrap-around pointer.

Validation mirrors rrd_create (src/rrd_create.c:310-700): DS name charset
and length, positive heartbeat, min<max, xff in [0,1), positive pdp_cnt and
row_cnt.
"""

from __future__ import annotations

import json
import re
from dataclasses import asdict, dataclass, field

# Reference: DS_NAM_RE "^[a-zA-Z0-9_-]+$", length cap (src/rrd_format.h:166-174).
_DS_NAME_RE = re.compile(r"^[a-zA-Z0-9_-]{1,64}$")

DST_TYPES = ("GAUGE", "COUNTER", "DERIVE", "ABSOLUTE", "DCOUNTER", "DDERIVE", "COMPUTE")
# Reference: enum cf_en (src/rrd_format.h:179-202).
CF_TYPES = (
    "AVERAGE",
    "MIN",
    "MAX",
    "LAST",
    "HWPREDICT",
    "MHWPREDICT",
    "SEASONAL",
    "DEVSEASONAL",
    "DEVPREDICT",
    "FAILURES",
)


@dataclass
class DSDef:
    """A data source: one named input channel of a dataset.

    Reference: ds_def_t (src/rrd_format.h:161-174).
    """

    name: str
    dst: str = "GAUGE"
    heartbeat: int = 600  # max seconds between samples before unknown
    min_val: float | None = None  # rate clamp lower bound (None = unbounded)
    max_val: float | None = None
    cdef: str | None = None  # RPN for DST=COMPUTE

    def validate(self) -> None:
        if not _DS_NAME_RE.match(self.name):
            raise ValueError(f"invalid DS name {self.name!r}")
        if self.dst not in DST_TYPES:
            raise ValueError(f"unknown DST {self.dst!r}")
        if self.dst == "COMPUTE":
            if not self.cdef:
                raise ValueError("COMPUTE DS requires cdef")
        elif self.heartbeat <= 0:
            raise ValueError("heartbeat must be positive")
        if self.min_val is not None and self.max_val is not None and self.min_val >= self.max_val:
            raise ValueError("min_val must be < max_val")


@dataclass
class RRADef:
    """An archive: (CF, resolution, retention) rollup spec.

    Reference: rra_def_t (src/rrd_format.h:267-275). ``pdp_cnt`` PDPs are
    consolidated into one row by ``cf``; a consolidated value is unknown when
    more than ``xff`` of its PDPs are unknown (src/rrd_update.c:2040-2045).
    """

    cf: str = "AVERAGE"
    xff: float = 0.5
    pdp_cnt: int = 1
    row_cnt: int = 600
    # Holt-Winters family parameters (src/rrd_format.h:209-259)
    params: dict[str, float] = field(default_factory=dict)

    def validate(self) -> None:
        if self.cf not in CF_TYPES:
            raise ValueError(f"unknown CF {self.cf!r}")
        if not (0.0 <= self.xff < 1.0):
            raise ValueError("xff must be in [0,1)")
        if self.pdp_cnt <= 0 or self.row_cnt <= 0:
            raise ValueError("pdp_cnt and row_cnt must be positive")


@dataclass
class DatasetDef:
    """A logical dataset ≙ one RRD file: step + DS list + RRA list.

    Reference: rrd_create argument grammar (src/rrd_create.c:77-240).
    """

    name: str
    step: int = 300
    ds: list[DSDef] = field(default_factory=list)
    rra: list[RRADef] = field(default_factory=list)
    start: int | None = None  # epoch seconds; updates at/before start rejected

    def validate(self) -> None:
        if self.step <= 0:
            raise ValueError("step must be positive")
        if not self.ds:
            raise ValueError("at least one DS required")
        if not self.rra:
            raise ValueError("at least one RRA required")
        names = [d.name for d in self.ds]
        if len(set(names)) != len(names):
            raise ValueError("duplicate DS names")
        for d in self.ds:
            d.validate()
        for r in self.rra:
            r.validate()

    def resolution(self, rra_idx: int) -> int:
        return self.step * self.rra[rra_idx].pdp_cnt

    def retention(self, rra_idx: int) -> int:
        return self.resolution(rra_idx) * self.rra[rra_idx].row_cnt

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "DatasetDef":
        doc = json.loads(s)
        doc["ds"] = [DSDef(**d) for d in doc.get("ds", [])]
        doc["rra"] = [RRADef(**r) for r in doc.get("rra", [])]
        return cls(**doc)


def create(name: str, step: int, ds: list[DSDef], rra: list[RRADef], start: int | None = None) -> DatasetDef:
    """Validate and return a dataset descriptor (≙ ``rrdtool create``).

    An HWPREDICT/MHWPREDICT archive flagged ``auto_contingent`` (the CLI
    sets it when the optional rra-num argument is absent) implicitly
    spawns its four companions — SEASONAL/DEVSEASONAL (rows=period,
    gamma=alpha), DEVPREDICT (rows like the primary), FAILURES (rows=
    period, deltas 2.0, threshold 7, window 9) — exactly like
    create_hw_contingent_rras (src/rrd_create.c:478-560)."""
    has_companions = any(
        r.cf in ("SEASONAL", "DEVSEASONAL", "DEVPREDICT", "FAILURES")
        for r in rra
    )
    expanded: list[RRADef] = []
    for r in rra:
        expanded.append(r)
        auto = r.params.pop("auto_contingent", None) if r.params else None
        if (
            r.cf in ("HWPREDICT", "MHWPREDICT")
            and auto
            # explicit companions anywhere in the spec mean the caller is
            # wiring the set by hand — don't double the archives
            and not has_companions
        ):
            period = int(r.params.get("period", 1))
            alpha = float(r.params.get("alpha", 0.1))
            expanded.append(
                RRADef(cf="SEASONAL", row_cnt=period, pdp_cnt=1,
                       params={"gamma": alpha})
            )
            expanded.append(
                RRADef(cf="DEVSEASONAL", row_cnt=period, pdp_cnt=1,
                       params={"gamma": alpha})
            )
            expanded.append(
                RRADef(cf="DEVPREDICT", row_cnt=r.row_cnt, pdp_cnt=1)
            )
            expanded.append(
                RRADef(cf="FAILURES", row_cnt=period, pdp_cnt=1,
                       params={"deltapos": 2.0, "deltaneg": 2.0,
                               "threshold": 7, "window": 9})
            )
    d = DatasetDef(name=name, step=step, ds=ds, rra=expanded, start=start)
    d.validate()
    return d
