"""Second-stage group aggregations turning pivot output into findings.

* IC-12: duplicate value-set groups — ``groupby(graph, dataset, value-set
  key)``; every member but the deterministic first (min subject — the
  reference's HashSet iteration order is nondeterministic,
  ValidatorIC11_12.java:70-80) is flagged with an empty detail set.
* IC-17: dimension-point groups — a group's size must equal the dataset's
  declared measure count (ValidatorIC17.java:50-57: flag when
  ``numObs1 - numObs2 != numOfMeasure`` where ``numObs1 - numObs2`` is the
  equal-group size); the detail is ``numObs2 = dataset_total - size``.
  Observations with a non-single-valued dimension make the reference's
  pairwise relation non-transitive; datasets containing one fall back to
  the exact pairwise semantics (driver-side, capped — pathological, not
  scale-bearing).
* IC-19/20/21: value-keyed flags merged per (graph, ic, value) with the
  union of failing code lists (ValidatorIC19.java:79-95).
* IC-2: the dataset universe (explicitly typed ∪ resource objects of
  qb:dataSet per phase 1) checked against qb:structure counts from the
  schema index (ValidatorIC2.java:24-36).
"""

from __future__ import annotations

import pandas as pd

import ray

_DETAIL_SEP = "\x1e"

_F_COLS = ["graph", "file_sha256", "ic", "subject", "detail"]


def _fdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=_F_COLS)


def _flag_dups(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for (g, _d, _k), grp in df.groupby(["graph", "dataset", "key"], sort=False):
        if len(grp) < 2:
            continue
        subjs = sorted(set(grp["subject"]))
        if len(subjs) < 2:
            continue
        sha = grp["file_sha256"].iat[0]
        for s in subjs[1:]:
            rows.append((g, sha, "IC12", s, ""))
    return _fdf(rows)


def ic12_findings(dup_ds) -> "ray.data.Dataset":
    return dup_ds.groupby(["graph", "dataset", "key"]).map_groups(
        _flag_dups, batch_format="pandas"
    )


class _FlagPoints:
    def __init__(self, nmeas_by_graph_ds: dict):
        self.nmeas = nmeas_by_graph_ds

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (g, d, _k), grp in df.groupby(["graph", "dataset", "key"], sort=False):
            if (grp["detail"] == "w").any():
                continue  # wildcard dataset handled in the fallback
            nm = self.nmeas.get((g, d))
            if nm is None:
                continue
            size = grp["subject"].nunique()
            if size != nm:
                sha = grp["file_sha256"].iat[0]
                for s in sorted(set(grp["subject"])):
                    rows.append((g, sha, d, s, size))
        return pd.DataFrame(
            rows, columns=["graph", "file_sha256", "dataset", "subject", "size"]
        )


def ic17_findings(pt_ds, indexes: dict) -> pd.DataFrame:
    """pt rows → IC-17 findings as a small pandas DataFrame (measureType
    datasets are schema-scale; per-dataset totals are tiny aggregates)."""
    nmeas = {
        (g, d): n
        for g, idx in indexes.items()
        for d, n in idx.ic17_nmeas_by_ds.items()
    }
    if not nmeas:
        return _fdf([])

    totals = {
        (r["graph"], r["dataset"]): r["count()"]
        for r in pt_ds.groupby(["graph", "dataset"]).count().take_all()
    }
    wild_rows = pt_ds.filter(lambda r: r["detail"] == "w").take_all()
    wild_keys = {(r["graph"], r["dataset"]) for r in wild_rows}

    flag_points = _FlagPoints(nmeas)

    def flag_points_fn(df: pd.DataFrame) -> pd.DataFrame:
        return flag_points(df)

    flagged = pt_ds.groupby(["graph", "dataset", "key"]).map_groups(
        flag_points_fn, batch_format="pandas"
    ).take_all()

    rows = []
    for r in flagged:
        g, d = r["graph"], r["dataset"]
        if (g, d) in wild_keys:
            continue
        total = totals.get((g, d), 0)
        rows.append((g, r["file_sha256"], "IC17", r["subject"], str(total - r["size"])))

    # wildcard fallback: exact pairwise reference semantics
    for (g, d) in sorted(wild_keys):
        drows = pt_ds.filter(
            lambda r, g=g, d=d: r["graph"] == g and r["dataset"] == d
        ).take_all()
        if len(drows) > 100_000:
            raise RuntimeError("IC-17 wildcard fallback exceeded cap")
        points = []
        for r in drows:
            vec = dict(kv.split("=", 1) for kv in r["key"].split(_DETAIL_SEP) if kv)
            points.append((r["subject"], r["file_sha256"], vec))
        nm = nmeas.get((g, d))
        n1 = len(points)
        for s1, sha, v1 in points:
            eq = 0
            for _s2, _sha2, v2 in points:
                same = True
                for dim, a in v1.items():
                    b = v2.get(dim, "*")
                    if a != "*" and b != "*" and a != b:
                        same = False
                        break
                if same:
                    eq += 1
            if eq != nm:
                rows.append((g, sha, "IC17", s1, str(n1 - eq)))

    return _fdf(rows)


def _merge_vals(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for (g, ic, v), grp in df.groupby(["graph", "ic", "subject"], sort=False):
        cls: set[str] = set()
        for d in grp["detail"]:
            cls.update(x for x in d.split(_DETAIL_SEP) if x)
        rows.append((g, grp["file_sha256"].iat[0], ic, v, _DETAIL_SEP.join(sorted(cls))))
    return _fdf(rows)


def val_findings(val_ds) -> "ray.data.Dataset":
    return val_ds.groupby(["graph", "ic", "subject"]).map_groups(
        _merge_vals, batch_format="pandas"
    )


def ic2_findings(dss_rows: list[dict], indexes: dict) -> pd.DataFrame:
    universe: dict[str, set[str]] = {
        g: set(idx.typed_datasets) for g, idx in indexes.items()
    }
    for r in dss_rows:
        universe.setdefault(r["graph"], set()).add(r["dataset"])
    rows = []
    for g in sorted(universe):
        idx = indexes.get(g)
        sha = idx.sha if idx is not None else ""
        sv = idx.structure_vals_by_ds if idx is not None else {}
        for d in sorted(universe[g]):
            vals = sv.get(d, ())
            if len(vals) != 1:
                rows.append((g, sha, "IC2", d, _DETAIL_SEP.join(vals)))
    return _fdf(rows)


def schema_findings_df(indexes: dict) -> pd.DataFrame:
    rows = []
    for g in sorted(indexes):
        idx = indexes[g]
        for ic, subject, detail in idx.schema_findings:
            rows.append((g, idx.sha, ic, subject, _DETAIL_SEP.join(detail)))
    return _fdf(rows)
