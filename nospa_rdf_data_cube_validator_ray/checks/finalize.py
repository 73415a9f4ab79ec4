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

_DETAIL_SEP = "\x1e"

_F_COLS = ["graph", "file_sha256", "ic", "subject", "detail"]


def _fdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=_F_COLS)


def _with_kb(ds, cols: list[str], num_buckets: int):
    """Add a coarse shuffle-bucket column over a composite key: the actual
    fine-grained grouping happens *inside* each bucket with vectorized
    pandas group-transforms — Ray shuffles ``num_buckets`` groups instead
    of one group per key (per-observation keys would mean one tiny pandas
    frame per observation, the same trap as the reference's per-obs loop)."""

    def add(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df = df.copy()
            df["kb"] = pd.Series(dtype="int64")
            return df
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + "\x00" + df[c].astype(str)
        h = pd.util.hash_pandas_object(key, index=False).to_numpy()
        df = df.copy()
        df["kb"] = (h % num_buckets).astype("int64")
        return df

    return ds.map_batches(add, batch_format="pandas")


def _flag_dups(df: pd.DataFrame) -> pd.DataFrame:
    d2 = df.drop_duplicates(["graph", "dataset", "key", "subject"]).sort_values(
        ["graph", "dataset", "key", "subject"]
    )
    # all but the (deterministic) min-subject member of each colliding group
    flagged = d2[d2.duplicated(["graph", "dataset", "key"], keep="first")]
    return pd.DataFrame(
        {
            "graph": flagged["graph"],
            "file_sha256": flagged["file_sha256"],
            "ic": "IC12",
            "subject": flagged["subject"],
            "detail": "",
        },
        columns=_F_COLS,
    )


def ic12_findings(dup_ds, num_buckets: int = 64) -> "ray.data.Dataset":
    return (
        _with_kb(dup_ds, ["graph", "dataset", "key"], num_buckets)
        .groupby("kb")
        .map_groups(_flag_dups, batch_format="pandas")
    )


class _FlagPoints:
    """Per-bucket IC-17 finalize: renders FINAL finding rows inside the
    bucketed map_groups (violations are observation-scale on a
    pathological corpus — they must never round-trip through the driver).
    ``nmeas`` / ``totals`` / ``wild_keys`` are dataset-scale dicts
    (measureType datasets are schema-scale), shipped once per task."""

    def __init__(self, nmeas: dict, totals: dict, wild_keys: set):
        self.nmeas = nmeas
        self.totals = totals
        self.wild_keys = wild_keys

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        keys = ["graph", "dataset", "key"]
        d2 = df.drop_duplicates(keys + ["subject"])
        if self.wild_keys:
            # wildcard datasets (a non-single-valued dim anywhere in the
            # dataset) use the exact pairwise fallback; their keys span
            # buckets, so the membership set rides in — dataset-level,
            # covering the per-key detail == 'w' marker rows too
            mask = [
                (g, d) not in self.wild_keys
                for g, d in zip(d2["graph"], d2["dataset"])
            ]
            d2 = d2[pd.Series(mask, index=d2.index)]
        if not len(d2):
            return _fdf([])
        grp = d2.groupby(keys, sort=False)
        size = grp["subject"].transform("size")
        gd_ix = pd.MultiIndex.from_frame(d2[["graph", "dataset"]])
        nm = gd_ix.map(self.nmeas)
        flagged = d2[nm.notna() & (size != nm.to_numpy())]
        if not len(flagged):
            return _fdf([])
        tot = pd.MultiIndex.from_frame(
            flagged[["graph", "dataset"]]
        ).map(self.totals)
        detail = (
            tot.to_numpy() - size[flagged.index].to_numpy()
        ).astype("int64").astype(str)
        return pd.DataFrame(
            {
                "graph": flagged["graph"],
                "file_sha256": flagged["file_sha256"],
                "ic": "IC17",
                "subject": flagged["subject"],
                "detail": detail,
            },
            columns=_F_COLS,
        )


def ic17_findings(pt_ds, indexes: dict, num_buckets: int = 64):
    """pt rows → IC-17 findings Dataset (final columns), or None when no
    dataset declares a measure count.  Findings stay distributed: the
    group-count compare renders rows inside the bucketed map_groups
    (ValidatorIC17.java:50-57 semantics, like the local path); only the
    dataset-scale aggregates (totals, wildcard set) and the cap-bounded
    wildcard fallback rows touch the driver."""
    import ray
    import ray.data

    nmeas = {
        (g, d): n
        for g, idx in indexes.items()
        for d, n in idx.ic17_nmeas_by_ds.items()
    }
    if not nmeas:
        return None

    from ..util import bucket_count

    # (graph, dataset) is corpus-scale on the shuffle path — bucketed
    # count, not Ray's per-distinct-key Aggregate (util.bucket_agg)
    tdf = bucket_count(
        pt_ds, ["graph", "dataset"], num_buckets=num_buckets
    ).to_pandas()  # not take_all: ~0.5 ms/row at dataset-scale rows
    # empty to_pandas frames are COLUMN-LESS (schema-less empty blocks):
    # every consumer must len-guard before column access
    totals = (
        dict(zip(zip(tdf["graph"], tdf["dataset"]), tdf["n"]))
        if len(tdf)
        else {}
    )
    wdf = pt_ds.filter(expr="detail == 'w'").to_pandas()
    wild_keys = (
        set(zip(wdf["graph"], wdf["dataset"])) if len(wdf) else set()
    )
    # enforce the wildcard cap STREAM-side, from the already-computed
    # per-dataset totals, before any wildcard row is collected — the loud
    # RuntimeError must fire before a pathological corpus can exhaust
    # driver memory, not after
    for k in wild_keys:
        if totals.get(k, 0) > 100_000:
            raise RuntimeError("IC-17 wildcard fallback exceeded cap")

    flag_points = _FlagPoints(nmeas, totals, wild_keys)

    def flag_points_fn(df: pd.DataFrame) -> pd.DataFrame:
        return flag_points(df)

    out = (
        _with_kb(pt_ds, ["graph", "dataset", "key"], num_buckets)
        .groupby("kb")
        .map_groups(flag_points_fn, batch_format="pandas")
    )

    # wildcard fallback: exact pairwise reference semantics.  ONE Dataset
    # pass collects all wildcard datasets' rows (pathological inputs,
    # bounded by the per-dataset cap above), then groups driver-side —
    # N wildcard datasets must not mean N full scans.
    if wild_keys:
        def keep_wild(df, wk=wild_keys):
            m = [
                (g, d) in wk for g, d in zip(df["graph"], df["dataset"])
            ]
            import pandas as _pd

            return df[_pd.Series(m, index=df.index)].reset_index(drop=True)

        all_wild = pt_ds.map_batches(
            keep_wild, batch_format="pandas"
        ).to_pandas()
        by_ds: dict = {}
        for g, d, subj, sha, key in zip(
            all_wild["graph"], all_wild["dataset"], all_wild["subject"],
            all_wild["file_sha256"], all_wild["key"],
        ):
            by_ds.setdefault((g, d), []).append((subj, sha, key))
        rows = _ic17_wildcard_rows(by_ds, nmeas)
        if rows:
            out = out.union(ray.data.from_pandas(_fdf(rows)))

    return out


def _parse_point(key: str) -> dict:
    """dim→value map from a pt-row key (entries joined by \\x1e, dim and
    value joined by \\x1f — \\x1f never appears raw in a rendered term, so
    the parse is unambiguous even for dim IRIs containing '=')."""
    return dict(kv.split("\x1f", 1) for kv in key.split(_DETAIL_SEP) if kv)


def _ic17_wildcard_rows(by_ds: dict, nmeas: dict) -> list:
    """Exact pairwise reference semantics (ValidatorIC17.java:46-96) for
    wildcard datasets — ONE shared implementation for the shuffle and
    local paths.  ``by_ds``: (graph, dataset) → [(subject, sha, key)].
    Quadratic per dataset, capped."""
    rows = []
    for (g, d) in sorted(by_ds):
        drows = by_ds[(g, d)]
        if len(drows) > 100_000:
            raise RuntimeError("IC-17 wildcard fallback exceeded cap")
        nm = nmeas.get((g, d))
        if nm is None:
            continue
        points = [(s, sha, _parse_point(key)) for s, sha, key in drows]
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
    return rows


def _merge_vals(df: pd.DataFrame) -> pd.DataFrame:
    keys = ["graph", "ic", "subject"]
    sha = df.drop_duplicates(keys)[keys + ["file_sha256"]]
    ex = df[keys + ["detail"]].copy()
    ex["detail"] = ex["detail"].str.split(_DETAIL_SEP)
    ex = ex.explode("detail")
    ex = ex[ex["detail"].astype(bool)].drop_duplicates()
    ex = ex.sort_values(keys + ["detail"])
    agg = ex.groupby(keys, sort=False)["detail"].agg(_DETAIL_SEP.join).reset_index()
    merged = sha.merge(agg, on=keys, how="left")
    merged["detail"] = merged["detail"].fillna("")
    return merged[_F_COLS]


def val_findings(val_ds, num_buckets: int = 64) -> "ray.data.Dataset":
    return (
        _with_kb(val_ds, ["graph", "ic", "subject"], num_buckets)
        .groupby("kb")
        .map_groups(_merge_vals, batch_format="pandas")
    )


def _ic17_local(pt: pd.DataFrame, indexes: dict) -> pd.DataFrame:
    """IC-17 on file-local pt rows (dim-point groups never cross a graph)."""
    if not len(pt):
        return _fdf([])
    nmeas = {
        (g, d): n
        for g in pt["graph"].unique()
        if (idx := indexes.get(g)) is not None
        for d, n in idx.ic17_nmeas_by_ds.items()
    }
    if not nmeas:
        return _fdf([])
    keys = ["graph", "dataset", "key"]
    d2 = pt.drop_duplicates(keys + ["subject"]).copy()
    d2["_w"] = d2["detail"] == "w"
    gd = d2.groupby(["graph", "dataset"], sort=False)
    wild_ds = gd["_w"].transform("max")
    totals = gd["subject"].transform("size")
    grp = d2.groupby(keys, sort=False)
    size = grp["subject"].transform("size")
    nm = pd.MultiIndex.from_frame(d2[["graph", "dataset"]]).map(nmeas)
    nm_arr = nm.to_numpy(dtype=object)
    has_nm = pd.notna(nm_arr)
    flagged = d2[(~wild_ds) & has_nm & (size.to_numpy() != nm_arr)]
    rows = [
        (r.graph, r.file_sha256, "IC17", r.subject, str(int(t) - int(s)))
        for r, t, s in zip(
            flagged.itertuples(), totals[flagged.index], size[flagged.index]
        )
    ]
    # wildcard datasets: exact pairwise reference semantics (pathological)
    wild_pairs = d2[wild_ds][["graph", "dataset"]].drop_duplicates()
    by_ds: dict = {}
    for g, d in wild_pairs.itertuples(index=False):
        drows = d2[(d2["graph"] == g) & (d2["dataset"] == d)]
        by_ds[(g, d)] = [
            (r.subject, r.file_sha256, r.key) for r in drows.itertuples()
        ]
    rows.extend(_ic17_wildcard_rows(by_ds, nmeas))
    return _fdf(rows)


def _ic2_local(dss: pd.DataFrame, indexes: dict) -> pd.DataFrame:
    """IC-2 for datasets discovered only via qb:dataSet edges (the typed
    universe is covered driver-side by ``ic2_typed_findings``)."""
    rows = []
    for g, d in dss[["graph", "dataset"]].drop_duplicates().itertuples(index=False):
        idx = indexes.get(g)
        if idx is None:
            continue
        if d in idx.typed_datasets:
            continue
        vals = idx.structure_vals_by_ds.get(d, ())
        if len(vals) != 1:
            rows.append((g, idx.sha, "IC2", d, _DETAIL_SEP.join(vals)))
    return _fdf(rows)


def local_finalize(out: pd.DataFrame, indexes: dict) -> pd.DataFrame:
    """Turn one file-local PivotCheck output frame into final findings.

    Valid because every second-stage group key (IC-12 value-set, IC-17
    dim-point, IC-19/20/21 value, IC-2 dataset) is scoped to one dataset ⊂
    one graph ⊂ one file — the zero-shuffle path. Giant files that exceed
    a block use the bucketed shuffle path instead (validate.py mode)."""
    kinds = out["kind"]
    parts = [out.loc[kinds == "f", _F_COLS]]
    dup = out[kinds == "dup"]
    if len(dup):
        parts.append(_flag_dups(dup))
    val = out[kinds == "val"]
    if len(val):
        parts.append(_merge_vals(val))
    pt = out[kinds == "pt"]
    if len(pt):
        parts.append(_ic17_local(pt, indexes))
    dss = out[kinds == "dss"]
    if len(dss):
        parts.append(_ic2_local(dss, indexes))
    return pd.concat(parts, ignore_index=True)


def ic2_typed_findings(indexes: dict) -> pd.DataFrame:
    """Driver-side IC-2 over the explicitly typed dataset universe (covers
    graphs with no observations at all — they never reach the local path)."""
    rows = []
    for g in sorted(indexes):
        idx = indexes[g]
        for d in sorted(idx.typed_datasets):
            vals = idx.structure_vals_by_ds.get(d, ())
            if len(vals) != 1:
                rows.append((g, idx.sha, "IC2", d, _DETAIL_SEP.join(vals)))
    return _fdf(rows)


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
