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

# a 0-row pandas frame of object columns makes Ray 2.49's block-size
# estimator log "Error calculating size ... vectorize on size 0 inputs"
# once per column per empty block (measured: most finalize groups flag
# nothing, so the bench log drowned in these) — an EMPTY ARROW table is
# typed and sized without the estimator, so empty results return this
def _empty_findings_table():
    import pyarrow as pa

    return pa.schema([(c, pa.string()) for c in _F_COLS]).empty_table()


def _fdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=_F_COLS)


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


_KB_KEYS = {
    "dup": ["graph", "dataset", "key"],      # IC-12 value-set groups
    "val": ["graph", "ic", "subject"],       # IC-19/20/21 value merges
    "pt": ["graph", "dataset", "key"],       # IC-17 dimension points
}
_KB_OFFSET = {"dup": 0, "val": 1, "pt": 2}


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


def _pt_dataset_aggs(pivot_out) -> tuple[dict, set]:
    """IC-17's dataset-scale aggregates — per-dataset pt-row totals and the
    wildcard-dataset set — via map-side partials + a driver combine.  Both
    results are driver-resident dicts anyway (dataset-scale, like the
    schema indexes), so a shuffle buys nothing: one streaming scan emits a
    tiny (graph, dataset, n, w) frame per block and the driver sums them,
    avoiding an extra all-to-all (Ray 2.49 aggregator spin-up is ~5-10 s
    per shuffle regardless of data size)."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["kind"] == "pt"]
        if not len(p):
            return pd.DataFrame(
                {
                    "graph": pd.Series(dtype="string"),
                    "dataset": pd.Series(dtype="string"),
                    "n": pd.Series(dtype="int64"),
                    "w": pd.Series(dtype="int64"),
                }
            )
        return (
            p.assign(_w=(p["detail"] == "w").astype("int64"))
            .groupby(["graph", "dataset"], sort=False)
            .agg(n=("subject", "size"), w=("_w", "max"))
            .reset_index()
        )

    tdf = pivot_out.map_batches(partials, batch_format="pandas").to_pandas()
    if not len(tdf):  # empty to_pandas frames are COLUMN-LESS — len-guard
        return {}, set()
    comb = (
        tdf.groupby(["graph", "dataset"], sort=False)
        .agg(n=("n", "sum"), w=("w", "max"))
        .reset_index()
    )
    totals = dict(zip(zip(comb["graph"], comb["dataset"]), comb["n"]))
    wild_keys = {
        (g, d)
        for g, d, w in zip(comb["graph"], comb["dataset"], comb["w"])
        if w
    }
    return totals, wild_keys


def fused_findings(pivot_out, indexes: dict, num_buckets: int = 64):
    """IC-12 (dup) + IC-19/20/21 (val) + IC-17 (pt) finalized through ONE
    bucketed shuffle: each kind hashes its own group key into a disjoint
    ``kb`` range (kind_offset * B + hash(key) % B), so a single
    groupby("kb").map_groups dispatches all three second-stage groupings
    where three separate sorts each paid Ray's fixed all-to-all spin-up.

    IC-17 semantics are unchanged (ValidatorIC17.java:50-57): final rows
    render inside the map_groups; only the dataset-scale aggregates and
    the cap-bounded wildcard fallback touch the driver."""
    import ray
    import ray.data

    nmeas = {
        (g, d): n
        for g, idx in indexes.items()
        for d, n in idx.ic17_nmeas_by_ds.items()
    }
    if nmeas:
        totals, wild_keys = _pt_dataset_aggs(pivot_out)
        # enforce the wildcard cap STREAM-side, from the per-dataset
        # totals, before any wildcard row is collected — the loud
        # RuntimeError must fire before a pathological corpus can exhaust
        # driver memory, not after
        for k in wild_keys:
            if totals.get(k, 0) > 100_000:
                raise RuntimeError("IC-17 wildcard fallback exceeded cap")
    else:
        totals, wild_keys = {}, set()
    flag_points = _FlagPoints(nmeas, totals, wild_keys)
    keep_pt = bool(nmeas)  # pt rows without a declared measure count are inert
    B = num_buckets

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for kind, cols in _KB_KEYS.items():
            if kind == "pt" and not keep_pt:
                continue
            p = df[df["kind"] == kind]
            if not len(p):
                continue
            key = p[cols[0]].astype(str)
            for c in cols[1:]:
                key = key + "\x00" + p[c].astype(str)
            h = pd.util.hash_pandas_object(key, index=False).to_numpy()
            p = p.copy()
            p["kb"] = (_KB_OFFSET[kind] * B + (h % B)).astype("int64")
            parts.append(p)
        if not parts:
            # TYPED empty — a 0-row object-dtype frame would poison Ray's
            # schema unification downstream (empty-block stickiness)
            out = pd.DataFrame(
                {c: pd.Series(dtype="string") for c in df.columns}
            )
            out["kb"] = pd.Series(dtype="int64")
            return out
        return pd.concat(parts, ignore_index=True)

    def finalize_group(df: pd.DataFrame) -> pd.DataFrame:
        # disjoint kb spaces mean one kind per group, but dispatch by the
        # kind column so a hash collision across spaces can't misroute
        outs = []
        for kind, sub in df.groupby("kind", sort=False):
            if kind == "dup":
                outs.append(_flag_dups(sub))
            elif kind == "val":
                outs.append(_merge_vals(sub))
            elif kind == "pt":
                outs.append(flag_points(sub))
        out = pd.concat(outs, ignore_index=True) if outs else _fdf([])
        if not len(out):
            return _empty_findings_table()
        return out

    out = (
        pivot_out.map_batches(add_kb, batch_format="pandas")
        .groupby("kb")
        .map_groups(finalize_group, batch_format="pandas")
    )

    # wildcard fallback: exact pairwise reference semantics.  ONE Dataset
    # pass collects all wildcard datasets' rows (pathological inputs,
    # bounded by the per-dataset cap above), then groups driver-side —
    # N wildcard datasets must not mean N full scans.
    if wild_keys:

        def keep_wild(df, wk=wild_keys):
            m = [
                (g, d) in wk and k == "pt"
                for g, d, k in zip(df["graph"], df["dataset"], df["kind"])
            ]
            return df[pd.Series(m, index=df.index)].reset_index(drop=True)

        all_wild = pivot_out.map_batches(
            keep_wild, batch_format="pandas"
        ).to_pandas()
        by_ds: dict = {}
        if len(all_wild):
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
