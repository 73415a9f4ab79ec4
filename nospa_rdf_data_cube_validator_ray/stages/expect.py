"""Declarative data-quality expectations over a Dataset — the
Great-Expectations-shaped rule engine a training-data pipeline runs as
its ingest gate (and the generic face of what the cube validator does
for RDF: assert invariants, report violation counts, never mutate).

Scale shape: every ROW-LOCAL rule (not_null / in_set / between /
matches / custom) is evaluated vectorized inside ONE ``map_batches``
pass that emits rule-scale partial counts per batch (a handful of rows
each), summed on the driver — zero shuffle, one streaming scan
regardless of rule count.  ``unique`` rules need a global distinct and
reuse the project's bucketed exact-distinct (one coarse shuffle per
unique rule).  The result is a tiny (rule, n_checked, n_violations)
table.
"""

from __future__ import annotations

import re

import pandas as pd


def expectations(
    ds: "ray.data.Dataset", rules: list[tuple]
) -> pd.DataFrame:
    """Evaluate ``rules`` against ``ds``; returns a pandas DataFrame
    (rule-scale) with columns (rule, n_checked, n_violations), sorted by
    rule name.

    Rule tuples (first element is always the reported rule name):

    * ``(name, "not_null", col)`` — NULL values violate
    * ``(name, "unique", col)`` — violations = n_rows − n_distinct
      (NULLs count as one distinct value, like SQL ``count(DISTINCT)``
      plus a null group)
    * ``(name, "in_set", col, values)`` — value not in ``values`` (or
      NULL) violates
    * ``(name, "between", col, lo, hi)`` — value outside [lo, hi] or
      NULL violates
    * ``(name, "matches", col, pattern)`` — full-match regex (ASCII,
      RE2-compatible — keep oracles exact); NULL treated as ''
    * ``(name, "custom", fn)`` — ``fn(batch_df) -> bool Series`` of
      violations (cross-column consistency checks)
    """
    import ray.data  # noqa: F401  (type reference only)

    from ..functions.kernel import distinct

    row_rules = [r for r in rules if r[1] != "unique"]
    uniq_rules = [r for r in rules if r[1] == "unique"]
    compiled = {
        r[0]: re.compile(r[3], re.ASCII)
        for r in row_rules
        if r[1] == "matches"
    }

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        names, checked, viol = [], [], []
        for r in row_rules:
            name, kind = r[0], r[1]
            if kind == "not_null":
                v = int(df[r[2]].isna().sum())
            elif kind == "in_set":
                c = df[r[2]]
                v = int((~c.isin(list(r[3])) | c.isna()).sum())
            elif kind == "between":
                x = pd.to_numeric(df[r[2]], errors="coerce")
                v = int((x.isna() | (x < r[3]) | (x > r[4])).sum())
            elif kind == "matches":
                m = df[r[2]].fillna("").astype(str).str.fullmatch(
                    compiled[name]
                )
                v = int((~m).sum())
            elif kind == "custom":
                v = int(pd.Series(r[2](df)).sum())
            else:
                raise ValueError(f"unknown expectation kind: {kind!r}")
            names.append(name)
            checked.append(len(df))
            viol.append(v)
        return pd.DataFrame(
            {
                "rule": pd.Series(names, dtype="string"),
                "n_checked": pd.Series(checked, dtype="int64"),
                "n_violations": pd.Series(viol, dtype="int64"),
            }
        )

    rows: list[tuple] = []
    total: int | None = None
    if row_rules:
        pdf = ds.map_batches(partial, batch_format="pandas").to_pandas()
        if len(pdf):
            agg = pdf.groupby("rule", sort=False)[
                ["n_checked", "n_violations"]
            ].sum()
            total = int(agg["n_checked"].iloc[0])
            rows.extend(
                (name, int(c), int(v))
                for name, (c, v) in agg.iterrows()
            )
        else:
            total = 0
            rows.extend((r[0], 0, 0) for r in row_rules)
    for r in uniq_rules:
        name, col = r[0], r[2]
        if total is None:
            total = ds.count()
        nd = (
            distinct(
                ds.map_batches(
                    lambda df, c=col: df[[c]], batch_format="pandas"
                ),
                [col],
            ).count()
            if total
            else 0
        )
        rows.append((name, total, total - nd))

    out = pd.DataFrame(
        rows, columns=["rule", "n_checked", "n_violations"]
    ).astype({"rule": "string", "n_checked": "int64", "n_violations": "int64"})
    return out.sort_values("rule", ignore_index=True)


def table_profile(
    ds: "ray.data.Dataset", cols: list[str]
) -> pd.DataFrame:
    """Column-profiling summary — the pay-as-you-go statistics pass a
    catalog/optimizer runs at ingest: per column, row count, NULL
    count, EXACT distinct count, and lexicographic min/max of the
    string form (stringified so one schema covers every column type;
    numeric min/max is a one-line variant).

    Scale shape: one streaming scan emits per-batch partials — null/row
    counts plus per-batch DISTINCT (col, value) pairs — so the shuffle
    moves per-block-distinct values, not rows; ONE bucketed distinct
    across all profiled columns together (col is part of the key)
    counts exact cardinalities.  min/max fold associatively from
    block-scale partials on the driver."""
    from ..functions.kernel import distinct
    from ..util import bucket_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            nn = s.dropna().astype(str)
            rows.append(
                (
                    c,
                    len(s),
                    int(s.isna().sum()),
                    nn.min() if len(nn) else None,
                    nn.max() if len(nn) else None,
                )
            )
        return pd.DataFrame(
            rows, columns=["col_name", "n", "nulls", "mn", "mx"]
        ).astype({"col_name": "string", "n": "int64", "nulls": "int64",
                  "mn": "string", "mx": "string"})

    stats = ds.map_batches(partial, batch_format="pandas").to_pandas()

    def dpairs(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            v = df[c].dropna().astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"col_name": c, "v": v}))
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"col_name": "string", "v": "string"})

    def count_per_col(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("col_name", sort=False, as_index=False).size()
        return g.rename(columns={"size": "nd"}).astype(
            {"col_name": "string", "nd": "int64"}
        )

    # distinct (col, value) pairs, then per-col counts — one shuffle for
    # ALL profiled columns; bucket_agg keeps per-key cost off Ray
    nd = bucket_agg(
        distinct(
            ds.map_batches(dpairs, batch_format="pandas"), ["col_name", "v"]
        ),
        ["col_name"],
        count_per_col,
    ).to_pandas()
    nd_map = (
        dict(zip(nd["col_name"], nd["nd"])) if len(nd) else {}
    )

    g = stats.groupby("col_name", sort=False)
    out = pd.DataFrame(
        {
            "col_name": pd.Series(list(g.groups), dtype="string"),
            "n_rows": g["n"].sum().to_numpy(),
            "n_nulls": g["nulls"].sum().to_numpy(),
            "n_distinct": [
                int(nd_map.get(c, 0)) for c in g.groups
            ],
            "min_str": g["mn"].min().to_numpy(),
            "max_str": g["mx"].max().to_numpy(),
        }
    ).astype({"n_rows": "int64", "n_nulls": "int64", "n_distinct": "int64",
              "min_str": "string", "max_str": "string"})
    return out.sort_values("col_name", ignore_index=True)
