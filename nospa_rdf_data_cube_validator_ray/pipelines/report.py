"""Result sink: render the findings Dataset as a markdown report.

Parity with the reference's log4j "result" appender, which writes
``validation_result_<timestamp>.md`` with one section per IC and "Pass."
for clean checks (NospaValidator.java:445-490, log4j.xml, README.md:75).
"""

from __future__ import annotations

import pandas as pd

IC_TITLES = {
    "IC1": "Unique DataSet",
    "IC2": "Unique DSD",
    "IC3": "DSD includes measure",
    "IC4": "Dimensions have range",
    "IC5": "Concept dimensions have code lists",
    "IC6": "Only attributes may be optional",
    "IC7": "Slice Keys must be declared",
    "IC8": "Slice Keys consistent with DSD",
    "IC9": "Unique slice structure",
    "IC10": "Slice dimensions complete",
    "IC11": "All dimensions required",
    "IC12": "No duplicate observations",
    "IC13": "Required attributes",
    "IC14": "All measures present",
    "IC15": "Measure dimension consistent",
    "IC16": "Single measure on measure dimension observation",
    "IC17": "All measures present in measures dimension cube",
    "IC18": "Consistent data set links",
    "IC19": "Codes from code list",
    "IC20": "Codes from hierarchy",
    "IC21": "Codes from hierarchy (inverse)",
}


def render_markdown(
    findings_df: pd.DataFrame,
    *,
    title: str = "Validation results",
    ics: list[str] | None = None,
) -> str:
    """``ics`` limits the report to the checks that actually RAN: an IC
    outside the scope renders "Not checked." — "Pass." is an affirmative
    clean verdict and must never appear for a filtered-out check (the
    reference's result appender only logs checks it executed)."""
    scope = set(ics) if ics is not None else set(IC_TITLES)
    lines = [f"# {title}", ""]
    n = len(findings_df)
    lines.append(f"{n} violation(s) across {findings_df['graph'].nunique() if n else 0} graph(s).")
    lines.append("")
    for ic in sorted(IC_TITLES, key=lambda x: int(x[2:])):
        sub = findings_df[findings_df["ic"] == ic] if n else findings_df
        lines.append(f"## {ic} — {IC_TITLES[ic]}")
        if ic not in scope:
            lines.append("Not checked.")
            lines.append("")
            continue
        if not len(sub):
            lines.append("Pass.")
            lines.append("")
            continue
        for _, row in sub.sort_values(["graph", "subject"]).iterrows():
            detail = row["detail"]
            if not isinstance(detail, str):
                detail = ", ".join(detail)
            suffix = f" — {detail}" if detail else ""
            lines.append(f"- `{row['graph']}` {row['subject']}{suffix}")
        lines.append("")
    return "\n".join(lines)


def write_report(findings_df: pd.DataFrame, path: str, **kw) -> str:
    with open(path, "w") as f:
        f.write(render_markdown(findings_df, **kw))
    return path
