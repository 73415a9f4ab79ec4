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


def _section_blocks(
    findings_df: pd.DataFrame,
    *,
    title: str = "Validation results",
    ics: list[str] | None = None,
):
    """Yield the report as per-section strings (header first, one block
    per IC) so the sink can STREAM a pathological observation-scale
    findings table instead of holding the whole document.  Line assembly
    is vectorized pandas string concat — no ``iterrows`` (round-3 review
    finding #4); joined, the blocks are byte-identical to the old
    whole-document renderer (asserted in tests)."""
    scope = set(ics) if ics is not None else set(IC_TITLES)
    n = len(findings_df)
    n_graphs = findings_df["graph"].nunique() if n else 0
    yield f"# {title}\n\n{n} violation(s) across {n_graphs} graph(s).\n\n"
    for ic in sorted(IC_TITLES, key=lambda x: int(x[2:])):
        head = f"## {ic} — {IC_TITLES[ic]}\n"
        if ic not in scope:
            yield head + "Not checked.\n\n"
            continue
        sub = findings_df[findings_df["ic"] == ic] if n else findings_df
        if not len(sub):
            yield head + "Pass.\n\n"
            continue
        sub = sub.sort_values(["graph", "subject"])
        det = sub["detail"]
        # details are strings except the rare list-valued finding kinds
        det = pd.Series(
            [d if isinstance(d, str) else ", ".join(d) for d in det],
            index=sub.index,
            dtype="string",
        ).fillna("")
        suffix = (" — " + det).where(det != "", "")
        bullets = (
            "- `"
            + sub["graph"].astype("string")
            + "` "
            + sub["subject"].astype("string")
            + suffix
        )
        yield head + bullets.str.cat(sep="\n") + "\n\n"


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
    return "".join(_section_blocks(findings_df, title=title, ics=ics))[:-1]


def write_report(findings_df: pd.DataFrame, path: str, **kw) -> str:
    """Stream the report to ``path`` section by section — the driver never
    holds more than one IC's findings as rendered text."""
    with open(path, "w") as f:
        prev = None
        for block in _section_blocks(findings_df, **kw):
            if prev is not None:
                f.write(prev)
            prev = block
        f.write(prev[:-1])
    return path
