"""Deterministic cube fixtures (seedless — pure functions of constants).

Two families:

* ``all_cases()`` — a well-formed cube mirroring the reference's only
  fixture (/root/reference/test.ttl: 1 dataset, 1 DSD, 3 dims of which 2
  are Slice-attached, 1 measure, 1 required DataSet-attached attribute,
  1 slice key, 6 slices, 24 observations) plus one minimal ill-formed
  mutant per integrity constraint, each with its hand-derived expected
  violation map (reference semantics, including the IC-14 measureType
  quirk — ValidatorIC14.java:31-33 — and P1 type-closure ripples).

* ``tpch_cube_corpus(sf_dir)`` — a cube corpus derived row-by-row from the
  driver's lineitem table with violations injected as pure functions of
  (l_orderkey, l_linenumber), so a DuckDB SQL oracle over lineitem can
  independently predict every violation the Ray pipeline must emit.

All cubes serialize to Turtle into the driver-mandated corpus table
``(repo, path, commit, lang, content)``.
"""

from __future__ import annotations

import pyarrow as pa

EX = "http://example.org/cube#"
UNIT = "http://example.org/unit/Year"

HEADER = """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix qb: <http://purl.org/linked-data/cube#> .
@prefix ex: <http://example.org/cube#> .
"""

AREAS = ["areaA", "areaB", "areaC", "areaD"]
PERIODS = ["p2004", "p2005", "p2006"]
SEXES = ["sexM", "sexF"]


def _t(name: str) -> str:
    """term_str of an ex: IRI."""
    return f"<{EX}{name}>"


# ---------------------------------------------------------------------------
# Well-formed cube + mutants
# ---------------------------------------------------------------------------


def wf_cube(mut: str | None = None) -> tuple[str, dict]:
    """Build the well-formed cube, optionally applying one named mutation.

    Returns (turtle_text, expected) where expected maps "IC1".."IC21" to
    {subject_term: sorted detail term list}.
    """
    L: list[str] = [HEADER]
    exp: dict[str, dict[str, list[str]]] = {}

    def add_exp(ic: str, subject: str, detail: list[str]) -> None:
        exp.setdefault(ic, {})[subject] = sorted(detail)

    # dataset
    ds_lines = [
        "ex:ds a qb:DataSet ;",
        "    qb:structure ex:dsd ;",
    ]
    if mut == "IC2":
        ds_lines.append("    qb:structure ex:dsd2 ;")
        add_exp("IC2", _t("ds"), [_t("dsd"), _t("dsd2")])
    if mut != "IC13":  # IC13 mutant makes the attribute observation-attached
        ds_lines.append("    ex:unit <" + UNIT + "> ;")
    ds_lines.append(
        "    qb:slice " + ", ".join(f"ex:slice{i}" for i in range(len(PERIODS) * len(SEXES))) + " ."
    )
    L.append("\n".join(ds_lines))

    # DSD
    dim_area_spec = "[ qb:dimension ex:area ; qb:order 1 "
    if mut == "IC6":
        dim_area_spec += '; qb:componentRequired "false"^^xsd:boolean '
        add_exp("IC6", _t("area"), [])
    dim_area_spec += "]"
    comps = [
        dim_area_spec,
        "[ qb:dimension ex:period ; qb:order 2 ; qb:componentAttachment qb:Slice ]",
        "[ qb:dimension ex:sex ; qb:order 3 ; qb:componentAttachment qb:Slice ]",
    ]
    if mut != "IC3":
        comps.append("[ qb:measure ex:life ]")
    else:
        add_exp("IC3", _t("dsd"), [])
    if mut == "IC14":
        comps.append("[ qb:measure ex:life2 ]")
    if mut == "IC13":
        comps.append(
            '[ qb:attribute ex:unitobs ; qb:componentRequired "true"^^xsd:boolean ]'
        )
    else:
        comps.append(
            '[ qb:attribute ex:unit ; qb:componentRequired "true"^^xsd:boolean ; '
            "qb:componentAttachment qb:DataSet ]"
        )
    dsd_lines = ["ex:dsd a qb:DataStructureDefinition ;"]
    dsd_lines.append("    qb:component " + ",\n        ".join(comps) + " ;")
    dsd_lines.append("    qb:sliceKey ex:skey")
    if mut == "IC8":
        dsd_lines.append("    , ex:skey3")
    dsd_lines.append("    .")
    L.append("\n".join(dsd_lines))

    L.append("ex:skey a qb:SliceKey ;\n    qb:componentProperty ex:period, ex:sex .")
    if mut == "IC7":
        L.append("ex:skey2 a qb:SliceKey .")
        add_exp("IC7", _t("skey2"), [])
    if mut == "IC8":
        L.append("ex:skey3 a qb:SliceKey ;\n    qb:componentProperty ex:rogue .")
        add_exp("IC8", _t("rogue"), [])

    # property declarations
    area_range = "" if mut == "IC4" else " ;\n    rdfs:range ex:Area"
    if mut == "IC4":
        add_exp("IC4", _t("area"), [])
    L.append(f"ex:area a rdf:Property, qb:DimensionProperty{area_range} .")
    L.append("ex:period a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:Period .")
    L.append("ex:sex a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:Sex .")
    L.append("ex:life a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    if mut == "IC14":
        L.append("ex:life2 a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    if mut == "IC13":
        L.append("ex:unitobs a rdf:Property, qb:AttributeProperty .")
    else:
        L.append("ex:unit a rdf:Property, qb:AttributeProperty .")
    if mut == "IC5":
        L.append("ex:cdim a qb:DimensionProperty ;\n    rdfs:range skos:Concept .")
        add_exp("IC5", _t("cdim"), [])

    # slices + observations
    obs_names: list[str] = []
    si = 0
    for period in PERIODS:
        for sex in SEXES:
            slice_obs = [f"o{si}_{a}" for a in range(len(AREAS))]
            obs_names.extend(slice_obs)
            slice_lines = [
                f"ex:slice{si} a qb:Slice ;",
                "    qb:sliceStructure ex:skey ;",
                f"    ex:period ex:{period} ;",
                f"    ex:sex ex:{sex} ;",
            ]
            if mut == "IC9" and si == 0:
                slice_lines.insert(2, "    qb:sliceStructure ex:skeyB ;")
                add_exp("IC9", _t("slice0"), [_t("skey"), _t("skeyB")])
            if mut == "IC18" and si == 0:
                slice_obs = slice_obs + ["orphan_obs"]
            slice_lines.append(
                "    qb:observation " + ", ".join(f"ex:{o}" for o in slice_obs) + " ."
            )
            L.append("\n".join(slice_lines))
            for ai, area in enumerate(AREAS):
                name = f"o{si}_{ai}"
                val = 70 + ((si * 7 + ai * 3) % 100) / 10.0
                lines = [f"ex:{name} a qb:Observation ;", "    qb:dataSet ex:ds ;"]
                if mut == "IC1" and name == "o0_0":
                    lines.append("    qb:dataSet ex:ds2 ;")
                    add_exp("IC1", _t(name), [_t("ds"), _t("ds2")])
                    add_exp("IC2", _t("ds2"), [])
                if not (mut == "IC11" and name == "o1_1"):
                    lines.append(f"    ex:area ex:{area} ;")
                else:
                    add_exp("IC11", _t(name), [_t("area")])
                if mut == "IC13" and name != "o2_0":
                    lines.append("    ex:unitobs <" + UNIT + "> ;")
                if mut == "IC13" and name == "o2_0":
                    add_exp("IC13", _t(name), [_t("unitobs")])
                if mut == "IC14":
                    if name != "o3_0":
                        lines.append("    ex:life2 %.1f ;" % (val + 1))
                    else:
                        add_exp("IC14", _t(name), [_t("life2")])
                lines.append(f"    ex:life {val:.1f} .")
                L.append("\n".join(lines))
            si += 1

    if mut == "IC1":
        L.append("ex:onods a qb:Observation .")
        add_exp("IC1", _t("onods"), [])
    if mut == "IC10":
        L.append(
            "ex:sliceX a qb:Slice ;\n    qb:sliceStructure ex:skey ;\n    ex:period ex:p2004 ."
        )
        add_exp("IC10", _t("sliceX"), [_t("sex")])
    if mut == "IC12":
        # duplicate of o0_0 (same area; same slice-pushed period/sex)
        L.append(
            "ex:o0_0b a qb:Observation ;\n    qb:dataSet ex:ds ;\n"
            "    ex:area ex:areaA ;\n    ex:life 1.1 ."
        )
        L.append("ex:slice0 qb:observation ex:o0_0b .")
        add_exp("IC12", _t("o0_0b"), [])
        # permuted-value pair: unordered value-set collision
        # (ValidatorIC11_12.java:70-80 hashes the SET of first values)
        L.append(
            "ex:operm1 a qb:Observation ;\n    qb:dataSet ex:ds ;\n"
            "    ex:area ex:permA ;\n    ex:period ex:permX ;\n"
            "    ex:sex ex:permY ;\n    ex:life 2.1 ."
        )
        L.append(
            "ex:operm2 a qb:Observation ;\n    qb:dataSet ex:ds ;\n"
            "    ex:area ex:permA ;\n    ex:period ex:permY ;\n"
            "    ex:sex ex:permX ;\n    ex:life 2.2 ."
        )
        add_exp("IC12", _t("operm2"), [])
    if mut == "IC18":
        L.append("ex:ds_b a qb:DataSet ;\n    qb:structure ex:dsd ;\n    ex:unit <" + UNIT + "> .")
        L.append(
            "ex:orphan_obs a qb:Observation ;\n    qb:dataSet ex:ds_b ;\n"
            "    ex:area ex:areaA ;\n    ex:life 3.3 ."
        )
        add_exp("IC18", _t("orphan_obs"), [_t("ds")])

    return "\n\n".join(L) + "\n", exp


def mt_cube(mut: str | None = None) -> tuple[str, dict]:
    """Measure-dimension (qb:measureType) cube for IC-15/16/17.

    NOTE the reference's IC-14 quirk (ValidatorIC14.java:31-33): when the
    DSD's component properties include qb:measureType the set is NOT
    filtered to measures, so every observation is required to carry a value
    for EVERY component property — including the other measure.  Every
    measureType cube therefore fails IC-14 on every observation; the
    expected maps below reproduce that faithfully.
    """
    L = [HEADER]
    exp: dict[str, dict[str, list[str]]] = {}

    def add_exp(ic, subject, detail):
        exp.setdefault(ic, {})[subject] = sorted(detail)

    L.append("ex:mds a qb:DataSet ;\n    qb:structure ex:mdsd .")
    L.append(
        "ex:mdsd a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:area ; qb:order 1 ],\n"
        "        [ qb:dimension qb:measureType ; qb:order 2 ],\n"
        "        [ qb:measure ex:life ], [ qb:measure ex:life2 ] ."
    )
    L.append("ex:area a rdf:Property, qb:DimensionProperty ;\n    rdfs:range ex:Area .")
    L.append(
        "<http://purl.org/linked-data/cube#measureType> a qb:DimensionProperty ;\n"
        "    rdfs:range qb:MeasureProperty ."
    )
    L.append("ex:life a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    L.append("ex:life2 a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")

    measures = ["life", "life2"]
    obs = []
    for ai, area in enumerate(AREAS):
        for mi, m in enumerate(measures):
            name = f"m{ai}_{mi}"
            if mut == "IC17" and name == "m3_1":
                continue  # drop one (area, measure) point
            obs.append((name, area, m, 50 + ai + mi / 10.0))

    n_obs = len(obs) + (1 if mut in ("IC16",) else 0)
    for name, area, m, val in obs:
        lines = [
            f"ex:{name} a qb:Observation ;",
            "    qb:dataSet ex:mds ;",
            f"    ex:area ex:{area} ;",
            f"    qb:measureType ex:{m} ;",
        ]
        if mut == "IC15" and name == "m0_0":
            lines[-1] = lines[-1]  # keep measureType; omit the measure value
            lines.append("    ex:ignore 0 .")
            L.append("\n".join(lines))
            add_exp("IC15", _t(name), [_t(m)])
            # IC-14 quirk: missing its own measure value too
            add_exp("IC14", _t(name), [_t("life"), _t("life2")])
            continue
        lines.append(f"    ex:{m} {val:.1f} .")
        L.append("\n".join(lines))
        other = measures[1 - measures.index(m)]
        add_exp("IC14", _t(name), [_t(other)])

    if mut == "IC16":
        L.append(
            "ex:mmulti a qb:Observation ;\n    qb:dataSet ex:mds ;\n"
            "    ex:area ex:areaX ;\n    qb:measureType ex:life, ex:life2 ;\n"
            "    ex:life 9.9 ."
        )
        add_exp("IC16", _t("mmulti"), [_t("life"), _t("life2")])
        add_exp("IC14", _t("mmulti"), [_t("life2")])
        # dedicated area point → group of 1 ≠ 2 measures (IC-17)
        add_exp("IC17", _t("mmulti"), [str(n_obs - 1)])
    if mut == "IC17":
        # point areaD has only m3_0 → group size 1 ≠ numMeasures 2
        add_exp("IC17", _t("m3_0"), [str(len(obs) - 1)])

    return "\n\n".join(L) + "\n", exp


def cl_cube(mut: str | None = None) -> tuple[str, dict]:
    """Code-list cube: one ConceptScheme dim + one (nested) Collection dim
    (shapes from ValidatorIC19.java:28-31,145-158)."""
    L = [HEADER]
    exp: dict[str, dict[str, list[str]]] = {}

    def add_exp(ic, subject, detail):
        exp.setdefault(ic, {})[subject] = sorted(detail)

    L.append("ex:cds a qb:DataSet ;\n    qb:structure ex:cdsd .")
    L.append(
        "ex:cdsd a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:cdim1 ; qb:order 1 ],\n"
        "        [ qb:dimension ex:cdim2 ; qb:order 2 ],\n"
        "        [ qb:measure ex:val ] ."
    )
    L.append(
        "ex:cdim1 a rdf:Property, qb:DimensionProperty ;\n"
        "    rdfs:range skos:Concept ;\n    qb:codeList ex:scheme ."
    )
    L.append(
        "ex:cdim2 a rdf:Property, qb:DimensionProperty ;\n"
        "    rdfs:range skos:Concept ;\n    qb:codeList ex:coll ."
    )
    L.append("ex:val a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    L.append("ex:scheme a skos:ConceptScheme .")
    L.append("ex:coll a skos:Collection ;\n    skos:member ex:c3, ex:subcoll .")
    L.append("ex:subcoll skos:member ex:c4 .")
    L.append("ex:c1 a skos:Concept ;\n    skos:inScheme ex:scheme .")
    L.append("ex:c2 a skos:Concept ;\n    skos:inScheme ex:scheme .")
    L.append("ex:c3 a skos:Concept .")
    L.append("ex:c4 a skos:Concept .")

    pairs = [("c1", "c3"), ("c2", "c4"), ("c1", "c4"), ("c2", "c3")]
    for i, (a, b) in enumerate(pairs):
        L.append(
            f"ex:co{i} a qb:Observation ;\n    qb:dataSet ex:cds ;\n"
            f"    ex:cdim1 ex:{a} ;\n    ex:cdim2 ex:{b} ;\n    ex:val {i}.5 ."
        )
    if mut == "IC19":
        L.append("ex:cbad a skos:Concept .")  # typed but not in scheme
        L.append("ex:coll skos:member ex:cnoc .")  # member but untyped
        L.append(
            "ex:cox a qb:Observation ;\n    qb:dataSet ex:cds ;\n"
            "    ex:cdim1 ex:cbad ;\n    ex:cdim2 ex:cnoc ;\n    ex:val 9.5 ."
        )
        add_exp("IC19", _t("cbad"), [_t("scheme")])
        add_exp("IC19", _t("cnoc"), [_t("coll")])
    return "\n\n".join(L) + "\n", exp


def hier_cube(mut: str | None = None) -> tuple[str, dict]:
    """Hierarchical code-list cube with BOTH a direct parentChildProperty
    and a blank-node inverse one (ValidatorIC20_21.java:165-192), plus both
    edge sets, so IC-20 and IC-21 each pass on the well-formed variant."""
    L = [HEADER]
    exp: dict[str, dict[str, list[str]]] = {}

    def add_exp(ic, subject, detail):
        exp.setdefault(ic, {})[subject] = sorted(detail)

    L.append("ex:hds a qb:DataSet ;\n    qb:structure ex:hdsd .")
    L.append(
        "ex:hdsd a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension ex:hdim ; qb:order 1 ],\n"
        "        [ qb:measure ex:val ] ."
    )
    L.append(
        "ex:hdim a rdf:Property, qb:DimensionProperty ;\n"
        "    rdfs:range ex:Node ;\n    qb:codeList ex:hier ."
    )
    L.append("ex:val a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    L.append(
        "ex:hier a qb:HierarchicalCodeList ;\n"
        "    qb:hierarchyRoot ex:nroot ;\n"
        "    qb:parentChildProperty ex:contains, [ owl:inverseOf ex:within ] ."
    )
    L.append("ex:nroot ex:contains ex:n1 .")
    L.append("ex:n1 ex:contains ex:n2 ;\n    ex:within ex:nroot .")
    L.append("ex:n2 ex:within ex:n1 .")

    values = ["nroot", "n1", "n2"]
    for i, v in enumerate(values):
        L.append(
            f"ex:ho{i} a qb:Observation ;\n    qb:dataSet ex:hds ;\n"
            f"    ex:hdim ex:{v} ;\n    ex:val {i}.5 ."
        )
    if mut == "IC20":
        # reachable inverse (within-edge) but NOT direct → only IC-20 fires
        L.append("ex:norphan ex:within ex:n1 .")
        L.append(
            "ex:hox a qb:Observation ;\n    qb:dataSet ex:hds ;\n"
            "    ex:hdim ex:norphan ;\n    ex:val 8.5 ."
        )
        add_exp("IC20", _t("norphan"), [_t("hier")])
    if mut == "IC21":
        # reachable direct (contains-edge) but NOT inverse → only IC-21 fires
        L.append("ex:n1 ex:contains ex:ndangle .")
        L.append(
            "ex:hoy a qb:Observation ;\n    qb:dataSet ex:hds ;\n"
            "    ex:hdim ex:ndangle ;\n    ex:val 7.5 ."
        )
        add_exp("IC21", _t("ndangle"), [_t("hier")])
    return "\n\n".join(L) + "\n", exp


def abbrev_cube() -> tuple[str, dict]:
    """Fully abbreviated cube (no rdf:type on observations / slices /
    components) to pin the phase-1 closure (Normalizer.java:23-72)."""
    L = [HEADER]
    L.append("ex:ads qb:structure ex:adsd .")
    L.append(
        "ex:adsd qb:component [ qb:dimension ex:adim ],\n"
        "    [ qb:measure ex:aval ] ."
    )
    L.append("ex:adim rdfs:range ex:Area .")
    L.append("ex:ao1 qb:dataSet ex:ads ;\n    ex:adim ex:areaA ;\n    ex:aval 1.0 .")
    L.append("ex:ao2 qb:dataSet ex:ads ;\n    ex:adim ex:areaB ;\n    ex:aval 2.0 .")
    return "\n\n".join(L) + "\n", {}


MUTANTS_WF = ["IC1", "IC2", "IC3", "IC4", "IC5", "IC6", "IC7", "IC8", "IC9", "IC10", "IC11", "IC12", "IC13", "IC14", "IC18"]
MUTANTS_MT = ["IC15", "IC16", "IC17"]


def all_cases() -> dict[str, tuple[str, dict]]:
    cases: dict[str, tuple[str, dict]] = {"WF": wf_cube(None)}
    for m in MUTANTS_WF:
        cases[m] = wf_cube(m)
    cases["WF-MT"] = mt_cube(None)
    for m in MUTANTS_MT:
        cases[m] = mt_cube(m)
    cases["WF-CL"] = cl_cube(None)
    cases["IC19"] = cl_cube("IC19")
    cases["WF-H"] = hier_cube(None)
    cases["IC20"] = hier_cube("IC20")
    cases["IC21"] = hier_cube("IC21")
    cases["ABBREV"] = abbrev_cube()
    return cases


def corpus_table(cases: dict[str, tuple[str, dict]] | None = None, *, with_noise: bool = True) -> pa.Table:
    """Fixture cases → the driver-mandated corpus table.  ``with_noise``
    adds non-RDF rows (lang="python" etc.) that the parser must skip."""
    cases = cases or all_cases()
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for name, (content, _exp) in sorted(cases.items()):
        rows["repo"].append("fixtures/cube-corpus")
        rows["path"].append(f"cubes/{name}.ttl")
        rows["commit"].append("c0ffee00" * 5)
        rows["lang"].append("turtle")
        rows["content"].append(content)
    if with_noise:
        rows["repo"].append("fixtures/cube-corpus")
        rows["path"].append("src/main.py")
        rows["commit"].append("c0ffee00" * 5)
        rows["lang"].append("python")
        rows["content"].append("print('not rdf')\n")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


# ---------------------------------------------------------------------------
# TPC-H-derived oracle corpus
# ---------------------------------------------------------------------------

TP = "http://example.org/tpch/"

# Violation injection moduli — pure functions of l_orderkey so a DuckDB
# oracle over lineitem predicts every finding (see __ray_entry__.oracle_sql).
MOD_IC11 = 97    # K%97==0  → omit the supplier dimension
MOD_IC12 = 101   # K%101==0 → duplicate of line 1
MOD_IC13 = 103   # K%103==0 → omit the required obs-attached attribute
MOD_IC1 = 107    # K%107==0 → line 1 gets a second qb:dataSet link
MOD_IC14 = 109   # K%109==0 → omit the second measure
MOD_IC19 = 113   # K%113==0 → rank-1 obs uses a code outside the concept scheme
MOD_IC2021 = 127  # K%127==0 → rank-1 obs uses a node outside the hierarchy


def tpch_cube_turtle(bucket: int, rows: list[tuple[int, int, int, float]]) -> str:
    """One cube file for one orderkey bucket.

    rows: (l_orderkey, row_rank, l_suppkey, l_quantity) where ``row_rank``
    is the 1-based rank of the row within its order by
    (l_linenumber, l_suppkey, round(l_quantity*100)) — the synthetic
    lineitem table has duplicate (orderkey, linenumber) pairs, so the rank
    is the row-unique dimension the obs IRI and tp:d_line are built from
    (SQL twin: row_number() OVER (PARTITION BY l_orderkey ORDER BY ...)).
    """
    out = [HEADER, f"@prefix tp: <{TP}> .\n"]
    ds = f"tp:ds-{bucket}"
    out.append(
        f"{ds} a qb:DataSet ;\n    qb:structure tp:dsd ;\n"
        f"    tp:a_unit <{UNIT}> ."
    )
    out.append(
        "tp:dsd a qb:DataStructureDefinition ;\n"
        "    qb:component [ qb:dimension tp:d_order ; qb:order 1 ],\n"
        "        [ qb:dimension tp:d_line ; qb:order 2 ],\n"
        "        [ qb:dimension tp:d_supp ; qb:order 3 ],\n"
        "        [ qb:dimension tp:d_mode ],\n"
        "        [ qb:dimension tp:d_geo ],\n"
        "        [ qb:measure tp:m_qty ], [ qb:measure tp:m_price ],\n"
        '        [ qb:attribute tp:a_status ; qb:componentRequired "true"^^xsd:boolean ],\n'
        '        [ qb:attribute tp:a_unit ; qb:componentRequired "true"^^xsd:boolean ; '
        "qb:componentAttachment qb:DataSet ] ."
    )
    out.append("tp:d_order a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:Order .")
    out.append("tp:d_line a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:Line .")
    out.append("tp:d_supp a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:Supp .")
    out.append(
        "tp:d_mode a rdf:Property, qb:DimensionProperty ;\n"
        "    rdfs:range skos:Concept ;\n    qb:codeList tp:modes ."
    )
    out.append("tp:modes a skos:ConceptScheme .")
    out.append(
        "tp:d_geo a rdf:Property, qb:DimensionProperty ;\n"
        "    rdfs:range tp:Zone ;\n    qb:codeList tp:geo ."
    )
    out.append(
        "tp:geo a qb:HierarchicalCodeList ;\n"
        f"    qb:hierarchyRoot <{TP}geo/root> ;\n"
        "    qb:parentChildProperty tp:contains, [ owl:inverseOf tp:within ] ."
    )
    out.append(
        f"<{TP}geo/root> tp:contains "
        + ", ".join(f"<{TP}region/{r}>" for r in range(4)) + " ."
    )
    for r in range(4):
        out.append(
            f"<{TP}region/{r}> tp:within <{TP}geo/root> ;\n    tp:contains "
            + ", ".join(f"<{TP}zone/{r}/{z}>" for z in range(5)) + " ."
        )
        for z in range(5):
            out.append(f"<{TP}zone/{r}/{z}> tp:within <{TP}region/{r}> .")
    for mi in range(5):
        out.append(
            f"<{TP}mode/{mi}> a skos:Concept ;\n    skos:inScheme tp:modes ."
        )
    out.append("tp:m_qty a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    out.append("tp:m_price a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
    out.append("tp:a_status a rdf:Property, qb:AttributeProperty .")
    out.append("tp:a_unit a rdf:Property, qb:AttributeProperty .")

    def obs(key: int, line: int, supp: int, qty: float, suffix: str = "") -> str:
        lines = [
            f"<{TP}obs/{key}/{line}{suffix}> a qb:Observation ;",
            f"    qb:dataSet {ds} ;",
        ]
        if line == 1 and key % MOD_IC1 == 0 and not suffix:
            lines.append(f"    qb:dataSet <{TP}ds/extra/{key}> ;")
        lines.append(f"    tp:d_order <{TP}order/{key}> ;")
        lines.append(f"    tp:d_line <{TP}line/{line}{suffix}> ;")
        if key % MOD_IC11 != 0:
            lines.append(f"    tp:d_supp <{TP}supp/{supp}> ;")
        if line == 1 and key % MOD_IC19 == 0 and not suffix:
            lines.append(f"    tp:d_mode <{TP}mode/bad/{key}> ;")
        else:
            lines.append(f"    tp:d_mode <{TP}mode/{supp % 5}> ;")
        if line == 1 and key % MOD_IC2021 == 0 and not suffix:
            lines.append(f"    tp:d_geo <{TP}zone/bad/{key}> ;")
        else:
            lines.append(f"    tp:d_geo <{TP}zone/{supp % 4}/{supp % 5}> ;")
        if key % MOD_IC13 != 0:
            lines.append('    tp:a_status "F" ;')
        if key % MOD_IC14 != 0:
            lines.append(f"    tp:m_price {qty * 2:.2f} ;")
        lines.append(f"    tp:m_qty {qty:.2f} .")
        return "\n".join(lines)

    for key, line, supp, qty in rows:
        out.append(obs(key, line, supp, qty))
        if line == 1 and key % MOD_IC12 == 0:
            # duplicate observation: same dimension values (d_line uses the
            # ORIGINAL line IRI so the value set collides), own measures
            dup = [
                f"<{TP}obs/{key}/{line}dup> a qb:Observation ;",
                f"    qb:dataSet {ds} ;",
                f"    tp:d_order <{TP}order/{key}> ;",
                f"    tp:d_line <{TP}line/{line}> ;",
            ]
            if key % MOD_IC11 != 0:
                dup.append(f"    tp:d_supp <{TP}supp/{supp}> ;")
            if key % MOD_IC19 == 0:
                dup.append(f"    tp:d_mode <{TP}mode/bad/{key}> ;")
            else:
                dup.append(f"    tp:d_mode <{TP}mode/{supp % 5}> ;")
            if key % MOD_IC2021 == 0:
                dup.append(f"    tp:d_geo <{TP}zone/bad/{key}> ;")
            else:
                dup.append(f"    tp:d_geo <{TP}zone/{supp % 4}/{supp % 5}> ;")
            if key % MOD_IC13 != 0:
                dup.append('    tp:a_status "F" ;')
            if key % MOD_IC14 != 0:
                dup.append(f"    tp:m_price {qty * 2:.2f} ;")
            dup.append(f"    tp:m_qty {qty:.2f} .")
            out.append("\n".join(dup))
    return "\n\n".join(out) + "\n"


def tpch_cube_corpus(sf_dir: str, n_files: int = 64, replicas: int = 1) -> pa.Table:
    """lineitem.parquet → corpus table of n_files Turtle cube files
    (bucket = l_orderkey % n_files, so every observation lands in exactly
    one file and IRIs are globally unique).

    ``replicas > 1`` tiles the table with disjoint orderkey offsets into
    ``n_files * replicas`` files — the bench's scaling corpus (compute
    must dominate fixed overheads for a meaningful N-vs-4N comparison)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"],
    )
    keys = t.column("l_orderkey").to_pylist()
    lines = t.column("l_linenumber").to_pylist()
    supps = t.column("l_suppkey").to_pylist()
    qtys = t.column("l_quantity").to_pylist()
    # rank rows within each order by (linenumber, suppkey, qty-cents) —
    # row-unique obs identity (exact ties interchangeable)
    per_order: dict[int, list[tuple[int, int, int, float]]] = {}
    for k, ln, s, q in zip(keys, lines, supps, qtys):
        per_order.setdefault(k, []).append((ln, s, int(round(q * 100)), q))
    buckets: dict[int, list[tuple[int, int, int, float]]] = {}
    for r in range(replicas):
        off = r * 10_000_019  # disjoint key ranges per replica
        for k, order_rows in per_order.items():
            order_rows.sort(key=lambda t: t[:3])
            for rank, (_ln, s, _qc, q) in enumerate(order_rows, 1):
                buckets.setdefault(k % n_files + r * n_files, []).append(
                    (k + off, rank, s, q)
                )
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for b in sorted(buckets):
        rows["repo"].append("synthetic/tpch-cubes")
        rows["path"].append(f"cubes/bucket{b:04d}.ttl")
        rows["commit"].append("deadbeef" * 5)
        rows["lang"].append("turtle")
        rows["content"].append(tpch_cube_turtle(b, sorted(buckets[b])))
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


# ---------------------------------------------------------------------------
# measureType oracle corpus (orders-derived) — IC-12/14/15/16/17 at scale
# ---------------------------------------------------------------------------

MOD_IC15 = 131   # K%131==0 → omit the measure value (measureType kept)
MOD_IC16 = 137   # K%137==0 → two qb:measureType values


def tpch_mt_corpus(sf_dir: str, n_files: int = 32) -> pa.Table:
    """orders.parquet → measure-dimension cube corpus: one qb:Observation
    per order, dims (customer, qb:measureType), two measures; files (and
    therefore datasets) bucketed by o_custkey % n_files so every
    customer's orders — the IC-17 dimension points — stay in one graph.

    Modular injections (pure functions of o_orderkey K):
      K%2    → which measure the observation carries (mm1 / mm2)
      K%131  → measure VALUE omitted (IC-15; both measures missing → IC-14 n=2)
      K%137  → two qb:measureType values (IC-16)
    The IC-14 quirk (ValidatorIC14.java:31-33) makes every observation of
    a measureType dataset miss the *other* measure — oracle-checkable as a
    per-observation missing-count.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    keys = t.column("o_orderkey").to_pylist()
    custs = t.column("o_custkey").to_pylist()
    buckets: dict[int, list[tuple[int, int]]] = {}
    for k, c in zip(keys, custs):
        buckets.setdefault(c % n_files, []).append((k, c))
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for b in sorted(buckets):
        out = [HEADER, f"@prefix tp: <{TP}> .\n"]
        ds = f"tp:mtds-{b}"
        out.append(f"{ds} a qb:DataSet ;\n    qb:structure tp:mtdsd .")
        out.append(
            "tp:mtdsd a qb:DataStructureDefinition ;\n"
            "    qb:component [ qb:dimension tp:d_cust ; qb:order 1 ],\n"
            "        [ qb:dimension qb:measureType ; qb:order 2 ],\n"
            "        [ qb:measure tp:mm1 ], [ qb:measure tp:mm2 ] ."
        )
        out.append("tp:d_cust a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:Cust .")
        out.append(
            "<http://purl.org/linked-data/cube#measureType> a qb:DimensionProperty ;\n"
            "    rdfs:range qb:MeasureProperty ."
        )
        out.append("tp:mm1 a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
        out.append("tp:mm2 a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
        for k, c in sorted(buckets[b]):
            m = "mm1" if k % 2 == 0 else "mm2"
            lines = [
                f"<{TP}mtobs/{k}> a qb:Observation ;",
                f"    qb:dataSet {ds} ;",
                f"    tp:d_cust <{TP}cust/{c}> ;",
            ]
            if k % MOD_IC16 == 0:
                lines.append("    qb:measureType tp:mm1, tp:mm2 ;")
            else:
                lines.append(f"    qb:measureType tp:{m} ;")
            if k % MOD_IC15 != 0:
                carried = "mm1" if k % MOD_IC16 == 0 else m
                lines.append(f"    tp:{carried} {k % 977}.5 .")
            else:
                lines[-1] = lines[-1][:-1] + "."
            out.append("\n".join(lines))
        rows["repo"].append("synthetic/tpch-mt-cubes")
        rows["path"].append(f"cubes/mt{b:04d}.ttl")
        rows["commit"].append("deadbeef" * 5)
        rows["lang"].append("turtle")
        rows["content"].append("\n\n".join(out) + "\n")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


# ---------------------------------------------------------------------------
# slice oracle corpus (lineitem-derived) — IC-10/18 + phase-2b pushdown
# ---------------------------------------------------------------------------

MOD_SLICE_IC10 = 11   # (8*bucket + supp8) % 11 == 0 → slice omits its key dim
MOD_SLICE_IC18 = 149  # K%149==0 → rank-1 obs points at a foreign dataset


def tpch_slice_corpus(sf_dir: str, n_files: int = 16) -> pa.Table:
    """lineitem.parquet → sliced cube corpus: one dataset per file
    (bucket = l_orderkey % n_files), slices keyed by l_suppkey % 8, the
    slice-attached dimension tp:d_sup8 reaches observations ONLY through
    phase-2b pushdown (Normalizer.java:121-152) — so IC-11 cleanliness at
    scale *is* the pushdown oracle.

    Injections (SQL-predictable):
      (8*bucket + supp8) % 11 == 0 → the slice omits its tp:d_sup8 value:
          IC-10 flags (slice, d_sup8); every obs of that slice loses the
          pushdown → IC-11 flags (obs, d_sup8).
      K % 149 == 0 → the rank-1 obs's qb:dataSet points at
          tp:sds/other/K: IC-18 flags the expected-link violation and
          IC-2 flags the undeclared dataset.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_linenumber", "l_quantity"],
    )
    keys = t.column("l_orderkey").to_pylist()
    supps = t.column("l_suppkey").to_pylist()
    lines = t.column("l_linenumber").to_pylist()
    qtys = t.column("l_quantity").to_pylist()
    per_order: dict[int, list[tuple]] = {}
    for k, s, ln, q in zip(keys, supps, lines, qtys):
        per_order.setdefault(k, []).append((ln, s, int(round(q * 100))))
    buckets: dict[int, dict[int, list[tuple[int, int, int]]]] = {}
    for k, rows_ in per_order.items():
        rows_.sort()
        b = k % n_files
        for rank, (_ln, s, _qc) in enumerate(rows_, 1):
            buckets.setdefault(b, {}).setdefault(s % 8, []).append((k, rank, s))

    out_rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for b in sorted(buckets):
        ds = f"tp:sds-{b}"
        out = [HEADER, f"@prefix tp: <{TP}> .\n"]
        slice_ids = sorted(buckets[b])
        out.append(
            f"{ds} a qb:DataSet ;\n    qb:structure tp:sdsd ;\n    qb:slice "
            + ", ".join(f"<{TP}sslice/{b}/{s8}>" for s8 in slice_ids) + " ."
        )
        out.append(
            "tp:sdsd a qb:DataStructureDefinition ;\n"
            "    qb:component [ qb:dimension tp:sd_order ; qb:order 1 ],\n"
            "        [ qb:dimension tp:sd_line ; qb:order 2 ],\n"
            "        [ qb:dimension tp:d_sup8 ; qb:order 3 ; "
            "qb:componentAttachment qb:Slice ],\n"
            "        [ qb:measure tp:sm_qty ] ;\n"
            "    qb:sliceKey tp:sskey ."
        )
        out.append("tp:sskey a qb:SliceKey ;\n    qb:componentProperty tp:d_sup8 .")
        out.append("tp:sd_order a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:O .")
        out.append("tp:sd_line a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:L .")
        out.append("tp:d_sup8 a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:S .")
        out.append("tp:sm_qty a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
        for s8 in slice_ids:
            sl = f"<{TP}sslice/{b}/{s8}>"
            lines_ = [f"{sl} a qb:Slice ;", "    qb:sliceStructure tp:sskey ;"]
            if (8 * b + s8) % MOD_SLICE_IC10 != 0:
                lines_.append(f"    tp:d_sup8 <{TP}sup8/{s8}> ;")
            lines_.append(
                "    qb:observation "
                + ", ".join(f"<{TP}sobs/{k}/{r}>" for k, r, _s in buckets[b][s8])
                + " ."
            )
            out.append("\n".join(lines_))
            for k, r, _s in buckets[b][s8]:
                target = (
                    f"<{TP}sds/other/{k}>"
                    if (r == 1 and k % MOD_SLICE_IC18 == 0)
                    else ds
                )
                out.append(
                    f"<{TP}sobs/{k}/{r}> a qb:Observation ;\n"
                    f"    qb:dataSet {target} ;\n"
                    f"    tp:sd_order <{TP}order/{k}> ;\n"
                    f"    tp:sd_line <{TP}line/{r}> ;\n"
                    f"    tp:sm_qty {k % 977}.5 ."
                )
        out_rows["repo"].append("synthetic/tpch-slice-cubes")
        out_rows["path"].append(f"cubes/sl{b:04d}.ttl")
        out_rows["commit"].append("deadbeef" * 5)
        out_rows["lang"].append("turtle")
        out_rows["content"].append("\n\n".join(out) + "\n")
    return pa.table({k: pa.array(v, pa.string()) for k, v in out_rows.items()})


# ---------------------------------------------------------------------------
# schema oracle corpus (supplier-derived) — IC-3..IC-9 at scale
# ---------------------------------------------------------------------------


def tpch_schema_corpus(sf_dir: str, n_files: int = 64) -> pa.Table:
    """supplier.parquet → schema-only cube files (no observations): one
    file per distinct s_suppkey % n_files bucket, each injecting
    schema-level violations as modular functions of the bucket id B:

      B%5==0  → DSD without a measure component            (IC-3)
      B%7==0  → dimension without rdfs:range               (IC-4)
      B%11==0 → skos:Concept-ranged dimension, no codeList (IC-5)
      B%13==0 → dimension spec with componentRequired false (IC-6)
      B%9==0  → orphan qb:SliceKey                          (IC-7)
      B%19==0 → slice-key property outside the DSD          (IC-8)
      B%17==0 → slice with two qb:sliceStructure            (IC-9)
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    bs = sorted({k % n_files for k in t.column("s_suppkey").to_pylist()})
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for b in bs:
        ns = f"{TP}sc{b}_"
        out = [HEADER, f"@prefix tp: <{TP}> .\n"]
        d1_spec = f"[ qb:dimension <{ns}d1> ; qb:order 1 "
        if b % 13 == 0:
            d1_spec += '; qb:componentRequired "false"^^xsd:boolean '
        d1_spec += "]"
        comps = [d1_spec, f"[ qb:dimension <{ns}d2> ]", f"[ qb:dimension <{ns}d3> ]"]
        if b % 5 != 0:
            comps.append(f"[ qb:measure <{ns}m> ]")
        out.append(
            f"<{ns}dsd> a qb:DataStructureDefinition ;\n    qb:component "
            + ",\n        ".join(comps)
            + f" ;\n    qb:sliceKey <{ns}sk>"
            + (f", <{ns}skR>" if b % 19 == 0 else "")
            + " ."
        )
        out.append(f"<{ns}sk> a qb:SliceKey ;\n    qb:componentProperty <{ns}d1> .")
        if b % 19 == 0:
            out.append(
                f"<{ns}skR> a qb:SliceKey ;\n    qb:componentProperty <{ns}rogue> ."
            )
        if b % 9 == 0:
            out.append(f"<{ns}orphan> a qb:SliceKey .")
        out.append(f"<{ns}d1> a rdf:Property, qb:DimensionProperty ;\n    rdfs:range tp:T .")
        rng = "" if b % 7 == 0 else " ;\n    rdfs:range tp:T"
        out.append(f"<{ns}d2> a rdf:Property, qb:DimensionProperty{rng} .")
        cl = "" if b % 11 == 0 else f" ;\n    qb:codeList <{ns}cl>"
        out.append(
            f"<{ns}d3> a rdf:Property, qb:DimensionProperty ;\n"
            f"    rdfs:range skos:Concept{cl} ."
        )
        if b % 11 != 0:
            out.append(f"<{ns}cl> a skos:ConceptScheme .")
        if b % 5 != 0:
            out.append(f"<{ns}m> a rdf:Property, qb:MeasureProperty ;\n    rdfs:range xsd:decimal .")
        # slice for IC-9 (key dim value present so IC-10 stays clean)
        slines = [f"<{ns}sl> a qb:Slice ;", f"    qb:sliceStructure <{ns}sk> ;"]
        if b % 17 == 0:
            slines.append(f"    qb:sliceStructure <{ns}skB> ;")
            out.append(f"<{ns}skB> a qb:SliceKey ;\n    qb:componentProperty <{ns}d1> .")
        slines.append(f"    <{ns}d1> tp:v1 .")
        out.append("\n".join(slines))
        rows["repo"].append("synthetic/tpch-schema-cubes")
        rows["path"].append(f"cubes/sc{b:04d}.ttl")
        rows["commit"].append("deadbeef" * 5)
        rows["lang"].append("turtle")
        rows["content"].append("\n\n".join(out) + "\n")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def entity_messy_iri(k: int, j: int) -> str:
    """The as-written (possibly messy) IRI for entity (k, j) — three
    RFC-3986 families that all normalize to ``entity_canonical_iri``:
    j=1 uppercased scheme/host + default port, j=2 dot-segments,
    j=3 percent-encoded unreserved octet."""
    if j == 1:
        return f"HTTP://Example.ORG:80/ent/{k}/1"
    if j == 2:
        return f"http://example.org/x/../ent/{k}/2"
    if j == 3:
        return f"http://example.org/%65nt/{k}/3"
    return f"http://example.org/ent/{k}/{j}"


def entity_canonical_iri(k: int, j: int) -> str:
    return f"http://example.org/ent/{k}/{j}"


def tpch_entity_corpus(sf_dir: str, n_files: int = 5) -> pa.Table:
    """nation.parquet → owl:sameAs entity-resolution corpus.

    For nation key k: a chain of ``k % 4`` sameAs edges over entities
    ent/k/0..k%4, each IRI written in a messy form (see
    :func:`entity_messy_iri`), plus a cross-chain merge
    ``ent/k/0 owl:sameAs ent/{k-20}/0`` for k ≥ 20.  Every as-written
    IRI, its canonical form, and every connected component (and its
    lexicographic-min root) is a pure function of n_nationkey — so a
    DuckDB oracle over nation predicts both the normalization map
    (``kg_canonical_iris``) and the alias table (``kg_sameas_roots``)
    without parsing any RDF."""
    import pyarrow.parquet as pq

    SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
    keys = sorted(
        pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
        .column("n_nationkey")
        .to_pylist()
    )
    buckets: dict[int, list[str]] = {}
    for k in keys:
        lines = buckets.setdefault(k % n_files, [])
        for j in range(1, k % 4 + 1):
            lines.append(
                f"<{entity_messy_iri(k, j)}> <{SAMEAS}> "
                f"<{entity_messy_iri(k, j - 1)}> ."
            )
        if k >= 20:
            lines.append(
                f"<{entity_canonical_iri(k, 0)}> <{SAMEAS}> "
                f"<{entity_canonical_iri(k - 20, 0)}> ."
            )
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for b, lines in sorted(buckets.items()):
        rows["repo"].append("synthetic/tpch-entities")
        rows["path"].append(f"entities/e{b:02d}.ttl")
        rows["commit"].append("deadbeef" * 5)
        rows["lang"].append("turtle")
        rows["content"].append("\n".join(lines) + "\n")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


# ---------------------------------------------------------------------------
# link-graph corpus (KG construction / graph-analytics fixtures)
# ---------------------------------------------------------------------------

KG = "http://example.org/kg#"
KGN = "http://example.org/kg/"


def tpch_link_corpus(sf_dir: str, n_files: int = 32) -> pa.Table:
    """orders/customer/nation/region → a provenance-chain link graph.

    Node IRIs are pure string functions of the table keys
    (``kg/ord/<k>``, ``kg/cust/<c>``, ``kg/nat/<n>``, ``kg/reg/<r>``);
    every node carries one ``rdf:type`` (kg:Order/Customer/Nation/Region)
    and at most ONE outgoing object-property edge:

      * a customer's FIRST order (min orderkey):  ord ``kg:placedBy`` cust
      * each later order: ord ``kg:follows`` its predecessor (commit-
        parent style chains, up to ~tens of hops deep in TPC-H)
      * cust ``kg:inNation`` nat;  nat ``kg:inRegion`` reg

    so the reversed graph is a forest rooted at the regions — BFS depths,
    degrees, 2-hop path motifs and class profiles are all predictable by
    a DuckDB oracle over the raw tables (window ``lag`` rebuilds the
    chains).  Order triples are bucketed into ``n_files`` Turtle files by
    ``o_orderkey % n_files``; chain edges deliberately CROSS files, so
    graph queries exercise the shuffle/join side of the engine (unlike
    cube validation, which is file-local by construction)."""
    import pandas as pd
    import pyarrow.parquet as pq

    orders = (
        pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        .to_pandas()
        .sort_values(["o_custkey", "o_orderkey"], ignore_index=True)
    )
    import numpy as np

    prev = orders["o_orderkey"].shift(1)
    first = orders["o_custkey"] != orders["o_custkey"].shift(1)
    k = orders["o_orderkey"].astype(str)
    target = pd.Series(
        np.where(first, orders["o_custkey"], prev.fillna(0)).astype("int64"),
        index=orders.index,
    )
    line = (
        "<" + KGN + "ord/" + k + "> a <" + KG + "Order> ; "
        + first.map({True: "<" + KG + "placedBy> ", False: "<" + KG + "follows> "})
        + "<" + KGN
        + first.map({True: "cust/", False: "ord/"})
        + target.astype(str)
        + "> ."
    )
    bucket = orders["o_orderkey"] % n_files
    contents = {
        int(b): "\n".join(grp) + "\n" for b, grp in line.groupby(bucket, sort=True)
    }

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    ent_lines = list(
        "<" + KGN + "cust/" + cust["c_custkey"].astype(str) + "> a <" + KG
        + "Customer> ; <" + KG + "inNation> <" + KGN + "nat/"
        + cust["c_nationkey"].astype(str) + "> ."
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    ent_lines += list(
        "<" + KGN + "nat/" + nat["n_nationkey"].astype(str) + "> a <" + KG
        + "Nation> ; <" + KG + "inRegion> <" + KGN + "reg/"
        + nat["n_regionkey"].astype(str) + "> ."
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"]).to_pandas()
    ent_lines += list(
        "<" + KGN + "reg/" + reg["r_regionkey"].astype(str) + "> a <" + KG
        + "Region> ."
    )

    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for b in sorted(contents):
        rows["repo"].append("synthetic/tpch-links")
        rows["path"].append(f"links/orders-{b:02d}.ttl")
        rows["commit"].append("cafebabe" * 5)
        rows["lang"].append("turtle")
        rows["content"].append(contents[b])
    rows["repo"].append("synthetic/tpch-links")
    rows["path"].append("links/entities.ttl")
    rows["commit"].append("cafebabe" * 5)
    rows["lang"].append("turtle")
    rows["content"].append("\n".join(ent_lines) + "\n")
    return pa.table({c: pa.array(v, pa.string()) for c, v in rows.items()})


# ---------------------------------------------------------------------------
# source-code corpus (import-graph extraction fixtures)
# ---------------------------------------------------------------------------

CODE = "http://example.org/code#"
CODEN = "http://example.org/code/"


def tpch_code_corpus(sf_dir: str) -> pa.Table:
    """part.parquet → a Python-ish source-code repository, one module
    file per part key, whose module-level imports are pure functions of
    ``p_partkey`` (k):

      * every module:      ``import m{k % 97}``
      * k % 3 == 0:        ``import m{(7k+1) % 101} as a{k}``  (alias stripped)
      * k % 3 == 1:        ``from m{(11k+3) % 103} import thing, other``
      * k % 3 == 2:        ``import m{(5k+2) % 107}, m{(3k+5) % 109}``

    Each file also carries a commented-out import, a function body with a
    NESTED import, and one def + one class — material the extractor must
    skip (module level only) or surface as definition triples.  A DuckDB
    oracle over part predicts the full edge multiset with arithmetic."""
    import pandas as pd
    import pyarrow.parquet as pq

    keys = (
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .to_pandas()["p_partkey"]
        .astype("int64")
        .sort_values(ignore_index=True)
    )
    k = keys
    ks = k.astype(str)
    extra = pd.Series("", index=k.index, dtype=object)
    m0 = k % 3 == 0
    m1 = k % 3 == 1
    m2 = k % 3 == 2
    extra[m0] = "import m" + ((7 * k[m0] + 1) % 101).astype(str) + " as a" + ks[m0]
    extra[m1] = "from m" + ((11 * k[m1] + 3) % 103).astype(str) + " import thing, other"
    extra[m2] = (
        "import m" + ((5 * k[m2] + 2) % 107).astype(str)
        + ", m" + ((3 * k[m2] + 5) % 109).astype(str)
    )
    # per-k body/comment padding makes file sizes and simple code
    # metrics non-uniform: k%5 branch lines (+1 while when 7|k) inside
    # the function, k%4 trailing comment lines — all indented or
    # '#'-led, so the column-0-anchored import/def extraction is
    # untouched, while code_metrics gets an arithmetic oracle
    branches = pd.Series(
        [
            "".join(f"    if x > {i}: x = {i}\n" for i in range(int(kk) % 5))
            + ("    while x > 0: x -= 1\n" if int(kk) % 7 == 0 else "")
            for kk in k
        ],
        index=k.index,
    )
    comments = pd.Series(
        ["".join(f"# note {i}\n" for i in range(int(kk) % 4)) for kk in k],
        index=k.index,
    )
    content = (
        '"""auto module m' + ks + '"""\n'
        + "import m" + (k % 97).astype(str) + "\n"
        + extra + "\n"
        + "# import m999 commented out\n"
        + "def fn_" + ks + "():\n"
        + "    import os\n"
        + branches
        + "    return 1\n"
        + "class C" + ks + ":\n"
        + "    pass\n"
        + comments
    )
    n = len(k)
    return pa.table(
        {
            "repo": pa.array(["synthetic/tpch-code"] * n, pa.string()),
            "path": pa.array(("src/m" + ks + ".py").tolist(), pa.string()),
            "commit": pa.array(["feedf00d" * 5] * n, pa.string()),
            "lang": pa.array(["python"] * n, pa.string()),
            "content": pa.array(content.tolist(), pa.string()),
        }
    )


def tpch_versioned_corpus(sf_dir: str) -> pa.Table:
    """part.parquet → a multi-commit source corpus: module file
    ``src/m{k}.py`` has 1–3 commits (j = 0; +1 when k is even; +2 when
    k % 4 == 0), commit ids are zero-padded decimals (lexicographically
    = numerically ordered — a real pipeline would order by a
    commit→timestamp dimension join instead) and each version's content
    is ``import m{(k + 13 j) % 97}\\n`` — one line, so the DuckDB oracle
    can rebuild content AND its sha256 with plain string concat."""
    import pyarrow.parquet as pq

    keys = (
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .to_pandas()["p_partkey"]
        .astype("int64")
        .sort_values(ignore_index=True)
    )
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for k in keys:
        k = int(k)
        n_versions = 1 + (k % 2 == 0) + (k % 4 == 0)
        for j in range(n_versions):
            rows["repo"].append("synthetic/tpch-versions")
            rows["path"].append(f"src/m{k}.py")
            rows["commit"].append(f"{j:040d}")
            rows["lang"].append("python")
            rows["content"].append(f"import m{(k + 13 * j) % 97}\n")
    return pa.table({c: pa.array(v, pa.string()) for c, v in rows.items()})


def tpch_fork_corpus(sf_dir: str) -> pa.Table:
    """The code corpus UNION a fork repo: every path exists in both
    ``synthetic/tpch-code`` and ``synthetic/tpch-code-fork``; the fork's
    copy is byte-identical when ``k % 5 == 0`` (an exact cross-repo
    clone) and carries a fork-local patch line otherwise.  A DuckDB
    oracle predicts the clone groups purely from ``part`` arithmetic."""
    base = tpch_code_corpus(sf_dir)
    import pandas as pd

    df = base.to_pandas()
    fork = df.copy()
    fork["repo"] = "synthetic/tpch-code-fork"
    k = df["path"].str.extract(r"m(\d+)\.py$", expand=False).astype("int64")
    patched = (k % 5) != 0
    fork.loc[patched, "content"] = (
        fork.loc[patched, "content"] + "# fork-local patch\n"
    )
    out = pd.concat([df, fork], ignore_index=True)
    return pa.table({c: pa.array(out[c].tolist(), pa.string()) for c in out.columns})


def tpch_dag_corpus(sf_dir: str) -> pa.Table:
    """part → an acyclic import graph: module m{k} (k ≥ 2) imports
    m{k//2} and m{k//3} (both strictly smaller ⇒ a DAG; m0/m1 are
    import-less leaf files).  Longest-path depth is then predictable by
    a recursive DuckDB oracle, and the depth bound is ~log2(max k)."""
    import pandas as pd
    import pyarrow.parquet as pq

    keys = (
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .to_pandas()["p_partkey"]
        .astype("int64")
        .sort_values(ignore_index=True)
    )
    k = keys
    ks = k.astype(str)
    body = pd.Series("x = 1\n", index=k.index, dtype=object)
    big = k >= 2
    body[big] = (
        "import m" + (k[big] // 2).astype(str)
        + "\nimport m" + (k[big] // 3).astype(str) + "\n"
    )
    n = len(k)
    return pa.table(
        {
            "repo": pa.array(["synthetic/tpch-dag"] * n, pa.string()),
            "path": pa.array(("src/m" + ks + ".py").tolist(), pa.string()),
            "commit": pa.array(["feedf00d" * 5] * n, pa.string()),
            "lang": pa.array(["python"] * n, pa.string()),
            "content": pa.array(body.tolist(), pa.string()),
        }
    )
