"""IRI canonicalization + owl:sameAs entity linking (actor-pool stage)."""

import pandas as pd

import ray.data

from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
    canonicalize,
    normalize_iri,
    sameas_aliases,
)


def test_normalize_iri():
    assert normalize_iri("HTTP://Ex.ORG:80/a/./b/../c") == "http://ex.org/a/c"
    assert normalize_iri("https://ex.org:443/%7Euser/%2fx") == "https://ex.org/~user/%2Fx"
    assert normalize_iri("urn:x:y") == "urn:x:y"  # non-hierarchical untouched
    assert normalize_iri("http://ex.org/ok") == "http://ex.org/ok"


def triples_ds():
    rows = [
        # same entity three ways + a sameAs link to a fourth spelling
        ("g", "HTTP://Ex.org/e1", "http://ex.org/p", 0, "http://ex.org/E2", "", ""),
        ("g", "http://ex.org/e1", "http://ex.org/p", 0, "http://ex.org/o", "", ""),
        ("g", "http://ex.org/alias", "http://www.w3.org/2002/07/owl#sameAs", 0,
         "http://ex.org/e1", "", ""),
        ("g", "http://ex.org/alias", "http://ex.org/q", 2, "lit", "", ""),
        ("g", "_:b1", "http://ex.org/p", 0, "http://ex.org/alias", "", ""),
    ]
    df = pd.DataFrame(
        rows,
        columns=["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"],
    )
    df["file_sha256"] = "s"
    return ray.data.from_pandas(df[["graph", "file_sha256", "subj", "pred",
                                    "obj_kind", "obj", "obj_dt", "obj_lang"]])


def test_canonicalize_and_link():
    ds = triples_ds()
    aliases = sameas_aliases(ds)
    # alias and e1 collapse to the lexicographically smallest member
    assert aliases == {"http://ex.org/e1": "http://ex.org/alias"}
    out = canonicalize(ds, aliases=aliases).to_pandas()
    subj = set(out["subj"])
    # scheme/host lowercased AND sameAs-linked: every e1 spelling → alias
    assert "HTTP://Ex.org/e1" not in subj
    assert "http://ex.org/e1" not in subj
    assert "http://ex.org/alias" in subj
    # bnodes untouched; literal objects untouched
    assert "_:b1" in subj
    assert "lit" in set(out.loc[out["obj_kind"] == 2, "obj"])
    # IRI objects linked too
    assert "http://ex.org/alias" in set(out.loc[out["obj_kind"] == 0, "obj"])


def test_canonicalize_deterministic():
    ds = triples_ds()
    a = canonicalize(ds).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = canonicalize(ds).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert a.equals(b)


def chain_ds(n_chain=4, n_comp=3):
    """Several sameAs chains (diameter > 1 forces multiple propagation
    rounds) plus non-sameAs noise triples."""
    rows = []
    for c in range(n_comp):
        for i in range(n_chain - 1):
            rows.append(
                ("g", f"http://ex.org/c{c}/n{i}",
                 "http://www.w3.org/2002/07/owl#sameAs", 0,
                 f"http://ex.org/c{c}/n{i+1}", "", "")
            )
    rows.append(("g", "http://ex.org/c0/n2", "http://ex.org/p", 0,
                 "http://ex.org/c1/n3", "", ""))
    df = pd.DataFrame(
        rows,
        columns=["graph", "subj", "pred", "obj_kind", "obj", "obj_dt", "obj_lang"],
    )
    df["file_sha256"] = "s"
    return ray.data.from_pandas(df[["graph", "file_sha256", "subj", "pred",
                                    "obj_kind", "obj", "obj_dt", "obj_lang"]])


def test_distributed_alias_table_matches_driver_union_find():
    from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
        sameas_alias_table,
    )

    ds = chain_ds()
    want = sameas_aliases(ds)
    # default path (driver union-find below the size threshold)
    got_df = sameas_alias_table(ds, num_partitions=2).to_pandas()
    got = dict(zip(got_df["node"], got_df["root"]))
    assert got == want
    # every chain collapses to its lexicographic minimum (n0)
    assert got["http://ex.org/c2/n3"] == "http://ex.org/c2/n0"
    # forced distributed path (cc_labels join rounds) — same output
    dist_df = sameas_alias_table(
        ds, num_partitions=2, max_driver_edges=0
    ).to_pandas()
    assert dict(zip(dist_df["node"], dist_df["root"])) == want


def test_alias_table_on_corpus_without_sameas():
    from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
        canonicalize_with_alias_table,
        sameas_alias_table,
    )

    ds = chain_ds().filter(
        expr="pred != 'http://www.w3.org/2002/07/owl#sameAs'"
    )
    table = sameas_alias_table(ds, num_partitions=2)
    assert table.count() == 0
    # the documented pairing must not crash on the string-typed empty
    out = canonicalize_with_alias_table(ds, table, num_partitions=2)
    assert out.count() == ds.count()


def test_join_based_aliasing_matches_broadcast():
    from nospa_rdf_data_cube_validator_ray.stages.canonicalize import (
        canonicalize_with_alias_table,
        sameas_alias_table,
    )

    ds = chain_ds()
    aliases = sameas_aliases(ds)
    want = (
        canonicalize(ds, aliases=aliases)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    table = sameas_alias_table(ds, num_partitions=2)
    normalized = canonicalize(ds)  # normalization only, empty alias dict
    got = (
        canonicalize_with_alias_table(normalized, table, num_partitions=2)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)[want.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, want)
