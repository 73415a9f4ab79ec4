"""Stateful IRI canonicalization + entity linking over the triple stream.

The reference relies on Jena's interned term identity (ResourceFactory,
ValidatorBase.java:301-368); at corpus scale term identity has to be
*manufactured*: syntactically different IRIs for the same entity must
collapse before any groupby/dedup/check treats them as distinct.

``CanonicalizeTerms`` is the actor-pool shape the north star asks for:
per-actor state built once in ``__init__`` — a broadcast alias map
(owl:sameAs / curated entity links) plus a memoized normalization
dictionary (hash-indexed term dictionary; IRIs are Zipfian, so after
warm-up every hot term is one dict hit) — applied per batch with
vectorized pandas ops + cached per-unique-value normalization.

Normalization rules (RFC 3986 syntax-based):
  * scheme and host lowercased
  * default ports dropped (http:80 / https:443)
  * percent-encoding uppercased; unreserved characters decoded
  * dot-segments resolved in the path
Alias linking happens AFTER normalization (alias keys are stored
normalized), so `HTTP://Ex.org/A` and `http://ex.org/a-alias` can both
link to one canonical entity.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pandas as pd

import ray
import ray.data

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _fix_pct(m: re.Match) -> str:
    ch = chr(int(m.group(1), 16))
    if ch in _UNRESERVED:
        return ch
    return "%" + m.group(1).upper()


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_iri(iri: str) -> str:
    """RFC 3986 syntax-based normalization (pure function)."""
    if "://" not in iri:
        return iri
    try:
        parts = urlsplit(iri)
    except ValueError:
        return iri
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = _PCT_RE.sub(_fix_pct, _remove_dot_segments(parts.path))
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


class CanonicalizeTerms:
    """Actor-pool map_batches stage: normalize + entity-link subj/pred/obj.

    ``alias_ref``: ray.put({normalized_alias_iri: canonical_iri}) built from
    owl:sameAs edges or a curated entity table — broadcast once, read in
    ``__init__`` (once per actor), never re-shipped per batch."""

    def __init__(self, alias_ref=None):
        self.aliases: dict[str, str] = (
            ray.get(alias_ref)
            if isinstance(alias_ref, ray.ObjectRef)
            else (alias_ref or {})
        )
        self._memo: dict[str, str] = {}  # raw IRI → canonical (per-actor dict)

    def _canon(self, iri: str) -> str:
        hit = self._memo.get(iri)
        if hit is None:
            if len(self._memo) > 4_000_000:
                self._memo.clear()
            n = normalize_iri(iri)
            hit = self.aliases.get(n, n)
            self._memo[iri] = hit
        return hit

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        canon = self._canon
        # unique-value mapping: each distinct term normalized once per batch,
        # memoized across batches by the actor dict
        for col, mask in (
            ("subj", ~df["subj"].str.startswith("_:")),
            ("pred", pd.Series(True, index=df.index)),
        ):
            vals = df.loc[mask, col]
            mapping = {v: canon(v) for v in vals.unique()}
            out.loc[mask, col] = vals.map(mapping)
        om = df["obj_kind"] == 0
        vals = df.loc[om, "obj"]
        mapping = {v: canon(v) for v in vals.unique()}
        out.loc[om, "obj"] = vals.map(mapping)
        return out


def canonicalize(
    triples: "ray.data.Dataset",
    *,
    aliases: dict[str, str] | None = None,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Triple Dataset → canonicalized triple Dataset (actor pool; alias map
    broadcast via ray.put once)."""
    ref = ray.put(aliases or {})
    return triples.map_batches(
        CanonicalizeTerms,
        fn_constructor_kwargs={"alias_ref": ref},
        batch_format="pandas",
        concurrency=concurrency,
    )


def sameas_aliases(triples: "ray.data.Dataset") -> dict[str, str]:
    """Build the alias map from owl:sameAs edges in the stream: each
    connected component maps to its lexicographically-smallest member
    (deterministic canonical representative).  Component-finding runs on
    the collected edge list — sameAs subgraphs are entity-scale, not
    observation-scale; a corpus where they are not would shard this by
    union-find over hash-partitioned edges."""
    OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
    edges = (
        triples.filter(expr=f"pred == '{OWL_SAMEAS}' and obj_kind == 0")
        .select_columns(["subj", "obj"])
        .take_all()
    )
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        a, b = normalize_iri(e["subj"]), normalize_iri(e["obj"])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent if find(x) != x}
