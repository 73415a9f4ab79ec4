"""Helpers for the two term domains used across stages.

* *nodes* (subjects, objects, datasets, slices, values, finding details)
  are ``term_str`` strings: ``<iri>`` / ``_:b`` / ``"lex"^^<dt>``.
* *properties* (predicates, dimension/measure/attribute props) are raw
  IRI strings — they are stream filter keys and Arrow column values.
"""

from __future__ import annotations

from .model import KIND_BNODE, KIND_IRI, KIND_LITERAL, term_str  # noqa: F401


def subj_term(subj: str) -> str:
    return subj if subj.startswith("_:") else f"<{subj}>"


def iri_of(term: str) -> str | None:
    """term_str → raw IRI, or None for bnodes/literals (the reference's
    nodeToProperty URI-resource filter, ValidatorBase.java:191-198)."""
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    return None


def obj_term(kind: int, obj: str, dt: str, lang: str) -> str:
    return term_str(kind, obj, dt, lang)
