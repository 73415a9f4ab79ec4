"""nospa_rdf_data_cube_validator_ray — a from-scratch, Ray-Data-native
RDF Data Cube construction + validation engine with the query semantics of
yyz1989/NoSPA-RDF-Data-Cube-Validator (reference at /root/reference,
studied for behavior only; architecture is Dataset/map_batches-first).

Public surface:
    CubeValidator         — Validator facade (normalize / validateAll / export)
    read_corpus, parse_corpus — corpus sources
    fixtures              — deterministic cube corpora + expected violations
"""

from .pipelines.validate import CubeValidator, ALL_ICS  # noqa: F401
from .sources.parse_stage import read_corpus, parse_corpus  # noqa: F401
from .model import TRIPLE_SCHEMA, FINDINGS_SCHEMA  # noqa: F401


def create_validator(validator_type: str = "NOSPA", **kwargs) -> CubeValidator:
    """ValidatorFactory parity (ValidatorFactory.java:26-53): the reference
    dispatches "NOSPA" | "SPARQL" to two engines with identical semantics.
    Here both names resolve to the one Ray-Data engine — the reference's
    SPARQL twin exists as the per-query DuckDB oracles in __ray_entry__
    (IntegrityConstraint.java re-expressed over the derived tables)."""
    if validator_type.upper() not in ("NOSPA", "SPARQL"):
        raise ValueError(f"unknown validator type: {validator_type!r}")
    return CubeValidator(**kwargs)
