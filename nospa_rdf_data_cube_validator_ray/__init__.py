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
    dispatches "NOSPA" | "SPARQL" to two engines with identical intended
    semantics.  This engine implements the NoSPA behavior (bug-for-bug);
    the SPARQL twin is spec-only here — its constraint queries live on as
    the per-query DuckDB oracles in __ray_entry__
    (IntegrityConstraint.java re-expressed over the derived tables) — so
    requesting it is an explicit, documented error rather than a silent
    alias."""
    vt = validator_type.upper()
    if vt == "NOSPA":
        return CubeValidator(**kwargs)
    if vt == "SPARQL":
        raise NotImplementedError(
            "the SPARQL validator backend is not implemented; the NoSPA "
            "engine (create_validator('NOSPA')) is the only backend — the "
            "reference's SPARQL constraint queries exist here as the "
            "DuckDB oracle suite, not as an execution engine"
        )
    raise ValueError(f"unknown validator type: {validator_type!r}")
