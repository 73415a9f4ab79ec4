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


def create_validator(validator_type: str = "NOSPA", **kwargs):
    """ValidatorFactory parity (ValidatorFactory.java:26-53): the reference
    dispatches "NOSPA" | "SPARQL" to two engines.

    * "NOSPA" — the streaming engine matching the nonsparql package
      bug-for-bug (IC-8/12/14/19 quirks reproduced).
    * "SPARQL" — the specification engine: a hand translation of the 21
      IntegrityConstraint.java SELECTs (pipelines/sparql_validate.py),
      usable as an independent cross-check on arbitrary corpora.  The two
      engines deliberately diverge exactly where the reference's own
      engines do — see sparql_validate's module docstring."""
    vt = validator_type.upper()
    if vt == "NOSPA":
        return CubeValidator(**kwargs)
    if vt == "SPARQL":
        from .pipelines.sparql_validate import SparqlCubeValidator

        return SparqlCubeValidator(**kwargs)
    raise ValueError(f"unknown validator type: {validator_type!r}")
