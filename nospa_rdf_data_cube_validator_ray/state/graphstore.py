"""LocalGraph — a tiny in-memory triple store for SCHEMA-SIDE subgraphs.

The reference's entire query engine is six graph-search functions over
Jena's in-memory SPO/POS hash indexes (ValidatorBase.java:34-293).  In the
Ray design those indexes exist ONLY for the small schema-side slice of each
graph (DSD / component / slice-key / code-list triples — bounded per file),
which is collected once, indexed here, and broadcast to workers via
``ray.put``.  Observation-scale triples never enter a LocalGraph; they stay
in the streaming Dataset.

Terms are single strings in the :func:`..model.term_str` encoding
(``<iri>`` / ``_:b`` / ``"lex"^^<dt>``); predicates are raw IRI strings.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable


class LocalGraph:
    __slots__ = ("_spo", "_pos", "_sp")

    def __init__(self) -> None:
        # pred -> subj -> set(obj)   and   pred -> obj -> set(subj)
        self._spo: dict[str, dict[str, set[str]]] = defaultdict(lambda: defaultdict(set))
        self._pos: dict[str, dict[str, set[str]]] = defaultdict(lambda: defaultdict(set))
        self._sp: dict[str, set[str]] = defaultdict(set)  # subj -> preds

    def add(self, subj: str, pred: str, obj: str) -> None:
        self._spo[pred][subj].add(obj)
        self._pos[pred][obj].add(subj)
        self._sp[subj].add(pred)

    def add_many(self, triples: Iterable[tuple[str, str, str]]) -> None:
        for s, p, o in triples:
            self.add(s, p, o)

    # -- kernel functions (relational reading in SURVEY.md §2.2) ----------

    def objects_of(self, subj: str, pred: str) -> set[str]:
        """Jena listObjectsOfProperty(s, p) — ValidatorBase.java:147-155.
        Returns a COPY: callers may mutate the result (retainAll-style set
        algebra everywhere in the checks) without corrupting the index."""
        return set(self._spo.get(pred, {}).get(subj, ()))

    def subjects_with(self, pred: str, obj: str | None = None) -> set[str]:
        """Jena listSubjectsWithProperty — ValidatorBase.java:163-171.
        Returns a COPY (see objects_of)."""
        if obj is None:
            return set(self._spo.get(pred, {}).keys())
        return set(self._pos.get(pred, {}).get(obj, ()))

    def all_objects_of(self, pred: str) -> set[str]:
        out: set[str] = set()
        for objs in self._spo.get(pred, {}).values():
            out |= objs
        return out

    def has(self, subj: str, pred: str, obj: str) -> bool:
        return obj in self._spo.get(pred, {}).get(subj, ())

    def subjects(self) -> set[str]:
        return set(self._sp.keys())

    def path_visit(self, prop_path: list[str]) -> dict[str, set[str]]:
        """searchByPathVisit(null, path, null) (ValidatorBase.java:61-72):
        for every subject of the first property, follow the k-hop path and
        return subject → set of path-end nodes (IRI/bnode hops only,
        matching nodeToResource filtering between hops)."""
        result: dict[str, set[str]] = {}
        first = prop_path[0]
        for sub in self._spo.get(first, {}):
            nodes = set(self._spo[first][sub])
            for pred in prop_path[1:]:
                nxt: set[str] = set()
                for node in nodes:
                    if node.startswith('"'):
                        continue  # literals have no outgoing edges
                    nxt |= self.objects_of(node, pred)
                nodes = nxt
            result[sub] = nodes
        return result

    def multi_prop_subjects(self, obj_by_prop: dict[str, str]) -> set[str]:
        """searchByMultipleProperty (ValidatorBase.java:85-106): subjects
        matching ALL (pred, obj) pairs."""
        items = list(obj_by_prop.items())
        if not items:
            return set()
        p0, o0 = items[0]
        subs = set(self.subjects_with(p0, o0))
        for p, o in items[1:]:
            subs &= self.subjects_with(p, o)
        return subs

    def reachable_from(self, roots: Iterable[str], pred: str) -> set[str]:
        """Forward closure {v : root →pred+ v}.  The reference's frontier
        loop (ValidatorBase.java:280-293) has NO visited set and therefore
        never terminates on cyclic graphs; this implementation adds one
        (documented divergence — on cyclic inputs the reference hangs,
        we terminate with the correct fixpoint)."""
        seen: set[str] = set()
        frontier = set(roots)
        while frontier:
            nxt: set[str] = set()
            for node in frontier:
                if node.startswith('"'):
                    continue
                nxt |= self.objects_of(node, pred)
            frontier = nxt - seen
            seen |= nxt
        return seen

    def reaching_to(self, targets: Iterable[str], pred: str) -> set[str]:
        """Backward closure {v : v →pred+ target} (the inverse-pcp walk of
        ValidatorBase.java:264-268, cycle-safe)."""
        seen: set[str] = set()
        frontier = set(targets)
        while frontier:
            nxt: set[str] = set()
            for node in frontier:
                nxt |= self.subjects_with(pred, node)
            frontier = nxt - seen
            seen |= nxt
        return seen
