"""RDFS forward-chaining inference over (subj, pred, obj) fact tables.

The reference stops at materializing extracted networks (renard/core.py
Pipeline output); a KG-construction engine also needs the standard
entailment step that turns extracted facts + a schema into the typed,
property-rolled-up graph downstream consumers query. This implements
the rhoDF fragment of RDFS (Munoz, Perez, Gutierrez, "Minimal
Deductive Systems for RDF", ESWC 2007 — public): subPropertyOf,
subClassOf, domain, range.

The fragment STRATIFIES — instance data never derives new schema
triples — so instead of a naive rule-loop fixpoint over the whole KG
(many corpus-sized shuffles per round), evaluation is four strata:

  1. subPropertyOf+ : transitive closure of the property hierarchy
     (schema-only, iterative doubling — O(log depth) tiny-table jobs),
  2. rdfs7          : facts x subPropertyOf+  => inherited facts
     (ONE broadcast join of the corpus-sized fact table),
  3. rdfs2 / rdfs3  : domain / range typing of the prop-closed facts
     (two broadcast joins => (s, type, C) / (o, type, C)),
  4. subClassOf+ & rdfs9: type facts x class closure => supertypes
     (ONE broadcast join).

The corpus-scale fact table crosses the pipeline exactly once per
stratum via a BROADCAST hash join against the (dimension-sized) schema
closures — no iteration touches instance data, no shuffle is keyed on
it, and the final distinct is the only wide operation. That is the
shape that survives 10^12 facts; a semi-naive datalog loop would pay
a fact-table shuffle per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUB_PROPERTY_OF = "subPropertyOf"
SUB_CLASS_OF = "subClassOf"
DOMAIN = "domain"
RANGE = "range"
TYPE = "type"


def _closure(edges: DataFrame, max_rounds: int) -> DataFrame:
    """Reflexive-free transitive closure (a, b) of a schema-sized edge
    table by iterative doubling; delegated to graph.transitive_closure
    so ontology and property-path closures share one implementation."""
    from renard_spark.functions.graph import transitive_closure

    return transitive_closure(edges, src="a", dst="b", max_rounds=max_rounds)


def rdfs_closure(
    facts: DataFrame,
    schema: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    type_pred: str = TYPE,
    max_rounds: int = 5,
) -> DataFrame:
    """RDFS entailment of ``facts`` under ``schema`` -> the closed
    (subj, pred, obj) table: the input facts, every subPropertyOf-
    inherited fact, and every domain/range/subClassOf-derived
    ``(entity, type, class)`` triple, distinct.

    ``schema`` is a (subj, pred, obj) table whose predicates are
    ``subPropertyOf`` / ``subClassOf`` / ``domain`` / ``range``
    (module constants) — a dimension table (ontologies are small even
    when corpora are not); it is broadcast into every join. ``facts``
    may itself contain explicit ``type`` triples; they join stratum 4
    like derived ones. ``max_rounds`` bounds the doubling closure of
    each hierarchy (covers depth 2**max_rounds).
    """
    s, p, o = subj, pred, obj
    sch = schema.select(
        F.col(s).alias("_s"), F.col(p).alias("_p"), F.col(o).alias("_o")
    ).localCheckpoint(eager=False)

    def hier(kind: str) -> DataFrame:
        e = sch.filter(F.col("_p") == kind).select(
            F.col("_s").alias("a"), F.col("_o").alias("b")
        )
        return _closure(e, max_rounds)

    sp_plus = hier(SUB_PROPERTY_OF)
    sc_plus = hier(SUB_CLASS_OF)

    base = facts.select(s, p, o)
    # stratum 2 (rdfs7): property inheritance over the CLOSED hierarchy
    inherited = base.join(
        F.broadcast(sp_plus), base[p] == sp_plus["a"]
    ).select(F.col(s), sp_plus["b"].alias(p), F.col(o))
    closed_facts = base.unionByName(inherited)
    # every downstream stratum reads closed_facts; truncate so the
    # fact lineage (at corpus scale: the whole extraction chain)
    # executes once, not once per consumer
    closed_facts = closed_facts.localCheckpoint(eager=False)

    # stratum 3 (rdfs2/rdfs3): domain / range typing
    dom = sch.filter(F.col("_p") == DOMAIN).select(
        F.col("_s").alias("_dp"), F.col("_o").alias("_dc")
    )
    rng = sch.filter(F.col("_p") == RANGE).select(
        F.col("_s").alias("_rp"), F.col("_o").alias("_rc")
    )
    non_type = closed_facts.filter(F.col(p) != type_pred)
    typed_dom = non_type.join(
        F.broadcast(dom), non_type[p] == dom["_dp"]
    ).select(F.col(s), F.lit(type_pred).alias(p), F.col("_dc").alias(o))
    typed_rng = non_type.join(
        F.broadcast(rng), non_type[p] == rng["_rp"]
    ).select(
        F.col(o).alias(s), F.lit(type_pred).alias(p), F.col("_rc").alias(o)
    )
    explicit_types = closed_facts.filter(F.col(p) == type_pred)
    types = explicit_types.unionByName(typed_dom).unionByName(typed_rng)
    types = types.localCheckpoint(eager=False)

    # stratum 4 (rdfs9): supertype inheritance over the class closure
    super_types = types.join(
        F.broadcast(sc_plus), types[o] == sc_plus["a"]
    ).select(F.col(s), F.col(p), sc_plus["b"].alias(o))

    return (
        closed_facts.filter(F.col(p) != type_pred)
        .unionByName(types)
        .unionByName(super_types)
        .distinct()
    )


def rdfs_closure_py(
    facts: list[tuple[str, str, str]],
    schema: list[tuple[str, str, str]],
    type_pred: str = TYPE,
) -> set[tuple[str, str, str]]:
    """Brute-force rule-loop fixpoint twin (pure Python) — the oracle
    for pytest: applies rdfs5/7/2/3/11/9 until no new triple appears.
    Deliberately the NAIVE algorithm, so agreement with rdfs_closure
    checks the stratification argument, not just the arithmetic."""
    out = set(facts)
    rules = set(schema)
    changed = True
    while changed:
        changed = False
        new: set[tuple[str, str, str]] = set()
        # rdfs5: subPropertyOf transitivity (schema-level)
        for a, p1, b in list(rules):
            for c, p2, d in list(rules):
                if p1 == p2 == SUB_PROPERTY_OF and b == c:
                    t = (a, SUB_PROPERTY_OF, d)
                    if t not in rules:
                        rules.add(t)
                        changed = True
                if p1 == p2 == SUB_CLASS_OF and b == c:
                    t = (a, SUB_CLASS_OF, d)
                    if t not in rules:
                        rules.add(t)
                        changed = True
        for s, p, o in out:
            for a, sp, b in rules:
                if sp == SUB_PROPERTY_OF and p == a:
                    new.add((s, b, o))
                if sp == DOMAIN and p == a and p != type_pred:
                    new.add((s, type_pred, b))
                if sp == RANGE and p == a and p != type_pred:
                    new.add((o, type_pred, b))
                if sp == SUB_CLASS_OF and p == type_pred and o == a:
                    new.add((s, type_pred, b))
        if not new <= out:
            out |= new
            changed = True
    return out
