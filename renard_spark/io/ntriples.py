"""N-Triples RDF export of the materialized knowledge graph — the
interchange sink next to GEXF (graph tools) and the Iceberg tables
(warehouses): one `.nt` line per fact, loadable by any RDF store.

Node identity uses blank-node labels derived from md5 of the canonical
character name (`_:b<hex>`), which keeps the exporter total over
arbitrary names without an IRI percent-encoding pass — the
human-readable surface travels on an rdfs:label literal per node, with
the standard N-Triples string escapes (backslash, quote, newline,
carriage return, tab) applied as a chained replace. Everything is
narrow projections + one distinct; the writer is a plain partitioned
text sink, so a 10^12-triple export streams straight from the shuffle
with no driver involvement.

Reference parity: the reference exports its character networks only to
GEXF/matplotlib (renard/graph_utils.py); an RDF line sink is the
engine-side addition for KG downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def _escape(col):
    # N-Triples literal escapes; backslash first so later escapes'
    # backslashes survive. Plain replace (no regex) on both engines.
    for a, b in (
        ("\\", "\\\\"),
        ('"', '\\"'),
        ("\n", "\\n"),
        ("\r", "\\r"),
        ("\t", "\\t"),
    ):
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def _bnode(col):
    return F.concat(F.lit("_:b"), F.md5(col.cast("string")))


def triples_to_ntriples(
    triples: DataFrame,
    base: str = "http://example.org/kg/",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """→ one-column DataFrame (line): the distinct (subj, pred, obj)
    facts as `_:bS <base/pred> _:bO .` plus one rdfs:label line per
    distinct node carrying the escaped surface name. ``pred`` values
    must be IRI-safe tokens (the engine's predicates are identifiers
    like ``interacts_with``)."""
    facts = triples.select(subj_col, pred_col, obj_col).distinct()
    fact_lines = facts.select(
        F.concat(
            _bnode(F.col(subj_col)),
            F.lit(" <"),
            F.lit(base),
            F.col(pred_col),
            F.lit("> "),
            _bnode(F.col(obj_col)),
            F.lit(" ."),
        ).alias("line")
    )
    nodes = (
        facts.select(F.col(subj_col).alias("name"))
        .union(facts.select(F.col(obj_col).alias("name")))
        .distinct()
    )
    label_lines = nodes.select(
        F.concat(
            _bnode(F.col("name")),
            F.lit(f' <{RDFS_LABEL}> "'),
            _escape(F.col("name").cast("string")),
            F.lit('" .'),
        ).alias("line")
    )
    return fact_lines.union(label_lines)


def write_ntriples(lines: DataFrame, path: str) -> None:
    """Write the line table as a partitioned `.nt` text directory
    (every part file is independently valid N-Triples — line-oriented
    formats shard for free)."""
    lines.select("line").write.mode("overwrite").text(path)
