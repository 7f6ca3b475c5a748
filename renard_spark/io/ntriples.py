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


# one N-Triples statement: subject (IRI | bnode), predicate IRI,
# object (IRI | bnode | quoted literal with backslash escapes), dot.
_NT_SUBJ = r"(<[^>]*>|_:\S+)"
_NT_OBJ = r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\")"
NT_LINE_RE = rf"^\s*{_NT_SUBJ}\s+<([^>]*)>\s+{_NT_OBJ}\s*\.\s*$"

# a literal body tokenizes into surrogate-PAIR \u escapes (kept
# together so the two halves decode as one UTF-16 unit), single \uXXXX
# / \UXXXXXXXX escapes, 2-char escapes, and backslash-free runs — ONE
# regex pass, so unescaping is single-pass (a chained replace would
# re-interpret backslashes produced by an earlier step: the classic
# double-unescape bug).
_ESCAPE_SEG_RE = (
    r"\\u[Dd][89ABab][0-9A-Fa-f]{2}\\u[Dd][C-Fc-f][0-9A-Fa-f]{2}"
    r"|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}|\\.|[^\\]+"
)


def _unescape(col):
    # \uXXXX is a UTF-16 code unit → unhex + UTF-16BE decode (full
    # Unicode; `char()` would truncate code points mod 256). Surrogate
    # pairs arrive as one 12-char segment: both units' hex concatenate
    # into 4 UTF-16BE bytes. \UXXXXXXXX is a raw code point → UTF-32.
    seg = F.regexp_extract_all(col, F.lit(_ESCAPE_SEG_RE), 0)
    return F.array_join(
        F.transform(
            seg,
            lambda s: F.when(s == F.lit("\\\\"), F.lit("\\"))
            .when(s == F.lit('\\"'), F.lit('"'))
            .when(s == F.lit("\\n"), F.lit("\n"))
            .when(s == F.lit("\\r"), F.lit("\r"))
            .when(s == F.lit("\\t"), F.lit("\t"))
            .when(
                (F.length(s) == 12) & s.rlike(r"^\\u"),
                F.decode(
                    F.unhex(
                        F.concat(
                            F.substring(s, 3, 4), F.substring(s, 9, 4)
                        )
                    ),
                    "UTF-16BE",
                ),
            )
            .when(
                s.rlike(r"^\\u"),
                F.decode(F.unhex(F.substring(s, 3, 4)), "UTF-16BE"),
            )
            .when(
                s.rlike(r"^\\U"),
                F.decode(F.unhex(F.substring(s, 3, 8)), "UTF-32"),
            )
            .otherwise(s),
        ),
        "",
    )


def parse_ntriples(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """N-Triples READER — the ingest inverse of triples_to_ntriples,
    so external RDF dumps load as plain (term, term, term) tables.

    → (subj, pred, obj, obj_kind): subj keeps its bnode label
    (``_:...``) or is the bare IRI text; pred is the bare IRI; obj is
    the bnode label / bare IRI / UNESCAPED literal value, with
    obj_kind ∈ {'bnode','iri','literal'}. Comment (#...) and blank
    lines are skipped; any other non-matching line raises downstream
    visibility via obj_kind = NULL rather than being dropped silently
    — callers gate on ``obj_kind IS NOT NULL``.

    Narrow end to end (regexp + higher-order functions, no UDF, no
    shuffle): parsing 10^12 lines costs exactly one scan.
    """
    raw = F.trim(F.col(line_col))
    parsed = lines.filter(
        (raw != F.lit("")) & ~raw.startswith(F.lit("#"))
    ).select(
        F.regexp_extract(line_col, NT_LINE_RE, 1).alias("_s"),
        F.regexp_extract(line_col, NT_LINE_RE, 2).alias("_p"),
        F.regexp_extract(line_col, NT_LINE_RE, 3).alias("_o"),
    )

    def term(c, literal_ok: bool):
        iri = F.when(
            c.startswith(F.lit("<")),
            F.substring(c, 2, F.length(c) - F.lit(2)),
        )
        if not literal_ok:
            return iri.otherwise(c)
        return iri.when(
            c.startswith(F.lit('"')),
            _unescape(F.substring(c, 2, F.length(c) - F.lit(2))),
        ).otherwise(c)

    kind = (
        F.when(F.col("_o") == F.lit(""), F.lit(None).cast("string"))
        .when(F.col("_o").startswith(F.lit('"')), F.lit("literal"))
        .when(F.col("_o").startswith(F.lit("<")), F.lit("iri"))
        .otherwise(F.lit("bnode"))
    )
    return parsed.select(
        term(F.col("_s"), literal_ok=False).alias("subj"),
        F.col("_p").alias("pred"),
        term(F.col("_o"), literal_ok=True).alias("obj"),
        kind.alias("obj_kind"),
    )


def ntriples_to_triples(
    lines: DataFrame, base: str = "http://example.org/kg/"
) -> DataFrame:
    """Reconstruct the name-level (subj, pred, obj) fact table from an
    export produced by :func:`triples_to_ntriples`: parse the lines,
    index the rdfs:label literals by bnode, and resolve both fact
    endpoints through that index (two equi-joins on the bnode key —
    the label table is same-cardinality as the node set, so Catalyst
    broadcasts it when small and shuffles it when not; either is
    correct). Predicates drop the ``base`` IRI prefix.
    """
    parsed = parse_ntriples(lines).localCheckpoint(eager=False)
    labels = parsed.filter(
        (F.col("pred") == RDFS_LABEL) & (F.col("obj_kind") == "literal")
    ).select(F.col("subj").alias("_b"), F.col("obj").alias("_name"))
    facts = parsed.filter(F.col("pred") != RDFS_LABEL).select(
        F.col("subj").alias("_sb"),
        F.regexp_replace("pred", f"^{base}", "").alias("pred"),
        F.col("obj").alias("_ob"),
    )
    sl = labels.select(
        F.col("_b").alias("_sb"), F.col("_name").alias("subj")
    )
    ol = labels.select(
        F.col("_b").alias("_ob"), F.col("_name").alias("obj")
    )
    return (
        facts.join(sl, "_sb").join(ol, "_ob").select("subj", "pred", "obj")
    )
