"""GEXF export — optional driver-side sink for small graphs.

The reference writes character networks to .gexf for Gephi
(core.py:244-282). At engine scale graphs live in the catalog tables
(nodes/edges/triples); this helper renders ONE document's graph (or a
small aggregate) to GEXF XML for inspection. Driver-side by design —
never part of a distributed plan.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame


def edges_to_gexf(
    nodes_df: DataFrame, edges_df: DataFrame, path: str,
    max_rows: int = 100_000,
) -> None:
    nodes = nodes_df.limit(max_rows).collect()
    edges = edges_df.limit(max_rows).collect()
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://gexf.net/1.3" version="1.3">\n')
        f.write('  <graph defaultedgetype="undirected">\n    <nodes>\n')
        for n in nodes:
            label = escape(str(n["char_id"]))
            f.write(f'      <node id="{label}" label="{label}"/>\n')
        f.write("    </nodes>\n    <edges>\n")
        for i, e in enumerate(edges):
            s, d = escape(str(e["src"])), escape(str(e["dst"]))
            w = e["weight"]
            f.write(
                f'      <edge id="{i}" source="{s}" target="{d}" weight="{w}"/>\n'
            )
        f.write("    </edges>\n  </graph>\n</gexf>\n")
