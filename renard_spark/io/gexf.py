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


def dynamic_edges_to_gexf(
    dyn_edges_df: DataFrame, path: str, n_windows: int | None = None,
    max_rows: int = 100_000,
) -> None:
    """Gephi-compatible DYNAMIC graph export from a dynamic edges
    table (window_id, src, dst, weight) — the reference's
    ``dynamic_graph_to_gephi_graph`` (graph_utils.py:108-167) +
    ``core.py:244-282`` dynamic path, re-expressed over tables.

    Reference semantics reproduced exactly: per edge, one cumulative
    ``dweight`` spell per window of presence — value = running sum of
    window weights, start = that window, end = the NEXT window the
    edge appears in (or total window count for the last spell); the
    edge's ``start`` is its first window; a node's ``start`` is its
    first incident window. The per-edge series is built with one
    distributed groupBy (collect_list of (window, weight) structs,
    array_sort); only the final ≤``max_rows`` series rows reach the
    driver for XML rendering.
    """
    from pyspark.sql import functions as F

    per_edge = (
        dyn_edges_df.groupBy("src", "dst")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("window_id", "weight"))
            ).alias("series")
        )
        .orderBy("src", "dst")
        .limit(max_rows)
        .collect()
    )
    if n_windows is None:
        n_windows = max(
            (s["window_id"] for e in per_edge for s in e["series"]),
            default=-1,
        ) + 1
    node_start: dict[str, int] = {}
    for e in per_edge:
        w0 = e["series"][0]["window_id"]
        for n in (e["src"], e["dst"]):
            node_start[n] = min(node_start.get(n, w0), w0)
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://gexf.net/1.3" version="1.3">\n')
        f.write(
            '  <graph defaultedgetype="undirected" mode="dynamic"'
            ' timeformat="long">\n'
        )
        f.write(
            '    <attributes class="edge" mode="dynamic">\n'
            '      <attribute id="dweight" title="dweight"'
            ' type="double"/>\n    </attributes>\n'
        )
        f.write("    <nodes>\n")
        for n in sorted(node_start):
            lbl = escape(str(n))
            f.write(
                f'      <node id="{lbl}" label="{lbl}"'
                f' start="{node_start[n]}" end="{n_windows}"/>\n'
            )
        f.write("    </nodes>\n    <edges>\n")
        for i, e in enumerate(per_edge):
            s, d = escape(str(e["src"])), escape(str(e["dst"]))
            first = e["series"][0]["window_id"]
            f.write(
                f'      <edge id="{i}" source="{s}" target="{d}"'
                f' start="{first}">\n        <attvalues>\n'
            )
            # cumulative value; each spell's end = next spell's start
            # (reference updates the previous END on reappearance)
            cum = 0.0
            series = e["series"]
            for j, sp in enumerate(series):
                cum += float(sp["weight"])
                end = (
                    series[j + 1]["window_id"]
                    if j + 1 < len(series) else n_windows
                )
                f.write(
                    f'          <attvalue for="dweight" value="{cum}"'
                    f' start="{sp["window_id"]}" end="{end}"/>\n'
                )
            f.write("        </attvalues>\n      </edge>\n")
        f.write("    </edges>\n  </graph>\n</gexf>\n")
