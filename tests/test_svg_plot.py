"""SVG plotting (io/svg.py): valid XML, reference-style scaling,
byte-determinism, stable layouts for dynamic graphs."""

import xml.etree.ElementTree as ET

from renard_spark.io import svg as svgmod

EDGES = [("alice", "bob", 3.0), ("bob", "carol", 1.0), ("alice", "carol", 2.0),
         ("dave", "alice", 5.0)]


def _counts(doc):
    root = ET.fromstring(doc)
    ns = "{http://www.w3.org/2000/svg}"
    return (
        len(root.findall(f"{ns}circle")),
        len(root.findall(f"{ns}line")),
        len(root.findall(f"{ns}text")),
    )


def test_svg_valid_and_counts():
    doc = svgmod.graph_to_svg(EDGES)
    circles, lines, texts = _counts(doc)
    assert circles == 4 and lines == 4 and texts == 4


def test_svg_deterministic():
    assert svgmod.graph_to_svg(EDGES) == svgmod.graph_to_svg(EDGES)
    assert svgmod.graph_to_svg(EDGES, seed=1) != svgmod.graph_to_svg(
        EDGES, seed=2
    )


def test_svg_escapes_labels():
    doc = svgmod.graph_to_svg([("a<b", 'c"&d', 1.0)])
    ET.fromstring(doc)  # must stay well-formed
    assert "a&lt;b" in doc


def test_edge_width_scales_with_weight():
    doc = svgmod.graph_to_svg(EDGES)
    root = ET.fromstring(doc)
    ns = "{http://www.w3.org/2000/svg}"
    widths = sorted(float(l.get("stroke-width")) for l in root.findall(f"{ns}line"))
    assert widths[0] < widths[-1]
    assert widths[-1] == 3.0  # 0.5 + 2.5 * wmax/wmax


def test_plot_graph_to_file(spark, tmp_path):
    df = spark.createDataFrame(EDGES, "src string, dst string, weight double")
    p = svgmod.plot_graph_to_file(df, str(tmp_path / "g.svg"))
    doc = open(p).read()
    assert _counts(doc) == (4, 4, 4)


def test_plot_graphs_to_dir_stable_layout(spark, tmp_path):
    rows = [("d1", "alice", "bob", 2.0), ("d1", "bob", "carol", 1.0),
            ("d2", "alice", "bob", 4.0)]
    df = spark.createDataFrame(
        rows, "doc_id string, src string, dst string, weight double"
    )
    paths = svgmod.plot_graphs_to_dir(df, str(tmp_path / "steps"))
    assert len(paths) == 2
    docs = [open(p).read() for p in paths]
    ns = "{http://www.w3.org/2000/svg}"

    def node_pos(doc):
        root = ET.fromstring(doc)
        return {
            t.text: None
            for t in root.findall(f"{ns}text")
        }, {
            (c.get("cx"), c.get("cy")) for c in root.findall(f"{ns}circle")
        }

    labels1, pos1 = node_pos(docs[0])
    labels2, pos2 = node_pos(docs[1])
    assert set(labels2) == {"alice", "bob"}
    # stable layout: d2's node positions are a subset of d1's
    assert pos2 <= pos1
