"""Character-network plotting without matplotlib: deterministic SVG.

The reference plots its nx.Graph networks with matplotlib
(/root/reference/renard/plot_utils.py:21-66 plot_nx_graph_reasonably;
core.py:284-360 plot_graphs_to_dir / plot_graph_to_file), with a
spring layout of ``k = min(1.5, 8/sqrt(n+1))``, node size/color scaled
by degree, and edge width by weight. This module reproduces that
surface as a self-contained SVG writer — the container ships no
matplotlib, and at engine scale plotting is a driver-side action over
an already-aggregated (small) edge table anyway.

Determinism: the force layout is seeded Fruchterman–Reingold on
sorted node order — same edges in, byte-identical SVG out (tested).
"""

from __future__ import annotations

import math
import os
from html import escape

import numpy as np
from pyspark.sql import DataFrame


def spring_layout(
    nodes: list[str], edges: list[tuple[str, str, float]],
    iterations: int = 50, seed: int = 0, k: float | None = None,
) -> dict[str, tuple[float, float]]:
    """Seeded Fruchterman–Reingold force layout in [0, 1]^2.

    ``k`` defaults to the reference's ``min(1.5, 8/sqrt(n+1))``
    spring constant (plot_utils.py:38), rescaled to the unit square.
    """
    n = len(nodes)
    if n == 0:
        return {}
    if n == 1:
        return {nodes[0]: (0.5, 0.5)}
    if k is None:
        k = min(1.5, 8.0 / math.sqrt(n + 1)) / math.sqrt(n)
    idx = {v: i for i, v in enumerate(sorted(nodes))}
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2))
    w = np.zeros((n, n))
    for a, b, wt in edges:
        i, j = idx[a], idx[b]
        w[i, j] = w[j, i] = max(float(wt), w[i, j])
    if w.max() > 0:
        w = w / w.max()
    t = 0.1
    dt = t / (iterations + 1)
    for _ in range(iterations):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.linalg.norm(delta, axis=-1)
        np.fill_diagonal(dist, 1.0)
        dist = np.maximum(dist, 0.01)
        # repulsion k^2/d for every pair, attraction d^2/k on edges
        force = k * k / dist**2 - w * dist / k
        disp = (delta * force[..., None]).sum(axis=1)
        length = np.maximum(np.linalg.norm(disp, axis=-1), 1e-9)
        pos += disp / length[:, None] * np.minimum(length, t)[:, None]
        t -= dt
    span = pos.max(axis=0) - pos.min(axis=0)
    span[span == 0] = 1.0
    pos = (pos - pos.min(axis=0)) / span
    inv = sorted(idx, key=idx.get)
    return {v: (float(pos[idx[v], 0]), float(pos[idx[v], 1])) for v in inv}


def graph_to_svg(
    edges: list[tuple[str, str, float]], width: int = 800,
    height: int = 600, seed: int = 0, margin: int = 60,
    layout: dict[str, tuple[float, float]] | None = None,
) -> str:
    """Render an undirected weighted edge list as an SVG document.

    Node radius grows with degree and edge stroke width with weight —
    the reference's ``node_size = 1 + degree*10`` / per-weight edge
    styling (plot_utils.py:52-66) in vector form. Pass ``layout`` to
    pin positions (the reference's ``stable_layout`` option for
    dynamic graphs)."""
    nodes = sorted({v for e in edges for v in e[:2]})
    if layout is None:
        layout = spring_layout(nodes, edges, seed=seed)

    def xy(v):
        x, y = layout[v]
        return (margin + x * (width - 2 * margin),
                margin + y * (height - 2 * margin))

    deg: dict[str, int] = {v: 0 for v in nodes}
    for a, b, _ in edges:
        deg[a] += 1
        deg[b] += 1
    wmax = max((e[2] for e in edges), default=1.0) or 1.0
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        '<rect width="100%" height="100%" fill="white"/>',
    ]
    for a, b, wt in sorted(edges):
        (x1, y1), (x2, y2) = xy(a), xy(b)
        sw = 0.5 + 2.5 * float(wt) / wmax
        out.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" '
            f'y2="{y2:.1f}" stroke="#999" stroke-width="{sw:.2f}"/>'
        )
    for v in nodes:
        x, y = xy(v)
        r = 4.0 + 2.0 * math.sqrt(deg[v])
        out.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r:.1f}" '
            'fill="#4477aa" stroke="#223355"/>'
        )
        out.append(
            f'<text x="{x:.1f}" y="{y - r - 3:.1f}" font-size="11" '
            f'text-anchor="middle" font-family="sans-serif">'
            f"{escape(str(v))}</text>"
        )
    out.append("</svg>")
    return "\n".join(out)


def _collect_edges(
    edges_df: DataFrame, src: str, dst: str, weight: str,
    max_edges: int,
) -> list[tuple[str, str, float]]:
    rows = (
        edges_df.select(src, dst, weight)
        .orderBy(edges_df[weight].desc(), src, dst)
        .limit(max_edges)
        .collect()
    )
    return [(str(r[0]), str(r[1]), float(r[2])) for r in rows]


def plot_graph_to_file(
    edges_df: DataFrame, path: str, src: str = "src", dst: str = "dst",
    weight: str = "weight", max_edges: int = 2000, seed: int = 0,
) -> str:
    """Driver-side render of an edge table to one SVG file — the
    analog of the reference's ``plot_graph_to_file`` (core.py:360).
    Takes the top ``max_edges`` heaviest edges (deterministic order)
    so a corpus-scale table cannot flood the driver."""
    svg = graph_to_svg(_collect_edges(edges_df, src, dst, weight,
                                      max_edges), seed=seed)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(svg)
    return path


def plot_graphs_to_dir(
    edges_df: DataFrame, directory: str, step_col: str = "doc_id",
    src: str = "src", dst: str = "dst", weight: str = "weight",
    max_steps: int = 100, max_edges: int = 2000,
    stable_layout: bool = True, seed: int = 0,
) -> list[str]:
    """Per-step SVGs of a dynamic graph (one file per ``step_col``
    value) — the reference's ``plot_graphs_to_dir`` (core.py:284).
    With ``stable_layout`` nodes keep the same position across steps,
    computed from the union graph (the reference computes it from the
    final cumulative graph — same positions)."""
    os.makedirs(directory, exist_ok=True)
    steps = [
        r[0]
        for r in edges_df.select(step_col).distinct()
        .orderBy(step_col).limit(max_steps).collect()
    ]
    layout = None
    if stable_layout:
        union = _collect_edges(
            edges_df.groupBy(src, dst).sum(weight)
            .withColumnRenamed(f"sum({weight})", weight),
            src, dst, weight, max_edges,
        )
        nodes = sorted({v for e in union for v in e[:2]})
        layout = spring_layout(nodes, union, seed=seed)
    paths = []
    for step in steps:
        sub = edges_df.filter(edges_df[step_col] == step)
        e = _collect_edges(sub, src, dst, weight, max_edges)
        if layout is not None:
            e = [t for t in e if t[0] in layout and t[1] in layout]
        svg = graph_to_svg(e, seed=seed, layout=layout)
        p = os.path.join(directory, f"graph_{step}.svg")
        with open(p, "w", encoding="utf-8") as fh:
            fh.write(svg)
        paths.append(p)
    return paths
