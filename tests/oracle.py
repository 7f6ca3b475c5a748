"""Independent per-document oracles for parity tests.

These deliberately mirror the *reference* algorithms' shapes
(sequential scans, nested loops, per-doc state —
/root/reference/renard/pipeline/graph_extraction.py:315-369) rather than
the engine's join formulation, so agreement is meaningful. Canonical
ordering (sorted names / (start,end,char) mention order) matches the
engine's documented determinism choices.
"""

from __future__ import annotations

from itertools import combinations

Mention = tuple[str, int, int]  # (char_id, start_idx, end_idx)


def cooccur_edges_oracle(
    mentions: list[Mention],
    dist: int,
    unit: str = "tokens",
    sent_of_token: list[int] | None = None,
    sent_bounds: list[tuple[int, int]] | None = None,
    polarities: list[float] | None = None,
) -> dict[tuple[str, str], tuple[int, float | None]]:
    """Edge weights (and polarity) for one doc, reference-style.

    Returns {(src,dst) sorted pair: (weight, polarity|None)}.
    """
    ms = sorted(mentions, key=lambda m: (m[1], m[2], m[0]))
    # blocks
    blocks: list[tuple[int, int]] = []
    if unit == "tokens":
        for _, s, e in ms:
            blocks.append((s - dist, e + dist))
    elif unit == "sentences":
        assert sent_of_token is not None and sent_bounds is not None
        bl = set()
        nsent = len(sent_bounds)
        for _, s, e in ms:
            s0 = max(0, sent_of_token[s] - dist)
            s1 = min(nsent - 1, sent_of_token[e - 1] + dist)
            bl.add((sent_bounds[s0][0], sent_bounds[s1][1]))
        blocks = sorted(bl)
    else:
        raise ValueError(unit)

    n = len(ms)
    C = [[0] * n for _ in range(n)]
    for bs, be in blocks:
        in_block = []
        for i, (k, s, e) in enumerate(ms):
            if s >= bs and e <= be:
                in_block.append(i)
            if s > be:
                break
        for i, j in combinations(in_block, 2):
            if ms[i][0] == ms[j][0]:
                continue
            C[i][j] = 1

    edges: dict[tuple[str, str], tuple[int, float | None]] = {}
    for i in range(n):
        for j in range(n):
            if not C[i][j]:
                continue
            k1, k2 = ms[i][0], ms[j][0]
            key = (min(k1, k2), max(k1, k2))
            w, p = edges.get(key, (0, None))
            if polarities is not None:
                assert sent_of_token is not None
                si = sent_of_token[ms[i][1]]
                sj = sent_of_token[ms[j][1]]
                between = polarities[si : sj + 1]
                pol = max(between, key=abs)
                p = (p or 0.0) + pol
            edges[key] = (w + 1, p)
    return edges


def rule_ner_oracle(tokens: list[str], gazetteer: set[str]) -> list[tuple[int, int, str]]:
    """Capitalized-run + gazetteer NER: (start, end_exclusive, surface)."""
    import re

    cap = re.compile(r"^[A-Z][a-z']*$")
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        if cap.match(tokens[i]):
            j = i
            while j < n and cap.match(tokens[j]):
                j += 1
            surface = " ".join(tokens[i:j])
            if surface in gazetteer:
                out.append((i, j, surface))
            i = j
        else:
            i += 1
    return out


def bio_decode_oracle(
    tokens: list[str], tags: list[str], resolve_inconsistencies: bool = True
) -> list[tuple[int, int, str]]:
    """Sequential BIO decode, reference semantics (ner_utils.py:126-180):
    any non-I tag closes; any I- continues; I- with nothing open starts
    (when resolving). Returns (start, end_exclusive, tag)."""
    out = []
    cur_tag = None
    cur_start = None
    for i, tag in enumerate(tags):
        if cur_tag is not None and not tag.startswith("I-"):
            out.append((cur_start, i, cur_tag))
            cur_tag = None
            cur_start = None
        if tag.startswith("B-"):
            cur_tag = tag[2:]
            cur_start = i
        elif tag.startswith("I-") and cur_tag is None and resolve_inconsistencies:
            cur_tag = tag[2:]
            cur_start = i
    if cur_tag is not None:
        out.append((cur_start, len(tags), cur_tag))
    return out
