"""Neural-coref block semantics (reference corefs/corefs.py:97-132)
with an injected fake scorer: 512-token-style block split, per-block
prediction, cross-block chain concatenation vs hierarchical merging,
and the rule resolver expressed as one scorer instance."""

from __future__ import annotations

from renard_spark.operators import coref, ner, tokenize
from renard_spark.operators.coref import (
    concat_block_chains,
    make_rule_scorer,
    merge_chains_by_surface,
    model_corefs,
    resolve_doc_corefs,
    split_blocks,
)
from renard_spark.sources import ingest
from renard_spark import corpus, pipeline


def test_split_blocks():
    toks = [f"t{i}" for i in range(10)]
    assert split_blocks(toks, 4) == [
        (0, toks[0:4]), (4, toks[4:8]), (8, toks[8:10])
    ]
    # reference's range(0, len(tokens), bs): zero blocks for zero tokens
    assert split_blocks([], 4) == []


def test_concat_offsets_and_keeps_chains_separate():
    # two blocks, each predicting one chain at relative positions
    block_chains = [[[(0, 1), (2, 3)]], [[(1, 2)]]]
    got = concat_block_chains(block_chains, [0, 5])
    assert got == [[(0, 1), (2, 3)], [(6, 7)]]


def test_hierarchical_merge_by_surface():
    tokens = ["Anna", "ran", ".", "Then", "Anna", "slept", "."]
    # block 1 chain {Anna@0}, block 2 chain {Anna@4}: same surface
    chains = [[(0, 1)], [(4, 5)], [(5, 6)]]
    merged = merge_chains_by_surface(chains, tokens)
    assert sorted(map(tuple, merged)) == [((0, 1), (4, 5)), ((5, 6),)]


def test_resolve_doc_blocks_vs_whole_doc():
    # a scorer that chains every occurrence of 'X' within its block:
    # without merging, block-split produces per-block chains; with
    # merging (or one big block) a single chain
    def scorer(blocks):
        out = []
        for toks in blocks:
            spans = [(i, i + 1) for i, t in enumerate(toks) if t == "X"]
            out.append([spans] if spans else [])
        return out

    tokens = ["X", "a", "b", "X", "c", "X"]
    split = resolve_doc_corefs(tokens, scorer, block_size=2)
    assert split == [[(0, 1)], [(3, 4)], [(5, 6)]]
    merged = resolve_doc_corefs(
        tokens, scorer, block_size=2, hierarchical_merging=True
    )
    assert merged == [[(0, 1), (3, 4), (5, 6)]]
    whole = resolve_doc_corefs(tokens, scorer, block_size=512)
    assert whole == merged


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_block_concat_properties(data):
    n_tokens = data.draw(st.integers(1, 120))
    block_size = data.draw(st.sampled_from([3, 7, 16, 512]))
    tokens = [f"t{i % 9}" for i in range(n_tokens)]
    blocks = split_blocks(tokens, block_size)
    # split covers the doc exactly, in order, without overlap
    assert [t for _, b in blocks for t in b] == tokens
    assert [s for s, _ in blocks] == [
        i * block_size for i in range(len(blocks))
    ]
    # a scorer chaining every block-local token pair: after concat all
    # spans are absolute, in-bounds, and chain counts add up per block
    def scorer(bs):
        return [
            [[(i, i + 1) for i in range(len(b))]] if b else [] for b in bs
        ]

    chains = resolve_doc_corefs(tokens, scorer, block_size)
    assert len(chains) == sum(1 for _, b in blocks if b)
    for chain in chains:
        for s, e in chain:
            assert 0 <= s < e <= n_tokens
    merged = resolve_doc_corefs(
        tokens, scorer, block_size, hierarchical_merging=True
    )
    # merging can only reduce the number of chains, never lose spans
    assert len(merged) <= len(chains)
    assert {sp for c in merged for sp in c} == {
        sp for c in chains for sp in c
    }


def _chain_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault((r.doc_id, r.chain_id), set()).add(
            (r.start_idx, r.end_idx, r.mention_str)
        )
    per_doc = {}
    for (doc, _), chain in out.items():
        per_doc.setdefault(doc, set()).add(frozenset(chain))
    return per_doc


def test_rule_scorer_matches_rule_corefs(spark):
    docs = ingest.normalize_documents(
        corpus.generate_documents(spark, 12, seed=77)
    )
    toks = tokenize.tokens(docs)
    gaz = sorted(pipeline.default_gazetteer())
    single = [g for g in gaz if " " not in g]
    ents = ner.dictionary_ner(toks, single)

    df_path = coref.rule_corefs(toks, ents, max_dist=30)
    doc_toks = tokenize.doc_tokens(toks)
    scorer_path = model_corefs(
        doc_toks,
        lambda: make_rule_scorer(set(single), max_dist=30),
        block_size=1 << 20,  # one block: no chain may straddle blocks
    )
    assert _chain_sets(df_path) == _chain_sets(scorer_path)


def test_model_corefs_block_boundary_behavior(spark):
    doc_toks = spark.createDataFrame(
        [("d1", ["X", "a", "b", "X", "c", "X"])],
        "doc_id string, tokens array<string>",
    )

    def scorer_factory():
        def scorer(blocks):
            return [
                [[(i, i + 1) for i, t in enumerate(toks) if t == "X"]]
                if any(t == "X" for t in toks) else []
                for toks in blocks
            ]
        return scorer

    concat = model_corefs(doc_toks, scorer_factory, block_size=2)
    assert {r.chain_id for r in concat.collect()} == {0, 1, 2}
    merged = model_corefs(
        doc_toks, scorer_factory, block_size=2, hierarchical_merging=True
    )
    rows = merged.collect()
    assert {r.chain_id for r in rows} == {0}
    assert sorted((r.start_idx, r.end_idx) for r in rows) == [
        (0, 1), (3, 4), (5, 6)
    ]


# -- SpacyCoreferee variant (reference corefs/corefs.py:154-322) ------


def test_coreferee_chunk_offsets():
    from renard_spark.operators.coref import coreferee_doc_corefs

    # 12 tokens, chunk size 5 → chunks of 5/5/2; a scorer that chains
    # the first two tokens of every chunk must come back with offsets
    # accumulated across chunks, one chain per chunk (never merged)
    toks = [f"t{i}" for i in range(12)]

    def scorer(chunks):
        return [[[[0], [1]]] if len(c) >= 2 else [] for c in chunks]

    got = coreferee_doc_corefs(toks, scorer, max_chunk_size=5)
    assert got == [[(0, 1), (1, 2)], [(5, 6), (6, 7)], [(10, 11), (11, 12)]]


def test_coreferee_discards_noncontiguous_chain_whole():
    from renard_spark.operators.coref import coreferee_doc_corefs

    toks = [f"t{i}" for i in range(6)]

    def scorer(chunks):
        # chain 0 has a non-contiguous mention {0, 2} → the WHOLE
        # chain is dropped (corefs.py:290-303), even its good mention;
        # chain 1 is clean and must survive; the multi-token subtree
        # mention [3,4] is contiguous → kept as span (3, 5)
        return [[[[0, 2], [5]], [[3, 4]]] for _ in chunks]

    got = coreferee_doc_corefs(toks, scorer, max_chunk_size=None)
    assert got == [[(3, 5)]]


def test_coreferee_blocks_accumulate_offsets(spark):
    from renard_spark.operators.coref import coreferee_corefs

    # two dynamic blocks of 3 and 2 tokens: the second block's chunk
    # starts at global offset 3 (reference chunk_start accumulation)
    df = spark.createDataFrame(
        [("d", ["a", "b", "c", "d", "e"], [["a", "b", "c"], ["d", "e"]])],
        "doc_id string, tokens array<string>, blocks array<array<string>>",
    )

    def factory():
        def scorer(chunks):
            return [[[[0], [1]]] for _ in chunks]

        return scorer

    rows = sorted(
        (r.chain_id, r.start_idx, r.end_idx, r.mention_str)
        for r in coreferee_corefs(
            df, factory, max_chunk_size=10, blocks_col="blocks"
        ).collect()
    )
    assert rows == [
        (0, 0, 1, "a"), (0, 1, 2, "b"),
        (1, 3, 4, "d"), (1, 4, 5, "e"),
    ]
