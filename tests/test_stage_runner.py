"""Checkpoint/resume semantics of the stage runner."""

import json
import os

import pytest

from renard_spark import corpus
from renard_spark.plans.stage import StageRunner
from renard_spark.io.catalog import get_catalog
from renard_spark.run import build_runner


def test_full_runner_and_resume(spark, tmp_path):
    wd = str(tmp_path / "kg")
    docs = corpus.generate_documents(spark, 10, seed=4)
    runner = build_runner(spark, docs, wd, with_speech=False)
    out = runner.run()
    assert out["triples"].count() > 0
    assert os.path.exists(os.path.join(wd, "_manifest.json"))

    with open(os.path.join(wd, "_manifest.json")) as f:
        m1 = json.load(f)

    # second run: everything fresh → all skipped, manifest unchanged
    runner2 = build_runner(spark, docs, wd, with_speech=False)
    runner2.run()
    with open(os.path.join(wd, "_manifest.json")) as f:
        m2 = json.load(f)
    assert m1 == m2

    # rerun_from recomputes that stage and downstream only
    runner3 = build_runner(spark, docs, wd, with_speech=False)
    runner3.run(rerun_from="unified_mentions")
    with open(os.path.join(wd, "_manifest.json")) as f:
        m3 = json.load(f)
    assert m3["tokens"]["finished_at"] == m1["tokens"]["finished_at"]
    assert m3["unified_mentions"]["finished_at"] > m1["unified_mentions"]["finished_at"]
    assert m3["triples"]["finished_at"] > m1["triples"]["finished_at"]

    # config change invalidates the stage (different hash)
    runner4 = build_runner(spark, docs, wd, with_speech=False,
                           min_appearances=2)
    runner4.run()
    with open(os.path.join(wd, "_manifest.json")) as f:
        m4 = json.load(f)
    assert m4["unified_mentions"]["config_hash"] != m1["unified_mentions"]["config_hash"]

    # metrics table: one row-set per stage materialization
    stages = {r.stage for r in runner.metrics().collect()}
    assert {"tokens", "entities", "unified_mentions", "edges", "triples"} <= stages


def test_check_valid_rejects_missing_dep(spark, tmp_path):
    cat = get_catalog(spark, str(tmp_path / "bad"))
    r = StageRunner(spark, cat, inputs={})
    r.add("b", ["a"], lambda s, a: a)
    with pytest.raises(ValueError, match="needs \\['a'\\]"):
        r.run()
