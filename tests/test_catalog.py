"""Catalog API contract: parquet fallback + Iceberg branch dispatch.

The two implementations share one surface (path/exists/write/read/
drop); the contract below runs against whichever backend the session
supports — parquet always, Iceberg when the session has the jars (not
in this sandbox, hence the skip marker on the live-Iceberg test)."""

import pytest

from renard_spark.io import catalog as cat


def _contract(c, spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "doc_id string, v int")
    assert not c.exists("t_contract")
    c.write("t_contract", df)
    assert c.exists("t_contract")
    assert c.read("t_contract").count() == 2
    c.write("t_contract", df, mode="append")
    assert c.read("t_contract").count() == 4
    c.write("t_contract", df, mode="overwrite", bucket_by="doc_id",
            num_buckets=2)
    assert c.read("t_contract").count() == 2
    c.drop("t_contract")
    assert not c.exists("t_contract")


def test_parquet_catalog_contract(spark, tmp_path):
    _contract(cat.get_catalog(spark, str(tmp_path / "cat")), spark)


def test_get_catalog_dispatch(spark, tmp_path, monkeypatch):
    # filesystem path → parquet
    assert isinstance(
        cat.get_catalog(spark, str(tmp_path / "p")), cat.ParquetCatalog
    )
    # dotted name without a configured spark.sql.catalog.<name> → parquet
    assert isinstance(cat.get_catalog(spark, "nosuch.db"), cat.ParquetCatalog)

    # dotted name WITH a configured catalog → Iceberg branch
    created = {}

    class FakeIceberg:
        def __init__(self, spark_, namespace):
            created["ns"] = namespace

    monkeypatch.setattr(cat, "IcebergCatalog", FakeIceberg)
    spark.conf.set("spark.sql.catalog.stage", "fake.IcebergSparkCatalog")
    try:
        got = cat.get_catalog(spark, "stage.kg")
        assert isinstance(got, FakeIceberg) and created["ns"] == "stage.kg"
    finally:
        spark.conf.unset("spark.sql.catalog.stage")


def _has_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_catalog_contract(spark, tmp_path):
    if not _has_iceberg(spark):
        pytest.skip("no Iceberg jars in this environment")
    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
    _contract(cat.get_catalog(spark, "ice.kg"), spark)
