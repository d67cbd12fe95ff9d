"""Salted-join tests: identical semantics to the plain join, and the salt
actually reaches the shuffle key (each hot key spread across partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.operators.skew import salted_join
from tests.conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang"
    )
    dim = d.groupBy("lang").agg(F.count("*").alias("lang_total"))
    salted = salted_join(d, dim, ["lang"], "doc_id", n_salts=8)
    plain = d.join(dim, "lang")
    assert salted.count() == plain.count()
    assert (
        salted.exceptAll(plain.select(salted.columns)).count() == 0
        and plain.select(salted.columns).exceptAll(salted).count() == 0
    )


def test_salt_reaches_the_shuffle_key(spark):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang"
    )
    dim = d.groupBy("lang").agg(F.count("*").alias("lang_total"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(d, dim, ["lang"], "doc_id", n_salts=8)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        # the shuffle must hash on (lang, __salt), not lang alone
        assert "__salt" in plan.split("hashpartitioning", 1)[1].split(")", 1)[0]
        # and a hot key's rows must occupy >1 salt bucket
        spread = (
            salted.groupBy("lang")
            .agg(
                F.countDistinct(
                    F.pmod(F.xxhash64("doc_id"), F.lit(8))
                ).alias("n_buckets")
            )
            .agg(F.min("n_buckets"))
            .first()[0]
        )
        assert spread > 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
