"""Multimodal plumbing tests: mapInPandas stages, schemas, determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.operators.multimodal import (
    decode_images,
    extract_features,
    resize_meta,
    sample_frames,
    with_blob,
)

from tests.conftest import SF_SMALL


def _docs(spark):
    from datafusion_flight_sql_server_spark.queries.catalog import tables

    return tables(spark, SF_SMALL)["documents"]


class TestDecode:
    def test_decode_matches_direct_hash(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "spark engine")], "doc_id BIGINT, text STRING"
        )
        out = {r.doc_id: r for r in decode_images(with_blob(df)).collect()}
        for doc_id, text in [(1, "hello world"), (2, "spark engine")]:
            digest = hashlib.sha256(text.encode()).hexdigest()
            row = out[doc_id]
            assert row.sha256 == digest
            assert row.n_bytes == len(text.encode())
            assert row.width == int(digest[:4], 16) % 1024 + 1
            assert row.height == int(digest[4:8], 16) % 1024 + 1
            assert row.channels == 3
            assert row.mime == "image/x-fake"

    def test_decode_corpus_deterministic(self, spark):
        blobs = with_blob(_docs(spark))
        a = sorted((r.doc_id, r.sha256) for r in decode_images(blobs).collect())
        b = sorted((r.doc_id, r.sha256) for r in decode_images(blobs).collect())
        assert a == b and len(a) > 0

    def test_plan_is_map_only(self, spark):
        plan = (
            decode_images(with_blob(_docs(spark)))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # zero shuffles: blobs never move


class TestFeatures:
    def test_feature_shape_and_range(self, spark):
        df = spark.createDataFrame([(7, "abc")], "doc_id BIGINT, text STRING")
        row = extract_features(with_blob(df), dim=8).collect()[0]
        assert len(row.feature) == 8
        assert all(0.0 <= v < 1.0 for v in row.feature)
        digest = hashlib.sha256(b"abc").hexdigest()
        assert row.feature[0] == int(digest[:4], 16) / 65536.0


class TestResizeAndFrames:
    def test_resize_preserves_aspect(self, spark):
        decoded = spark.createDataFrame(
            [(1, 1024, 512, 3), (2, 100, 50, 3)],
            "doc_id BIGINT, width BIGINT, height BIGINT, channels BIGINT",
        )
        out = {r.doc_id: r for r in resize_meta(decoded, max_side=256).collect()}
        assert (out[1].target_w, out[1].target_h) == (256, 128)
        assert (out[2].target_w, out[2].target_h) == (100, 50)  # under limit

    def test_sample_frames_every_n(self, spark):
        decoded = spark.createDataFrame(
            [(1, 35)], "doc_id BIGINT, width BIGINT"
        )
        frames = [
            r.frame_idx for r in sample_frames(decoded, "width", every_n=10).collect()
        ]
        assert frames == [0, 10, 20, 30]
