"""Property-based tests (hypothesis) for the custom composite operators.

The reference ships no property tests (SURVEY.md §5); these go beyond its
strategy for the operators whose semantics are easiest to get subtly wrong —
the as-of join's tie/duplicate handling and the chunker's window geometry —
by checking them against independent reference implementations (pandas
merge_asof, pure-Python slicing) on adversarial generated inputs.

Examples are capped low: every example runs Spark jobs, so the budget goes
to input shape diversity (duplicate timestamps, empty sides, single-key
collisions) rather than volume.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_flight_sql_server_spark.operators.asof import asof_join
from datafusion_flight_sql_server_spark.queries.extensions import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
)

# Tight domains force collisions: 2 keys, 8 coarse timestamps → duplicate
# (key, ts) pairs and exact left/right timestamp ties appear in most runs.
_ts = st.integers(min_value=0, max_value=7)
_key = st.integers(min_value=0, max_value=1)
_left_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _key, _ts), min_size=0, max_size=12
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _key, _ts, st.floats(0, 100, width=32)),
    min_size=0,
    max_size=12,
)


def _asof_reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Backward-inclusive as-of via pandas merge_asof, with the operator's
    documented duplicate rule: one right row per (key, ts), max event_id
    wins with its value taken atomically."""
    if len(right):
        right = (
            right.sort_values(["user_id", "ts", "event_id"])
            .groupby(["user_id", "ts"], as_index=False)
            .last()
        )
    out = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "ts_r", "event_id": "event_id_r", "value": "value_r"}
        ),
        left_on="ts",
        right_on="ts_r",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # purchase_id doubles as a unique left row id so rows compare 1:1
    left = [(i, k, ts) for i, (_, k, ts) in enumerate(left)]
    lpdf = pd.DataFrame(left, columns=["purchase_id", "user_id", "ts"]).astype(
        {"purchase_id": "int64", "user_id": "int64", "ts": "int64"}
    )
    rpdf = pd.DataFrame(
        right, columns=["event_id", "user_id", "ts", "value"]
    ).astype(
        {"event_id": "int64", "user_id": "int64", "ts": "int64", "value": "float64"}
    )

    ldf = spark.createDataFrame(
        lpdf, schema="purchase_id long, user_id long, ts long"
    )
    rdf = spark.createDataFrame(
        rpdf, schema="event_id long, user_id long, ts long, value double"
    )
    got = (
        asof_join(ldf, rdf, on="user_id", ts_col="ts")
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    want = (
        _asof_reference(lpdf, rpdf)
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(lpdf)
    for col in ("ts_r", "event_id_r", "value_r"):
        g, w = got[col], want[col] if col in want else pd.Series(dtype=float)
        assert list(g.isna()) == list(w.isna()), f"{col} null mask"
        pd.testing.assert_series_equal(
            g.dropna().astype(float).reset_index(drop=True),
            w.dropna().astype(float).reset_index(drop=True),
            check_names=False,
        )


_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=200
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(words=_words)
def test_doc_chunk_geometry_reconstructs_document(spark, words):
    """Every document must be exactly reconstructable from its chunks:
    the first `stride` words of each chunk plus the tail of the final
    chunk concatenate back to the original token sequence, and chunk
    indices are dense from 0."""
    from datafusion_flight_sql_server_spark.functions.text import chunk_words

    text = " ".join(words)
    doc = spark.createDataFrame(
        [(1, text)], schema="doc_id long, text string"
    )
    chunks = (
        chunk_words(doc, chunk=CHUNK_WORDS, stride=CHUNK_STRIDE)
        .toPandas()
        .sort_values("chunk_idx")
        .reset_index(drop=True)
    )

    assert list(chunks["chunk_idx"]) == list(range(len(chunks)))
    rebuilt: list[str] = []
    for i, row in chunks.iterrows():
        toks = row["chunk_text"].split(" ") if row["chunk_text"] else []
        assert len(toks) == row["n_words"] <= CHUNK_WORDS
        if i < len(chunks) - 1:
            rebuilt.extend(toks[:CHUNK_STRIDE])
        else:
            rebuilt.extend(toks)
    # trailing chunks overlap the document tail; dedupe the overlap by
    # truncating to the original length before comparing
    assert rebuilt[: len(words)] == words


_events = st.lists(
    st.tuples(
        st.integers(0, 1),            # user
        st.integers(0, 10_000),       # epoch second
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_events)
def test_sessionize_matches_python_reference(spark, rows):
    """Gap-based sessionization (30 min) must agree with a sequential
    single-machine reference on session count and per-session bounds."""
    from datafusion_flight_sql_server_spark.streaming.sessionize import (
        sessionize,
    )

    pdf = pd.DataFrame(
        [(i, u, pd.Timestamp(ts, unit="s")) for i, (u, ts) in enumerate(rows)],
        columns=["event_id", "user_id", "ts"],
    )
    df = spark.createDataFrame(pdf, schema="event_id long, user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.session_id, r.n_events, r.duration_s)
        for r in sessionize(df, gap_seconds=1800).collect()
    )

    want = []
    for user, grp in pdf.groupby("user_id"):
        times = sorted(grp["ts"])
        sessions: list[list] = [[times[0]]]
        for t in times[1:]:
            if (t - sessions[-1][-1]).total_seconds() > 1800:
                sessions.append([t])
            else:
                sessions[-1].append(t)
        for sid, sess in enumerate(sessions, start=1):
            want.append(
                (
                    user,
                    sid,
                    len(sess),
                    int((sess[-1] - sess[0]).total_seconds()),
                )
            )
    assert got == sorted(want)
