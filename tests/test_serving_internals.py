"""Direct policy tests for the result-serving internals in engine/core.py.

These pin the exact contracts the round-7 serving rewrite changed blind
(VERDICT r7 items #1/#2): ``sc.runJob``'s per-partition FLATTENING of
returned iterables, the exact-byte group planner's three branches, the
adaptive ``_grouped_pull`` growth policy, and the pid↔partition-index
invariant guard's negative case. The fake-SparkContext tests run without a
JVM so the policy branches stay cheap to exercise; ``_sized_partitions``
and the guard run against the real session because runJob semantics are
the thing under test.
"""

import pytest

from datafusion_flight_sql_server_spark.engine.core import (
    _PULL_BUDGET,
    Engine,
    _grouped_pull,
    _plan_groups_by_bytes,
    _sized_partitions,
)

MB = 1 << 20


class _SizedBytes:
    """len()-able stand-in for a large IPC blob without allocating it."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self) -> int:
        return self.n


class _FakeRow:
    def __init__(self, n: int):
        self.ipc = _SizedBytes(n)


class _FakeSC:
    """Records the partition list of every runJob call; returns one fake
    row per requested partition with the configured blob size."""

    def __init__(self, sizes: list):
        self.sizes = sizes
        self.calls: list = []

    def runJob(self, rdd, func, parts):
        self.calls.append(list(parts))
        return [_FakeRow(self.sizes[p]) for p in parts]


# -- _plan_groups_by_bytes ---------------------------------------------------


class TestPlanGroupsByBytes:
    def test_budget_split_exact(self):
        # 5 partitions of 50 each under budget 120 -> [2, 2, 1]: each
        # group's TRUE bytes stay <= budget.
        groups = _plan_groups_by_bytes([0, 1, 2, 3, 4], [50] * 5, budget=120)
        assert groups == [[0, 1], [2, 3], [4]]
        for g in groups:
            assert sum(50 for _ in g) <= 120

    def test_oversized_partition_gets_own_group(self):
        # A single over-budget partition must land on the driver whole:
        # it forms its own group and does not absorb neighbours.
        groups = _plan_groups_by_bytes([0, 1, 2], [10, 500, 10], budget=100)
        assert groups == [[0], [1], [2]]

    def test_task_cap_64(self):
        # Zero-byte partitions would otherwise form one giant group; the
        # per-job task cap bounds scheduler payload at 64.
        groups = _plan_groups_by_bytes(list(range(150)), [0] * 150, budget=100)
        assert [len(g) for g in groups] == [64, 64, 22]
        assert [p for g in groups for p in g] == list(range(150))

    def test_groups_are_contiguous_and_complete(self):
        parts = list(range(17))
        groups = _plan_groups_by_bytes(parts, [30] * 17, budget=100)
        assert [p for g in groups for p in g] == parts


# -- _grouped_pull policy ----------------------------------------------------


class TestGroupedPull:
    def test_observed_plus_one_caps_first_group(self):
        # With only the 1-partition probe observed, the first pull may not
        # exceed 2 partitions even though the default group is 4: the byte
        # cap's denominator must rest on a sample at least group-sized.
        sc = _FakeSC([1 * MB] * 12)
        list(_grouped_pull(sc, None, list(range(12)), max_part=1 * MB))
        assert len(sc.calls[0]) == 2

    def test_probe_observation_carries_over(self):
        # execute_stream passes observed=probed: a 5-partition probe
        # licenses the full default group of 4 immediately.
        sc = _FakeSC([1 * MB] * 12)
        list(
            _grouped_pull(
                sc, None, list(range(12)), max_part=1 * MB, observed=5
            )
        )
        assert len(sc.calls[0]) == 4

    def test_group_grows_while_small(self):
        # Tiny pulls quadruple the group (bounded by observed+1) so
        # job-launch latency amortizes; growth is monotone until caps bind.
        sc = _FakeSC([1024] * 40)
        list(_grouped_pull(sc, None, list(range(40)), max_part=1024))
        lens = [len(c) for c in sc.calls]
        assert lens[0] == 2
        # Monotone growth except the final call, which pulls whatever
        # remainder is left.
        body = lens[:-1]
        assert all(b >= a for a, b in zip(body, body[1:]))
        assert max(lens) > 2

    def test_over_budget_pull_drops_to_one(self):
        # A size cliff: the pull that blows the budget forces the NEXT
        # group to exactly 1, not a halving.
        big = (_PULL_BUDGET // 2) + MB
        sc = _FakeSC([big] * 6)
        # max_part lies small, as an observation-based caller's would
        # before the cliff is visible.
        list(_grouped_pull(sc, None, list(range(6)), max_part=1 * MB))
        assert len(sc.calls[0]) == 2  # 2 * big > budget -> over-budget
        assert len(sc.calls[1]) == 1

    def test_byte_cap_from_max_part(self):
        # Once a large partition is observed, budget // (2 * max_part)
        # bounds every subsequent group.
        half = _PULL_BUDGET // 2
        sc = _FakeSC([half] * 8)
        list(_grouped_pull(sc, None, list(range(8)), max_part=half))
        assert all(len(c) == 1 for c in sc.calls)

    def test_all_partitions_pulled_exactly_once(self):
        sc = _FakeSC([1024] * 23)
        rows = list(_grouped_pull(sc, None, list(range(23)), max_part=1024))
        assert len(rows) == 23
        assert [p for c in sc.calls for p in c] == list(range(23))


# -- _sized_partitions: real runJob flatten semantics ------------------------


class TestSizedPartitions:
    def test_one_element_per_partition(self, spark):
        """Pins the r7 regression: runJob is mapPartitions + collect, so it
        FLATTENS each partition's returned iterable. ``_sized_partitions``
        must therefore return exactly len(parts) elements, each a
        (sizes, pids) pair — never 2N interleaved lists."""
        from pyspark.sql import Row

        sc = spark.sparkContext
        data = [Row(pid=i // 3, ipc=bytes(i + 1)) for i in range(12)]
        rdd = sc.parallelize(data, 4)
        parts = list(range(4))
        sizes = _sized_partitions(sc, rdd, parts)
        assert len(sizes) == len(parts)
        for part_sizes, part_pids in sizes:
            assert isinstance(part_sizes, list)
            assert isinstance(part_pids, list)
            assert all(isinstance(s, int) for s in part_sizes)
        assert sum(s for ps, _ in sizes for s in ps) == sum(
            len(r.ipc) for r in data
        )

    def test_subset_of_partitions(self, spark):
        from pyspark.sql import Row

        sc = spark.sparkContext
        rdd = sc.parallelize(
            [Row(pid=0, ipc=b"abc"), Row(pid=1, ipc=b"de")], 2
        )
        sizes = _sized_partitions(sc, rdd, [1])
        assert len(sizes) == 1


# -- pid invariant guard: negative case --------------------------------------


class TestPidInvariantGuard:
    def test_mistagged_partition_raises(self, spark):
        """A staged relation whose pid tags disagree with the physical
        partition index must RAISE (bucket mapping would silently drop or
        duplicate data), not stream."""
        import pyarrow as pa

        sc = spark.sparkContext
        # Two physical partitions, both tagged pid=0: partition 1's tag is
        # wrong by construction.
        rdd = sc.parallelize([(0, b"x"), (0, b"y")], 2)
        staged = spark.createDataFrame(rdd, "pid int, ipc binary")
        schema = pa.schema([("a", pa.int64())])
        gen = Engine.stream_result_bucket(
            staged, bucket=0, n_buckets=1, schema=schema, batch_rows=1024
        )
        with pytest.raises(RuntimeError, match="pid"):
            list(gen)


# -- Connect degradation ------------------------------------------------------


class TestConnectDegradation:
    def test_no_rdd_access_degrades_to_one_bucket(self, spark):
        """A session without RDD access (Spark Connect) must get exactly
        ONE bucket — reference parity — because the bucket fallback would
        otherwise pid-filter-rescan the staged relation once per bucket."""
        from datafusion_flight_sql_server_spark.engine.core import Engine

        class _ConnectLikeDF:
            """Delegates plan building but denies sparkContext, like a
            Connect-session DataFrame."""

            def __init__(self, df):
                self._df = df

            def mapInArrow(self, *a, **k):
                return self._df.mapInArrow(*a, **k)

            @property
            def sparkSession(self):
                class _S:
                    @property
                    def sparkContext(self):
                        raise RuntimeError("Connect: no sparkContext")

                return _S()

        eng = Engine(spark)
        df = spark.range(100).selectExpr("id", "id * 2 AS v")
        staged, n = eng.prepare_partitioned_result(
            _ConnectLikeDF(df), max_endpoints=4
        )
        try:
            assert n == 1
        finally:
            staged.unpersist()
        # classic sessions keep the configured bucket count
        staged2, n2 = eng.prepare_partitioned_result(df, max_endpoints=4)
        try:
            assert n2 == 4
        finally:
            staged2.unpersist()


# -- _PullBudgetPool (round 9: aggregate budget across concurrent pulls) ------


class TestPullBudgetPool:
    """VERDICT r8 "what's wrong" #1: the per-stream 128 MB group budget
    let N concurrent DoGets pin N x 128 MB on the driver. The shared pool
    bounds AGGREGATE in-flight pull bytes; these pin its semantics."""

    def _pool(self, total):
        from datafusion_flight_sql_server_spark.engine.core import (
            _PullBudgetPool,
        )

        return _PullBudgetPool(total)

    def test_acquire_clamps_to_total(self):
        pool = self._pool(100)
        # an over-pool single group must land whole regardless: clamp,
        # wait for an empty pool, proceed alone
        assert pool.acquire(10_000) == 100
        pool.release(100)
        assert pool.acquire(0) == 1  # degenerate sizes still account

    def test_peak_tracks_high_water_mark(self):
        pool = self._pool(100)
        a = pool.acquire(40)
        b = pool.acquire(50)
        pool.release(a)
        c = pool.acquire(10)
        assert pool.peak == 90
        pool.release(b)
        pool.release(c)

    def test_second_stream_blocks_until_release(self):
        import threading
        import time

        pool = self._pool(100)
        t0 = pool.acquire(80)
        got = []

        def taker():
            got.append(pool.acquire(80))

        th = threading.Thread(target=taker)
        th.start()
        time.sleep(0.1)
        assert not got  # blocked: 80 + 80 > 100
        pool.release(t0)
        th.join(10)
        assert got == [80]
        pool.release(80)

    def test_interrupted_waiter_leaves_no_orphan_ticket(self):
        """Code-review round 10: an exception raised while a FIFO waiter
        sleeps (KeyboardInterrupt in an embedder's main thread is the
        realistic case) must remove its ticket — a leaked queue HEAD
        would deadlock every later acquire on the shared pool."""
        pool = self._pool(100)
        held = pool.acquire(100)  # drain so the next acquire must wait

        calls = {"n": 0}
        orig_wait = pool._cv.wait

        def raising_wait(*a, **k):
            calls["n"] += 1
            raise RuntimeError("interrupted in wait")

        pool._cv.wait = raising_wait
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            pool.acquire(10)
        pool._cv.wait = orig_wait
        assert calls["n"] == 1
        assert not pool._waiters  # ticket removed on the way out
        pool.release(held)
        assert pool.acquire(100) == 100  # pool still fully grantable
        pool.release(100)

    def test_grouped_pull_draws_from_shared_pool(self):
        """Two interleaved _grouped_pull streams never exceed the pool
        total even though each alone is entitled to a full group budget."""
        import threading

        from datafusion_flight_sql_server_spark.engine import core

        saved = core._PULL_POOL
        pool = self._pool(3 * MB)
        core._PULL_POOL = pool
        try:
            sizes = [1 * MB] * 8
            barrier = threading.Barrier(2)
            errors = []

            def stream():
                try:
                    barrier.wait()
                    sc = _FakeSC(sizes)
                    for _ in _grouped_pull(
                        sc, None, list(range(8)), max_part=1 * MB
                    ):
                        pass
                except Exception as exc:  # pragma: no cover
                    errors.append(exc)

            threads = [threading.Thread(target=stream) for _ in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(60)
            assert not errors
            assert 0 < pool.peak <= pool.total
        finally:
            core._PULL_POOL = saved

    def test_execute_stream_draws_from_shared_pool(self, spark):
        """The adaptive (uncached) serving path accounts its sized pulls
        against the same aggregate pool as the bucket streams — only the
        blind <=8-partition probe is exempt (documented)."""
        from datafusion_flight_sql_server_spark.engine import core

        eng = Engine(spark)
        # >8 partitions so pulls continue past the probe window
        df = spark.range(0, 200_000, 1, 24).selectExpr(
            "id", "CAST(id % 7 AS STRING) AS s"
        )
        saved = core._PULL_POOL
        pool = core._PullBudgetPool(core._PULL_POOL_TOTAL)
        core._PULL_POOL = pool
        try:
            total = sum(b.num_rows for b in eng.execute_stream(df))
        finally:
            core._PULL_POOL = saved
        assert total == 200_000
        assert pool.peak > 0, "no post-probe pull reserved from the pool"
        assert pool.peak <= pool.total
