"""Connected-components edge semantics (operators/components.py).

Oracle parity covers the minhash-derived graph; these pin the algorithm:
transitive chains longer than one hop (multiple propagation rounds),
component isolation, and min-id labeling.
"""

from datafusion_flight_sql_server_spark.operators.components import (
    connected_components,
)


class TestConnectedComponents:
    def test_chain_two_components_min_label(self, spark):
        # 7-5-3-1 is a chain (needs >1 round to converge); {10, 20} separate
        edges = spark.createDataFrame(
            [(7, 5), (5, 3), (3, 1), (20, 10)],
            "src bigint, dst bigint",
        )
        got = {
            (r.node, r.cluster_id)
            for r in connected_components(edges).collect()
        }
        assert got == {
            (1, 1), (3, 1), (5, 1), (7, 1),
            (10, 10), (20, 10),
        }

    def test_single_edge_and_symmetry(self, spark):
        # direction must not matter
        edges = spark.createDataFrame([(2, 9)], "src bigint, dst bigint")
        got = {
            (r.node, r.cluster_id)
            for r in connected_components(edges).collect()
        }
        assert got == {(2, 2), (9, 2)}
