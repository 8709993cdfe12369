"""Unit tests for distributed connected components."""

from pyspark.sql import functions as F

from etl_aws_spark.operators.graph import connected_components


def _cc(spark, n_vertices, edge_list, **kw):
    verts = spark.createDataFrame([(i,) for i in n_vertices], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = connected_components(verts, edges, **kw)
    return {r.id: r.component_id for r in out.collect()}


def test_two_branches_hooked_to_different_roots_merge(spark):
    # A<B<C<D with edges A-C, C-D, D-B: one-round min-hooking sends C->A
    # and D->B, and pure pointer jumping can never join the two trees.
    got = _cc(spark, [1, 2, 3, 4], [(1, 3), (3, 4), (4, 2)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_long_chain_converges(spark):
    n = 40
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_disjoint_components_and_isolated_vertices(spark):
    got = _cc(
        spark,
        [1, 2, 3, 10, 11, 99],
        [(2, 1), (2, 3), (11, 10), (10, 10)],  # self-loop tolerated
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
