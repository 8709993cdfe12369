"""Transitive closure of LSH canonical assignments."""

from __future__ import annotations

from etl_aws_spark.text import dedup


def test_closure_collapses_chains(spark):
    # chain: 5->3, 3->1, 1->1 ; separate pair 8->7 ; singleton 9
    rows = [(1, 1), (3, 1), (5, 3), (7, 7), (8, 7), (9, 9)]
    df = spark.createDataFrame(rows, "doc_id long, canonical_id long")
    out = dedup.lsh_closure(df, "doc_id").toPandas().set_index("doc_id")
    assert out.loc[5, "canonical_id"] == 1  # two hops resolved
    assert out.loc[3, "canonical_id"] == 1
    assert out.loc[8, "canonical_id"] == 7
    assert out.loc[9, "canonical_id"] == 9
    assert int(out["is_dup"].sum()) == 3


def test_closure_idempotent(spark):
    rows = [(i, max(i - 1, 0)) for i in range(8)]  # long chain 7->6->...->0
    df = spark.createDataFrame(rows, "doc_id long, canonical_id long")
    once = dedup.lsh_closure(df, "doc_id")
    assert set(once.toPandas()["canonical_id"]) == {0}
    again = dedup.lsh_closure(once.drop("is_dup"), "doc_id").toPandas()
    assert set(again["canonical_id"]) == {0}
