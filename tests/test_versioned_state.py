"""The shared versioned-state protocol (streaming/state.py): atomic
name-encoded commits, replay idempotency, delta folds, compaction, and
O(batch) delta writes — the r12 verdict's streaming-state hardening."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_aws_spark.streaming.state import VersionedState


def _mk(spark, root):
    return VersionedState(spark, str(root))


def test_uncommitted_version_is_invisible(spark, tmp_path):
    """Crash between tree write and commit record: the half-written
    version must be ignored by every reader — version(), read_union,
    read_latest_wins all resolve to the last COMMITTED version."""
    st = _mk(spark, tmp_path / "st")
    df0 = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    st.write_tree(df0, 0, "t")
    st.commit(0, batch_id=-1, base=0)
    # crash point: v1 trees fully written, commit record never created
    st.write_tree(spark.createDataFrame([(1, 99)], "k int, v int"), 1, "t")
    assert st.version() == 0
    got = sorted(map(tuple, st.read_latest_wins("t", ["k"]).collect()))
    assert got == [(1, 10), (2, 20)]
    # the replay overwrites its own partial output and commits
    st.write_tree(spark.createDataFrame([(1, 11)], "k int, v int"), 1, "t")
    st.commit(1, batch_id=0)
    assert st.version() == 1
    got = sorted(map(tuple, st.read_latest_wins("t", ["k"]).collect()))
    assert got == [(1, 11), (2, 20)]


def test_already_folded_guards_replay(spark, tmp_path):
    """Crash AFTER the commit record but before the streaming checkpoint
    offset commit: the replay (same batch_id — Structured Streaming's
    contract) must be a no-op, not a double fold."""
    st = _mk(spark, tmp_path / "st")
    st.write_tree(spark.createDataFrame([(1, 1)], "k int, v int"), 0, "t")
    st.commit(0, batch_id=-1, base=0)
    assert not st.already_folded(0)
    st.write_tree(spark.createDataFrame([(2, 2)], "k int, v int"), 1, "t")
    st.commit(1, batch_id=0)
    assert st.already_folded(0)  # the replayed batch returns early
    assert not st.already_folded(1)  # the next real batch still folds


def test_read_before_any_commit_raises(spark, tmp_path):
    st = _mk(spark, tmp_path / "st")
    with pytest.raises(FileNotFoundError):
        st.read_union("t")
    assert st.version() == -1


def test_latest_wins_and_append_folds(spark, tmp_path):
    st = _mk(spark, tmp_path / "st")
    st.write_tree(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), 0, "t"
    )
    st.commit(0, batch_id=-1, base=0)
    st.write_tree(spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), 1, "t")
    st.commit(1, batch_id=0)
    lw = sorted(map(tuple, st.read_latest_wins("t", ["k"]).collect()))
    assert lw == [(1, "a"), (2, "B"), (3, "c")]
    ap = sorted(map(tuple, st.read_append("t").collect()))
    assert ap == [(1, "a"), (2, "B"), (2, "b"), (3, "c")]


def test_compact_folds_chain_and_gcs(spark, tmp_path):
    import posixpath

    from etl_aws_spark import fsutil

    root = str(tmp_path / "st")
    st = _mk(spark, root)
    for v, rows in enumerate([[(1, 10), (2, 20)], [(2, 21)], [(3, 30)]]):
        st.write_tree(spark.createDataFrame(rows, "k int, v int"), v, "t")
        st.commit(v, batch_id=v - 1, base=0 if v == 0 else None)
    before = sorted(map(tuple, st.read_latest_wins("t", ["k"]).collect()))
    new_base = st.compact({"t": st.read_latest_wins("t", ["k"])})
    assert new_base == 3
    # pre-base version dirs are gone; the fold result is unchanged
    for v in range(3):
        assert not fsutil.exists(spark, posixpath.join(root, "v%d" % v))
    after = sorted(map(tuple, st.read_latest_wins("t", ["k"]).collect()))
    assert after == before == [(1, 10), (2, 21), (3, 30)]
    # the replay guard survives compaction (batch_id carried forward)
    assert st.already_folded(1) and not st.already_folded(2)


def test_lifecycle_compaction_preserves_results(spark, tmp_path):
    """End-to-end: both streaming lifecycles' compaction folds the delta
    chain without changing served results (the compaction-drift
    contract, now on the shared module)."""
    from etl_aws_spark.registry import load
    from etl_aws_spark.streaming import maintenance as mt

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings").select("vec_id", "embedding", "label")
    is_delta = F.pmod(F.col("vec_id"), F.lit(40)) == 7
    old, delta = emb.filter(~is_delta), emb.filter(is_delta)
    landing, state, ckpt = (str(tmp_path / d) for d in ("in", "st", "ck"))
    mt.init_state(spark, old, state, 64, k=5, budget=200)
    delta.coalesce(1).write.mode("append").parquet(landing)
    mt.run_maintenance_pass(spark, emb, landing, state, ckpt, 64, k=5, budget=200)
    before = sorted(map(tuple, mt.read_final_topk(spark, state, k=5).collect()))
    mt.compact_state(spark, state)
    after = sorted(map(tuple, mt.read_final_topk(spark, state, k=5).collect()))
    assert after == before


def test_delta_writes_are_batch_sized(spark, tmp_path):
    """The r12 verdict's O(batch) criterion, pinned structurally: after a
    small tranche folds into a large committed clustering state, the new
    version's labels delta holds ~|batch| rows, NOT ~|corpus| (the old
    snapshot layout rewrote every doc ever seen)."""
    from etl_aws_spark.registry import load
    from etl_aws_spark.streaming import clustering as cl

    sf = "/root/testdata/sf0.01"
    docs = load(spark, sf, "documents").select("doc_id", "text")
    # the small tranche carries HIGH ids only: min-label components mean a
    # batch introducing a new global-minimum id genuinely relabels every
    # doc it reaches (an honest O(component) delta), which is not the
    # write-amplification this test pins
    big = docs.filter(F.col("doc_id") % 50 != 49)
    small = docs.filter(F.col("doc_id") % 50 == 49)  # ~2% of the corpus
    landing, state, ckpt = (str(tmp_path / d) for d in ("in", "st", "ck"))
    cl.init_state(spark, state)
    big.coalesce(1).write.mode("append").parquet(landing)
    cl.run_clustering_pass(spark, landing, state, ckpt)
    small.coalesce(1).write.mode("append").parquet(landing)
    cl.run_clustering_pass(spark, landing, state, ckpt)
    st = VersionedState(spark, state)
    assert st.version() == 2
    n_big, n_small = big.count(), small.count()
    delta_rows = spark.read.parquet(st.tree_path(2, "labels")).count()
    # the delta carries the batch plus any docs its arrival merged — far
    # below the corpus (a full rewrite would be n_big + n_small rows)
    assert delta_rows < n_small + 0.2 * n_big
    # and the fold still serves every doc
    assert cl.read_clusters(spark, state).count() == n_big + n_small
