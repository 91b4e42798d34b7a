"""Bloom semi-join reduction invariants (operators/bloom.py): the classic
no-false-negative guarantee, pruning effectiveness within the theoretical
false-positive envelope, and the empty-build edge."""

import pyspark.sql.functions as F
import pytest

from hnsw_spark.operators.bloom import bloom_build, bloom_prune


@pytest.fixture(scope="module")
def frames(spark):
    build = spark.range(0, 200).selectExpr("id AS k")
    # probe: the 200 true keys plus 1800 misses
    probe = spark.range(0, 2000).selectExpr("id AS k", "id * 10 AS payload")
    return build, probe


def test_no_false_negatives(spark, frames):
    build, probe = frames
    cand = bloom_prune(probe, bloom_build(build, "k"), "k")
    missed = (
        probe.join(build, "k", "left_semi")
        .join(cand.select("k"), "k", "left_anti")
        .count()
    )
    assert missed == 0


def test_pruning_within_fp_envelope(spark, frames):
    build, probe = frames
    bl = bloom_build(build, "k")
    n_set = bl.collect()[0].n_set_bits
    # 200 keys x 4 hashes, 32768 bits: collisions only ever LOWER n_set
    assert 0 < n_set <= 800
    cand = bloom_prune(probe, bl, "k").count()
    # 200 true hits + fp-bounded remainder: p_fp = (n_set/m)^4 over 1800
    # non-members; 10x the expectation leaves room for hash variance while
    # still failing loudly if the membership test is broken (e.g. always
    # true -> 2000 candidates)
    fp_bound = 1800 * (n_set / 32768.0) ** 4
    assert 200 <= cand <= 200 + max(10 * fp_bound, 5)


def test_empty_build_side_prunes_everything(spark, frames):
    _, probe = frames
    empty = spark.range(0).selectExpr("id AS k")
    assert bloom_prune(probe, bloom_build(empty, "k"), "k").count() == 0


def test_probe_columns_survive(spark, frames):
    build, probe = frames
    cand = bloom_prune(probe, bloom_build(build, "k"), "k")
    assert cand.columns == ["k", "payload"]
