"""Leave-one-out target encoding: hand-checked LOO/smoothing/fallback
semantics plus hypothesis parity against a pure-Python model."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hnsw_spark.operators.encoding import target_encode_loo

_SCHEMA = "row_id long, cat string, y double"


def _q(v: float, scale: int = 4) -> int:
    return int(math.floor(v * 10**scale + 0.5))


def _model(rows, alpha, scale=4):
    qs = [(_q(y, scale)) for _, _, y in rows]
    gmean = sum(qs) // len(qs)
    by_cat: dict = {}
    for (rid, cat, y), q in zip(rows, qs):
        by_cat.setdefault(cat, []).append(q)
    out = {}
    for (rid, cat, y), q in zip(rows, qs):
        peers = by_cat[cat]
        if cat is None or len(peers) <= 1:
            out[rid] = gmean
        else:
            out[rid] = (sum(peers) - q + alpha * gmean) // (
                len(peers) - 1 + alpha
            )
    return out


def test_loo_excludes_own_label_and_thin_cat_falls_back(spark):
    rows = [
        (1, "a", 1.0),
        (2, "a", 3.0),
        (3, "b", 100.0),  # lone category -> global mean
        (4, None, 2.0),   # NULL category -> global mean
    ]
    got = {
        r.row_id: r.te_fp
        for r in target_encode_loo(
            spark.createDataFrame(rows, _SCHEMA), "cat", "y", alpha=0
        ).collect()
    }
    gmean = (_q(1.0) + _q(3.0) + _q(100.0) + _q(2.0)) // 4
    # with alpha=0: row 1 sees only row 2's label, and vice versa
    assert got[1] == _q(3.0) and got[2] == _q(1.0)
    assert got[3] == gmean and got[4] == gmean
    assert got == _model(rows, alpha=0)


def test_null_targets_are_not_label_evidence(spark):
    # a NULL-target row must (a) encode as the global mean itself and
    # (b) leave its peers' LOO stats untouched — it is not label evidence
    # (ADVICE r6: count(_y), not count(*))
    with_null = [
        (1, "a", 1.0),
        (2, "a", 3.0),
        (3, "a", None),  # unlabeled row in a labeled category
        (4, "b", 5.0),
    ]
    got = {
        r.row_id: r.te_fp
        for r in target_encode_loo(
            spark.createDataFrame(with_null, _SCHEMA), "cat", "y", alpha=0
        ).collect()
    }
    # global mean over LABELED rows only
    gmean = (_q(1.0) + _q(3.0) + _q(5.0)) // 3
    assert got[3] == gmean  # NULL target -> global mean, never NULL
    assert got[4] == gmean  # lone labeled category -> global mean
    # peers see exactly the same encoding as if row 3 did not exist
    without_null = [(1, "a", 1.0), (2, "a", 3.0), (4, "b", 5.0)]
    base = {
        r.row_id: r.te_fp
        for r in target_encode_loo(
            spark.createDataFrame(without_null, _SCHEMA), "cat", "y", alpha=0
        ).collect()
    }
    assert got[1] == base[1] and got[2] == base[2]


def test_smoothing_shrinks_toward_global_mean(spark):
    rows = [(1, "a", 0.0), (2, "a", 0.0), (3, "b", 10.0), (4, "b", 10.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    sharp = {
        r.row_id: r.te_fp
        for r in target_encode_loo(df, "cat", "y", alpha=0).collect()
    }
    smooth = {
        r.row_id: r.te_fp
        for r in target_encode_loo(df, "cat", "y", alpha=50).collect()
    }
    gmean = _q(5.0)
    for rid in (1, 2):  # low category pulled UP toward the global mean
        assert sharp[rid] < smooth[rid] <= gmean
    for rid in (3, 4):  # high category pulled DOWN
        assert sharp[rid] > smooth[rid] >= gmean


def test_unseen_category_encodes_as_global_mean(spark):
    """ADVICE r10 (medium): a row whose category is ABSENT from the stats
    table (left-join miss → NULL _cat_n) must fall back to the global
    mean, never NULL — under BOTH evidence contracts."""
    from hnsw_spark.operators.encoding import category_stats, encode_with_stats

    evidence = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0)], _SCHEMA
    )
    stats = category_stats(evidence, "cat", "y")
    gmean = (_q(1.0) + _q(3.0) + _q(5.0)) // 3
    serving = spark.createDataFrame(
        [(10, "zzz", 4.0), (11, "zzz", None), (12, "a", None)], _SCHEMA
    )
    for row_in_stats in (True, False):
        got = {
            r.row_id: r.te_fp
            for r in encode_with_stats(
                serving, stats, "cat", "y", alpha=0,
                row_in_stats=row_in_stats,
            ).collect()
        }
        assert got[10] == gmean, row_in_stats  # unseen category, has label
        assert got[11] == gmean, row_in_stats  # unseen category, no label


def test_serving_rows_outside_evidence_use_plain_mean(spark):
    """ADVICE r10 (medium): with row_in_stats=False nothing is subtracted —
    a serving row's label must not remove evidence it never added."""
    from hnsw_spark.operators.encoding import category_stats, encode_with_stats

    evidence = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0)], _SCHEMA
    )
    stats = category_stats(evidence, "cat", "y")
    gmean = (_q(1.0) + _q(3.0) + _q(5.0)) // 3
    serving = spark.createDataFrame(
        [(20, "a", 100.0), (21, "a", None), (22, "b", 7.0)], _SCHEMA
    )
    got = {
        r.row_id: r.te_fp
        for r in encode_with_stats(
            serving, stats, "cat", "y", alpha=0, row_in_stats=False
        ).collect()
    }
    # plain category mean of the EVIDENCE, independent of the row's label
    assert got[20] == got[21] == (_q(1.0) + _q(3.0)) // 2
    # n=1 categories are usable evidence under the plain-mean contract
    # (only n=0/unseen falls back); with alpha>0 they'd shrink toward gmean
    assert got[22] == _q(5.0)
    # the LOO contract on the same rows would instead subtract the label —
    # pin that the two contracts genuinely differ on out-of-evidence rows
    loo = {
        r.row_id: r.te_fp
        for r in encode_with_stats(
            serving, stats, "cat", "y", alpha=0, row_in_stats=True
        ).collect()
    }
    assert loo[20] != got[20]
    assert loo[22] == gmean  # _cat_n <= 1 under LOO -> global mean


@pytest.mark.slow
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    max_examples=8,
    deadline=None,
)
def test_target_encode_matches_python_model(spark, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 40))
    alpha = int(rng.integers(0, 30))
    rows = [
        (
            int(i),
            str(rng.choice(["a", "b", "c"])) if rng.random() > 0.1 else None,
            float(np.round(rng.uniform(0, 100), 3)),  # non-negative targets
        )
        for i in range(n)
    ]
    got = {
        r.row_id: r.te_fp
        for r in target_encode_loo(
            spark.createDataFrame(rows, _SCHEMA), "cat", "y", alpha=alpha
        ).collect()
    }
    assert got == _model(rows, alpha=alpha), (seed, alpha)
