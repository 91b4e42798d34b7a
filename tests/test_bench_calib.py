"""Calib-normalized bench gating (VERDICT r8 #7): the sidecar must carry
per-cell wall ratios vs the r1 baseline divided by the run's host-speed
factor, so the 2x gate reads code, not box contention.

Importing bench is side-effect-free (main() is __main__-guarded)."""

import math

import bench


def test_calib_factor_geomean():
    # a box exactly 2x slower on every reference point -> factor 2.0
    calib = {k: 2.0 * v for k, v in bench._REF_CALIB.items()}
    assert bench._calib_factor(calib) == 2.0
    # the reference box itself -> 1.0
    assert bench._calib_factor(dict(bench._REF_CALIB)) == 1.0
    # mixed drift -> geometric mean of the per-point ratios
    calib = {k: r * v for (k, v), r in zip(bench._REF_CALIB.items(), (1.0, 2.0, 4.0))}
    assert abs(bench._calib_factor(calib) - (1 * 2 * 4) ** (1 / 3)) < 1e-3


def test_calib_factor_missing_or_bad_is_none():
    assert bench._calib_factor({}) is None
    assert bench._calib_factor({"err": "boom"}) is None
    assert bench._calib_factor({"matmul_1024_ms": 0}) is None  # degenerate
    # one usable point is enough (partial calib on a failing box)
    assert bench._calib_factor({"matmul_1024_ms": bench._REF_CALIB["matmul_1024_ms"]}) == 1.0


def test_r1_walls_parse_committed_artifact():
    r1 = bench._r1_walls()
    # the 19 driver-baseline cells the judge geomeans against
    assert len(r1) == 19
    assert r1["knn_exact_cosine"] == 1.015
    assert r1["ann_hnsw_knn"] == 2.644


def test_calib_normalized_ratios():
    r1 = bench._r1_walls()
    # identical walls on a 2x-slower box -> every normalized ratio 0.5
    timings = dict(r1)
    calib = {k: 2.0 * v for k, v in bench._REF_CALIB.items()}
    out = bench._calib_normalized(timings, calib)
    assert out["factor"] == 2.0
    assert set(out["ratio_vs_r1"]) == set(r1)
    assert all(abs(v - 0.5) < 1e-6 for v in out["ratio_vs_r1"].values())
    # cells without an r1 wall are skipped, never invented
    out2 = bench._calib_normalized({"new_cell": 1.0, **timings}, calib)
    assert "new_cell" not in out2["ratio_vs_r1"]
    # no usable calib -> no ratios (fall back to raw walls elsewhere)
    out3 = bench._calib_normalized(timings, {"err": "x"})
    assert out3["factor"] is None and "ratio_vs_r1" not in out3
    # a genuinely slow cell stays visible through the normalization
    timings["knn_exact_cosine"] = r1["knn_exact_cosine"] * 6.0
    out4 = bench._calib_normalized(timings, calib)
    assert out4["ratio_vs_r1"]["knn_exact_cosine"] == 3.0
    assert math.isclose(out4["ratio_vs_r1"]["dedup_exact"], 0.5)
