"""Calib-normalized bench gating (VERDICT r8 #7, r9 #2): the sidecar must
carry per-cell wall ratios vs the r1 baseline divided by the run's
host-speed factor computed over the OVERHEAD axes only (pyloop +
spark_sum) — the headline cells are Spark-scheduler/interpreter-overhead
dominated, so the BLAS axis must not be able to move their normalized
ratios (round 9 measured an 18% inflation from exactly that).

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


def test_calib_factor_axis_subset():
    # axis-matched factor: only the requested axes participate
    calib = dict(bench._REF_CALIB)
    calib["matmul_1024_ms"] *= 4.0  # BLAS axis way off, overhead axes on-ref
    assert bench._calib_factor(calib, bench._OVERHEAD_AXES) == 1.0
    assert bench._calib_factor(calib) == round(4.0 ** (1 / 3), 4)
    # overhead axes both 2x slower -> overhead factor 2.0 regardless of matmul
    calib2 = {
        "matmul_1024_ms": bench._REF_CALIB["matmul_1024_ms"] * 0.1,
        "pyloop_2m_ms": bench._REF_CALIB["pyloop_2m_ms"] * 2.0,
        "spark_sum_1m_ms": bench._REF_CALIB["spark_sum_1m_ms"] * 2.0,
    }
    assert bench._calib_factor(calib2, bench._OVERHEAD_AXES) == 2.0


def test_calib_factor_missing_or_bad_is_none():
    assert bench._calib_factor({}) is None
    assert bench._calib_factor({"err": "boom"}) is None
    assert bench._calib_factor({"matmul_1024_ms": 0}) is None  # degenerate
    # one usable point is enough (partial calib on a failing box)
    assert bench._calib_factor({"matmul_1024_ms": bench._REF_CALIB["matmul_1024_ms"]}) == 1.0
    # overhead subset with only matmul present -> None, never a matmul factor
    assert (
        bench._calib_factor(
            {"matmul_1024_ms": bench._REF_CALIB["matmul_1024_ms"]},
            bench._OVERHEAD_AXES,
        )
        is None
    )


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


def test_calib_normalized_insensitive_to_matmul_axis():
    """The VERDICT r9 #2 scenario, pinned: a box whose BLAS runs 1.57x
    FASTER than the reference while the overhead axes sit at 1.0 must
    leave every headline ratio exactly equal to its raw ratio — the
    matmul axis cannot inflate (or deflate) overhead-dominated cells."""
    r1 = bench._r1_walls()
    timings = dict(r1)
    calib = dict(bench._REF_CALIB)
    calib["matmul_1024_ms"] /= 1.57
    out = bench._calib_normalized(timings, calib)
    assert out["factor"] == 1.0
    assert all(abs(v - 1.0) < 1e-6 for v in out["ratio_vs_r1"].values())
    # ...while the all-axes factor still records the whole-box drift
    assert out["factor_all_axes"] == round((1 / 1.57) ** (1 / 3), 4)
    # per-axis ratios are emitted for sensitivity reading
    assert out["factor_by_axis"]["pyloop_2m_ms"] == 1.0
    assert abs(out["factor_by_axis"]["matmul_1024_ms"] - 1 / 1.57) < 1e-3


def test_calib_normalized_annotates_changed_paths():
    # ann_hnsw_knn changed code path since r1 (dispatch=auto -> exact
    # route); the sidecar must say so next to the ratio (ADVICE r9)
    r1 = bench._r1_walls()
    out = bench._calib_normalized(dict(r1), dict(bench._REF_CALIB))
    assert "ann_hnsw_knn" in out["path_changed_since_r1"]
    assert "ann_hnsw_knn" in out["ratio_vs_r1"]
    assert out["ref_calib_note"]
    assert out["normalization_axes"] == list(bench._OVERHEAD_AXES)


def test_norm_summary_rides_the_line():
    # the stdout line carries the two gate numbers; empty ratios add nothing
    assert bench._norm_summary(None) == {}
    assert bench._norm_summary({}) == {}
    out = bench._norm_summary({"a": 0.5, "b": 2.0, "c": 1.0})
    assert out["norm_vs_r1_geomean"] == 1.0
    assert out["norm_vs_r1_worst"] == {"b": 2.0}
    assert "norm_excluded_path_changed" not in out


def test_norm_summary_excludes_path_changed_cells():
    """ADVICE r10: a path-changed cell's ratio compares different
    algorithms, so it must not move the gate numbers — it rides the line
    as a separately annotated field instead."""
    assert "ann_hnsw_knn" in bench._PATH_CHANGED_SINCE_R1
    out = bench._norm_summary({"a": 1.0, "ann_hnsw_knn": 9.0})
    assert out["norm_vs_r1_geomean"] == 1.0
    assert out["norm_vs_r1_worst"] == {"a": 1.0}
    assert out["norm_excluded_path_changed"] == {"ann_hnsw_knn": 9.0}
    # all-excluded input degenerates to empty, never a gate on nothing
    assert bench._norm_summary({"ann_hnsw_knn": 9.0}) == {}


def test_cell_walls_median_of_three_with_samples():
    """VERDICT r10 #1: headline walls are median-of-3 and every sample is
    recorded (the sidecar's `queries_samples`), so one contended window
    cannot redden the committed record.  Low spread -> exactly 3 samples."""
    seq = iter([0.0, 1.0, 1.0, 2.0, 2.0, 3.1])  # walls 1.0, 1.0, 1.1
    orig = bench.time.time
    bench.time.time = lambda: next(seq)
    try:
        wall, samples = bench._cell_walls(lambda: None)
    finally:
        bench.time.time = orig
    assert samples == [1.0, 1.0, 1.1]
    assert wall == 1.0  # the median


def test_cell_walls_burst_takes_extra_samples():
    """VERDICT r11 #1: a burst-shaped spread (max/min > 2 — the r11
    driver's dedup_exact sampled 2.93/0.72/0.90 s) triggers up to 2 extra
    samples so median AND min land on steady state, bounded so a
    genuinely bimodal cell cannot loop forever."""
    # walls: 2.93, 0.72, 0.90 (burst) -> extras 0.71, 0.73
    seq = iter([0.0, 2.93, 3.0, 3.72, 4.0, 4.90, 5.0, 5.71, 6.0, 6.73])
    orig = bench.time.time
    bench.time.time = lambda: next(seq)
    try:
        wall, samples = bench._cell_walls(lambda: None)
    finally:
        bench.time.time = orig
    assert samples == [2.93, 0.72, 0.9, 0.71, 0.73]
    assert wall == 0.73  # median of 5 sits on steady state, not the burst
    # min (the gate-ratio wall) is a clean sample too
    assert min(samples) == 0.71


def test_calib_normalized_gate_axis_not_two_axis_mean():
    """VERDICT r11 What's-wrong #2, pinned: when the overhead axes
    diverge (pyloop on-ref, spark_sum 1.9x — the r11 driver window), a
    Spark-job-shaped gate cell must divide by the spark_sum axis factor,
    not the two-axis geomean that undercorrected the four r11 breach
    cells."""
    r1 = bench._r1_walls()
    calib = dict(bench._REF_CALIB)
    calib["spark_sum_1m_ms"] *= 1.9
    # walls inflated exactly like the window says Spark overhead did
    timings = {n: w * 1.9 for n, w in r1.items()}
    out = bench._calib_normalized(timings, calib)
    assert all(abs(v - 1.0) < 1e-6 for v in out["ratio_vs_r1"].values())
    # ...while the old run-factor convention (recorded alongside for
    # auditability) still shows the undercorrection
    assert all(v > 1.3 for v in out["ratio_vs_r1_run_factor"].values())
    assert out["gate_axis"] == "spark_sum_1m_ms"


def test_calib_normalized_per_cell_probes_and_min_samples():
    """VERDICT r11 #1b: a contention burst that hits ONE cell mid-run is
    corrected by that cell's own bracketing micro-probes and min-of-samples
    — the end-of-run calib (quiet here) cannot see it."""
    r1 = bench._r1_walls()
    calib = dict(bench._REF_CALIB)  # run-level calib reads a quiet box
    timings = dict(r1)
    ref = bench._REF_CALIB["spark_sum_1m_ms"]
    # dedup_exact got hit: median wall 1.9x, samples burst-shaped, probes
    # around the cell measured the same 1.9x scheduler slowdown
    timings["dedup_exact"] = r1["dedup_exact"] * 1.9
    samples = {
        "dedup_exact": [
            r1["dedup_exact"] * 4.0,
            r1["dedup_exact"] * 1.9,
            r1["dedup_exact"] * 1.9,
        ]
    }
    probes = {"dedup_exact": [ref * 1.9, ref * 1.9]}
    out = bench._calib_normalized(timings, calib, samples, probes)
    assert abs(out["ratio_vs_r1"]["dedup_exact"] - 1.0) < 1e-2
    # untouched cells keep the run-level (quiet) factor
    assert abs(out["ratio_vs_r1"]["knn_exact_cosine"] - 1.0) < 1e-6
    assert out["cell_factors"]["dedup_exact"] == 1.9
    assert out["cell_probes_ms"] == probes
    # min-of-samples alone (no probes) also drops a burst-median cell
    out2 = bench._calib_normalized(timings, calib, samples, None)
    assert abs(out2["ratio_vs_r1"]["dedup_exact"] - 1.9) < 1e-2
    assert "ratio_convention" in out2


def test_calib_normalized_r11_breach_scenario():
    """The exact r11 adjudication, replayed: the driver window's calib
    (spark_sum 151.6 ms = 1.91x ref, pyloop on-ref) with dedup_exact's
    recorded burst samples must normalize BELOW the 2x gate under the
    r12 convention — the old two-axis-mean/median convention read 2.695
    on code identical to a run that scored 1.05."""
    r1 = bench._r1_walls()
    calib = {"matmul_1024_ms": 6.2, "pyloop_2m_ms": 77.7, "spark_sum_1m_ms": 151.6}
    timings = {"dedup_exact": 0.895}
    samples = {"dedup_exact": [2.93, 0.72, 0.90]}
    out = bench._calib_normalized(timings, calib, samples)
    assert out["ratio_vs_r1"]["dedup_exact"] < 2.0
    # the recorded old-convention number stays auditable
    assert out["ratio_vs_r1_run_factor"]["dedup_exact"] > 2.0


def test_quiet_window_retry(monkeypatch):
    """VERDICT r11 #1a: the run probes the box first; a contended window
    sleeps-and-reprobes within a bounded budget, and every probe is
    surfaced for the sidecar so a still-contended run is provably so."""
    contended = {k: 1.6 * v for k, v in bench._REF_CALIB.items()}
    quiet = dict(bench._REF_CALIB)
    seq = iter([contended, quiet])
    slept = []
    monkeypatch.setattr(bench, "_calibration", lambda spark: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    ok, probes = bench._quiet_window(None, sleep_s=1.0)
    assert ok and len(probes) == 2 and slept == [1.0]
    assert probes[0]["factor"] > bench._QUIET_FACTOR
    assert probes[1]["factor"] == 1.0

    # never-quiet box: bounded attempts, ok=False, all probes recorded
    monkeypatch.setattr(bench, "_calibration", lambda spark: dict(contended))
    slept.clear()
    ok2, probes2 = bench._quiet_window(None, attempts=3, sleep_s=1.0)
    assert not ok2 and len(probes2) == 3 and slept == [1.0, 1.0]

    # unusable calib (factor None) must not spin the retry loop
    monkeypatch.setattr(bench, "_calibration", lambda spark: {"err": "x"})
    ok3, probes3 = bench._quiet_window(None, sleep_s=1.0)
    assert ok3 and len(probes3) == 1


def test_normalized_min_per_sample_probe_pairing():
    """ADVICE r12 #1, pinned: the one-sided bias scenario — the min
    sample landed in a QUIET moment (before-probe on-ref) while the
    after-probe caught a 2x burst.  r12's min/geomean-of-probes divided
    the clean wall by ~1.41x it never paid (under-reporting a regression
    by the same factor); the per-sample convention pairs the early min
    sample with the early (quiet) probe."""
    ref = bench._REF_CALIB["spark_sum_1m_ms"]
    calib = dict(bench._REF_CALIB)
    # two samples: a clean 1.0 s first, a burst-inflated 2.0 s second
    walls = [1.0, 2.0]
    probes = [ref * 1.0, ref * 2.0]
    v = bench._normalized_min(walls, probes, calib)
    # sample 0 at t=0.25 -> factor 1.25; sample 1 at t=0.75 -> 1.75
    assert abs(v - min(1.0 / 1.25, 2.0 / 1.75)) < 1e-9
    # old convention (geomean sqrt(2)=1.414) would have read 0.707 —
    # the new one reads 0.8: strictly less flattering to the clean wall
    assert v > 1.0 / math.sqrt(2.0)
    # identical probes degenerate to the r12 convention exactly
    assert abs(
        bench._normalized_min([1.9, 4.0], [ref * 1.9, ref * 1.9], calib)
        - 1.0
    ) < 1e-9
    # no probes -> run-level spark_sum axis fallback, min of samples
    calib2 = dict(bench._REF_CALIB)
    calib2["spark_sum_1m_ms"] *= 2.0
    assert abs(bench._normalized_min([4.0, 2.0], None, calib2) - 1.0) < 1e-9
    # unusable calib and no probes -> None, never an invented factor
    assert bench._normalized_min([1.0], None, {"err": "x"}) is None


def test_norm_summary_normalized_away_and_loose_run_gate():
    """VERDICT r12 #4: cells the probe convention rescued from a >2x
    old-convention ratio are first-class on the line (cell, raw ratio,
    factor, probes); ADVICE r12 #1 second arm: a persistent slowdown past
    a LOOSER 3x run-factor bar reddens the line even when probe
    normalization cleared it."""
    cn = {
        "ratio_vs_r1_run_factor": {"a": 2.7, "b": 1.1, "c": 3.4},
        "cell_factors": {"a": 1.9, "b": 1.0, "c": 2.1},
        "cell_probes_ms": {"a": [151.6, 150.2], "c": [160.0]},
    }
    out = bench._norm_summary({"a": 1.05, "b": 1.1, "c": 1.9}, cn)
    away = {e["cell"]: e for e in out["normalized_away"]}
    assert set(away) == {"a", "c"}
    assert away["a"]["raw_ratio"] == 2.7
    assert away["a"]["cell_factor"] == 1.9
    assert away["a"]["probes_ms"] == [151.6, 150.2]
    assert out["run_factor_gate_3x"] == {"c": 3.4}
    # a cell >2 under BOTH conventions is a breach, not "normalized away"
    out2 = bench._norm_summary({"a": 2.4}, {"ratio_vs_r1_run_factor": {"a": 2.9}})
    assert "normalized_away" not in out2
    # no cn block: the classic two-field summary, unchanged
    out3 = bench._norm_summary({"a": 1.0})
    assert "normalized_away" not in out3 and "run_factor_gate_3x" not in out3
