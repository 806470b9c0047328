"""survival_km: hand cases + python product-limit differential."""

from datetime import datetime, timedelta

from picogeojson_spark.operators.survival import survival_km

SCHEMA = "user_id long, ts timestamp_ntz"
T0 = datetime(2024, 1, 1)


def _rows(spec):
    """spec: {user: [day offsets (floats ok)]} -> event rows."""
    out = []
    for u, days in spec.items():
        for d in days:
            out.append((u, T0 + timedelta(days=d)))
    return out


def _run(spark, spec, margin=7):
    got = survival_km(
        spark.createDataFrame(_rows(spec), SCHEMA),
        censor_margin_days=margin,
    ).orderBy("t_days").collect()
    return [(r.t_days, r.n_risk, r.n_events, r.n_censored, r.surv_ppm)
            for r in got]


def _brute(spec, margin=7):
    day_us = 86_400_000_000
    us = {u: (int(min(d) * day_us), int(max(d) * day_us))
          for u, d in spec.items()}
    cutoff = max(t1 for _, t1 in us.values())
    per = [((t1 - t0) // day_us, 1 if cutoff - t1 >= margin * day_us else 0)
           for t0, t1 in us.values()]
    roll = {}
    for t, ev in per:
        d, c = roll.get(t, (0, 0))
        roll[t] = (d + ev, c + (1 - ev))
    n = len(per)
    s = 1_000_000
    out = []
    for t in sorted(roll):
        d, c = roll[t]
        s = s * (n - d) // n
        out.append((t, n, d, c, s))
        n -= d + c
    return out


def test_hand_case_churn_and_censor(spark):
    # users 1,2 churn (last activity well before observation end);
    # user 3 defines the end and is censored; margin 7.
    spec = {1: [0, 2], 2: [0, 5], 3: [0, 20]}
    got = _run(spark, spec)
    # durations: u1 -> 2 (churn), u2 -> 5 (churn), u3 -> 20 (censored)
    assert got == [
        (2, 3, 1, 0, 666666),       # 1e6 * 2 // 3
        (5, 2, 1, 0, 333333),       # 666666 * 1 // 2
        (20, 1, 0, 1, 333333),      # censored: survival unchanged
    ]
    assert got == _brute(spec)


def test_ties_deaths_before_censoring(spark):
    # one churn and one censored at the SAME duration: both at risk,
    # death applies first, censored leaves after.
    spec = {1: [0, 3], 2: [10, 13], 3: [0, 13.5]}
    # cutoff = day 13.5; u1 last=3 churn (10.5d margin), u2 last=13
    # censored (0.5d), u3 censored; durations u1=3, u2=3, u3=13.
    got = _run(spark, spec)
    assert got == _brute(spec)
    assert got[0] == (3, 3, 1, 1, 666666)


def test_all_censored_curve_stays_flat(spark):
    spec = {1: [0, 1], 2: [0, 2], 3: [0, 3]}
    got = _run(spark, spec, margin=30)
    assert [r[4] for r in got] == [1_000_000] * 3
    assert got == _brute(spec, margin=30)


def test_brute_differential(spark):
    spec = {u: [((u * 13 + j * 7) % 11) * 0.5 + j for j in range(1 + u % 4)]
            for u in range(1, 40)}
    assert _run(spark, spec) == _brute(spec)
    assert _run(spark, spec, margin=3) == _brute(spec, margin=3)


def test_single_user_zero_duration(spark):
    got = _run(spark, {1: [5.0]})
    assert got == [(0, 1, 0, 1, 1_000_000)]


def test_hour_unit_matches_scaled_brute(spark):
    spec = {1: [0, 0.5], 2: [0, 1.25], 3: [0, 2]}
    got = survival_km(
        spark.createDataFrame(_rows(spec), SCHEMA),
        censor_margin_days=1, unit="hour",
    ).orderBy("t_days").collect()
    # durations in hours: 12, 30, 48; cutoff day 2 -> u3 censored,
    # u1/u2 churned (>= 1 day before cutoff? u2 last=1.25, margin 0.75d
    # -> censored; u1 last=0.5, 1.5d before -> churn).
    rows = [(r.t_days, r.n_risk, r.n_events, r.n_censored, r.surv_ppm)
            for r in got]
    assert rows == [
        (12, 3, 1, 0, 666666),
        (30, 2, 0, 1, 666666),
        (48, 1, 0, 1, 666666),
    ]
