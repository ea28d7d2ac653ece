import math

from snappy_aqp_spark.stats import (confidence_factors, normal_ppf,
                                    poisson1_cdf_thresholds, t_cdf, t_ppf)


def test_normal_ppf_known_values():
    assert abs(normal_ppf(0.975) - 1.959963984540054) < 1e-12
    assert abs(normal_ppf(0.95) - 1.6448536269514722) < 1e-12
    assert abs(normal_ppf(0.5)) < 1e-12
    assert abs(normal_ppf(0.025) + 1.959963984540054) < 1e-12


def test_t_ppf_known_values():
    # classic two-sided 95% t table
    expected = {1: 12.7062, 2: 4.30265, 5: 2.57058, 10: 2.22814, 28: 2.04841}
    for df, v in expected.items():
        assert abs(t_ppf(0.975, float(df)) - v) < 5e-4, df


def test_t_cdf_roundtrip():
    for df in (1.0, 3.0, 17.0):
        for p in (0.6, 0.9, 0.99):
            assert abs(t_cdf(t_ppf(p, df), df) - p) < 1e-10


def test_confidence_factors_shape():
    z, ts = confidence_factors(0.95)
    assert abs(z - 1.959963984540054) < 1e-12
    assert len(ts) == 28
    assert ts[0] > ts[1] > ts[-1] > z  # t decreases toward z


def test_poisson_thresholds_monotone():
    th = poisson1_cdf_thresholds(2147483647)
    assert list(th) == sorted(th)
    # P(0) = e^-1 ~ 0.3679
    assert abs(th[0] / 2147483647 - math.exp(-1)) < 1e-6
