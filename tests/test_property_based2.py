"""Property-based checks (hypothesis) for the round-8 pure helpers —
no Spark session needed, so examples run in volume:

* ``seasonal_stream.decompose_days`` vs its defining invariants
  (additivity, edge NULLs, input-order invariance, weekday-mean
  definition).
* The Kaplan-Meier integer recurrence vs the float product-limit
  estimator (always within one ppm-floor step per bucket) and its
  structural monotonicity.
"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: property-based model replays
pytestmark = _pytest_tier.mark.slow

import math

from hypothesis import given, settings, strategies as st

from data_pipeline_bigquery_spark.streaming.seasonal_stream import (
    decompose_days,
)

_SETTINGS = dict(max_examples=200, deadline=None)

_series = st.dictionaries(
    st.integers(min_value=0, max_value=60),  # epoch days
    st.integers(min_value=0, max_value=10**9),  # cents
    min_size=0,
    max_size=40,
)


@given(_series)
@settings(**_SETTINGS)
def test_decompose_days_invariants(day_cents):
    pairs = sorted(day_cents.items())
    rows = decompose_days(list(day_cents.items()))
    assert [r["day_epoch"] for r in rows] == [d for d, _ in pairs]
    n = len(pairs)
    for i, r in enumerate(rows):
        # full-window trend only: first/last 3 rows are NULL
        if i < 3 or i >= n - 3:
            assert r["trend_mc"] is None and r["residual_mc"] is None
        else:
            s7 = sum(c for _, c in pairs[i - 3 : i + 4])
            assert r["trend_mc"] == math.floor(s7 * 1000.0 / 7.0)
        assert r["wd"] == r["day_epoch"] % 7
        # exact additivity wherever all three terms exist
        if r["residual_mc"] is not None:
            assert (
                r["cents"] * 1000
                == r["trend_mc"] + r["seasonal_mc"] + r["residual_mc"]
            )
            # a defined residual requires a defined trend and seasonal
            assert r["trend_mc"] is not None
            assert r["seasonal_mc"] is not None


@given(_series)
@settings(**_SETTINGS)
def test_decompose_days_is_input_order_invariant(day_cents):
    items = list(day_cents.items())
    assert decompose_days(items) == decompose_days(list(reversed(items)))


def _km_curve(steps, scale=10**6):
    """The repo's integer product-limit recurrence over sorted
    (bucket, events, censored) steps."""
    n = sum(d + c for _, d, c in steps)
    out, s = [], scale
    for b, d, c in sorted(steps):
        s = s * (n - d) // n
        out.append((b, n, d, c, s))
        n -= d + c
    return out


_steps = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=50),  # events
        st.integers(min_value=0, max_value=50),  # censored
    ),
    min_size=1,
    max_size=13,
    unique_by=lambda t: t[0],
).filter(lambda steps: all(d + c > 0 for _, d, c in steps))


@given(_steps)
@settings(**_SETTINGS)
def test_km_recurrence_tracks_float_product_limit(steps):
    curve = _km_curve(steps)
    # monotone nonincreasing, bounded by the scale
    ppms = [s for *_, s in curve]
    assert all(0 <= s <= 10**6 for s in ppms)
    assert all(a >= b for a, b in zip(ppms, ppms[1:]))
    # n_risk telescopes exactly
    for i in range(1, len(curve)):
        _, n_prev, d_prev, c_prev, _ = curve[i - 1]
        assert curve[i][1] == n_prev - d_prev - c_prev
    # each step floors once, so the integer curve sits within
    # len(curve) ppm of the float product-limit estimator
    s_float = 1.0
    for (b, n, d, c, s_int), _ in zip(curve, curve):
        s_float *= (n - d) / n
        assert s_int <= s_float * 10**6 + 1e-6
        assert s_int > s_float * 10**6 - len(curve) - 1e-6


@given(_steps)
@settings(**_SETTINGS)
def test_km_all_censored_stays_at_scale(steps):
    censored_only = [(b, 0, d + c) for b, d, c in steps]
    assert all(s == 10**6 for *_, s in _km_curve(censored_only))
