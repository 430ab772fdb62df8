"""exact_quantiles: sample→bracket→refine must equal pandas' linear
interpolation on adversarial shapes."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ptrail_ray.stages.quantiles import exact_quantiles

QS = [0.25, 0.5, 0.75]


def _check(vals: np.ndarray, ray_session):
    pdf = pd.DataFrame({"x": vals})
    ds = rd.from_pandas(pdf).repartition(4)
    got = exact_quantiles(ds, "x", QS)
    exp = [pd.Series(vals).quantile(q) for q in QS]
    for g, e in zip(got, exp):
        if np.isnan(e):
            assert np.isnan(g)
        else:
            assert g == e, (g, e)


def test_uniform(ray_session):
    _check(np.random.default_rng(1).uniform(size=10_001), ray_session)


def test_heavy_ties(ray_session):
    """Massive duplication around the quartiles (bracket degeneracy)."""
    rng = np.random.default_rng(2)
    vals = np.concatenate([np.zeros(5000), np.ones(5000), rng.normal(size=100)])
    rng.shuffle(vals)
    _check(vals, ray_session)


def test_with_nans(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.normal(size=5000)
    vals[rng.random(5000) < 0.3] = np.nan
    _check(vals, ray_session)


def test_tiny(ray_session):
    _check(np.array([3.0, 1.0, 2.0]), ray_session)
    _check(np.array([7.5]), ray_session)


def test_all_nan(ray_session):
    got = exact_quantiles(rd.from_pandas(pd.DataFrame({"x": [np.nan] * 10})), "x", QS)
    assert all(np.isnan(g) for g in got)
