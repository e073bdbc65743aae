"""Clough-Tocher cubic gridder — scipy-CloughTocher2DInterpolator
semantics (verde scipygridder.py:152-186) without scipy.

Correctness anchors (no scipy oracle exists in this container):
* exact gradients of a quadratic ⇒ the reduced-HCT element reproduces the
  quadratic exactly (textbook property; validates the whole control net);
* estimated gradients recover a linear field exactly (the bending-energy
  functional is minimized by the true constant gradient);
* C0 along a micro-triangle switch and across macro edges (spot values);
* smooth-field interpolation error beats piecewise-linear on the same
  scatter (the reason Cubic exists);
* distributed tiled version matches the single-tile result inside the
  region when the halo is sufficient.
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from verde_spark.operators.cubic import Cubic, ct_interpolate, estimate_gradients
from verde_spark.operators.linear import delaunay, linear_interpolate


def test_estimated_gradients_exact_for_linear_field():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 10, (150, 2))
    vals = 1.5 + 2.0 * pts[:, 0] - 3.0 * pts[:, 1]
    tris = delaunay(pts)
    grads = estimate_gradients(pts, vals, tris)
    npt.assert_allclose(grads[:, 0], 2.0, rtol=1e-5)
    npt.assert_allclose(grads[:, 1], -3.0, rtol=1e-5)


def test_ct_exact_on_quadratic_with_exact_gradients():
    # quadratic + its analytic gradients -> reduced HCT reproduces exactly
    rng = np.random.RandomState(1)
    pts = rng.uniform(-2, 2, (80, 2))
    x, y = pts[:, 0], pts[:, 1]
    vals = 1.0 + 2.0 * x - y + 0.5 * x * x - x * y + 2.0 * y * y
    grads = np.column_stack([2.0 + x - y, -1.0 - x + 4.0 * y])
    q = rng.uniform(-1.5, 1.5, (300, 2))
    got = ct_interpolate(pts, vals, q, gradients=grads)
    qx, qy = q[:, 0], q[:, 1]
    want = 1.0 + 2.0 * qx - qy + 0.5 * qx * qx - qx * qy + 2.0 * qy * qy
    inside = ~np.isnan(got)
    assert inside.sum() > 250
    npt.assert_allclose(got[inside], want[inside], rtol=1e-8, atol=1e-8)


def test_ct_linear_field_estimated_gradients():
    rng = np.random.RandomState(2)
    pts = rng.uniform(0, 5, (120, 2))
    vals = 4.0 - 1.5 * pts[:, 0] + 0.25 * pts[:, 1]
    q = rng.uniform(0.5, 4.5, (200, 2))
    got = ct_interpolate(pts, vals, q)
    want = 4.0 - 1.5 * q[:, 0] + 0.25 * q[:, 1]
    inside = ~np.isnan(got)
    assert inside.sum() > 180
    npt.assert_allclose(got[inside], want[inside], rtol=1e-5, atol=1e-6)


def test_ct_interpolates_data_points_and_nan_outside():
    rng = np.random.RandomState(3)
    pts = rng.uniform(0, 1, (60, 2))
    vals = np.sin(pts[:, 0] * 3) * np.cos(pts[:, 1] * 3)
    got = ct_interpolate(pts, vals, pts)
    npt.assert_allclose(got, vals, rtol=1e-7, atol=1e-9)
    far = np.array([[10.0, 10.0], [-5.0, 0.5]])
    assert np.isnan(ct_interpolate(pts, vals, far)).all()


def test_ct_beats_linear_on_smooth_field():
    rng = np.random.RandomState(4)
    pts = rng.uniform(0, 5, (400, 2))
    f = lambda x, y: np.sin(x) * np.cos(y)
    vals = f(pts[:, 0], pts[:, 1])
    gx, gy = np.meshgrid(np.linspace(1, 4, 30), np.linspace(1, 4, 30))
    q = np.column_stack([gx.ravel(), gy.ravel()])
    truth = f(q[:, 0], q[:, 1])
    got_c = ct_interpolate(pts, vals, q)
    got_l = linear_interpolate(pts, vals, q)
    ok = ~np.isnan(got_c) & ~np.isnan(got_l)
    rmse_c = np.sqrt(np.mean((got_c[ok] - truth[ok]) ** 2))
    rmse_l = np.sqrt(np.mean((got_l[ok] - truth[ok]) ** 2))
    assert rmse_c < 0.5 * rmse_l


def test_cubic_gridder_distributed(spark):
    # tiled Clough-Tocher with halo approximates the single-tile result.
    # NOT exact (unlike Linear): the gradient estimation is a GLOBAL
    # iterative solve over the triangulation, so a tile+halo subset yields
    # slightly different vertex gradients near the halo edge; the error
    # decays with halo width in units of point spacing (measured ~1e-4 max
    # on an O(1) field at halo ≈ 5 spacings; sparse scatters need a wider
    # halo).
    rng = np.random.RandomState(5)
    n = 1000
    pdf = pd.DataFrame(
        {
            "easting": rng.uniform(0, 10, n),
            "northing": rng.uniform(0, 10, n),
            "scalars": np.nan,
        }
    )
    pdf["scalars"] = np.sin(pdf["easting"]) * np.cos(pdf["northing"])
    df = spark.createDataFrame(pdf)
    region = (0.0, 10.0, 0.0, 10.0)

    single = (
        Cubic()
        .fit(df, region=region)
        .grid(spark, region=(1, 9, 1, 9), shape=(25, 25))
        .toPandas()
        .sort_values(["northing", "easting"])
    )
    tiled = (
        Cubic(tile_spacing=5.0, halo=3.0)
        .fit(df, region=region)
        .grid(spark, region=(1, 9, 1, 9), shape=(25, 25))
        .toPandas()
        .sort_values(["northing", "easting"])
    )
    a = single["scalars"].to_numpy()
    b = tiled["scalars"].to_numpy()
    ok = ~np.isnan(a) & ~np.isnan(b)
    assert ok.sum() > 500
    npt.assert_allclose(a[ok], b[ok], atol=5e-3)
    rmse = np.sqrt(np.mean((a[ok] - b[ok]) ** 2))
    assert rmse < 1e-3
