"""Deprecated sample-dataset surface (reference ``verde/datasets``).

The reference's ``fetch_*`` functions download real survey files with
pooch (deprecated there, slated for removal in v2.0.0 in favour of
Ensaio).  This environment has no network, so each function returns a
**deterministic synthetic stand-in with the same column schema and
geographic region** as the real dataset (column names per the verde docs
and gallery) — enough for every tutorial-style pipeline (decimate →
project → grid) to run unchanged.  The values are synthetic; anything
asserting on real-survey values is out of scope by design.

``setup_*_map`` helpers are Cartopy/matplotlib plotting utilities; no
plotting stack exists here, so they raise ``NotImplementedError``.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import pandas as pd


def _deprecation():
    # parity with the reference's _datasets_deprecation_warning
    warnings.warn(
        "The datasets module is deprecated (mirrors the reference's removal "
        "in v2.0.0). Prefer your own tables or the synthetic sources.",
        FutureWarning,
    )


def locate() -> str:
    """The local data storage location (no downloads happen here)."""
    path = os.path.expanduser(os.path.join("~", ".verde_spark", "data"))
    os.makedirs(path, exist_ok=True)
    return path


def _field(rng: np.random.RandomState, lon, lat, scale):
    return (
        np.sin(np.radians(lon) * 40) * np.cos(np.radians(lat) * 40) * scale
        + rng.normal(scale=scale * 0.05, size=lon.size)
    )


def fetch_baja_bathymetry() -> pd.DataFrame:
    """Synthetic stand-in: columns (longitude, latitude, bathymetry_m) over
    the Baja California region (245, 254.705, 20, 29.99)."""
    _deprecation()
    rng = np.random.RandomState(10)
    n = 20_000
    lon = rng.uniform(245.0, 254.705, n)
    lat = rng.uniform(20.0, 29.99, n)
    return pd.DataFrame(
        {
            "longitude": lon,
            "latitude": lat,
            "bathymetry_m": -3000.0 + _field(rng, lon, lat, 1200.0),
        }
    )


def fetch_texas_wind() -> pd.DataFrame:
    """Synthetic stand-in: columns (station_id, longitude, latitude,
    air_temperature_c, wind_speed_east_knots, wind_speed_north_knots) over
    Texas (-107, -93, 25.5, 37)."""
    _deprecation()
    rng = np.random.RandomState(11)
    n = 160
    lon = rng.uniform(-107.0, -93.0, n)
    lat = rng.uniform(25.5, 37.0, n)
    return pd.DataFrame(
        {
            "station_id": [f"TX{i:04d}" for i in range(n)],
            "longitude": lon,
            "latitude": lat,
            "air_temperature_c": 18.0 + _field(rng, lon, lat, 6.0),
            "wind_speed_east_knots": _field(rng, lon + 1, lat, 8.0),
            "wind_speed_north_knots": _field(rng, lon, lat + 1, 8.0),
        }
    )


def fetch_california_gps() -> pd.DataFrame:
    """Synthetic stand-in: columns (latitude, longitude, height,
    velocity_north, velocity_east, velocity_up, std_north, std_east,
    std_up) over California (235.2, 245.3, 31.9, 42.3)."""
    _deprecation()
    rng = np.random.RandomState(12)
    n = 2000
    lon = rng.uniform(235.2, 245.3, n)
    lat = rng.uniform(31.9, 42.3, n)
    return pd.DataFrame(
        {
            "latitude": lat,
            "longitude": lon,
            "height": rng.uniform(-50, 3000, n),
            "velocity_north": _field(rng, lon, lat, 0.03),
            "velocity_east": _field(rng, lon + 2, lat, 0.03),
            "velocity_up": _field(rng, lon, lat + 2, 0.005),
            "std_north": rng.uniform(5e-4, 3e-3, n),
            "std_east": rng.uniform(5e-4, 3e-3, n),
            "std_up": rng.uniform(1e-3, 6e-3, n),
        }
    )


def fetch_rio_magnetic() -> pd.DataFrame:
    """Synthetic stand-in: columns (longitude, latitude,
    total_field_anomaly_nt, height_ell_m, line_number) over Rio de
    Janeiro (-42.6, -42, -22.5, -22)."""
    _deprecation()
    rng = np.random.RandomState(13)
    n = 30_000
    lon = rng.uniform(-42.6, -42.0, n)
    lat = rng.uniform(-22.5, -22.0, n)
    return pd.DataFrame(
        {
            "longitude": lon,
            "latitude": lat,
            "total_field_anomaly_nt": _field(rng, lon, lat, 150.0),
            "height_ell_m": rng.uniform(80, 120, n),
            "line_number": (np.arange(n) // 500).astype("int64"),
        }
    )


def _no_plotting(*_args, **_kwargs):
    raise NotImplementedError(
        "setup_*_map helpers need Cartopy/matplotlib, which are not "
        "available in this environment (plotting-only; no Spark surface)."
    )


setup_baja_bathymetry_map = _no_plotting
setup_texas_wind_map = _no_plotting
setup_california_gps_map = _no_plotting
setup_rio_magnetic_map = _no_plotting
