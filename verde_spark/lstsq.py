"""Damped weighted least squares — pure NumPy, sklearn-semantics.

Replicates verde base/least_squares.py:17-71 without sklearn (not
installed in this environment):

* column scaling = ``StandardScaler(with_mean=False)``: divide each
  Jacobian column by its population std (ddof=0, computed about the mean);
  zero-variance columns get scale 1 (sklearn ``_handle_zeros_in_scale``);
* ``damping=None`` → ``LinearRegression(fit_intercept=False)`` = plain
  ``lstsq``; with weights, rows are scaled by sqrt(w);
* ``damping=α`` → ``Ridge(alpha=α, fit_intercept=False)``: solve
  ``(JᵀWJ + αI) p = JᵀWd``;
* coefficients are unscaled before returning.

This runs *inside* executors (per-tile applyInPandas bodies) — the dense
matrix never leaves a partition.
"""

from __future__ import annotations

import warnings

import numpy as np


def _column_scale(jacobian: np.ndarray) -> np.ndarray:
    """sklearn StandardScaler scale_: population std per column, 0→1."""
    scale = jacobian.std(axis=0, ddof=0)
    # sklearn treats near-zero scales as 1 to avoid division blow-up.
    scale = np.where(scale < 10 * np.finfo(jacobian.dtype).eps, 1.0, scale)
    return scale


def least_squares(
    jacobian: np.ndarray,
    data: np.ndarray,
    weights: np.ndarray | None = None,
    damping: float | None = None,
) -> np.ndarray:
    """Solve min ||sqrt(W)(d - Jp)||² (+ α||p_scaled||²), sklearn-equivalent."""
    if jacobian.shape[0] < jacobian.shape[1]:
        warnings.warn(
            f"Under-determined problem detected (ndata, nparams)={jacobian.shape}.",
            stacklevel=2,
        )
    scale = _column_scale(jacobian)
    jac = jacobian / scale
    d = np.ravel(np.asarray(data, dtype="float64"))
    if weights is not None:
        sw = np.sqrt(np.asarray(weights, dtype="float64"))
        jac = jac * sw[:, None]
        d = d * sw
    if damping is None:
        params, *_ = np.linalg.lstsq(jac, d, rcond=None)
    else:
        k = jac.shape[1]
        lhs = jac.T @ jac + float(damping) * np.eye(k)
        rhs = jac.T @ d
        try:
            params = np.linalg.solve(lhs, rhs)
        except np.linalg.LinAlgError:
            params, *_ = np.linalg.lstsq(lhs, rhs, rcond=None)
    return params / scale
