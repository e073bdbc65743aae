"""SplineCV — cross-validated damping/mindist search (verde spline.py:29-312).

The parameter grid is ``itertools.product(mindists, dampings)``
(spline.py:217-225); each candidate runs ``cross_val_score`` and the
argmax of the mean score is refit on all data (spline.py:256-261).

Spark story: parameter sets are independent jobs. The reference's dask
``delayed``/``client`` dispatch (its only cluster boundary) maps to a
driver-side thread pool submitting concurrent Spark jobs — the FAIR
scheduler interleaves their stages across executors, and all folds'
train/test sets filter one cached DataFrame.
"""

from __future__ import annotations

import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame

from ..model_selection import BlockKFold, cross_val_score
from .spline import Spline


class SplineCV:
    def __init__(
        self,
        dampings: Sequence[Optional[float]] = (1e-4, 1e-3, 1e-2),
        mindists: Sequence[float] = (0.0,),
        force_coords=None,
        cv=None,
        tile_spacing: Optional[float] = None,
        halo: Optional[float] = None,
        parallel_candidates: int = 4,
        scoring=None,
    ):
        self.dampings = list(dampings)
        self.mindists = list(mindists)
        self.force_coords = force_coords  # passed through to every candidate
        self.cv = cv
        self.tile_spacing = tile_spacing
        self.halo = halo
        self.parallel_candidates = parallel_candidates
        self.scoring = scoring  # sklearn scorer name/callable (reference spline.py:97)
        self.scores_: Optional[list] = None
        self.damping_: Optional[float] = None
        self.mindist_: Optional[float] = None
        self.spline_: Optional[Spline] = None

    def fit(
        self,
        df: DataFrame,
        data_col: str = "scalars",
        weight_col: Optional[str] = None,
        easting: str = "easting",
        northing: str = "northing",
    ) -> "SplineCV":
        candidates = list(itertools.product(self.mindists, self.dampings))
        cv = self.cv or BlockKFold(shape=(4, 4), n_splits=3, shuffle=True, random_state=0)
        df = df.persist()

        def score(params):
            mindist, damping = params
            scores = cross_val_score(
                lambda: Spline(
                    damping=damping,
                    mindist=mindist,
                    force_coords=self.force_coords,
                    tile_spacing=self.tile_spacing,
                    halo=self.halo,
                ),
                df,
                cv=cv,
                data_col=data_col,
                weight_col=weight_col,
                easting=easting,
                northing=northing,
                scoring=self.scoring,
            )
            return float(np.mean(scores))

        with ThreadPoolExecutor(max_workers=self.parallel_candidates) as pool:
            self.scores_ = list(pool.map(score, candidates))
        best = int(np.argmax(self.scores_))
        self.mindist_, self.damping_ = candidates[best]
        self.spline_ = Spline(
            damping=self.damping_,
            mindist=self.mindist_,
            force_coords=self.force_coords,
            tile_spacing=self.tile_spacing,
            halo=self.halo,
        ).fit(df, data_col=data_col, weight_col=weight_col, easting=easting, northing=northing)
        return self

    def predict(self, df: DataFrame, output_col: str = "prediction", **kwargs) -> DataFrame:
        if self.spline_ is None:
            raise RuntimeError("SplineCV is not fitted.")
        return self.spline_.predict(df, output_col, **kwargs)

    def grid(self, spark, **kwargs) -> DataFrame:
        if self.spline_ is None:
            raise RuntimeError("SplineCV is not fitted.")
        return self.spline_.grid(spark, **kwargs)
