"""Reconstruction-error anomaly scorer (SURVEY.md §2.7 M8-M10).

The reference's 128-64-32-64-128 TF autoencoder (python_scoring/
train.py:18-28) exists to produce one number per row: reconstruction
MSE, thresholded at the validation 97.5th percentile (train.py:86-88)
and served as ``clip(mse/threshold, 0, 1)`` (model_wrapper.py:44-49,
app.py:193). The engine operator is the linear-autoencoder equivalent
(SURVEY.md §2.7 M8 option (a)): distributed MLlib ``PCA`` fit, with the
reconstruction error computed as

    mse(x) = (‖x − μ‖² − ‖Wᵀ(x − μ)‖²) / d

— for an orthonormal component matrix W, the residual of the
rank-k projection. The fit is fully distributed (MLlib RowMatrix SVD);
scoring is one matmul per Arrow batch in a pandas_udf with the (d × k)
component matrix broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.feature import PCA
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .iforest import IsolationForestModel

_as_array = IsolationForestModel._as_array


class ReconstructionScorer:
    def __init__(self, k: int = 8, threshold_quantile: float = 0.975):
        self.k = k
        self.threshold_quantile = threshold_quantile
        self.components: np.ndarray | None = None  # (d, k)
        self.mean: np.ndarray | None = None  # (d,)
        self.threshold: float | None = None

    def fit(
        self,
        df: DataFrame,
        features_col: str = "features",
        val_df: DataFrame | None = None,
    ) -> "ReconstructionScorer":
        """Fit the rank-k model on ``df``; calibrate the MSE threshold on
        ``val_df`` when given (the reference's held-out calibration,
        train.py:83-88) — on ``df`` itself otherwise (in-sample)."""
        arr = _as_array(df, features_col)
        d = len(df.select(arr).first()[0])
        k = min(self.k, d)

        # distributed mean (PCA in MLlib does not center)
        mean_row = df.select(
            F.array(*[F.avg(arr[i]) for i in range(d)]).alias("m")
        ).first()["m"]
        self.mean = np.array(mean_row, dtype=np.float64)

        from pyspark.ml.feature import VectorAssembler  # local import to avoid cycle

        # assemble centered vector column for MLlib PCA
        centered = df.select(
            F.array(*[(arr[i] - float(self.mean[i])) for i in range(d)]).alias("_c")
        )
        from pyspark.ml.functions import array_to_vector

        vec_df = centered.select(array_to_vector("_c").alias("_v"))
        model = PCA(k=k, inputCol="_v", outputCol="_p").fit(vec_df)
        self.components = model.pc.toArray()  # (d, k)

        # threshold: exact percentile of MSE (M9/A4), on the held-out
        # split when provided (train.py:86-88), else in-sample
        cal_df = val_df if val_df is not None else df
        scored = cal_df.withColumn("_mse", self.mse_col(cal_df, features_col))
        self.threshold = float(
            scored.select(
                F.expr(f"percentile(_mse, {self.threshold_quantile})")
            ).first()[0]
        )
        return self

    def mse_col(self, df: DataFrame, features_col: str = "features") -> Column:
        """Per-row reconstruction MSE (A5) — one matmul per Arrow batch."""
        if self.components is None:
            raise RuntimeError("fit() first")
        sc = df.sparkSession.sparkContext
        b = sc.broadcast((self.components, self.mean))

        @F.pandas_udf(T.DoubleType())
        def _mse(batch: pd.Series) -> pd.Series:
            W, mu = b.value
            X = np.stack(batch.to_numpy()) - mu
            total = (X * X).sum(axis=1)
            proj = X @ W
            captured = (proj * proj).sum(axis=1)
            return pd.Series(np.maximum(total - captured, 0.0) / X.shape[1])

        return _mse(_as_array(df, features_col))

    def score_col(self, df: DataFrame, features_col: str = "features") -> Column:
        """Normalized AE-style score: clip(mse / threshold, 0, 1)
        (model_wrapper.py:44-49; app.py:193 F9)."""
        if self.threshold is None:
            raise RuntimeError("fit() first")
        mse = self.mse_col(df, features_col)
        return F.least(F.greatest(mse / F.lit(max(self.threshold, 1e-12)), F.lit(0.0)), F.lit(1.0))
