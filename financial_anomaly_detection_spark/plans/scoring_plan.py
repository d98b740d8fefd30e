"""End-to-end batch plans (SURVEY.md §3.2 train, §3.1/§3.3 score).

The reference's ``python train.py --csv …`` pipeline
(python_scoring/train.py:34-103) and its two scoring services
(app.py / api/app.py) re-expressed as two declarative plans over the
canonical transaction schema. Everything before model fit/inference is
pure Catalyst; training collects only bounded samples (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.timefn import time_features, to_utc_timestamp_coerce
from ..ml.ensemble import AnomalyEnsemble
from ..operators.profiles import with_window_profiles
from ..sources.readers import read_transactions_csv


def prepare_transaction_features(tx: DataFrame) -> DataFrame:
    """§3.2 steps 2-5 (train.py:38-62): coerce-parse timestamp and drop
    failures (P2), drop null amounts (P3), add the four time features
    (F1-F3), annotate per-customer/merchant whole-group stats (J3/A3
    window form), project the 10 feature columns + ids."""
    ts = to_utc_timestamp_coerce("timestamp")
    tf = time_features(ts)
    parsed = (
        tx.withColumn("ts", ts)
        .na.drop(subset=["ts"])  # P2: errors='coerce' + dropna(ts)
        .na.drop(subset=["amount"])  # P3
        .withColumn("year", tf["year"])
        .withColumn("month", tf["month"])
        .withColumn("day_of_week", tf["day_of_week"])
        .withColumn("hour", tf["hour"])
    )
    return with_window_profiles(parsed)


def train_from_csv(spark: SparkSession, csv_path: str, model_dir: str, seed: int = 42) -> AnomalyEnsemble:
    """§3.2: CSV -> features -> fit the three anomaly models -> save
    bundle. Raises on an empty CSV like the reference (train.py:35-36).
    """
    tx = read_transactions_csv(spark, csv_path)
    if tx.isEmpty():
        raise ValueError(f"no rows in {csv_path}")
    features = prepare_transaction_features(tx)
    ens = AnomalyEnsemble(seed=seed)
    ens.fit(features)
    ens.save(model_dir)
    return ens


def score_transactions(
    spark: SparkSession,
    tx: DataFrame,
    model_dir: str | None = None,
    ensemble: AnomalyEnsemble | None = None,
) -> DataFrame:
    """§3.1/§3.3: the POST /score(/batch) plan on a static DataFrame —
    enrich, model-score, fuse, bucket. Loads the bundle when an
    in-memory ensemble isn't supplied (S6)."""
    if ensemble is None:
        if model_dir is None:
            raise ValueError("need model_dir or ensemble")
        ensemble = AnomalyEnsemble.load(spark, model_dir)
    features = prepare_transaction_features(tx)
    return ensemble.transform(features, id_col="transaction_id")
