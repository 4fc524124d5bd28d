"""ML-pipeline operators (SURVEY.md §2B B4–B10) — the anomaly-detection
stages of the reference's changelog-evidenced Numaflow pipeline, as
deterministic DataFrame transforms.

Design rule (SURVEY.md §2C): everything except the model-inference seam is
a built-in-expression composition — scalers are closed-form math over
fitted stats joined back (broadcast), thresholds/ensembles/postprocess are
scalar expressions. Only ``reconstruction_error`` (B6) crosses into Python,
via Arrow-batched ``applyInPandas``.

Scale posture: fitted scaler/threshold state is a tiny per-key relation —
the join back to the 100 TB fact side is always a broadcast, never a
shuffle. This replaces the reference's Redis model registry reads
(CHANGELOG.md:124) with a relational artifact table.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_nan_inf(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """B4 (CHANGELOG.md:420): map NaN and ±Inf to 0.0 before modeling."""
    out = df
    for c in cols:
        bad = F.isnan(c) | (F.abs(F.col(c)) == F.lit(float("inf")))
        out = out.withColumn(c, F.when(bad, 0.0).otherwise(F.col(c)))
    return out


def fit_zscore(df: DataFrame, keys: Sequence[str], value: str) -> DataFrame:
    """Fit per-key standard-scaler stats (B5, stateful preproc artifacts,
    CHANGELOG.md:456). The fitted relation is one row per key."""
    return df.groupBy(*keys).agg(
        F.avg(value).alias("mu"),
        F.stddev_samp(value).alias("sigma"),
    )


def transform_zscore(
    df: DataFrame, fitted: DataFrame, keys: Sequence[str], value: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Apply z-score normalization: broadcast-join fitted stats back."""
    z = (F.col(value) - F.col("mu")) / F.col("sigma")
    return (
        df.join(F.broadcast(fitted), list(keys))
        .withColumn(out_col, F.when(F.col("sigma") == 0, 0.0).otherwise(z))
        .drop("mu", "sigma")
    )


def fit_minmax(df: DataFrame, keys: Sequence[str], value: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.min(value).alias("vmin"), F.max(value).alias("vmax")
    )


def transform_minmax(
    df: DataFrame, fitted: DataFrame, keys: Sequence[str], value: str,
    out_col: str = "scaled",
) -> DataFrame:
    rng = F.col("vmax") - F.col("vmin")
    scaled = (F.col(value) - F.col("vmin")) / rng
    return (
        df.join(F.broadcast(fitted), list(keys))
        .withColumn(out_col, F.when(rng == 0, 0.0).otherwise(scaled))
        .drop("vmin", "vmax")
    )


def tanh_scale(col, mu, sigma):
    """Tanh scaler (B5, CHANGELOG.md:190): closed-form
    0.5·(tanh(0.01·(x−μ)/σ)+1) — bounded to (0,1), robust to outliers."""
    return F.when(sigma == 0, 0.5).otherwise(
        0.5 * (F.tanh(0.01 * (col - mu) / sigma) + 1)
    )


def static_threshold(df: DataFrame, score: str, limit: float,
                     out_col: str = "anomaly") -> DataFrame:
    """B7 static thresholding (CHANGELOG.md:369): score vs config limit.
    Emits the binary flag and the ratio score (score/limit, the static
    "anomaly score" shape)."""
    # unrounded: one IEEE division of the same stored double is
    # bit-identical cross-engine; an in-query round(x, 6) would be the
    # only divergence source (the round-8 sf0.1 sweep tie class)
    return df.withColumn(out_col, (F.col(score) > limit).cast("int")).withColumn(
        f"{out_col}_score", F.col(score) / limit
    )


def quantile_threshold(df: DataFrame, keys: Sequence[str], score: str,
                       q: float = 0.95) -> DataFrame:
    """B7 trained thresholding (CHANGELOG.md:447): per-key percentile
    cutoff fitted from history — the relational stand-in for the trained
    threshold classifier."""
    return df.groupBy(*keys).agg(
        F.percentile(score, F.lit(q)).alias("threshold")
    )


def ensemble_score(df: DataFrame, scores: Sequence[str],
                   weights: Sequence[float], out_col: str = "ensemble") -> DataFrame:
    """B8 ensemble scoring (CHANGELOG.md:317): weighted row-wise combine."""
    expr = None
    for c, w in zip(scores, weights):
        term = F.col(c) * F.lit(w)
        expr = term if expr is None else expr + term
    return df.withColumn(out_col, expr / F.lit(sum(weights)))


def unified_score(df: DataFrame, keys: Sequence[str], score: str,
                  how: str = "max") -> DataFrame:
    """B9 unified anomaly score (CHANGELOG.md:293): one score per
    app/namespace from per-metric scores (max or mean)."""
    agg = F.max(score) if how == "max" else F.avg(score)
    return df.groupBy(*keys).agg(agg.alias("unified_score"))


def postprocess_norm(col, ceiling: float = 10.0):
    """B10 postprocess (CHANGELOG.md:42): squash a raw score into the
    emitted [0, ceiling] range via tanh."""
    return F.round(F.tanh(col) * ceiling, 6)


def reconstruction_error(
    df: DataFrame,
    keys: Sequence[str],
    vec_col: str,
    out_schema: str | None = None,
) -> DataFrame:
    """B6 model-inference seam (CHANGELOG.md:139): "autoencoder" scoring
    of pre-assembled window vectors via Arrow-batched mapInPandas.

    The stand-in model is deterministic: reconstruction = centered moving
    average (window 3) of the vector; error = mean squared residual. The
    Spark-side contract — Arrow batches of (keys, window_vec) in, typed
    rows out — is exactly what a real torch/numalogic model plugs into;
    swap `_score_batches`.

    Batch, not group, on purpose: each input row already IS one complete
    inference unit (the window vector), so per-GROUP applyInPandas would
    pay one Python call + pandas frame per (user, hour) — ~1.4 ms × 95k
    groups ≈ 2 minutes at sf0.1 — where per-BATCH mapInPandas scores
    ~10k windows per call (and real models want batched input anyway).
    """
    import numpy as np

    out_schema = out_schema or (
        ", ".join(f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
        + ", recon_error double"
    )
    cols = list(keys) + [vec_col]

    def _score_batches(batches):
        kernel = np.ones(3) / 3.0
        for pdf in batches:
            errs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype="float64")
                if len(x) == 0:
                    errs.append(0.0)
                    continue
                recon = np.convolve(
                    np.pad(x, 1, mode="edge"), kernel, mode="valid"
                )
                errs.append(float(np.mean((x - recon) ** 2)))
            out = pdf[list(keys)].copy()
            out["recon_error"] = errs
            yield out

    return df.select(*cols).mapInPandas(_score_batches, schema=out_schema)
