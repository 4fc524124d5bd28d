"""Arbitrary stateful streaming operators via applyInPandasWithState
(SURVEY.md §2C streaming-only: counter resets, stateful scalers B5).

State layout mirrors what the reference kept in Redis per composite key
(CHANGELOG.md:456 stateful preproc artifacts; :124 model registry): a
small numeric tuple per key, updated per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_stats(grouped) -> DataFrame:
    """Per-key running (count, sum, sum-of-squares) across micro-batches →
    emits the key's cumulative mean/std after each batch — the streaming
    form of the fitted z-score scaler (B5): downstream transforms read the
    latest row per key as the model artifact.

    ``grouped`` is ``streaming_df.groupBy(key_col)``.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, s2 = state.get
        else:
            n, s, s2 = 0, 0.0, 0.0
        for pdf in pdfs:
            # dropna once so count/sum/sumsq see the same rows — len() is
            # O(1) where Series.count() would re-scan for non-null.
            v = pdf["value"].dropna()
            n += len(v)
            s += float(v.sum())
            s2 += float((v * v).sum())
        state.update((n, s, s2))
        mu = s / n if n else 0.0
        var = max(s2 / n - mu * mu, 0.0) if n else 0.0
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "mean": [mu],
                "std": [var ** 0.5],
            }
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType="key string, n long, mean double, std double",
        stateStructType="n long, s double, s2 double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
