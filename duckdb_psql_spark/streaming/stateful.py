"""Custom stateful streaming operator via ``applyInPandasWithState``.

The charter's escape hatch for semantics the built-in windowed aggregates
can't express (SURVEY.md §2.C streaming note): arbitrary per-key state
carried across micro-batches. This module implements a running per-user
activity profile — event count, value total, and a high-value-event flag
with a configurable threshold — the canonical shape for fraud/quality
counters over an event stream.

Scale notes: state lives in the executor-local state store keyed by
``user_col`` (shuffled once per micro-batch on that key); Arrow batches
carry the rows, so Python sees columnar chunks, not rows. State size is
O(distinct keys) — bounded, no per-event growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, n_high_value bigint"
)
STATE_SCHEMA = "n bigint, total double, n_high bigint"


def running_user_profile(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    value_col: str = "value",
    high_value_threshold: float = 100.0,
) -> DataFrame:
    """Per-user running (count, value-total, high-value-count) across
    micro-batches. Works on a streaming DataFrame; emits one updated row
    per user per micro-batch (update semantics).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, n_high = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            vals = pdf[value_col]
            n += int(len(pdf))
            total += float(vals.sum())
            n_high += int((vals > high_value_threshold).sum())
        state.update((n, total, n_high))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "n_high_value": [n_high],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
