"""Custom stateful streaming operator: exactly-once-per-key emission.

``applyInPandasWithState`` implementation of streaming dedupe — the
streaming twin of the batch cache-hit anti-join (J4,
app/app_controller.py:77-79): the first row of each key is emitted, every
later arrival (same micro-batch or any later one) is dropped. State is one
flag per key, persisted in the streaming state store, so re-delivery
across micro-batches cannot re-emit.

This is the "custom stateful operator" extension point: the same shape
(groupByKey → pandas state function) hosts sessionization, per-host crawl
budgets, incremental per-domain quality counters, etc.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


STATE_SCHEMA = "seen boolean"


def _dedupe_fn(
    key, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    emitted = state.exists and state.get[0]
    for batch in batches:
        if emitted or batch.empty:
            continue
        yield batch.iloc[[0]]
        emitted = True
    state.update((bool(emitted),))


def dedupe_stream(
    stream: DataFrame, key_col: str, output_schema: StructType
) -> DataFrame:
    """Streaming DataFrame → streaming DataFrame with the first occurrence
    of each ``key_col`` value only, across all micro-batches."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _dedupe_fn,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
