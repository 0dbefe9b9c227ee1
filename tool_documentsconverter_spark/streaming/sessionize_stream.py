"""Custom stateful streaming operator: gap-based sessionization of the
transcript stream via ``applyInPandasWithState``.

The batch twin is the `sessionize` entry in __spark_entry__.py (lag
window + running sum); streaming cannot window over unbounded history,
so per-conversation session state (current session id, event count,
start/last timestamps) lives in the state store and survives across
micro-batches — the canonical "custom stateful operator" shape for
operators Spark's built-in streaming aggregations can't express.

Scale notes: state is one tiny fixed-width row per ACTIVE conversation
(bounded by dropping state for conversations idle past `idle_drop_
seconds` via processing-time timeout), keyed by conv_id so the state
store shards with the shuffle — no driver-side state, no unbounded
growth.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, session_id long, events long, "
    "session_start_epoch long, last_ts_epoch long, closed boolean"
)
STATE_SCHEMA = "session_id long, events long, start_ts long, last_ts long"


def make_sessionizer(gap_seconds: int = 1800,
                     idle_drop_seconds: int = 24 * 3600):
    """Returns the (key, batches, state) -> DataFrames function for
    applyInPandasWithState.  Emits one row per session PER MICRO-BATCH
    (update semantics): `closed=True` rows are final (a newer event
    opened the next session, or the conversation idled out);
    `closed=False` rows are the running state of the open session."""

    def fn(key: Tuple[Any, ...],
           batches: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            if state.exists:
                session_id, events, start, last = state.get
                state.remove()
                yield pd.DataFrame(
                    [(conv_id, session_id, events, start, last, True)],
                    columns=["conv_id", "session_id", "events",
                             "session_start_epoch", "last_ts_epoch",
                             "closed"],
                )
            return

        if state.exists:
            session_id, events, start, last = state.get
        else:
            session_id, events, start, last = 0, 0, None, None

        # a group's rows arrive as MULTIPLE chunks with no cross-chunk
        # ordering guarantee (>10k events/micro-batch splits): collect
        # all chunks first and sort ts ONCE globally — sorting per
        # chunk would process events out of order across chunk
        # boundaries and silently mis-split sessions.  Bounded memory:
        # one micro-batch's events for one conversation.
        chunks = [pdf for pdf in batches if not pdf.empty]
        out = []
        if chunks:
            all_ts = pd.concat([pdf["ts"] for pdf in chunks]).sort_values()
            for ts in all_ts:
                epoch = int(pd.Timestamp(ts).timestamp())
                if last is not None and epoch - last > gap_seconds:
                    # close the previous session, open the next
                    out.append((conv_id, session_id, events, start,
                                last, True))
                    session_id += 1
                    events, start = 0, epoch
                if start is None:
                    start = epoch
                events += 1
                last = epoch

        if last is not None:
            state.update((session_id, events, start, last))
            state.setTimeoutDuration(idle_drop_seconds * 1000)
            out.append((conv_id, session_id, events, start, last, False))
        if out:
            yield pd.DataFrame(
                out,
                columns=["conv_id", "session_id", "events",
                         "session_start_epoch", "last_ts_epoch", "closed"],
            )

    return fn


def sessionize_stream(stream: DataFrame, gap_seconds: int = 1800,
                      idle_drop_seconds: int = 24 * 3600) -> DataFrame:
    """(conv_id, ts, ...) stream -> per-session update rows.  State is
    keyed by conv_id; a >gap_seconds silence starts a new session, a
    >idle_drop_seconds silence drops the conversation's state entirely
    (processing-time timeout) so the store stays bounded."""
    return (
        stream.select("conv_id", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, idle_drop_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
