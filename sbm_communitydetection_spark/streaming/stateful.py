"""Custom stateful streaming operator — ``applyInPandasWithState``
(SURVEY.md §2.10, the "custom stateful operators" half of Structured
Streaming the batched replay driver does not exercise).

``stream_sessionize`` keeps one tiny state row per conversation
(last-turn epoch-ms, running session ordinal) and assigns every arriving
turn its session index incrementally — the streaming twin of
operators/extract.sessionize, whose drained output it must equal
row-for-row (tested, and gated against the same DuckDB lag/running-sum
oracle).  Reference analogue: none (the reference replays arrays
in-process); this is the piece a production interaction-log feed needs
to sessionize without re-scanning history each batch.

Scale shape: state is O(live conversations) × 16 bytes, sharded by the
stream's groupBy(conv_id) exchange exactly like any keyed aggregation;
each micro-batch moves only its own turns plus the touched state rows.
The per-group kernel is numpy-vectorized over the batch's turns (one
Arrow crossing per group-batch, no per-row Python).

Ordering contract: turns for a conversation arrive in ``turn_idx`` order
ACROSS micro-batches (the replay-ordered feed guarantee, same as the
edge_seq contract in stream_driver); within a batch any order is fine —
the kernel sorts its slice.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windowed import TURN_SCHEMA, epoch_sink

SESSION_OUT_SCHEMA = "conv_id string, turn_idx int, session_idx long"
SESSION_STATE_SCHEMA = "last_ms long, sess long"


def _sessionize_group(gap_ms: int):
    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (conv_id,) = key
        if state.exists:
            last_ms, sess = state.get
        else:
            last_ms, sess = None, 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values("turn_idx")
        ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        prev = np.concatenate(
            ([last_ms if last_ms is not None else ms[0]], ms[:-1])
        )
        boundary = (ms - prev) > gap_ms
        sess_idx = sess + np.cumsum(boundary)
        state.update((int(ms[-1]), int(sess_idx[-1])))
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": pdf["turn_idx"].to_numpy(),
                "session_idx": sess_idx.astype("int64"),
            }
        )

    return fn


def stream_sessionize(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_ms: int,
):
    """Drain what is currently in ``source_dir`` (availableNow), emitting
    (conv_id, turn_idx, session_idx) rows through the idempotent
    per-epoch parquet sink; per-conversation state persists in the
    checkpoint across invocations."""
    stream = spark.readStream.schema(TURN_SCHEMA).parquet(source_dir)
    sess = stream.groupBy("conv_id").applyInPandasWithState(
        _sessionize_group(gap_ms),
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return (
        sess.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(epoch_sink(out_dir))
        .trigger(availableNow=True)
        .start()
    )
