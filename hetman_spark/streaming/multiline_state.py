"""P5 as a STREAMING stateful operator: multiline stitching with
applyInPandasWithState.

The reference stitches multiline logs in a goroutine holding one
pending anchor in memory (/root/reference/internal/parser/parser.go:93-128):
a non-matching line starts a new anchor and flushes the previous one;
matching lines append, joined by single spaces.  The reference has NO
timeout — an unterminated multiline waits forever (TODO at
parser.go:119).  This rebuild adds a processing-time timeout that
flushes a stale pending anchor, fixing that gap.

State per file_id: (pending_line_no, pending_text).  Lines are sorted
by line_no inside each micro-batch; cross-batch order is guaranteed by
the file source feeding whole files per trigger.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("file_id", StringType()),
        StructField("line_no", LongType()),
        StructField("line", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("pending_line_no", LongType()),
        StructField("pending_text", StringType()),
    ]
)


def make_stitcher(pattern: str, timeout_ms: int | None = 60_000):
    """Returns the applyInPandasWithState function for a given
    continuation pattern (e.g. r"^\\s").  timeout_ms=None disables the
    stale-anchor timeout (see stitch_multiline_stream)."""
    rx = re.compile(pattern)

    def stitch(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        file_id = key[0]

        if state.hasTimedOut:
            # flush the stale pending anchor (the reference never
            # flushes — parser.go:119 TODO; we do)
            if state.exists:
                line_no, text = state.get
                state.remove()
                yield pd.DataFrame({"file_id": [file_id], "line_no": [line_no], "line": [text]})
            return

        pending: tuple[int, str] | None = state.get if state.exists else None
        out_rows: list[tuple[str, int, str]] = []

        for pdf in pdfs:
            # the stitch is inherently sequential per file, but the row
            # access need not be: one sort, then a zip over raw numpy
            # arrays (iterrows materializes a pandas Series per row,
            # ~10x slower on wide batches)
            s = pdf.sort_values("line_no")
            for line_no, line in zip(s["line_no"].to_numpy(), s["line"].to_numpy()):
                if rx.search(line) and pending is not None:
                    # continuation: append joined by a single space
                    pending = (pending[0], pending[1] + " " + line)
                else:
                    if pending is not None:
                        out_rows.append((file_id, pending[0], pending[1]))
                    pending = (int(line_no), line)

        if pending is not None:
            state.update(pending)
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["file_id", "line_no", "line"])

    return stitch


def stitch_multiline_stream(
    lines: DataFrame, pattern: str, timeout_ms: int | None = 60_000
) -> DataFrame:
    """Streaming lines (file_id, line_no, line) -> stitched records.

    Usage:
        out = stitch_multiline_stream(readStream_lines, r"^\\s")
        out.writeStream.outputMode("append")...

    timeout_ms=None disables the stale-anchor timeout entirely
    (GroupStateTimeout.NoTimeout): required for bounded availableNow
    DRAINS that must terminate on their own — with a processing-time
    timeout registered, Spark keeps the drained query alive running
    micro-batches until every pending timeout has fired (measured:
    a 1 s timeout held a fully-drained query active 60+ s).  The
    continuous `--follow` mode keeps the default timeout: there the
    periodic flush of a stale anchor is the point."""
    return lines.groupBy("file_id").applyInPandasWithState(
        make_stitcher(pattern, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
