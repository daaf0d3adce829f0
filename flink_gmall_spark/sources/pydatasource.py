"""Custom connector via the Python Data Source API (PySpark ≥ 4).

The reference's CDC source (S5, BaseDBApp.java:67-112) is a *pluggable
connector* — Flink's MySQLSource emitting a Debezium-style
``{database, table, type, data}`` envelope per changelog op. This module
is the Spark-4-native equivalent: a registered data source, so any
session can ``spark.read.format("gmall_cdc")`` and get the envelope
stream without knowing how it is produced.

Scale shape: one InputPartition per parquet row group — partition
planning mirrors the file layout, so executors read row groups in
parallel and no payload routes through the driver. Rows are produced as
Arrow RecordBatches (vectorized pandas build, one batch per op type per
row group), not Python-object rows — the Arrow fast path of the data
source API. The envelope payload is identical to plans.dwd's
DataFrame-synthesized changelog (insert per order + later PAID update
for finished orders), which is what lets the dim-upsert merge over this
source share ORACLE_CDC_DIM_UPSERT bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CDC_SOURCE_SCHEMA = (
    "database string, table string, type string, data string, "
    "op_us long, op_seq long"
)

_ORDER_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


class GmallCDCDataSource(DataSource):
    """``spark.read.format("gmall_cdc").option("path", orders_parquet)``"""

    @classmethod
    def name(cls) -> str:
        return "gmall_cdc"

    def schema(self) -> str:
        return CDC_SOURCE_SCHEMA

    def reader(self, schema) -> "_CDCEnvelopeReader":
        return _CDCEnvelopeReader(self.options)


def _arrow_envelope(df, typ: str, status, ts, seq: int, null_payload: bool = False):
    """One Arrow RecordBatch of CDC envelopes for a set of orders.

    ``null_payload`` is the delete shape (the after-image carries only
    the key — plans.dwd._order_changelog_with_deletes emits the same
    all-NULL payload via to_json; from_json parses both identically).
    """
    import json

    import pandas as pd
    import pyarrow as pa

    arrow_schema = pa.schema(
        [
            ("database", pa.string()),
            ("table", pa.string()),
            ("type", pa.string()),
            ("data", pa.string()),
            ("op_us", pa.int64()),
            ("op_seq", pa.int64()),
        ]
    )
    if null_payload:
        data = [
            json.dumps(
                {
                    "id": int(k),
                    "order_status": None,
                    "total_amount": None,
                    "create_time": None,
                }
            )
            for k in df["o_orderkey"]
        ]
    else:
        data = [
            json.dumps(
                {
                    "id": int(k),
                    "order_status": s,
                    "total_amount": float(a),
                    "create_time": t,
                }
            )
            for k, s, a, t in zip(
                df["o_orderkey"],
                status,
                df["o_totalprice"],
                ts.dt.strftime("%Y-%m-%d %H:%M:%S"),
            )
        ]
    out = pd.DataFrame(
        {
            "database": "gmall",
            "table": "order_info",
            "type": typ,
            "data": data,
            "op_us": ts.astype("int64") // 1000,
            "op_seq": seq,
        }
    )
    return pa.RecordBatch.from_pandas(out, schema=arrow_schema)


# op phases of the synthesized changelog: the insert wave, the PAID
# update wave ('F' orders, +1 day), and — withDeletes only — the delete
# wave (o_orderkey % 7 == 0, +2 days), mirroring
# plans.dwd._order_changelog_with_deletes.
_PHASE_INSERT, _PHASE_UPDATE, _PHASE_DELETE = 0, 1, 2


def _phase_batch(path: str, rg: int, phase: int):
    """The RecordBatch for one (row group, op phase), or None if the
    phase selects no rows from that group. Executor-side."""
    import pandas as pd
    import pyarrow.parquet as pq

    df = (
        pq.ParquetFile(path)
        .read_row_group(rg, columns=_ORDER_COLS)
        .to_pandas()
    )
    if phase == _PHASE_INSERT:
        return _arrow_envelope(df, "insert", df["o_orderstatus"], df["o_orderdate"], 0)
    if phase == _PHASE_UPDATE:
        fin = df[df["o_orderstatus"] == "F"]
        if not len(fin):
            return None
        return _arrow_envelope(
            fin, "update", ["PAID"] * len(fin), fin["o_orderdate"] + pd.Timedelta(days=1), 1
        )
    dele = df[df["o_orderkey"] % 7 == 0]
    if not len(dele):
        return None
    return _arrow_envelope(
        dele, "delete", None, dele["o_orderdate"] + pd.Timedelta(days=2), 2,
        null_payload=True,
    )


class _CDCEnvelopeReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options["path"]
        self.with_deletes = (
            str(options.get("withdeletes", "false")).lower() == "true"
        )

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [InputPartition(i) for i in range(n)]

    def read(self, partition):
        phases = (
            (_PHASE_INSERT, _PHASE_UPDATE, _PHASE_DELETE)
            if self.with_deletes
            else (_PHASE_INSERT, _PHASE_UPDATE)
        )
        for phase in phases:
            batch = _phase_batch(self.path, partition.value, phase)
            if batch is not None:
                yield batch


# --- Custom sink: batched dim writes with two-phase commit ------------------


@dataclass
class _SinkCommit(WriterCommitMessage):
    file: str
    rows: int


class GmallDimSinkDataSource(DataSource):
    """``df.write.format("gmall_dim_sink").option("path", dir).save()``

    The sink-side counterpart of the connector above — the reference's
    JDBC batch sink (S6, ClickHouseUtil.java:17-50) and Phoenix dim
    upserts (S7, DimSink.java:29-61) re-expressed as a Spark data source
    with a real two-phase commit: executors write per-partition staging
    files and return commit messages; the driver publishes a manifest
    listing exactly the committed files. Readers that trust only the
    manifest get exactly-once visibility — a failed/retried task's
    orphan staging file is never listed (the idempotence the reference
    approximates with Kafka transactions, T9).
    """

    @classmethod
    def name(cls) -> str:
        return "gmall_dim_sink"

    def writer(self, schema, overwrite: bool) -> "_DimSinkWriter":
        return _DimSinkWriter(self.options["path"])


class _DimSinkWriter(DataSourceWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator) -> _SinkCommit:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        # one buffered file per partition — the batched-insert analogue
        with open(fname, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _SinkCommit(file=fname, rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(m.file for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


# --- Streaming flavor of the CDC connector ----------------------------------


class _CDCEnvelopeStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the same changelog: the offset is
    the next unread parquet row group; each ``read`` hands the engine all
    groups that have appeared since the last offset (the Kafka-like
    all-available-per-trigger policy — availableNow falls back to
    single-batch execution for Python streaming sources, so draining must
    not depend on multiple triggers). ``readBetweenOffsets`` re-derives
    any committed range, which is what makes checkpoint replay exact.
    Rows are returned as a materialized list: the engine's prefetch cache
    copies the iterator, which a generator cannot survive.

    ``maxRowGroupsPerBatch`` (0/absent = uncapped) is the Kafka
    maxOffsetsPerTrigger analog: each ``read`` admits at most that many
    row groups, so a deep backlog replays as bounded micro-batches —
    state stores, sinks and checkpoints see production-sized increments
    during recovery. The bound derives from the PASSED start offset, so
    it is restart-safe (unlike a driver-side cursor in ``latestOffset``,
    see _CDCEnvelopeDistStreamReader). Only meaningful with a continuous
    trigger: availableNow is single-batch for Python streaming sources
    (verified on Spark 4.1) and would stop at the first capped batch.

    ``withDeletes`` switches the changelog to the delete-bearing shape
    AND re-keys the offset space to op-phase waves: unit = phase *
    n_row_groups + row_group, phases streamed insert → update → delete.
    A key's insert and its later update/delete therefore genuinely
    straddle micro-batches (a real topic's op-time order), which is
    what the retraction machine's cross-batch semantics are exercised
    against — without deletes the offset space stays exactly the
    pre-existing per-row-group form, so committed checkpoints of
    existing queries are untouched."""

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.max_rg_per_batch = int(options.get("maxrowgroupsperbatch", 0))
        self.with_deletes = (
            str(options.get("withdeletes", "false")).lower() == "true"
        )

    def _num_row_groups(self) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self.path).metadata.num_row_groups

    def _num_units(self) -> int:
        n = self._num_row_groups()
        return 3 * n if self.with_deletes else n

    def _rows_for(self, unit: int):
        if self.with_deletes:
            phase, rg = divmod(unit, self._num_row_groups())
            batches = [_phase_batch(self.path, rg, phase)]
        else:
            batch_reader = _CDCEnvelopeReader({"path": self.path})
            batches = list(batch_reader.read(InputPartition(unit)))
        for batch in batches:
            if batch is None:
                continue
            for row in batch.to_pylist():
                yield (
                    row["database"],
                    row["table"],
                    row["type"],
                    row["data"],
                    row["op_us"],
                    row["op_seq"],
                )

    def initialOffset(self) -> dict:
        return {"rg": 0}

    def read(self, start: dict):
        n = self._num_units()
        rg = start["rg"]
        if rg >= n:
            # caught up: empty batch, offset unchanged. Note the shape:
            # the engine needs an object that is both next()-able and
            # copy.copy()-able — a list_iterator qualifies, a bare list
            # or a generator does not.
            return iter([]), start
        end = min(n, rg + self.max_rg_per_batch) if self.max_rg_per_batch else n
        rows = [r for g in range(rg, end) for r in self._rows_for(g)]
        return iter(rows), {"rg": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # same iterator contract as read(): the engine rejects a bare
        # list ("Expected types: iterator") — only hit on RESTART when an
        # uncommitted epoch replays, which is why a checkpoint test that
        # stops cleanly never sees it
        return iter(
            [r for g in range(start["rg"], end["rg"]) for r in self._rows_for(g)]
        )

    def commit(self, end: dict) -> None:
        pass


class GmallCDCStreamDataSource(DataSource):
    """``spark.readStream.format("gmall_cdc_stream")`` — the unbounded
    form of the CDC connector (the reference's actual deployment shape:
    BaseDBApp tails the changelog forever)."""

    @classmethod
    def name(cls) -> str:
        return "gmall_cdc_stream"

    def schema(self) -> str:
        return CDC_SOURCE_SCHEMA

    def simpleStreamReader(self, schema) -> _CDCEnvelopeStreamReader:
        return _CDCEnvelopeStreamReader(self.options)


class _CDCEnvelopeDistStreamReader(DataSourceStreamReader):
    """The scale-correct streaming reader: unlike the Simple variant
    (whose reads run on the DRIVER through the prefetch cache), this one
    plans offset ranges on the driver and executes ``read`` per
    InputPartition on EXECUTORS, Arrow-batched — one partition per
    parquet row group in the trigger's range. This is the form that
    holds at 1000 executors; the Simple reader stays as the
    minimal-offset-logic reference implementation."""

    def __init__(self, options) -> None:
        self.path = options["path"]

    def _num_row_groups(self) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self.path).metadata.num_row_groups

    def initialOffset(self) -> dict:
        return {"rg": 0}

    def latestOffset(self) -> dict:
        # No admission control here, deliberately: ``latestOffset()`` in
        # the Python DataSourceStreamReader API takes no start offset, so
        # a per-trigger cap would need a driver-side cursor that resets on
        # query restart — measured on Spark 4.1, that re-plans already
        # committed ranges and DUPLICATES data. Rate limiting lives on the
        # Simple reader (``maxRowGroupsPerBatch``), whose ``read(start)``
        # derives the bound from the committed offset and is restart-safe
        # by construction.
        return {"rg": self._num_row_groups()}

    def partitions(self, start: dict, end: dict):
        return [InputPartition(rg) for rg in range(start["rg"], end["rg"])]

    def read(self, partition):
        # executor-side: same Arrow-batched envelope builder as the batch
        # connector — one row group per task
        yield from _CDCEnvelopeReader({"path": self.path}).read(partition)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class GmallCDCDistStreamDataSource(DataSource):
    """``spark.readStream.format("gmall_cdc_stream_dist")`` — executor-
    parallel streaming CDC connector (see _CDCEnvelopeDistStreamReader)."""

    @classmethod
    def name(cls) -> str:
        return "gmall_cdc_stream_dist"

    def schema(self) -> str:
        return CDC_SOURCE_SCHEMA

    def streamReader(self, schema) -> _CDCEnvelopeDistStreamReader:
        return _CDCEnvelopeDistStreamReader(self.options)
