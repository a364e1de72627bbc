"""Arrow IPC (Feather V2) source and sink.

Spark has no native reader for the Arrow IPC file format — the
zero-copy interchange format pandas/polars/duckdb/feather all speak —
so this pairs a distributed writer (one `.arrow` file per partition,
written executor-side through the same Arrow batches `mapInPandas`
already materializes) with a distributed reader (`binaryFile` scan →
per-file `pyarrow.ipc.open_file` → Arrow batches), completing the
interchange-format matrix next to JSONL and ORC
(sources/textual.py).  Reference parity: the reference's only
interchange surface is CSV-in / SQLite-out
(/root/reference/finanalyzer/database/findatabase.py:79-110); this is
the columnar equivalent a Spark shop would actually exchange.

Scale shape: the writer shuffles nothing (each task serializes its
own partition; file names carry the partition id); the reader
parallelizes per file — at 100 TB you want many medium files, which
is exactly what a partitioned writer produces.  Schema round-trips
through Arrow, so long/double/string/bool/date survive bit-exact;
the reader takes the Spark schema from the FIRST file's footer read
on the driver (one footer, not a data scan)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.types import from_arrow_schema


def write_ipc(df: DataFrame, path: str) -> int:
    """Write `df` as one Arrow IPC file per non-empty partition under
    `path` (created if needed).  Returns the number of files written.
    Executor-side and shuffle-free: each task streams its own Arrow
    batches through a RecordBatchFileWriter."""
    os.makedirs(path, exist_ok=True)
    schema = df.schema

    def write_part(batches):
        import pyarrow as pa
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        import pandas as pd

        pid = TaskContext.get().partitionId()
        writer = None
        target = os.path.join(path, f"part-{pid:05d}.arrow")
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            tbl = pa.Table.from_pandas(pdf, preserve_index=False)
            if writer is None:
                writer = ipc.new_file(target, tbl.schema)
            writer.write_table(tbl)
            n += len(pdf)
        if writer is not None:
            writer.close()
        yield pd.DataFrame({"files": [1 if n else 0]})

    wrote = (
        df.mapInPandas(write_part, schema="files int")
        .agg(F.sum("files").alias("n"))
        .collect()[0]["n"]
    )
    return int(wrote or 0)


def read_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Arrow IPC files back into a DataFrame.

    The Spark schema comes from the first file's footer (driver-side
    metadata read); the data scan is a `binaryFile` load fanned out
    per file with `pyarrow.ipc.open_file` inside `mapInPandas`."""
    import glob

    import pyarrow.ipc as ipc

    first = sorted(glob.glob(os.path.join(path, "*.arrow")))
    if not first:
        raise FileNotFoundError(f"no .arrow files under {path}")
    with ipc.open_file(first[0]) as rd:
        spark_schema = from_arrow_schema(rd.schema)

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.arrow")
    )

    def read_part(batches):
        import io

        import pyarrow.ipc as ipc_

        for pdf in batches:
            for blob in pdf["content"]:
                with ipc_.open_file(io.BytesIO(bytes(blob))) as rd_:
                    tbl = rd_.read_all()
                yield tbl.to_pandas()

    return files.select("content").mapInPandas(
        read_part, schema=spark_schema
    )
