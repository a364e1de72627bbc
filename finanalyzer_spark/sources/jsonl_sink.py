"""Manifest-committed JSONL sink — the WRITE half of the Python
DataSource API surface (the feed DataSource covers batch+stream READ).

    spark.dataSource.register(JsonlSinkDataSource)
    df.write.format("jsonl_manifest").mode("append").save(path)

Commit protocol (the part worth modeling — the reference's row-append
sink, finanalyzer/database/findatabase.py:167-186, commits per-row via
sqlite autocommit; a distributed sink can't):

* each task writes its rows to a uniquely named ``part-*.jsonl`` and
  returns the filename + row count in its commit message;
* the DRIVER's ``commit()`` — which Spark calls only when every task
  succeeded — writes a ``_MANIFEST`` JSON listing exactly the
  committed files, atomically via write-tmp-then-rename;
* ``abort()`` deletes whatever the failed attempt managed to write.

Visibility is manifest-based: `read_manifest` loads only files the
manifest names, so a crashed/duplicated task attempt can never leak
rows into a reader — the same snapshot-pointer idea as
pipeline/versioned.py, at file granularity. Speculative or retried
task attempts write distinct UUID names and only the attempt whose
message reaches ``commit()`` becomes visible.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST"


@dataclasses.dataclass
class _FileMsg(WriterCommitMessage):
    filename: str
    rows: int


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamWriter":
        return JsonlStreamWriter(self.options, schema)


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_manifest sink requires a path")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    # -- executor side -----------------------------------------------------
    def write(self, iterator) -> _FileMsg:
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                d = row.asDict()
                fh.write(
                    json.dumps({k: d.get(k) for k in self.fields}) + "\n"
                )
                n += 1
        return _FileMsg(filename=fname, rows=n)

    # -- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        files = sorted(m.filename for m in messages if m is not None)
        rows = sum(m.rows for m in messages if m is not None)
        prior: list[str] = []
        mpath = os.path.join(self.path, MANIFEST)
        if not self.overwrite and os.path.exists(mpath):
            with open(mpath) as fh:
                prior = json.load(fh)["files"]
        doc = {"files": prior + files, "rows_last_commit": rows}
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, mpath)  # atomic visibility flip

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming form: one manifest EPOCH per micro-batch, keyed by
    batchId — Spark redelivers a batch under the same id after a
    restart, and re-committing an epoch REPLACES its file list, so
    at-least-once delivery collapses to exactly-once visibility (the
    orphaned first-attempt files stay on disk but out of the manifest;
    same idea as the versioned store's txn pointer, per epoch)."""

    def __init__(self, options, schema) -> None:
        self.path = options.get("path") or options.get("checkpointLocation_path")
        if not self.path:
            raise ValueError("jsonl_manifest stream sink requires a path")
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> _FileMsg:
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                d = row.asDict()
                fh.write(json.dumps({k: d.get(k) for k in self.fields}) + "\n")
                n += 1
        return _FileMsg(filename=fname, rows=n)

    def commit(self, messages, batchId: int) -> None:
        mpath = os.path.join(self.path, MANIFEST)
        doc = {"epochs": {}}
        if os.path.exists(mpath):
            with open(mpath) as fh:
                prior = json.load(fh)
            if "epochs" in prior:
                doc = prior
        doc["epochs"][str(batchId)] = sorted(
            m.filename for m in messages if m is not None
        )
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, mpath)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass


def read_manifest(spark, path: str, schema: str | None = None):
    """Read ONLY manifest-committed files (uncommitted part files from
    crashed attempts are invisible, whatever is on disk)."""
    mpath = os.path.join(path, MANIFEST)
    with open(mpath) as fh:
        doc = json.load(fh)
    if "epochs" in doc:  # streaming manifest: epoch id → file list
        files = [
            f
            for _, fl in sorted(doc["epochs"].items(), key=lambda kv: int(kv[0]))
            for f in fl
        ]
    else:
        files = doc["files"]
    if not files:
        raise FileNotFoundError(f"manifest at {path} lists no files")
    paths = [os.path.join(path, f) for f in files]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)
