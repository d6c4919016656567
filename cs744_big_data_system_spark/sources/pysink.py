"""Custom Python Data Source WRITER (Spark 4 ``pyspark.sql.datasource``
API, the write side — sources/generator.py covers the read side):
a JSON-lines sink with a real two-phase commit protocol.

Each executor task streams its partition to a uniquely-named
``part-*.jsonl`` file and returns a WriterCommitMessage naming it; the
DRIVER's commit() then atomically publishes the manifest
(``_committed.json``) listing exactly the files of the successful
attempt — a reader that honors the manifest never sees files from
failed/speculative tasks (abort() deletes them). That is the same
commit discipline every distributed sink needs at 100 TB: task output
is invisible until the single driver-side commit point.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class FileCommit(WriterCommitMessage):
    file: str
    rows: int


class JsonlSinkDataSource(DataSource):
    """``format("jsonlsink")`` — option: path (output directory)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> "JsonlSinkWriter":
        return JsonlSinkWriter(self.options["path"], [f.name for f in schema.fields])


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, path: str, cols: list[str]):
        self.path = path
        self.cols = cols

    def write(self, rows) -> FileCommit:
        """Executor-side: one file per partition, streamed row-by-row
        (memory is one row, never the partition)."""
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in rows:
                f.write(json.dumps({c: row[c] for c in self.cols}) + "\n")
                n += 1
        return FileCommit(file=name, rows=n)

    def commit(self, messages) -> None:
        """Driver-side atomic publish: the manifest names exactly the
        committed attempt's files (tmp + rename, so a reader never
        sees a half-written manifest)."""
        manifest = {
            "files": sorted(m.file for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        tmp = os.path.join(self.path, f"_committed.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_committed.json"))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.unlink(os.path.join(self.path, m.file))
            except FileNotFoundError:
                pass


def read_committed(spark, path: str, schema: str):
    """Read back ONLY the manifest's files (the committed snapshot)."""
    with open(os.path.join(path, "_committed.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, name) for name in manifest["files"]]
    return spark.read.schema(schema).json(files)
