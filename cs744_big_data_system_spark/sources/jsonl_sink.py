"""Custom Python Data Source SINK: atomic JSONL writer with the
two-phase task-commit protocol (Spark 4 ``pyspark.sql.datasource``
writer API).

Why it matters at scale: a 1000-task write that dies half-way must
leave NOTHING visible. Each task writes to a ``*.jsonl.tmp`` file and
reports it in its commit message; only the DRIVER's commit() renames
the batch to visibility (rename is atomic per file), and abort()
deletes every temporary — the same temp-then-publish contract file
committers (Hadoop FileOutputCommitter v1, Delta's transaction log)
implement, here in its minimal honest form.

Usage::

    spark.dataSource.register(JsonlSinkDataSource)
    df.write.format("jsonlsink").option("path", dir).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _TaskFile(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlSinkDataSource(DataSource):
    """``format("jsonlsink")`` — option: path (output directory)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options["path"], overwrite)


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> _TaskFile:
        # Task-side: spill to a temp name invisible to readers. If the
        # iterator itself fails mid-write the task deletes its own
        # partial temp before re-raising — abort() only ever sees
        # commit messages from tasks that RETURNED, so a crashed task
        # must not rely on the driver for cleanup.
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        try:
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return _TaskFile(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        # Driver-side, runs once after EVERY task succeeded: publish
        # via atomic per-file rename. Overwrite also sweeps stale
        # temporaries from prior killed attempts (a kill -9'd executor
        # never runs the task-side cleanup above).
        committing = {m.tmp_path for m in messages}
        for f in os.listdir(self.path):
            full = os.path.join(self.path, f)
            if self.overwrite and f.endswith(".jsonl"):
                os.remove(full)
            elif f.endswith(".tmp") and full not in committing:
                os.remove(full)
        for m in messages:
            os.rename(m.tmp_path, m.tmp_path[: -len(".tmp")])

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
