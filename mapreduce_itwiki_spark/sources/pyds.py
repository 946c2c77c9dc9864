"""Custom connector via Spark 4's Python DataSource API — the
extension point a user reaches for when a feed has no built-in reader
(internal services, bespoke formats, synthetic generators). The
reference's equivalent extension surface is its hand-rolled Hadoop
InputFormat (``/root/reference/src/mr/CountReference.java:94-203``,
the Mahout-style XmlInputFormat with custom split handling); this is
the same idea expressed Spark-first: declare ``partitions()`` and the
planner schedules one task per partition — splits, retries, and
locality come from the framework instead of 110 lines of byte
arithmetic.

The demo source emits a deterministic document stream (id + md5
fingerprint + a size column derived from the hash), so an oracle can
replay it exactly with SQL ``range()`` — proving the connector's
partitioning delivers every row exactly once with no seam defects at
partition boundaries.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

SYNTH_NAME = "synthdocs"


class SynthDocsSource(DataSource):
    """``spark.read.format("synthdocs").option("n", ...).option("parts", ...)``."""

    @classmethod
    def name(cls) -> str:
        return SYNTH_NAME

    def schema(self) -> str:
        return "id long, fp string, size int"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", "1000"))
        self.parts = int(options.get("parts", "8"))
        self.lo_bound = 0  #: narrowed by pushed id predicates
        self.hi_bound = self.n  # exclusive

    def pushFilters(self, filters):
        """Predicate pushdown into the connector (the Python-source
        analogue of PushedFilters on a parquet scan): range predicates
        on the ordered ``id`` column narrow [lo_bound, hi_bound), and
        ``partitions()`` then never emits a split outside it — pruning
        happens at PLANNING time, before any task launches. Filters we
        can't interpret are yielded back for Spark to evaluate."""
        for f in filters:
            # getattr guard: composite shapes (Not, And/Or wrappers)
            # carry no .attribute — they must be yielded back, not crash
            # the planner with an AttributeError
            if getattr(f, "attribute", None) == ("id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo_bound = max(self.lo_bound, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo_bound = max(self.lo_bound, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi_bound = min(self.hi_bound, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo_bound = max(self.lo_bound, f.value)
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                    continue
            yield f  # not handled here — Spark evaluates it post-scan

    def partitions(self):
        """Static range split over the (possibly filter-narrowed) id
        range — the planner runs one task per returned partition, in
        parallel across executors (the Python-source analogue of
        InputFormat.getSplits)."""
        lo0, hi0 = self.lo_bound, max(self.lo_bound, self.hi_bound)
        if lo0 >= hi0:
            return [InputPartition((0, 0))]  # planner requires >= 1
        step = -(-(hi0 - lo0) // self.parts)  # ceil
        return [
            InputPartition((lo, min(lo + step, hi0)))
            for lo in range(lo0, hi0, step)
        ]

    def read(self, partition):
        """Runs ON EXECUTORS, one call per partition. Yields ONE Arrow
        RecordBatch per partition instead of per-row tuples — the
        vectorized producer path the DataSource API supports: the whole
        partition crosses the Python↔JVM boundary as a single columnar
        batch with no per-row pickling. Deterministic: a pure function
        of the id."""
        import hashlib

        import pyarrow as pa

        lo, hi = partition.value
        ids = list(range(lo, hi))
        fps = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        yield pa.RecordBatch.from_pydict(
            {
                "id": pa.array(ids, pa.int64()),
                "fp": pa.array(fps, pa.string()),
                "size": pa.array([int(f[:4], 16) for f in fps], pa.int32()),
            }
        )


# The reader classes ship to Python workers via cloudpickle, which
# serializes importable classes BY REFERENCE — a worker whose
# sys.path lacks this package would fail the import at unpickle time
# (e.g. a driver launched from outside the repo root). Registering the
# module by VALUE embeds the class definitions in the pickle itself:
# the connector then runs anywhere, matching how a packaged deployment
# would ship it inside the job's environment.
try:  # cloudpickle < 2.0 lacks register_pickle_by_value
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - defensive; reference pickling still works in-repo
    pass


JSONL_SINK_NAME = "jsonl_manifest"


class JsonlManifestSink(DataSource):
    """``df.write.format("jsonl_manifest").option("path", ...).save()``
    — the WRITE side of the Python DataSource API, implementing the
    task-commit protocol a distributed sink needs for exactly-once
    output: each task writes to a uniquely-named temp file and returns
    a commit message; only the driver's ``commit()`` promotes temp
    files to final names and publishes a ``_MANIFEST.json`` naming
    exactly the committed files. Readers that trust only the manifest
    never see output from failed/speculative/aborted task attempts —
    the same contract Hadoop's FileOutputCommitter / Spark's v2 commit
    protocol provide for built-in sinks (and the reference gets only by
    having a single reducer write a single file,
    CountReference.java:365-377). On a cluster the path must be shared
    storage; the protocol itself is storage-agnostic."""

    @classmethod
    def name(cls) -> str:
        return JSONL_SINK_NAME

    def writer(self, schema, overwrite: bool) -> "JsonlManifestWriter":
        return JsonlManifestWriter(self.options)


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options["path"]

    def write(self, iterator) -> "FileCommit":
        """Runs ON EXECUTORS, one call per partition: stream rows to a
        temp file whose name no concurrent attempt can collide with
        (task attempts of the same partition differ in the uuid), and
        report it for promotion — never visible until commit."""
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        final = f"part-{pid:05d}.jsonl"
        tmp = f"_tmp-{uuid.uuid4().hex}-{final}"
        with open(os.path.join(self.path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
        return FileCommit(tmp, final)

    def commit(self, messages) -> None:
        """Driver-side, runs once after EVERY task succeeded: promote
        temp files atomically and publish the manifest LAST — the
        manifest write is the single commit point."""
        import json
        import os

        names = []
        for m in messages:
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )
            names.append(m.final_name)
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(sorted(names), fh)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


class FileCommit(WriterCommitMessage):
    """Commit message: (temp name, final name) of one task's file."""

    def __init__(self, tmp_name: str, final_name: str) -> None:
        self.tmp_name = tmp_name
        self.final_name = final_name
