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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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

    def partitions(self):
        """Static range split — the planner runs one task per returned
        partition, in parallel across executors (the Python-source
        analogue of InputFormat.getSplits)."""
        step = -(-self.n // self.parts)  # ceil
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        """Runs ON EXECUTORS, one call per partition; rows are fed back
        through Arrow. Deterministic: a pure function of the id."""
        import hashlib

        lo, hi = partition.value
        for i in range(lo, hi):
            fp = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, fp, int(fp[:4], 16))


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
