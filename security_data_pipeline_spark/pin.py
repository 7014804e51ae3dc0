"""Plan pinning with a cluster-faithfulness knob.

Several operators pin an intermediate result so Catalyst cannot inline an
expensive subtree into each downstream consumer (the measured O(L²)
filter-pushdown pathologies) or so an iterative loop's lineage stays
bounded. The default mechanism is ``localCheckpoint`` — cheapest on a
single machine, but its blocks live only in executor storage and are NOT
replayable: on a real cluster a lost executor fails the job instead of
recomputing lineage. This module makes the mechanism a runtime knob so
the same code runs local-fast by default and cluster-safe when asked.

Set ``spark.security_data_pipeline.pinMode`` (SQL conf, settable per
session or per job) to:

- ``local`` (default) — ``localCheckpoint``: truncates lineage,
  executor-local storage, non-replayable. Right for local[]/notebook
  runs and for tests.
- ``persist`` — ``persist(StorageLevel.DISK_ONLY)``: the plan barrier is
  the InMemoryRelation (downstream subtrees cannot inline across it,
  same pinning effect), lineage is KEPT, so a lost executor recomputes
  the partition instead of failing the job. Eager pins materialize with
  one ``count()`` pass. The right cluster default.
- ``reliable`` — ``DataFrame.checkpoint`` to the directory set via
  ``SparkContext.setCheckpointDir`` (HDFS/object store): survives
  executor AND driver loss; for multi-hour jobs where recomputing a
  deep lineage is itself too expensive. Raises loudly if no checkpoint
  dir is configured.

Every pin site in the package routes through :func:`pin` /
:func:`pin_lazy` via ``DataFrame.transform``, so the knob governs all of
them uniformly. See SCALE.md ("Pin strategy at cluster scale").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

PIN_MODE_CONF = "spark.security_data_pipeline.pinMode"

_MODES = ("local", "persist", "reliable")


def _mode(df: DataFrame) -> str:
    mode = df.sparkSession.conf.get(PIN_MODE_CONF, "local")
    if mode not in _MODES:
        raise ValueError(
            f"{PIN_MODE_CONF}={mode!r}: expected one of {_MODES}"
        )
    return mode


def _pin(df: DataFrame, eager: bool) -> DataFrame:
    mode = _mode(df)
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "persist":
        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        return out
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise ValueError(
            f"{PIN_MODE_CONF}=reliable requires "
            "SparkContext.setCheckpointDir(<fault-tolerant path>) first"
        )
    return df.checkpoint(eager=eager)


def pin(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` as a plan barrier (``df.transform(pin)``)."""
    return _pin(df, eager=True)


def pin_lazy(df: DataFrame) -> DataFrame:
    """Plan barrier WITHOUT forcing computation now — the pin materializes
    on first action (``df.transform(pin_lazy)``). Used where the barrier
    exists to stop subtree inlining, not to checkpoint loop state."""
    return _pin(df, eager=False)
