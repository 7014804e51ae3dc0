"""SparkSession bootstrap and runtime configuration.

Two entry points:

- :func:`get_spark` — build a session for local runs / tests / bench.
- :func:`configure` — apply the runtime confs this engine depends on to an
  *externally created* session (the correctness driver builds its own
  ``SparkSession``; these confs are all runtime-settable).

Scale notes (100 TB): AQE is left on so shuffle partition counts, skew joins
and broadcast decisions adapt at runtime; ``spark.sql.session.timeZone=UTC``
is semantic (UTC day-flooring of baselines — reference
``feature_engineering.py:52`` floors tz-aware UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs required for correctness on the test corpus.
RUNTIME_CONFS: dict[str, str] = {
    # Reference normalizes all timestamps to UTC (normalization.py:25, utc=True);
    # day-flooring and epoch math below assume it.
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark
    # cannot read natively; read as long and convert (sources/catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # testdata parquet timestamps carry no timezone tag; read them as
    # session-tz TIMESTAMP (UTC above) rather than TIMESTAMP_NTZ so epoch
    # functions (unix_micros et al.) apply directly — matches DuckDB, whose
    # naive TIMESTAMP is treated as UTC by the oracle harness.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Arrow for any pandas-UDF path (similarity / multimodal operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply this engine's runtime confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf may be static in some deployments; engine code paths that
            # need it (events nanos read) re-check and raise a clear error.
            pass
    return spark


def get_spark(
    app_name: str = "security-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession configured for this engine.

    Defaults target the local harness (``local[$SPARK_GRAFT_CPUS]``); on a
    real cluster pass ``master=None`` with spark-submit owning the master and
    sizing confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # 20+ distinct whole-stage-codegen plans per session generate enough
        # JIT-compiled classes to fill the default 240m code cache; once full
        # the C2 compiler shuts off and later queries run interpreted
        # (measured 1s -> 6s on the same plan). Reserve enough to keep every
        # hot loop compiled for the session's whole query mix.
        # Driver covers local mode (executors live in the driver JVM);
        # executor opts cover real clusters, where codegen classes JIT in
        # the executor JVMs (ignored in local mode).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if extra_conf:
        for key, value in extra_conf.items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return configure(spark)
