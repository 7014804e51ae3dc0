"""Data-layout operators: multi-dimensional clustering for scan pruning.

A 100 TB table is pruned at three levels — partition directories, parquet
row-group min/max stats, and page indexes. All three depend on the physical
ROW ORDER inside files: a table sorted by one column prunes that column only;
a table Z-ORDERED over k columns prunes usefully on ANY subset of them,
because the space-filling curve keeps rows that are close in k-dim space
close in the file. This is the layout trick behind Delta/Iceberg `OPTIMIZE
ZORDER BY` — implemented here engine-side with plain Column expressions, so
it works on vanilla parquet.

Two pieces:

- :func:`zvalue` — interleave the bits of k rank-normalized columns into one
  long (Morton code). Rank normalization (equal-frequency buckets) makes the
  curve robust to skewed / arbitrary-ranged inputs: every column contributes
  equal-weight bits regardless of its distribution. A per-column
  ``percent_rank`` window would cost k global sorts — instead bucket ids
  come from a balanced WHEN-tree compiled from one ``approxQuantile`` pass
  (Greenwald–Khanna sketch; the driver collects only the ~2^bits cut
  points), so the whole z-value is a map-side codegen expression and the
  only shuffle is the final range partitioning.
- :func:`zorder_layout` — repartitionByRange + sortWithinPartitions on the
  z-value: each output file covers a compact hyper-rectangle, so min/max
  stats prune multi-column predicates. Range partitioning samples the
  z-value to build balanced splits — no skew hotspot even when the data
  clusters in z-space.

Scale: quantile fit is one sketch-merged pass; the layout itself is one
exchange — the same cost as any repartition, paid once at write time,
repaid on every pruned read.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zvalue",
    "zvalue_fixed",
    "zorder_layout",
    "file_stats_manifest",
    "build_file_manifest",
    "update_file_manifest",
    "prune_files",
    "read_pruned",
    "compaction_plan",
    "compact_dataset",
    "publish_generation",
    "current_generation",
    "generation_log",
    "read_current",
    "read_generation",
]


def _bucket_tree(col: Column, cuts: Sequence[float], lo: int, hi: int) -> Column:
    """Balanced CASE tree mapping ``col`` to its equal-frequency bucket id in
    ``[lo, hi]``: depth log2(buckets) comparisons per row, fully inside
    whole-stage codegen (no UDF, no O(buckets) per-row scan)."""
    if lo == hi:
        return F.lit(lo).cast("long")
    mid = (lo + hi) // 2  # buckets lo..mid sit strictly below cuts[mid]
    return (
        F.when(col < F.lit(cuts[mid]), _bucket_tree(col, cuts, lo, mid))
        .otherwise(_bucket_tree(col, cuts, mid + 1, hi))
    )


def _interleave(rank_cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each rank column into one long.

    Static expression tree (k*bits shift/or terms) — codegen-friendly.
    """
    z = F.lit(0).cast("long")
    k = len(rank_cols)
    for b in range(bits):
        for i, rc in enumerate(rank_cols):
            bit = F.shiftright(rc, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: int = 8,
    sample_error: float = 0.01,
) -> Column:
    """Z-value (Morton code) column over ``cols``, rank-normalized.

    Each column maps to one of ``2**bits_per_col`` equal-frequency buckets
    (cut points from one ``approxQuantile`` pass over all columns, relative
    error ``sample_error``); bucket ids are bit-interleaved LSB-first.
    NULLs rank lowest (bucket 0). Total bits = len(cols) * bits_per_col —
    capped at 60 to stay in a signed long. Duplicate cut points (heavy
    values) collapse buckets, which only merges neighbors — ordering is
    preserved.
    """
    cols = list(cols)
    n_buckets = 1 << bits_per_col
    if len(cols) * bits_per_col > 60:
        raise ValueError("len(cols) * bits_per_col must be <= 60")
    num = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_cuts = num.approxQuantile(cols, probs, sample_error)
    rank_cols: list[Column] = []
    for c, cuts in zip(cols, all_cuts):
        dcol = F.col(c).cast("double")
        tree = _bucket_tree(dcol, list(cuts), 0, len(cuts))
        rank_cols.append(
            F.when(dcol.isNull(), F.lit(0).cast("long")).otherwise(tree)
        )
    return _interleave(rank_cols, bits_per_col)


def zvalue_fixed(
    bounds: Sequence[tuple[Column, Column, Column]],
    bits_per_col: int = 8,
) -> Column:
    """Equal-WIDTH z-value: each entry of ``bounds`` is ``(col, lo, hi)``
    Column triples; the column maps to ``floor((col-lo)/(hi-lo) * 2^bits)``
    clamped into range, then bits interleave as in :func:`zvalue`.

    Fully deterministic arithmetic (no sketch), so the identical expression
    is reproducible in any SQL engine — this is the oracle-checkable form;
    :func:`zvalue` (equal-frequency) is the production form for skewed data.
    NULLs map to bucket 0.
    """
    n_buckets = 1 << bits_per_col
    if len(bounds) * bits_per_col > 60:
        raise ValueError("len(bounds) * bits_per_col must be <= 60")
    rank_cols: list[Column] = []
    for col, lo, hi in bounds:
        x = col.cast("double")
        span = hi.cast("double") - lo.cast("double")
        raw = F.floor((x - lo.cast("double")) / span * F.lit(n_buckets))
        clamped = F.least(
            F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)
        ).cast("long")
        rank_cols.append(F.coalesce(clamped, F.lit(0).cast("long")))
    return _interleave(rank_cols, bits_per_col)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int = 200,
    bits_per_col: int = 8,
) -> DataFrame:
    """Rewrite ``df``'s physical order along the Z-curve of ``cols``.

    Returns the frame range-partitioned into ``num_files`` z-ranges and
    sorted by z within each — write it out directly and every output file
    covers a compact region of the col-space, giving row-group min/max
    pruning on any predicate touching any subset of ``cols``.
    """
    z = zvalue(df, cols, bits_per_col=bits_per_col)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def list_data_files(spark, path: str, suffix: str = ".parquet"):
    """Recursively list a dataset directory's data files as
    ``[(path, bytes)]`` via the Hadoop FileSystem API — works against any
    FS Spark can read (local, HDFS, object stores); metadata-only, no
    jobs. The planning half of :func:`compact_dataset`."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        # a never-written dataset has no files — callers (staleness
        # reports, compaction planners) treat that as empty, not an error
        return []
    it = fs.listFiles(jpath, True)
    out: list[tuple[str, int]] = []
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(suffix):
            out.append((name, int(st.getLen())))
    return out


def _file_stats(df, cols: Sequence[str]):
    """The ONE stats aggregation behind :func:`file_stats_manifest` and
    :func:`update_file_manifest` — built and refreshed manifests cannot
    diverge in what they track."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
        ]
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
            *[F.col(c) for c in cols],
        )
        .groupBy("file_path", "file_size")
        .agg(*aggs)
    )


def file_stats_manifest(
    spark, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-FILE column statistics over ``cols`` — the data-skipping
    manifest that turns :func:`zorder_layout` from row-group pruning into
    FILE pruning, the way Delta/Iceberg manifests do, on vanilla parquet.

    One row per data file: ``(file_path, file_size, n_rows)`` plus
    ``{col}__min / {col}__max / {col}__nulls`` per tracked column. Built
    from ONE scan that reads ONLY ``cols`` plus the ``_metadata`` hidden
    struct (column pruning keeps untracked columns on disk), reduced by a
    map-side-combining groupBy on the file path — output is one row per
    file, so the manifest for a million-file table is a million rows of
    plain parquet, queryable and diffable like any other dataset.
    """
    return _file_stats(spark.read.parquet(path), cols)


def build_file_manifest(
    spark, path: str, cols: Sequence[str], manifest_path: str | None = None
) -> str:
    """Materialize :func:`file_stats_manifest` beside the dataset
    (``{path}__manifest`` by default) and return the manifest path. Call
    after a layout rewrite (:func:`zorder_layout` + write,
    :func:`compact_dataset`) — the manifest describes a GENERATION of
    files; appends after the build degrade :func:`prune_files` to
    no-pruning for the new files, never to wrong answers."""
    mp = manifest_path or f"{path}__manifest"
    file_stats_manifest(spark, path, cols).write.mode("overwrite").parquet(
        mp
    )
    return mp


def _norm_file_path(p: str) -> str:
    """Normalize a file URI for comparison across listing APIs: the
    ``_metadata`` column reports ``file:/x``, Hadoop listings
    ``file:///x`` — same file."""
    if ":/" in p:
        scheme, rest = p.split(":/", 1)
        return f"{scheme}:/{rest.lstrip('/')}"
    return p


def _read_manifest(spark, mp: str) -> DataFrame:
    """Read a manifest, falling back to the ``__next`` scratch generation
    (a crash during :func:`update_file_manifest`'s final overwrite leaves
    the merged manifest only there — same recovery convention as the
    streaming state swaps). ONLY a genuinely-missing primary takes the
    fallback: a corrupted or schema-mismatched manifest must surface, not
    silently serve a stale scratch."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from security_data_pipeline_spark.fsutil import missing_path

    try:
        return spark.read.parquet(mp)
    except AnalysisException as e:
        if not missing_path(e):
            raise
    try:
        return spark.read.parquet(f"{mp}__next")
    except AnalysisException as e:
        if not missing_path(e):
            raise
    raise FileNotFoundError(
        f"no manifest at {mp} (or its __next scratch) — run"
        " build_file_manifest first"
    )


def update_file_manifest(
    spark, path: str, cols: Sequence[str], manifest_path: str | None = None
) -> dict:
    """Incremental manifest refresh — the nightly-append path: stat ONLY
    the files added since the last build (the unlisted set), drop rows
    for files that no longer exist (a compaction or delete), and swap
    the merged manifest in. Cost follows the APPEND, not the table: a
    100 TB table that gained 100 files tonight scans 100 files, while
    :func:`build_file_manifest` would rescan everything.

    Swap is scratch-then-overwrite (``{mp}__next`` → ``{mp}``); readers
    (:func:`prune_files`) fall back to the scratch on a crash window and
    a re-run heals it. Returns ``{"added", "dropped", "kept"}`` row
    counts. The tracked ``cols`` must match the original build — stats
    columns are unioned by name."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from security_data_pipeline_spark.fsutil import missing_path

    mp = manifest_path or f"{path}__manifest"
    try:
        old = spark.read.parquet(mp)
    except AnalysisException as e:
        if not missing_path(e):
            raise
        # crash window of a previous refresh: the merged manifest lives
        # only in the scratch — complete the interrupted swap FIRST, so
        # the scratch is free to be overwritten again below
        spark.read.parquet(f"{mp}__next").write.mode("overwrite").parquet(
            mp
        )
        old = spark.read.parquet(mp)
    on_disk = {_norm_file_path(p_) for p_, _ in list_data_files(spark, path)}
    listed = {
        _norm_file_path(r["file_path"])
        for r in old.select("file_path").collect()
    }
    unlisted = sorted(on_disk - listed)
    norm_col = F.regexp_replace(
        "file_path", r"^([A-Za-z0-9+.-]+):/+", r"$1:/"
    )
    # semi-join, not isin: a million-file table would otherwise compile a
    # million-literal predicate into the plan
    disk_df = spark.createDataFrame(
        [(p_,) for p_ in sorted(on_disk)], "_disk_path string"
    )
    kept = (
        old.withColumn("_norm", norm_col)
        .join(
            F.broadcast(disk_df),
            F.col("_norm") == F.col("_disk_path"),
            "left_semi",
        )
        .drop("_norm")
    )
    merged = (
        kept.unionByName(_file_stats(spark.read.parquet(*unlisted), cols))
        if unlisted
        else kept
    )
    merged.write.mode("overwrite").parquet(f"{mp}__next")
    spark.read.parquet(f"{mp}__next").write.mode("overwrite").parquet(mp)
    n_total = len(on_disk)
    return {
        "added": len(unlisted),
        "dropped": len(listed - on_disk),
        "kept": n_total - len(unlisted),
    }


def prune_files(
    spark,
    path: str,
    ranges: Mapping[str, tuple],
    manifest_path: str | None = None,
) -> dict:
    """Driver-side manifest pruning — which files can hold rows matching
    EVERY ``col BETWEEN lo AND hi`` in ``ranges`` (inclusive bounds).

    A file is kept when each range overlaps its ``[min, max]`` — i.e.
    NOT (max < lo OR min > hi). All-NULL stats never overlap: a range
    predicate is NULL-excluding, so a file whose tracked column is
    entirely NULL cannot contribute a matching row. The decision is
    reconciled against the CURRENT directory listing, so a stale
    manifest degrades instead of lying: files on disk but absent from
    the manifest (appended since the build) are ALWAYS included, and
    manifest rows for files no longer on disk are ignored (a directory
    scan would not read them either).

    Returns ``{"files", "unlisted", "n_total", "n_skipped"}``. One job
    over the manifest (a (path, keep) pair per file — the same order of
    driver state as the listing any scan planner materializes) plus one
    FS listing; the SCAN itself is bounded by the matched files.
    """
    mp = manifest_path or f"{path}__manifest"
    m = _read_manifest(spark, mp)
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        overlap = ~(
            (F.col(f"{c}__max") < F.lit(lo))
            | (F.col(f"{c}__min") > F.lit(hi))
        )
        cond = cond & F.coalesce(overlap, F.lit(False))
    decisions = m.select("file_path", cond.alias("_keep")).collect()
    listed = {_norm_file_path(r["file_path"]) for r in decisions}
    keep = {
        _norm_file_path(r["file_path"]) for r in decisions if r["_keep"]
    }
    files: list[str] = []
    unlisted: list[str] = []
    n_total = 0
    for p_, _ in list_data_files(spark, path):
        n_total += 1
        np_ = _norm_file_path(p_)
        if np_ not in listed:
            unlisted.append(p_)
        elif np_ in keep:
            files.append(p_)
    return {
        "files": files,
        "unlisted": unlisted,
        "n_total": n_total,
        "n_skipped": n_total - len(files) - len(unlisted),
    }


def read_pruned(
    spark,
    path: str,
    ranges: Mapping[str, tuple] | None = None,
    manifest_path: str | None = None,
    selection: dict | None = None,
) -> DataFrame:
    """Manifest-pruned scan: read only the files :func:`prune_files`
    keeps (plus any unlisted ones). The caller STILL applies the row
    filter — the contract is ``read_pruned(path, ranges).filter(pred)``
    ≡ ``spark.read.parquet(path).filter(pred)`` for any ``pred`` at
    least as strict as the conjunction of the ranges; the manifest only
    removes files that cannot contain matches. On a Z-ordered layout the
    kept set concentrates around the queried hyper-rectangle, so the
    scan reads a small fraction of the files row-group pruning alone
    would still have to open. Pass ``selection`` (a :func:`prune_files`
    result) to reuse an already-computed decision instead of pruning
    twice."""
    if selection is None:
        if ranges is None:
            raise ValueError("read_pruned needs ranges or selection")
        selection = prune_files(
            spark, path, ranges, manifest_path=manifest_path
        )
    files = selection["files"] + selection["unlisted"]
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)


def compaction_plan(
    spark, path: str, target_file_bytes: int = 256 * 1024 * 1024
) -> dict:
    """Small-files report for a parquet dataset: file count, total bytes,
    and the output file count a compaction should produce
    (``ceil(total / target)``). Pure FS metadata — the cheap health probe
    a 100 TB table runs per partition before deciding to rewrite.

    Small files are the silent scan killer at scale: parquet splits at
    row-group granularity, so a million 1 MB files means a million scan
    tasks (scheduling overhead dominates), tiny row groups defeat min/max
    pruning, and object-store LIST/GET round-trips multiply. The fix is a
    periodic rewrite toward ``target_file_bytes`` (the same default Spark
    uses for ``maxPartitionBytes``).
    """
    files = list_data_files(spark, path)
    total = sum(b for _, b in files)
    n_out = max(1, -(-total // int(target_file_bytes)))
    return {
        "files_before": len(files),
        "bytes_total": total,
        "files_after": n_out,
        "avg_file_bytes_before": total // max(1, len(files)),
    }


def compact_dataset(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    n_files: int | None = None,
    partition_by: tuple[str, ...] = (),
) -> dict:
    """Rewrite a parquet dataset into ``n_files`` (or the
    :func:`compaction_plan` size) at ``out_path`` — generation-based, the
    original is untouched until the caller swaps directories (same
    crash-safe convention as the streaming state swap; an in-place
    rewrite that dies mid-delete loses data).

    Unpartitioned: ``repartition(n)`` → n equal-ish files (round-robin —
    content-balanced regardless of input skew). Partitioned: repartition
    on the partition columns so each partition's rows land in one task —
    one file per partition value, the compacted shape for
    directory-pruned layouts (hot partitions that need multiple files
    should be compacted per-directory with the unpartitioned form).
    Returns the plan dict plus ``rows`` (count preserved is asserted by
    the caller's tests, not silently assumed here — the rewrite is the
    same rows by construction, but the report makes it checkable).
    """
    plan = compaction_plan(spark, path, target_file_bytes)
    n = int(n_files) if n_files is not None else plan["files_after"]
    df = spark.read.parquet(path)
    if partition_by:
        (
            df.repartition(*[F.col(c) for c in partition_by])
            .write.mode("error")
            .partitionBy(*partition_by)
            .parquet(out_path)
        )
    else:
        df.repartition(n).write.mode("error").parquet(out_path)
    plan["files_after"] = len(list_data_files(spark, out_path))
    plan["rows"] = spark.read.parquet(out_path).count()
    return plan


# ---------------------------------------------------------------------------
# Generation publishing: atomic dataset swap via a pointer-commit log
# ---------------------------------------------------------------------------

_COMMITS = "_commits"


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path-class) for ``path`` via the session's Hadoop
    conf — the same JVM surface the streaming replay guards use, so the
    protocol follows whatever filesystem the cluster mounts."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def publish_generation(
    spark,
    root: str,
    gen_path: str,
    expect_version: int | None = None,
    max_retries: int = 16,
) -> int:
    """ATOMICALLY publish ``gen_path`` as the next generation of the
    dataset rooted at ``root`` — the missing last step of every
    rewrite-then-swap operator here (`compact_dataset`, `zorder_layout`,
    `rebuild_ivf_index` write NEW directories; this is how readers cut
    over without ever observing partial state).

    Protocol (the Iceberg/Delta pointer-commit idea, on bare files): a
    commit is one file ``{root}/_commits/<version>`` whose CONTENT is the
    generation directory path. Committing writes a dot-prefixed temp file
    and RENAMES it to the final name — rename-if-absent is the atomic
    primitive (POSIX and HDFS; object stores need their conditional-put
    flavor, the documented caveat) — so concurrent publishers race on the
    rename and exactly one wins each version number; the loser retries at
    the next version. Readers (:func:`current_generation`) list the log,
    take the highest fully-committed version, and read its pointer —
    a crashed half-written temp file is invisible to them by name.

    ``expect_version`` turns the publish into a CAS for read-modify-write
    pipelines (compact generation N, publish only if N is still current):
    raises ``RuntimeError`` if someone published meanwhile. Rollback is
    just re-publishing an old generation's path as a NEW version — the
    log is append-only history, so time travel (:func:`read_generation`)
    keeps working.

    At 100 TB the commit log is |generations| tiny files and the publish
    is one rename regardless of data size; old generations stay until a
    retention sweep deletes those below the oldest version readers pin.
    """
    import uuid

    fs, Path = _hadoop_fs(spark, root)
    log_dir = f"{root.rstrip('/')}/{_COMMITS}"
    fs.mkdirs(Path(log_dir))
    cur = current_generation(spark, root)
    version = (cur[0] if cur else 0) + 1
    if expect_version is not None and (cur[0] if cur else 0) != expect_version:
        raise RuntimeError(
            f"publish_generation: expected current version "
            f"{expect_version} but found {(cur[0] if cur else 0)} — "
            "concurrent publish; re-derive the generation and retry"
        )
    payload = gen_path.encode("utf-8")
    for _ in range(max_retries):
        tmp = Path(f"{log_dir}/.tmp-{uuid.uuid4().hex}")
        out = fs.create(tmp, True)
        try:
            out.write(payload)
        finally:
            out.close()
        if fs.rename(tmp, Path(f"{log_dir}/{version:020d}")):
            return version
        fs.delete(tmp, False)
        if expect_version is not None:
            raise RuntimeError(
                f"publish_generation: version {version} was taken during "
                "a CAS publish — concurrent publish; re-derive and retry"
            )
        version += 1
    raise RuntimeError(
        f"publish_generation: lost the rename race {max_retries} times"
    )


def _list_commits(spark, root: str) -> list[tuple[int, str]]:
    fs, Path = _hadoop_fs(spark, root)
    log_dir = Path(f"{root.rstrip('/')}/{_COMMITS}")
    if not fs.exists(log_dir):
        return []
    out = []
    for st in fs.listStatus(log_dir):
        name = st.getPath().getName()
        if name.startswith("."):
            continue  # crashed temp: never renamed, never visible
        try:
            version = int(name)
        except ValueError:
            continue
        stream = fs.open(st.getPath())
        try:
            data = bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()
        out.append((version, data))
    return sorted(out)


def current_generation(spark, root: str) -> tuple[int, str] | None:
    """Highest committed ``(version, gen_path)`` of ``root``, or None if
    nothing was ever published."""
    commits = _list_commits(spark, root)
    return commits[-1] if commits else None


def generation_log(spark, root: str) -> list[tuple[int, str]]:
    """Full append-only history ``[(version, gen_path), ...]`` ascending
    — the time-travel index."""
    return _list_commits(spark, root)


def read_current(spark, root: str) -> DataFrame:
    """Read the currently published generation. Raises if nothing was
    published — an unpublished root has no readable state by contract
    (readers must never guess at directories)."""
    cur = current_generation(spark, root)
    if cur is None:
        raise FileNotFoundError(f"no generation published under {root}")
    return spark.read.parquet(cur[1])


def read_generation(spark, root: str, version: int) -> DataFrame:
    """Time travel: read the generation published as ``version``."""
    for v, p in _list_commits(spark, root):
        if v == version:
            return spark.read.parquet(p)
    raise FileNotFoundError(f"version {version} not in {root}/{_COMMITS}")
