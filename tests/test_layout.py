"""Z-order layout: locality, determinism, null handling; ORC roundtrip."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import layout
from security_data_pipeline_spark.sources import sinks


def _grid_df(spark, side: int = 64):
    pts = [(x, y) for x in range(side) for y in range(side)]
    random.Random(7).shuffle(pts)
    return spark.createDataFrame(pts, "x long, y long")


def test_zorder_layout_bounds_both_dims(spark):
    """After z-ordering a 64x64 grid into 16 ranges, every range's bounding
    box is compact in BOTH dims — the property a single-column sort cannot
    give (its minor dim spans the full domain in every file)."""
    side, n_parts = 64, 16
    df = _grid_df(spark, side)
    laid = layout.zorder_layout(df, ["x", "y"], num_files=n_parts, bits_per_col=6)
    boxes = (
        laid.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(boxes) == n_parts
    avg_dx = sum(r["dx"] for r in boxes) / len(boxes)
    avg_dy = sum(r["dy"] for r in boxes) / len(boxes)
    # x-sorted layout gives avg_dy == side-1 == 63; z-order must beat it by
    # a wide margin on BOTH dims (ideal 16-cell z-split of 64x64: 31/15).
    assert avg_dx < side * 0.75, avg_dx
    assert avg_dy < side * 0.75, avg_dy
    assert laid.count() == side * side  # layout is a pure reorder


def test_zvalue_fixed_matches_hand_morton(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (None, 3.0)],
        "x double, y double",
    )
    z = layout.zvalue_fixed(
        [(F.col("x"), F.lit(0.0), F.lit(4.0)), (F.col("y"), F.lit(0.0), F.lit(4.0))],
        bits_per_col=2,
    )
    got = [r["z"] for r in df.select(z.alias("z")).collect()]
    # buckets: 0->0, 3->3 (floor(3/4*4)=3). interleave LSB-first, x bit i at
    # position 2i, y at 2i+1: (3,3)->15, (3,0)->5, (0,3)->10, null->bucket 0
    assert got == [0, 5, 10, 15, 10]


def test_zvalue_equal_frequency_skew_resistant(spark):
    # 90% of mass at x=0; equal-frequency ranks must still spread buckets
    # so the interleaved code orders the heavy value before the tail.
    rows = [(0,) for _ in range(900)] + [(i,) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "x long")
    z = layout.zvalue(df, ["x"], bits_per_col=6, sample_error=0.001)
    out = df.select(F.col("x"), z.alias("z")).distinct().collect()
    zero_z = {r["z"] for r in out if r["x"] == 0}
    tail_z = {r["z"] for r in out if r["x"] > 0}
    assert len(zero_z) == 1  # identical values share one bucket
    assert min(tail_z) >= max(zero_z)  # order preserved
    # 10% of mass over 64 equal-frequency buckets ≈ 6 buckets for the tail:
    # it must NOT collapse into the heavy value's bucket
    assert len(tail_z) >= 3, tail_z


def test_zvalue_rejects_bit_overflow(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    try:
        layout.zvalue(df, ["x", "y"], bits_per_col=31)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, -0.25)],
        "k long, s string, v double",
    )
    path = str(tmp_path / "orc_out")
    sinks.write_orc(df, path)
    back = sinks.read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_partitioned_prunes_directories(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
        "k long, par string",
    )
    path = str(tmp_path / "orc_part")
    sinks.write_orc(df, path, partition_by=("par",))
    back = sinks.read_orc(spark, path).filter(F.col("par") == "even")
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "par#" not in plan.split("Location")[0]


def test_compaction_rewrites_small_files(spark, tmp_path):
    """64 tiny files -> the planned handful, content identical, report
    numbers honest (before/after counts from the real filesystem)."""
    from security_data_pipeline_spark.operators import layout
    from security_data_pipeline_spark.sources.catalog import load_table

    src = str(tmp_path / "frag")
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    ev.repartition(64).write.parquet(src)
    plan = layout.compaction_plan(spark, src, target_file_bytes=1 << 40)
    assert plan["files_before"] == 64
    assert plan["files_after"] == 1  # everything fits one target file

    out = str(tmp_path / "compact")
    report = layout.compact_dataset(
        spark, src, out, n_files=4
    )
    assert report["files_before"] == 64
    assert report["files_after"] == 4
    assert report["rows"] == ev.count()
    # content equality, not just counts
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b

    # partitioned form: one file per partition directory
    psrc = str(tmp_path / "pfrag")
    ev.withColumn("pk", F.pmod("user_id", F.lit(5))).repartition(
        32
    ).write.partitionBy("pk").parquet(psrc)
    assert len(layout.list_data_files(spark, psrc)) > 5
    pout = str(tmp_path / "pcompact")
    layout.compact_dataset(spark, psrc, pout, partition_by=("pk",))
    per_dir: dict[str, int] = {}
    for f, _ in layout.list_data_files(spark, pout):
        d = f.rsplit("/", 2)[-2]
        per_dir[d] = per_dir.get(d, 0) + 1
    assert set(per_dir.values()) == {1} and len(per_dir) == 5


def test_checksum_invariant_under_relayout_and_sensitive_to_change(spark, tmp_path):
    """The generation-diff primitive: identical content under a 64->4
    compaction rewrite yields the identical checksum; one changed row
    changes it."""
    from security_data_pipeline_spark.operators import layout
    from security_data_pipeline_spark.operators.merge import dataset_checksum
    from security_data_pipeline_spark.sources.catalog import load_table

    cols = ["event_id", "user_id", "event_type"]
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(*cols)
    src, out = str(tmp_path / "a"), str(tmp_path / "b")
    ev.repartition(64).write.parquet(src)
    layout.compact_dataset(spark, src, out, n_files=4)

    def ck(path):
        return tuple(
            dataset_checksum(spark.read.parquet(path), cols).first()
        )

    assert ck(src) == ck(out)
    # sensitivity: flip one row's event_type
    mutated = spark.read.parquet(src).withColumn(
        "event_type",
        F.when(F.col("event_id") == 7, F.lit("TAMPERED")).otherwise(
            F.col("event_type")
        ),
    )
    m = tuple(dataset_checksum(mutated, cols).first())
    assert m[0] == ck(src)[0] and m[1] != ck(src)[1]


def _checksum_oracle_sql(cols, table, by=None):
    """DuckDB mirror of merge.row_content_hash — same length-prefixed
    encoding (`<len>:<value>`, NULL -> '-:')."""
    enc = " || ".join(
        f"CASE WHEN {c} IS NULL THEN '-:' ELSE CONCAT(CAST(length(CAST({c} "
        f"AS VARCHAR)) AS VARCHAR), ':', CAST({c} AS VARCHAR)) END"
        for c in cols
    )
    expr = (
        "CAST(SUM(CAST(CAST(CONCAT('0x', substr(md5("
        + enc
        + "), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)"
    )
    if by:
        bycols = ", ".join(by)
        return (
            f"SELECT {bycols}, CAST(COUNT(*) AS BIGINT) AS n_rows, {expr} AS "
            f"checksum FROM {table} GROUP BY {bycols} ORDER BY {bycols}"
        )
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, {expr} AS checksum "
        f"FROM {table}"
    )


def test_checksum_null_sentinel_and_separator_unambiguous(spark, tmp_path):
    """NULL-bearing and '|'-bearing rows: (a) the Spark checksum matches
    the DuckDB oracle encoding (catches the r6 4-char-'\\x00' sentinel
    divergence), (b) the global and per-group forms agree on the same
    rows, (c) rows that a '|'-joined encoding would conflate hash
    differently."""
    import duckdb

    from security_data_pipeline_spark.operators.merge import (
        dataset_checksum,
        dataset_checksum_by,
    )

    rows = [
        ("a|b", "c", "g1"),
        ("a", "b|c", "g1"),  # '|'-joined encodings conflate these two
        (None, "", "g2"),
        ("", None, "g2"),  # and these two under a shared NULL sentinel
        (None, None, "g2"),
        ("\\x00", "x", "g1"),  # the literal 4-char string r6 used
        ("\x00", "x", "g1"),  # vs a real NUL byte in the data
    ]
    df = spark.createDataFrame(rows, "a string, b string, grp string")
    path = str(tmp_path / "nulls")
    df.write.parquet(path)
    back = spark.read.parquet(path)

    got = tuple(dataset_checksum(back, ["a", "b"]).first())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    exp = con.sql(_checksum_oracle_sql(["a", "b"], "t")).fetchone()
    assert got == exp, f"spark {got} vs duckdb {exp}"

    got_by = sorted(
        map(tuple, dataset_checksum_by(back, ["a", "b"], ["grp"]).collect())
    )
    exp_by = [tuple(r) for r in con.sql(
        _checksum_oracle_sql(["a", "b"], "t", by=["grp"])
    ).fetchall()]
    assert got_by == exp_by
    con.close()

    # global == exact decimal sum over the per-group checksums: the two
    # primitives must agree about the same rows (the generation-diff
    # contract the r6 sentinel divergence broke)
    assert int(got[1]) == sum(int(r[2]) for r in got_by)
    assert got[0] == sum(r[1] for r in got_by)

    # all 7 rows hash distinctly: no '|'-ambiguity, no NULL/empty/sentinel
    # collisions
    from security_data_pipeline_spark.operators.merge import row_content_hash

    hashes = [
        r[0]
        for r in back.select(
            row_content_hash(["a", "b"]).cast("string").alias("h")
        ).collect()
    ]
    assert len(set(hashes)) == len(rows), hashes


def test_checksum_properties_hypothesis(spark, tmp_path):
    """Property check over adversarial row sets (NULLs, empties, '|', ':',
    digits-only strings): global checksum == DuckDB oracle, per-group sums
    reconcile to the global, and any single-value mutation moves it."""
    import duckdb

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from security_data_pipeline_spark.operators.merge import (
        dataset_checksum,
        dataset_checksum_by,
    )

    val = st.one_of(
        st.none(),
        st.sampled_from(["", "|", ":", "a|b", "1:ab", "-:", "\\x00"]),
        st.text(alphabet="ab|:0123456789-", max_size=6),
    )
    rows_strategy = st.lists(
        st.tuples(val, val, st.sampled_from(["g1", "g2"])),
        min_size=1,
        max_size=12,
    )

    @given(rows=rows_strategy)
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        df = spark.createDataFrame(rows, "a string, b string, grp string")
        g = tuple(dataset_checksum(df, ["a", "b"]).first())
        con = duckdb.connect()
        pdf = df.toPandas()  # noqa: F841 — registered below by name
        con.register("t", pdf)
        e = con.sql(_checksum_oracle_sql(["a", "b"], "t")).fetchone()
        con.close()
        assert g == e, f"{rows}: spark {g} vs duckdb {e}"
        by = dataset_checksum_by(df, ["a", "b"], ["grp"]).collect()
        assert int(g[1]) == sum(int(r["checksum"]) for r in by)
        # single-value mutation sensitivity: append ONE char to column a of
        # the first row (covers the NULL -> value transition too)
        mut = [(("m" if a is None else a + "m"), b, grp) for a, b, grp in rows[:1]]
        mdf = spark.createDataFrame(mut + rows[1:], df.schema)
        m = tuple(dataset_checksum(mdf, ["a", "b"]).first())
        assert m[1] != g[1], f"mutation not detected for {rows}"

    check()


def test_file_manifest_prunes_zordered_scan(spark, tmp_path):
    """The data-skipping loop closes: a Z-ordered layout + per-file
    manifest lets a box query read a MINORITY of files, and the pruned
    scan returns exactly the rows a full scan returns — including with a
    stale manifest (appended file read unpruned, never dropped) and an
    all-NULL file (range predicates are NULL-excluding, so it prunes)."""
    df = _grid_df(spark, 64)
    path = str(tmp_path / "grid")
    layout.zorder_layout(df, ["x", "y"], num_files=16, bits_per_col=6).write.parquet(path)
    mp = layout.build_file_manifest(spark, path, ["x", "y"])

    ranges = {"x": (10, 19), "y": (50, 59)}
    pred = F.col("x").between(10, 19) & F.col("y").between(50, 59)
    sel = layout.prune_files(spark, path, ranges)
    assert sel["n_total"] == 16 and not sel["unlisted"]
    # the 10x10 box intersects few z-ranges; most files skip
    assert sel["n_skipped"] >= 8, sel

    full = sorted(
        map(tuple, spark.read.parquet(path).filter(pred).collect())
    )
    pruned = sorted(
        map(tuple, layout.read_pruned(spark, path, ranges).filter(pred).collect())
    )
    assert pruned == full and len(full) == 100

    # stale manifest: a file appended AFTER the build is always read
    spark.createDataFrame([(15, 55)], "x long, y long").coalesce(
        1
    ).write.mode("append").parquet(path)
    sel2 = layout.prune_files(spark, path, ranges)
    assert len(sel2["unlisted"]) == 1
    pruned2 = layout.read_pruned(spark, path, ranges).filter(pred).count()
    assert pruned2 == 101

    # all-NULL tracked column: min/max are NULL -> the file prunes
    null_path = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(None, None)] * 5, "x long, y long"
    ).coalesce(1).write.parquet(null_path)
    layout.build_file_manifest(spark, null_path, ["x", "y"])
    sel3 = layout.prune_files(spark, null_path, ranges)
    assert sel3["files"] == [] and sel3["n_skipped"] == 1
    assert layout.read_pruned(spark, null_path, ranges).filter(pred).count() == 0

    # empty keep-set short-circuit keeps the schema
    assert layout.read_pruned(spark, null_path, ranges).columns == ["x", "y"]
    assert mp.endswith("__manifest")


def test_update_file_manifest_follows_the_append(spark, tmp_path):
    """Incremental manifest refresh: appended files get stats WITHOUT
    rescanning the table, rows for deleted files drop, a crash between
    the scratch write and the final overwrite heals (readers fall back
    to the scratch; a re-run completes), and pruning over the refreshed
    manifest is exact again."""
    import os
    import shutil

    df = _grid_df(spark, 32)
    path = str(tmp_path / "grid")
    layout.zorder_layout(df, ["x", "y"], num_files=8, bits_per_col=5).write.parquet(path)
    mp = layout.build_file_manifest(spark, path, ["x", "y"])

    # nightly append: two new files land
    spark.createDataFrame(
        [(100, 100), (101, 101)], "x long, y long"
    ).repartition(2).write.mode("append").parquet(path)
    rep = layout.update_file_manifest(spark, path, ["x", "y"])
    assert rep["added"] == 2 and rep["dropped"] == 0 and rep["kept"] == 8
    # the refreshed manifest covers everything: nothing unlisted, and the
    # new region prunes precisely
    sel = layout.prune_files(spark, path, {"x": (100, 101), "y": (100, 101)})
    assert not sel["unlisted"]
    assert sel["n_skipped"] >= 8
    pred = F.col("x") >= 100
    assert (
        layout.read_pruned(spark, path, {"x": (100, 101), "y": (100, 101)})
        .filter(pred)
        .count()
        == 2
    )

    # a file disappears (compaction/delete): its row drops on refresh
    victim = next(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    os.remove(f"{path}/{victim}")
    # stale manifest with a DEAD entry: pruning ignores it (a directory
    # scan would not read it either), n_skipped stays non-negative, and
    # the pruned read works instead of raising PATH_NOT_FOUND
    wide = {"x": (-1000, 1000), "y": (-1000, 1000)}
    sel_dead = layout.prune_files(spark, path, wide)
    assert sel_dead["n_skipped"] >= 0
    assert (
        layout.read_pruned(spark, path, wide).count()
        == spark.read.parquet(path).count()
    )
    rep2 = layout.update_file_manifest(spark, path, ["x", "y"])
    assert rep2["dropped"] == 1 and rep2["added"] == 0
    n_manifest = spark.read.parquet(mp).count()
    assert n_manifest == 9

    # crash window: final overwrite never happened — manifest dir gone,
    # merged state only in __next; readers fall back, re-run heals
    shutil.rmtree(mp + "__next")
    shutil.copytree(mp, mp + "__next")
    shutil.rmtree(mp)
    sel2 = layout.prune_files(spark, path, {"x": (0, 5), "y": (0, 5)})
    assert sel2["n_total"] == 9 and not sel2["unlisted"]
    rep3 = layout.update_file_manifest(spark, path, ["x", "y"])
    assert rep3 == {"added": 0, "dropped": 0, "kept": 9}
    assert spark.read.parquet(mp).count() == 9


def test_prune_files_exact_hypothesis(spark, tmp_path):
    """Property: for ANY point set (with NULLs) laid out into multiple
    files and ANY query box, the manifest-pruned scan + row filter
    returns exactly what a full scan + filter returns — pruning may only
    remove files that cannot match."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.one_of(st.none(), st.integers(min_value=-20, max_value=20))
    points = st.lists(st.tuples(vals, vals), min_size=1, max_size=60)
    boxes = st.tuples(
        st.integers(min_value=-25, max_value=25),
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=-25, max_value=25),
        st.integers(min_value=0, max_value=15),
    )
    counter = [0]

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pts=points, box=boxes)
    def run(pts, box):
        counter[0] += 1
        path = str(tmp_path / f"h{counter[0]}")
        df = spark.createDataFrame(pts, "x long, y long")
        df.repartition(4).write.parquet(path)
        layout.build_file_manifest(spark, path, ["x", "y"])
        x_lo, dx, y_lo, dy = box
        ranges = {"x": (x_lo, x_lo + dx), "y": (y_lo, y_lo + dy)}
        pred = F.col("x").between(x_lo, x_lo + dx) & F.col("y").between(
            y_lo, y_lo + dy
        )
        full = sorted(
            map(tuple, spark.read.parquet(path).filter(pred).collect())
        )
        pruned = sorted(
            map(
                tuple,
                layout.read_pruned(spark, path, ranges)
                .filter(pred)
                .collect(),
            )
        )
        assert pruned == full

    run()


def test_file_stats_manifest_scan_is_column_pruned(spark, tmp_path):
    """The manifest build must not read untracked columns: its scan's
    ReadSchema carries only the tracked cols (+ _metadata, which is
    synthesized, not read from data pages) — on a wide 100 TB table the
    build cost follows the TRACKED columns."""
    spark.createDataFrame(
        [(1, 2, "wide_payload" * 100)], "x long, y long, payload string"
    ).write.parquet(str(tmp_path / "wide"))
    m = layout.file_stats_manifest(spark, str(tmp_path / "wide"), ["x"])
    plan = m._jdf.queryExecution().executedPlan().toString()
    read_schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert read_schema, plan
    assert "payload" not in read_schema[0]
    assert "x:" in read_schema[0] or "x" in read_schema[0]


def test_checksum_manifest_diff_classifies_with_null_keys(spark):
    """The reprocessing decision: added/removed/changed/unchanged per
    partition, with the NULL-keyed partition treated as ONE partition in
    both generations (null-safe join) — never a spurious removed+added
    pair."""
    from security_data_pipeline_spark.operators.merge import (
        checksum_manifest_diff,
        dataset_checksum_by,
    )

    old = spark.createDataFrame(
        [
            (1, "a", "p1"),   # p1 unchanged
            (2, "b", "p2"),   # p2 changed (value moves)
            (3, "c", "p3"),   # p3 removed
            (4, "d", None),   # NULL partition: row count stays, value moves
        ],
        "id long, v string, pk string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "p1"),
            (2, "B", "p2"),
            (5, "e", "p4"),   # p4 added
            (4, "D", None),
        ],
        "id long, v string, pk string",
    )
    cols = ["id", "v"]
    diff = checksum_manifest_diff(
        dataset_checksum_by(old, cols, ["pk"]),
        dataset_checksum_by(new, cols, ["pk"]),
        ["pk"],
    )
    got = {r["pk"]: r["status"] for r in diff.collect()}
    assert got == {
        "p1": "unchanged",
        "p2": "changed",
        "p3": "removed",
        "p4": "added",
        None: "changed",
    }
    rows = {r["pk"]: (r["n_rows_old"], r["n_rows_new"]) for r in diff.collect()}
    assert rows["p3"] == (1, None) and rows["p4"] == (None, 1)
    assert rows[None] == (1, 1)


def test_publish_generation_roundtrip_and_time_travel(spark, tmp_path):
    """Publish two generations: versions increment, read_current cuts
    over atomically, the log keeps full history, and time travel reads
    the old generation verbatim."""
    import pytest

    from security_data_pipeline_spark.operators import layout

    root = str(tmp_path / "ds")
    g1 = str(tmp_path / "gen1")
    g2 = str(tmp_path / "gen2")
    spark.range(0, 10).write.parquet(g1)
    spark.range(10, 30).write.parquet(g2)

    assert layout.current_generation(spark, root) is None
    with pytest.raises(FileNotFoundError):
        layout.read_current(spark, root)

    v1 = layout.publish_generation(spark, root, g1)
    assert v1 == 1
    assert layout.read_current(spark, root).count() == 10

    v2 = layout.publish_generation(spark, root, g2)
    assert v2 == 2
    assert layout.read_current(spark, root).count() == 20
    assert layout.generation_log(spark, root) == [(1, g1), (2, g2)]
    assert layout.read_generation(spark, root, 1).count() == 10

    # rollback = republishing the old path as a NEW version
    v3 = layout.publish_generation(spark, root, g1)
    assert v3 == 3
    assert layout.read_current(spark, root).count() == 10


def test_publish_generation_cas_conflict_raises(spark, tmp_path):
    """expect_version turns publish into a CAS: a concurrent publish in
    the read-modify-write window is detected, never silently clobbered."""
    import pytest

    from security_data_pipeline_spark.operators import layout

    root = str(tmp_path / "ds")
    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    spark.range(5).write.parquet(g1)
    spark.range(5).write.parquet(g2)

    layout.publish_generation(spark, root, g1)  # v1
    # CAS against the version we read (1) succeeds
    assert layout.publish_generation(spark, root, g2, expect_version=1) == 2
    # stale CAS (still thinks current is 1) fails
    with pytest.raises(RuntimeError, match="concurrent publish"):
        layout.publish_generation(spark, root, g1, expect_version=1)


def test_publish_generation_ignores_crashed_tmp_files(spark, tmp_path):
    """A crashed half-written commit (dot-prefixed temp that never got
    renamed) is invisible to readers and to the next publisher."""
    import pathlib

    from security_data_pipeline_spark.operators import layout

    root = str(tmp_path / "ds")
    g1 = str(tmp_path / "g1")
    spark.range(5).write.parquet(g1)
    layout.publish_generation(spark, root, g1)

    junk = pathlib.Path(root) / "_commits" / ".tmp-deadbeef"
    junk.write_text("/nowhere")
    assert layout.current_generation(spark, root) == (1, g1)
    assert layout.publish_generation(spark, root, g1) == 2


def test_compact_then_publish_preserves_checksum(spark, tmp_path):
    """The full swap story: compact a fragmented dataset into a new
    generation, assert the order-free content checksum is unchanged,
    publish, and read through the pointer."""
    from security_data_pipeline_spark.operators import layout, merge

    root = str(tmp_path / "ds")
    g1 = str(tmp_path / "gen1")
    spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS grp"
    ).repartition(16).write.parquet(g1)
    layout.publish_generation(spark, root, g1)

    g2 = str(tmp_path / "gen2")
    plan = layout.compact_dataset(spark, g1, g2, n_files=2)
    assert plan["rows"] == 1000

    cols = ["id", "grp"]
    ck = lambda p: merge.dataset_checksum(
        spark.read.parquet(p), cols
    ).first()
    a, b = ck(g1), ck(g2)
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])

    layout.publish_generation(spark, root, g2, expect_version=1)
    assert layout.read_current(spark, root).count() == 1000
    files = layout.list_data_files(spark, g2)
    assert len(files) == 2
