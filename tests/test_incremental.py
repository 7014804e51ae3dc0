"""Incremental rollup maintenance: merge(partials) == direct aggregation."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from security_data_pipeline_spark.operators import incremental as inc


def _slices(spark):
    rows = [
        ("a", 1, 10.0), ("a", 2, -3.5), ("b", 1, 0.25),
        ("a", 1, 4.0), ("b", 3, 7.0), ("b", 3, None),
        ("c", 9, 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, u long, v double")
    return [
        df.filter(F.col("u") == 1),
        df.filter(F.col("u") == 2),
        df.filter(F.col("u") > 2),
    ], df


def test_merged_partials_equal_direct(spark):
    slices, full = _slices(spark)
    partials = [inc.partial_aggs(s, ["k"], ["v"], ["u"]) for s in slices]
    merged = inc.merge_partials(partials, ["k"], ["v"], ["u"])
    fin = inc.finalize(merged, ["k"], ["v"], ["u"]).collect()
    got = {r["k"]: r for r in fin}

    direct = {
        r["k"]: r
        for r in full.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(38,6)")).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("u").alias("d"),
        )
        .collect()
    }
    for k, d in direct.items():
        g = got[k]
        assert g["v_sum"] == d["s"], k
        assert g["v_min"] == d["mn"] and g["v_max"] == d["mx"], k
        assert g["n_rows"] == d["n"], k
        # tiny cardinalities: the sketch estimate is exact
        assert g["u_distinct"] == d["d"], k


def test_merge_is_order_independent(spark):
    slices, _ = _slices(spark)
    partials = [inc.partial_aggs(s, ["k"], ["v"], ["u"]) for s in slices]
    a = inc.finalize(
        inc.merge_partials(partials, ["k"], ["v"], ["u"]), ["k"], ["v"], ["u"]
    )
    b = inc.finalize(
        inc.merge_partials(partials[::-1], ["k"], ["v"], ["u"]),
        ["k"], ["v"], ["u"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tree_merge_of_merged_state(spark):
    # state is re-mergeable: merge(merge(p1,p2), p3) == merge(p1,p2,p3)
    slices, _ = _slices(spark)
    p = [inc.partial_aggs(s, ["k"], ["v"], ["u"]) for s in slices]
    left = inc.merge_partials(p[:2], ["k"], ["v"], ["u"])
    tree = inc.merge_partials([left, p[2]], ["k"], ["v"], ["u"])
    flat = inc.merge_partials(p, ["k"], ["v"], ["u"])
    fa = inc.finalize(tree, ["k"], ["v"], ["u"]).collect()
    fb = inc.finalize(flat, ["k"], ["v"], ["u"]).collect()
    assert sorted(map(tuple, fa)) == sorted(map(tuple, fb))


def test_empty_slice_is_identity(spark):
    slices, full = _slices(spark)
    empty = full.filter(F.lit(False))
    p = [inc.partial_aggs(s, ["k"], ["v"], ["u"]) for s in [full, empty]]
    fin = inc.finalize(
        inc.merge_partials(p, ["k"], ["v"], ["u"]), ["k"], ["v"], ["u"]
    ).collect()
    assert {r["k"]: r["n_rows"] for r in fin} == {"a": 3, "b": 3, "c": 1}


def test_avg_finalized_from_sum_and_count(spark):
    _, full = _slices(spark)
    p = inc.partial_aggs(full, ["k"], ["v"], [])
    fin = inc.finalize(p, ["k"], ["v"], []).collect()
    got = {r["k"]: r["v_avg"] for r in fin}
    # count skips the NULL v in group b: avg = (0.25 + 7.0) / 2
    assert got["b"] == Decimal("3.625000")
    assert got["a"] == Decimal("3.500000")


def test_streaming_rollup_equals_batch(spark, tmp_path):
    """maintain_rollup_stream folds micro-batch partials into persisted
    state; finalize over that state must equal a direct batch aggregation
    over everything the stream saw."""
    import json

    from security_data_pipeline_spark.streaming import maintain_rollup_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows1 = [{"k": "a", "u": 1, "v": 10.0}, {"k": "b", "u": 2, "v": 1.5}]
    rows2 = [{"k": "a", "u": 1, "v": 4.0}, {"k": "a", "u": 3, "v": -2.0}]
    (in_dir / "f1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    (in_dir / "f2.json").write_text("\n".join(json.dumps(r) for r in rows2))

    stream = (
        spark.readStream.schema("k string, u long, v double")
        .option("maxFilesPerTrigger", 1)  # force >1 micro-batch: real merges
        .json(str(in_dir))
    )
    state = str(tmp_path / "state")
    q = maintain_rollup_stream(
        stream,
        state,
        str(tmp_path / "ckpt"),
        keys=["k"],
        measures=["v"],
        distinct_cols=["u"],
    )
    q.awaitTermination(120)

    fin = inc.finalize(
        spark.read.parquet(state), ["k"], ["v"], ["u"]
    ).collect()
    got = {r["k"]: (float(r["v_sum"]), r["n_rows"], r["u_distinct"]) for r in fin}
    assert got == {"a": (12.0, 3, 2), "b": (1.5, 1, 1)}


def test_streaming_rollup_recovers_from_scratch_generation(spark, tmp_path):
    """If the state dir vanished mid-swap (crash during the final
    overwrite), the next batch must fold into the scratch generation, not
    silently restart from empty."""
    import json
    import shutil

    from security_data_pipeline_spark.streaming import maintain_rollup_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "f1.json").write_text(json.dumps({"k": "a", "u": 1, "v": 10.0}))
    state = str(tmp_path / "state")

    def run(ckpt):
        q = maintain_rollup_stream(
            spark.readStream.schema("k string, u long, v double").json(str(in_dir)),
            state,
            str(tmp_path / ckpt),
            keys=["k"],
            measures=["v"],
            distinct_cols=["u"],
        )
        q.awaitTermination(120)

    run("ckpt1")
    # simulate the crash window: state written to scratch, final overwrite
    # died after deleting the target
    shutil.rmtree(state)
    assert (tmp_path / "state__next").exists()

    (in_dir / "f2.json").write_text(json.dumps({"k": "a", "u": 2, "v": 5.0}))
    # a fresh checkpoint reads BOTH files as its first batch (15.0 / 2 rows);
    # folding that into the recovered scratch state (10.0 / 1 row) proves the
    # fold went through scratch — a silent reset would end at 15.0 / 2.
    run("ckpt2")
    fin = inc.finalize(
        spark.read.parquet(state), ["k"], ["v"], ["u"]
    ).collect()
    row = {r["k"]: r for r in fin}["a"]
    # scratch held (10.0, 1 row); new batch over both files adds 15.0/2 rows
    assert float(row["v_sum"]) == 25.0 and row["n_rows"] == 3
