

def test_bm25_null_and_empty_corpora(spark):
    """NULL texts are empty documents: they score nothing but count in
    N/avgdl; an all-NULL (or all-empty) corpus returns zero rows instead
    of crashing the driver-side stats collection (sum of all-NULL doc
    lengths is NULL -> float(None)) or dividing the length norm by a
    zero avgdl."""
    from security_data_pipeline_spark.operators import textops

    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    assert textops.bm25_topk(all_null, ["x"], k=3).count() == 0
    all_empty = spark.createDataFrame(
        [(1, ""), (2, "  ")], "doc_id long, text string"
    )
    assert textops.bm25_topk(all_empty, ["x"], k=3).count() == 0
    mixed = spark.createDataFrame(
        [(1, None), (2, ""), (4, "real words here ok fine")],
        "doc_id long, text string",
    )
    got = textops.bm25_topk(mixed, ["real", "words"], k=3).collect()
    assert [r["doc_id"] for r in got] == [4]
