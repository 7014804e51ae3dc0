"""CCNet-style line-level dedup (operators/dedup.py:remove_duplicated_lines
family): removal semantics, scopes, normalization, key modes, round-trips."""

from __future__ import annotations

from security_data_pipeline_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _clean(df):
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_removed"])
        for r in df.collect()
    }


def test_cross_doc_duplicated_lines_removed_in_order(spark):
    docs = _docs(
        spark,
        [
            (1, "keep me\nBOILER\nalso mine"),
            (2, "BOILER\nunique two"),
            (3, "only here"),
        ],
    )
    out = _clean(dedup.remove_duplicated_lines(docs, scope="cross_doc"))
    assert out[1] == ("keep me\nalso mine", 3, 1)
    assert out[2] == ("unique two", 2, 1)
    assert out[3] == ("only here", 1, 0)


def test_scope_any_catches_within_doc_repeats(spark):
    docs = _docs(spark, [(1, "hdr\nbody\nhdr"), (2, "other")])
    # cross_doc: 'hdr' appears in only one document -> survives
    cross = _clean(dedup.remove_duplicated_lines(docs, scope="cross_doc"))
    assert cross[1] == ("hdr\nbody\nhdr", 3, 0)
    # any: two occurrences total -> boilerplate, both dropped
    any_ = _clean(dedup.remove_duplicated_lines(docs, scope="any"))
    assert any_[1] == ("body", 3, 2)


def test_min_ids_threshold(spark):
    docs = _docs(spark, [(1, "X\na"), (2, "X\nb"), (3, "X\nc"), (4, "Y\nd"), (5, "Y\ne")])
    out = _clean(
        dedup.remove_duplicated_lines(docs, scope="cross_doc", min_ids=3)
    )
    # X occurs in 3 docs -> removed; Y in only 2 -> survives min_ids=3
    assert out[1] == ("a", 2, 1)
    assert out[4] == ("Y\nd", 2, 0)


def test_ccnet_normalization_matches_variants(spark):
    docs = _docs(
        spark,
        [(1, "Hello, World 123!\nmine"), (2, "hello world\nyours")],
    )
    out = _clean(
        dedup.remove_duplicated_lines(
            docs, scope="cross_doc", normalize="ccnet"
        )
    )
    # the two headers normalize to the same key -> both removed
    assert out[1] == ("mine", 2, 1)
    assert out[2] == ("yours", 2, 1)
    # without normalization they differ -> both survive
    raw = _clean(dedup.remove_duplicated_lines(docs, scope="cross_doc"))
    assert raw[1][2] == 0 and raw[2][2] == 0


def test_hash_key_equals_text_key(spark):
    docs = _docs(
        spark,
        [
            (i, f"dup line\nuniq {i}\n" + ("tail" if i % 2 else f"t{i}"))
            for i in range(20)
        ],
    )
    a = _clean(dedup.remove_duplicated_lines(docs, line_key="text"))
    b = _clean(dedup.remove_duplicated_lines(docs, line_key="hash"))
    assert a == b
    assert all(v[2] >= 1 for v in a.values())  # 'dup line' always removed


def test_null_and_trailing_empty_lines(spark):
    # NULL text reads as one empty line; 'a\n' has a TRAILING empty line
    # (split limit -1). Empty lines participate like any other: the two
    # '' lines are cross-doc duplicated and both removed at min_ids=2...
    docs = _docs(spark, [(1, None), (2, "a\n"), (3, "b")])
    out = _clean(
        dedup.remove_duplicated_lines(docs, scope="cross_doc", min_ids=2)
    )
    assert out[1] == ("", 1, 1)
    assert out[2] == ("a", 2, 1)
    assert out[3] == ("b", 1, 0)
    # ...and round-trip untouched when under the threshold
    out3 = _clean(
        dedup.remove_duplicated_lines(docs, scope="cross_doc", min_ids=3)
    )
    assert out3[1] == ("", 1, 0)
    assert out3[2] == ("a\n", 2, 0)
    assert out3[3] == ("b", 1, 0)


def test_stats_fractions(spark):
    docs = spark.createDataFrame(
        [
            (1, "s1", "B\nu1"),
            (2, "s1", "B\nu2"),
            (3, "s2", "v\nw"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r["source"]: r
        for r in dedup.duplicated_line_stats(
            docs, by="source", scope="cross_doc"
        ).collect()
    }
    assert rows["s1"]["n_docs"] == 2
    assert rows["s1"]["n_docs_affected"] == 2
    assert rows["s1"]["total_lines"] == 4
    assert rows["s1"]["dup_lines"] == 2
    assert rows["s1"]["dup_line_frac"] == 0.5
    assert rows["s2"]["dup_lines"] == 0
    assert rows["s2"]["n_docs_affected"] == 0


def test_fully_boilerplate_doc_survives_empty(spark):
    docs = _docs(spark, [(1, "X"), (2, "X")])
    out = _clean(dedup.remove_duplicated_lines(docs, scope="cross_doc"))
    assert out[1] == ("", 1, 1)
    assert out[2] == ("", 1, 1)
