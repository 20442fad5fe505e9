"""Round-16 exact-substring detector: sliding k-grams + run-length
stitching must recover maximal duplicated spans with exact offsets —
including the offset-misaligned plant the width-6 grid lanes miss."""

from __future__ import annotations

from pyspark.sql import functions as F

from sas_etl_spark.operators.text import duplicated_spans


def _spans(spark, docs, k=8):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r.doc_id, r.start_pos, r.n_tokens)
        for r in duplicated_spans(df, k=k).collect()
    }


def test_misaligned_duplicate_the_grid_lane_misses(spark):
    """A 12-token span copied at offset 3 vs offset 0 shares NO
    width-6 grid cell (the partition lanes' blind spot) but must be
    found here with exact boundaries."""
    shared = " ".join(chr(ord("a") + i) for i in range(12))
    docs = [
        (1, shared + " m n o p"),
        (2, "x1 x2 x3 " + shared + " zz"),
        (3, "totally unique tokens that never repeat anywhere at all"),
    ]
    assert _spans(spark, docs) == {(1, 0, 12), (2, 3, 12)}

    # the grid lane really does miss it: no width-6 aligned chunk of
    # doc 1 equals any width-6 aligned chunk of doc 2
    def grid_chunks(text):
        t = text.split(" ")
        return {
            " ".join(t[i : i + 6]) for i in range(0, len(t), 6)
        }

    assert not (grid_chunks(docs[0][1]) & grid_chunks(docs[1][1]))


def test_within_doc_repetition_counts(spark):
    """Self-repetition is duplication (Lee et al.): one doc repeating
    its own 8-gram yields two spans in that doc."""
    eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    docs = [(1, eight + " mid1 mid2 " + eight)]
    assert _spans(spark, docs) == {(1, 0, 8), (1, 10, 8)}


def test_two_separate_runs_stay_separate(spark):
    """Two disjoint duplicated spans in one doc must not merge: the
    gap breaks the island."""
    s1 = " ".join(f"a{i}" for i in range(8))
    s2 = " ".join(f"b{i}" for i in range(9))
    docs = [
        (1, s1 + " gap1 gap2 gap3 " + s2),
        (2, s1 + " other filler words here now " + s2),
    ]
    got = _spans(spark, docs)
    assert got == {
        (1, 0, 8), (1, 11, 9),
        (2, 0, 8), (2, 13, 9),
    }


def test_short_docs_and_no_duplicates_empty(spark):
    docs = [
        (1, "too short"),
        (2, "eight distinct tokens but nothing shared with anyone else"),
    ]
    assert _spans(spark, docs) == set()


def test_overlapping_occurrences_report_maximal_run(spark):
    """A periodic string duplicates k-grams at every offset; the
    stitcher must emit ONE maximal span per doc, not per k-gram."""
    rep = " ".join(["w1 w2 w3"] * 5)  # 15 tokens, period 3
    docs = [(1, rep), (2, rep + " tail1 tail2")]
    got = _spans(spark, docs)
    # every k-gram position in doc 1 is duplicated -> one island
    # covering the whole 15 tokens; doc 2's first 15 tokens likewise
    assert (1, 0, 15) in got and (2, 0, 15) in got
    assert len([g for g in got if g[0] == 1]) == 1


def test_registered_query_runs_on_fixture(spark):
    from sas_etl_spark.queries.text_curation import q_exact_substring
    from tests.conftest import SF_CORRECTNESS

    df = q_exact_substring(spark, SF_CORRECTNESS)
    assert df.columns == ["doc_id", "start_pos", "n_tokens"]
    rows = df.collect()
    # empty-but-correct is allowed at tiny SF (chunk-lane contract);
    # any reported span must be >= k tokens long at a sane offset
    assert all(r.n_tokens >= 8 and r.start_pos >= 0 for r in rows)
