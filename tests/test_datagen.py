import pandas as pd

from embedanything_spark.datagen import (gen_conv, gen_query_set,
                                         gen_transcripts_df,
                                         gen_transcripts_pdf)


def test_deterministic_per_conv():
    a, b = gen_conv(7), gen_conv(7)
    pd.testing.assert_frame_equal(a, b)


def test_schema_and_invariants(transcripts_pdf):
    t = transcripts_pdf
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text",
                               "tool", "ts"]
    # turn_idx contiguous per conv
    g = t.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # ts monotone within conv
    assert t.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"] \
        .apply(lambda s: s.is_monotonic_increasing).all()
    # tool null iff role != tool
    assert (t["tool"].notna() == (t["role"] == "tool")).all()
    assert (t["text"] == "").sum() > 0  # empty turns exist


def test_spark_generation_matches_driver(spark, transcripts_pdf):
    """Distributed generation produces identical rows at any parallelism."""
    df = gen_transcripts_df(spark, 200, partitions=7)
    got = (df.toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want = (transcripts_pdf
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    got["turn_idx"] = got["turn_idx"].astype("int32")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_query_set_shape(queries_pdf):
    q = queries_pdf
    assert len(q) == 50
    assert q["k"].isin([1, 10, 100]).all()
    assert q["query_text"].str.contains("zzunseen").sum() == 5
