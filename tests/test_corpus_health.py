"""q_corpus_health must equal the join of its four constituent
batteries with the flag arithmetic applied to the same rounded
columns, and the screens must actually fire on a pathological slice."""

import random

from pyspark.sql import functions as F

import __spark_entry__ as entry
from chronoxtract_spark.operators.corpus_stats import (
    boilerplate_prefixes,
    hill_tail,
    lexical_stats,
)
from chronoxtract_spark.operators.text import charclass_profile


def _health_from_parts(df):
    cc = {r.source: r for r in charclass_profile(df).collect()}
    lx = {r.source: r for r in lexical_stats(df).collect()}
    bp = {r.source: r for r in boilerplate_prefixes(df).collect()}
    ht = {r.source: r for r in hill_tail(df).collect()}
    out = {}
    for s in set(cc) & set(lx) & set(bp) & set(ht):
        flags = (
            int(bp[s].top_share > 0.05)
            + int(lx[s].hapax_share < 0.01)
            + int(ht[s].hill_alpha is not None and ht[s].hill_alpha > 20.0)
            + int(cc[s].other_share > 0.3)
        )
        out[s] = dict(
            n_docs=bp[s].n_docs, n_tokens=lx[s].n_tokens,
            ttr=lx[s].ttr, top_share=bp[s].top_share,
            hill_alpha=ht[s].hill_alpha, n_flags=flags,
        )
    return out


def test_matches_constituents_on_testdata(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {r.source: r.asDict()
           for r in entry.q_corpus_health(spark, sf).collect()}
    want = _health_from_parts(docs)
    assert set(got) == set(want)
    for s, cols in want.items():
        for col, exp in cols.items():
            assert got[s][col] == exp, (s, col, got[s][col], exp)


def test_screens_fire_on_pathological_slice(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(2000)]
    organic = [(f"d{i}", " ".join(rng.choice(vocab) for _ in range(60)),
                "organic", 1) for i in range(40)]
    # template mill: one opening, no hapax, capped lengths
    mill = [(f"m{i}", "win a free prize now click here today yes "
             + "spam " * 10, "mill", 1) for i in range(40)]
    df = spark.createDataFrame(
        [(i, t, "en", src, len(t))
         for i, (d, t, src, _) in enumerate(organic + mill)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = {r.source: r for r in entry.q_corpus_health(spark, tmp).collect()}
    assert got["mill"].n_flags >= 2, got["mill"]
    assert got["mill"].top_share == 1.0
    assert got["organic"].n_flags < got["mill"].n_flags
