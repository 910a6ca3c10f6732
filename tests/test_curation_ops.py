"""Unit tests for the data-curation operators added on top of the oracle
harness: decontamination, repetition scoring, grouped exact quantiles.

(The oracle-parity tests in test_queries_oracle.py check these end-to-end
against DuckDB at sf0.001; these tests pin the SEMANTICS on hand-crafted
inputs where the expected values are computable by eye.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(ray, rows):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(2)


def test_decontaminate_counts_distinct_overlapping_grams(ray_session):
    from polars_genson_ray.stages.decontam import decontaminate

    bench = ["the quick brown fox jumps over the lazy dog"]
    rows = [
        # contains "the quick brown fox jumps" and 4 more bench 5-grams
        (1, "prefix the quick brown fox jumps over the lazy dog suffix"),
        # one bench 5-gram, repeated twice — distinct count is still 1
        (2, "quick brown fox jumps over x quick brown fox jumps over"),
        (3, "completely unrelated words with no overlap at all here"),
        (4, "too short"),  # < 5 words: no shingles
    ]
    out = (
        decontaminate(_docs_ds(ray_session, rows), bench, ngram_words=5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # bench has 5 distinct 5-grams; doc 1 contains all 5
    assert out.loc[1, "n_contam"] == 5
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_contam"] == 1
    assert out.loc[3, "n_contam"] == 0
    assert not bool(out.loc[3, "contaminated"])
    assert out.loc[4, "n_contam"] == 0


def test_benchmark_ngram_set_dedups(ray_session):
    from polars_genson_ray.stages.decontam import benchmark_ngram_hashes

    a = benchmark_ngram_hashes(["a b c d e", "a b c d e"], n=5)
    assert len(a) == 1
    assert len(benchmark_ngram_hashes(["a b c d"], n=5)) == 0
    assert len(benchmark_ngram_hashes([None, ""], n=5)) == 0


def test_repetition_scorer_hand_computed():
    from polars_genson_ray.stages.text import RepetitionScorer

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a a b", "x", ""], pa.string()),
        }
    )
    out = RepetitionScorer()(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 4
    assert out.loc[1, "dup_word_frac"] == pytest.approx(0.5)  # 1 - 2/4
    assert out.loc[1, "top_word_frac"] == pytest.approx(0.75)  # 'a' 3/4
    # bigrams: 'a a', 'a a', 'a b' → top 2/3
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(2 / 3)
    assert out.loc[2, "n_words"] == 1
    assert out.loc[2, "top_word_frac"] == pytest.approx(1.0)
    assert out.loc[2, "top_bigram_frac"] == 0.0
    assert out.loc[3, "n_words"] == 0
    assert out.loc[3, "dup_word_frac"] == 0.0


def test_grouped_quantiles_matches_numpy(ray_session):
    import ray.data as rd

    from polars_genson_ray.stages.aggregate import grouped_quantiles

    rng = np.random.default_rng(7)
    keys = rng.choice(["a", "b", "c"], size=500)
    vals = rng.integers(0, 40, size=500)
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = rd.from_pandas(df).repartition(4)
    qs = (0.25, 0.5, 0.9)
    out = grouped_quantiles(ds, "k", "v", qs=qs).to_pandas()
    for key, g in df.groupby("k"):
        for q in qs:
            expected = np.quantile(g["v"].to_numpy(), q)  # linear interp
            got = out[(out.k == key) & (out.q == q)]["value"].iloc[0]
            assert got == pytest.approx(expected), (key, q)
