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


def test_boilerplate_ngrams_finds_planted_bigram(ray_session):
    from polars_genson_ray.stages.corpus import boilerplate_ngrams

    rows = [(i, f"cookie banner unique{i} filler words") for i in range(10)]
    rows += [(100, "nothing shared here"), (101, "cookie banner")]
    # "cookie banner" in 11 docs; every other bigram df <= 10
    out = (
        boilerplate_ngrams(_docs_ds(ray_session, rows), "text",
                           ngram_words=2, min_df=11)
        .to_pandas()
    )
    assert len(out) == 1
    assert out.iloc[0]["gram"] == "cookie banner"
    assert out.iloc[0]["df"] == 11


def test_unigram_logprob_hand_computed(ray_session):
    import numpy as np

    from polars_genson_ray.stages.corpus import unigram_logprob

    # corpus: 4 'a', 2 'b', 2 'c' -> p(a)=.5, p(b)=.25, p(c)=.25
    rows = [(1, "a a b"), (2, "a a b c c"), (3, "")]
    ds = _docs_ds(ray_session, rows)
    out = (
        unigram_logprob(ds, _docs_ds(ray_session, rows))
        .to_pandas()
        .set_index("doc_id")
    )
    assert sorted(out.index) == [1, 2]  # empty doc dropped
    lp = {"a": np.log(0.5), "b": np.log(0.25), "c": np.log(0.25)}
    exp1 = round((2 * lp["a"] + lp["b"]) / 3, 6)
    exp2 = round((2 * lp["a"] + lp["b"] + 2 * lp["c"]) / 5, 6)
    assert out.loc[1, "logprob"] == pytest.approx(exp1, abs=1e-9)
    assert out.loc[2, "logprob"] == pytest.approx(exp2, abs=1e-9)
    assert out.loc[1, "n_words"] == 3 and out.loc[2, "n_words"] == 5


def test_pack_batch_next_fit_semantics():
    from polars_genson_ray.stages.packing import pack_batch

    counts = np.array([50, 40, 30, 100, 1, 2000, 5, 0, 0])
    a = pack_batch(counts, 100)
    # next-fit: [50,40] (90), [30], [100] (exactly full), [1],
    # [2000] (oversize, alone), [5,0,0]
    assert a.tolist() == [0, 0, 1, 2, 3, 4, 5, 5, 5]
    # no pack except a single-doc oversize exceeds the budget
    for p in set(a.tolist()):
        tot = counts[a == p].sum()
        assert tot <= 100 or (counts[a == p] > 100).any()


def test_pack_documents_round_trip(ray_session):
    import ray.data as rd

    from polars_genson_ray.stages.packing import pack_documents

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {"doc_id": np.arange(1000), "n_tokens": rng.integers(1, 300, 1000)}
    )
    ds = rd.from_pandas(df).repartition(4)
    out = pack_documents(ds, 512, batch_size=256).to_pandas()
    # every doc appears exactly once across packs
    all_ids = sorted(i for ids in out.doc_ids for i in ids)
    assert all_ids == list(range(1000))
    assert out.pack_id.is_unique
    assert (out.total_tokens == [sum(df.n_tokens[df.doc_id.isin(ids)])
                                 for ids in out.doc_ids]).all()
    ok = (out.total_tokens <= 512) | out.oversize
    assert ok.all()
    # fill should be healthy for random small docs
    assert out.fill.mean() > 0.6


def test_training_data_prep_deterministic_across_partitioning(ray_session):
    """The end-to-end prep summary must be identical regardless of input
    partitioning — the property that makes the pipeline resumable and
    cluster-size-invariant."""
    from polars_genson_ray.pipelines import queries as Q

    base = Q.r_training_data_prep("/root/testdata/sf0.001")
    assert list(base.columns) == [
        "shard", "n_docs", "n_packs", "total_tokens", "fill"
    ]
    assert base["n_docs"].sum() > 0
    assert (base["n_packs"] > 0).all()
    assert (base["fill"] > 0).all() and (base["fill"] <= 1.0).all()

    # rerun — different session state, same result
    again = Q.r_training_data_prep("/root/testdata/sf0.001")
    import pandas as pd
    pd.testing.assert_frame_equal(base, again)


def test_hash_mix_upsample_exact_replication(ray_session):
    """Copy counts are a pure function of (id, weight): floor(w) + the md5
    Bernoulli, rep index 0..n-1 per surviving row, stable under
    repartitioning."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from polars_genson_ray.stages.mix import hash_mix_upsample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "source": [f"s{i % 3}" for i in range(200)],
        }
    )
    weights = {"s0": 2.0, "s1": 0.25, "s2": 1.75}
    for parts in (1, 5):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        out = (
            hash_mix_upsample(
                ds, weights, id_column="doc_id", source_column="source"
            )
            .to_pandas()
            .sort_values(["doc_id", "rep"])
            .reset_index(drop=True)
        )
        exp_rows = []
        for _, row in df.iterrows():
            w = weights[row.source]
            u = int(
                hashlib.md5(str(row.doc_id).encode()).hexdigest()[:8], 16
            ) / 2**32
            n = int(np.floor(w)) + (1 if u < w - np.floor(w) else 0)
            for rep in range(n):
                exp_rows.append((row.doc_id, row.source, rep))
        exp = pd.DataFrame(exp_rows, columns=["doc_id", "source", "rep"])
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # expected mass ≈ sum of weights (law of the construction, not chance:
    # every integer-weight row contributes exactly w)
    s0 = out[out.source == "s0"]
    assert len(s0) == 2 * (len(df) // 3 + (1 if len(df) % 3 else 0))


def test_duplicated_spans_interval_union_coverage(ray_session):
    """Planted-truth check of the window-coverage arithmetic: overlapping
    duplicated windows must count each covered position ONCE."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.corpus import duplicated_spans

    # docs 0 and 1 share the 6-word run "a b c d e f" → with n=3 the dup
    # 3-grams are (a b c),(b c d),(c d e),(d e f): overlapping windows
    # covering positions 0..5 = 6 words exactly (not 4*3=12)
    shared = "a b c d e f"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                shared + " unique0 tail0",
                "head1 " + shared,
                "totally different words here seven eight",
            ],
        }
    )
    out = (
        duplicated_spans(
            rd.from_pandas(docs).repartition(2), "text", "doc_id",
            ngram_words=3, min_docs=2,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_words"] == 8 and out.loc[0, "dup_words"] == 6
    assert out.loc[1, "n_words"] == 7 and out.loc[1, "dup_words"] == 6
    assert out.loc[2, "dup_words"] == 0
    assert out.loc[0, "dup_fraction"] == 6 / 8
    assert out.loc[2, "dup_fraction"] == 0.0


def test_bm25_ranking_and_selectivity(ray_session):
    """BM25 sanity: higher tf of a rare term outranks common terms; docs
    with no query term are absent."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.corpus import bm25_scores

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "zebra zebra zebra common filler words",  # rare term, tf 3
                "zebra common filler pad filler pad",     # rare term, tf 1
                "common common common common pad pad",    # only common term
                "nothing relevant at all",                # no query terms
            ],
        }
    )
    out = (
        bm25_scores(rd.from_pandas(docs).repartition(2), "zebra common")
        .to_pandas()
        .set_index("doc_id")["bm25"]
    )
    assert set(out.index) == {0, 1, 2}
    assert out[0] > out[1] > 0
    assert out[1] > out[2]  # one rare-term hit beats pure common-term tf
    assert all(out > 0)


def test_bloom_decontaminate_superset_of_exact(ray_session):
    """Bloom flags must be a SUPERSET of exact decontamination flags (no
    false negatives), and with an 8 MiB bitmap over a toy corpus the FP
    count is zero — flags match exactly."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.decontam import (
        bloom_decontaminate,
        decontaminate,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(80)]
    texts = [
        " ".join(rng.choice(vocab, size=int(k)).tolist())
        for k in rng.integers(3, 30, size=120)
    ]
    # plant: docs 100.. share an exact 5-gram run with bench docs 0..4
    bench_texts = texts[:5]
    for i in range(5):
        words = texts[100 + i].split()
        texts[100 + i] = " ".join(words[:2] + bench_texts[i].split()[:5] + words[2:])
    docs = pd.DataFrame({"doc_id": range(120), "text": texts})
    train = rd.from_pandas(docs.iloc[5:]).repartition(3)
    contam = rd.from_pandas(docs.iloc[:5]).repartition(2)

    exact = (
        decontaminate(train, bench_texts, ngram_words=5)
        .to_pandas().set_index("doc_id").sort_index()
    )
    bloom = (
        bloom_decontaminate(train, contam, ngram_words=5)
        .to_pandas().set_index("doc_id").sort_index()
    )
    exact_flagged = set(exact.index[exact.contaminated])
    bloom_flagged = set(bloom.index[bloom.contaminated])
    assert {100 + i for i in range(5)} <= exact_flagged
    assert exact_flagged <= bloom_flagged  # never a false negative
    assert bloom_flagged == exact_flagged  # 8 MiB bitmap: no FPs at toy size
    # hit counts agree when there are no false positives
    assert (
        bloom.loc[sorted(exact_flagged), "n_maybe_contam"].to_numpy()
        == exact.loc[sorted(exact_flagged), "n_contam"].to_numpy()
    ).all()


def test_bloom_filter_build_is_order_independent(ray_session):
    """OR-merge of per-batch bitmaps is commutative: different
    partitionings build the identical filter."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.decontam import build_bloom_filter

    texts = [f"alpha beta gamma delta epsilon doc{i} zeta eta" for i in range(40)]
    docs = pd.DataFrame({"doc_id": range(40), "text": texts})
    a = build_bloom_filter(rd.from_pandas(docs).repartition(1), bits_log2=20)
    b = build_bloom_filter(rd.from_pandas(docs).repartition(7), bits_log2=20)
    assert (a == b).all()


def test_re2_tokenizer_matches_duckdb_exactly():
    """sketches.re2_words must agree with DuckDB's
    string_split_regex('\\s+') + empty-drop on hostile whitespace: NBSP
    and thin space stay inside tokens, \\x0b stays inside tokens (RE2 \\s
    has no \\v), \\t\\n\\f\\r and space all split."""
    import duckdb

    from polars_genson_ray.stages.sketches import re2_words

    cases = [
        "foo bar baz",      # NBSP inside token
        "a b c",            # thin space inside token
        "a\x0bb c",              # vertical tab inside token (RE2 keeps it)
        "a\x1cb\x1dc d",           # FS/GS inside tokens (str.split would split)
        "a\x1eb\x1fc d",           # RS/US inside tokens
        "x\ty\nz\fq\rw e",       # every RE2 ws char splits
        "  leading and trailing  ",
        "",
    ]
    con = duckdb.connect()
    for t in cases:
        ours = re2_words(t)
        theirs = [
            r[0]
            for r in con.execute(
                "SELECT UNNEST(string_split_regex(lower(?), '\\s+')) AS w",
                [t],
            ).fetchall()
            if r[0] != ""
        ]
        assert ours == theirs, (t, ours, theirs)


def test_dup_spans_and_bm25_oracle_hostile_whitespace(ray_session):
    """End-to-end engine-vs-DuckDB parity for the two corpus operators on
    documents containing NBSP / tabs / trailing newlines AND docs whose
    text is non-space whitespace only (trim() strips spaces only, so such
    docs survive a trim(text) <> '' filter with an empty word list) —
    runs the SHIPPED oracle_sql() against the hostile frame so the test
    pins the exact SQL the driver executes."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    import __ray_entry__ as entry
    from polars_genson_ray.stages.corpus import bm25_scores, duplicated_spans

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "alpha beta gamma delta epsilon zeta eta",
                "alpha beta gamma delta epsilon zeta theta\n",
                "\talpha beta gamma delta epsilon zeta iota",
                "plain words only here now",
                "\t\n\f\r",  # non-space whitespace only: zero words
                "",
            ],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    oracles = entry.oracle_sql()

    # dup_spans: the shipped oracle must drop the zero-word docs exactly
    # like the engine (no nw=0 row with a NULL 0/0 dup_fraction)
    spans = (
        duplicated_spans(rd.from_pandas(docs), ngram_words=5, min_docs=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    oracle = (
        con.execute(oracles["dup_spans"]).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert spans.doc_id.tolist() == oracle.doc_id.tolist() == [0, 1, 2, 3]
    assert spans.n_words.tolist() == oracle.n_words.tolist()
    assert spans.dup_words.tolist() == oracle.dup_words.tolist()
    assert spans.dup_fraction.tolist() == oracle.dup_fraction.tolist()
    # docs 0/1 share their first FIVE tokens (the NBSP fuses beta+gamma
    # into one token on both sides), i.e. exactly one duplicated 5-gram
    assert spans.loc[0, "dup_words"] == 5

    # bm25: the zero-word doc must not count into n_docs/avgdl on either
    # side (the shipped oracle's dl CTE filters len(w) > 0)
    bdocs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "hash join merge sort hash",
                "\tsort merge\n",
                "no query terms here",
                "\t\n",  # zero words: shifts avgdl/n_docs if miscounted
            ],
        }
    )
    con2 = duckdb.connect()
    con2.register("documents", bdocs)
    scores = (
        bm25_scores(rd.from_pandas(bdocs), "hash join merge sort")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    boracle = (
        con2.execute(oracles["bm25_docs"]).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert scores.doc_id.tolist() == boracle.doc_id.tolist()
    assert scores.bm25.tolist() == boracle.bm25.tolist()


def test_bloom_and_bm25_empty_inputs(ray_session):
    """Empty contamination corpus → all-zero filter (nothing flagged);
    empty bm25 corpus → empty result, no crash."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.corpus import bm25_scores
    from polars_genson_ray.stages.decontam import bloom_decontaminate

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e f", "g h"]})
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=int),
                          "text": pd.Series([], dtype=str)})
    tagged = bloom_decontaminate(
        rd.from_pandas(docs), rd.from_pandas(empty)
    ).to_pandas()
    assert not tagged.contaminated.any()

    out = bm25_scores(rd.from_pandas(empty), "a b").to_pandas()
    assert len(out) == 0


def test_dup_spans_broadcast_guard(ray_session):
    """The dup-gram broadcast guard raises with a diagnostic instead of
    silently materializing an unbounded set on the driver."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from polars_genson_ray.stages.corpus import duplicated_spans

    docs = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d e f g h", "a b c d e f g h"]}
    )
    with pytest.raises(ValueError, match="broadcast budget"):
        duplicated_spans(
            rd.from_pandas(docs), ngram_words=2, min_docs=2, max_dup_grams=2
        )

def test_repetition_and_token_oracles_hostile_whitespace(ray_session):
    """RepetitionScorer / TokenCounter / chunk_documents now follow the
    engine-wide RE2 tokenization contract — engine output must match the
    SHIPPED oracle_sql() on NBSP / VT / tab-edge / whitespace-only docs
    (exactly where str.split() used to diverge)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    import __ray_entry__ as entry
    from polars_genson_ray.stages.packing import chunk_documents
    from polars_genson_ray.stages.text import RepetitionScorer, TokenCounter

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "one two two three three three",  # NBSP fuses a token
                "\ta B a\x0bB c\n",  # tab edge + VT inside a token
                "plain words only",
                "\t\n\f\r",  # zero words after RE2 split
                "",
            ],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    oracles = entry.oracle_sql()

    rep = (
        rd.from_pandas(docs)
        .map_batches(RepetitionScorer(), batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    orep = (
        con.execute(oracles["doc_repetition"]).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert rep.doc_id.tolist() == orep.doc_id.tolist()
    assert rep.n_words.tolist() == orep.n_words.tolist()
    assert rep.dup_word_frac.tolist() == orep.dup_word_frac.tolist()
    assert rep.top_word_frac.tolist() == orep.top_word_frac.tolist()
    assert rep.top_bigram_frac.tolist() == orep.top_bigram_frac.tolist()
    # NBSP doc: 6 visual words but 5 RE2 tokens ("two\xa0two" is ONE)
    assert rep.loc[0, "n_words"] == 5

    tok = (
        rd.from_pandas(docs)
        .map_batches(TokenCounter(), batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    otok = (
        con.execute(oracles["token_counts"]).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert tok.n_tokens.tolist() == otok.n_tokens.tolist()
    assert tok.n_tokens.tolist() == [5, 4, 3, 0, 0]

    chunks = (
        chunk_documents(rd.from_pandas(docs), chunk_tokens=3, stride=2)
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    osql = oracles["chunk_documents"].replace(", 48", ", 2").replace(
        "s + 64", "s + 3").replace("LEAST(64", "LEAST(3").replace(
        "s // 48", "s // 2")
    ochunks = (
        con.execute(osql).fetchdf()
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    assert chunks.doc_id.tolist() == ochunks.doc_id.tolist()
    assert chunks.chunk.tolist() == ochunks.chunk.tolist()
    assert chunks.n_tokens.tolist() == ochunks.n_tokens.tolist()
    # case preserved in chunk text (re2_tokens, not re2_words)
    assert any("B" in c for c in chunks.chunk)


def test_global_row_number_rejects_nan_order_values(ray_session):
    """Null/NaN order values would vanish from the distinct-value counts
    while their rows still hit the rank exchange — the operator must
    refuse them with a clear message instead of misranking."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from polars_genson_ray.stages.shards import global_row_number

    df = pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "value": [1.0, np.nan, 2.0, 0.5]}
    )
    with pytest.raises(Exception, match="null/NaN"):
        global_row_number(
            rd.from_pandas(df), "value", "event_id"
        ).materialize()

def test_char_spans_catch_subword_duplication_words_miss(ray_session):
    """duplicated_char_spans vs duplicated_spans on a planted corpus:
    both see verbatim duplication, but only the char-level pass catches
    duplication broken by sub-word edits (every Nth word perturbed, so no
    full word n-gram survives while long char runs still repeat), and the
    shipped char oracle agrees with the engine on the same frame."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    import __ray_entry__ as entry
    from polars_genson_ray.stages.corpus import (
        duplicated_char_spans,
        duplicated_spans,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(200)]
    base = " ".join(rng.choice(vocab, 40))
    # doc1 = verbatim copy of doc0; doc2 = copy with every 4th word's last
    # char flipped (kills every 5-word gram, keeps long char runs);
    # doc3 = unrelated
    words = base.split()
    perturbed = [
        (w[:-1] + "x") if i % 4 == 0 else w for i, w in enumerate(words)
    ]
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [base, base, " ".join(perturbed),
                 " ".join(rng.choice(vocab, 40))],
    })
    ds = rd.from_pandas(docs)

    wspans = (
        duplicated_spans(ds, ngram_words=5, min_docs=2)
        .to_pandas().set_index("doc_id")
    )
    cspans = (
        duplicated_char_spans(ds, ngram_chars=12, min_docs=2)
        .to_pandas().set_index("doc_id")
    )
    # verbatim copies: both passes see full coverage
    assert wspans.loc[0, "dup_fraction"] == 1.0
    assert cspans.loc[0, "dup_fraction"] == 1.0
    # sub-word-perturbed copy: invisible to word grams, visible to chars
    assert wspans.loc[2, "dup_words"] == 0
    assert cspans.loc[2, "dup_fraction"] > 0.4
    # unrelated doc: clean in both
    assert wspans.loc[3, "dup_words"] == 0
    assert cspans.loc[3, "dup_chars"] == 0

    # shipped oracle agreement on this frame (ngram_chars=24 contract)
    con = duckdb.connect()
    con.register("documents", docs)
    eng = (
        duplicated_char_spans(ds, ngram_chars=24, min_docs=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ora = (
        con.execute(entry.oracle_sql()["dup_spans_chars"]).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert eng.doc_id.tolist() == ora.doc_id.tolist()
    assert eng.n_chars.tolist() == ora.n_chars.tolist()
    assert eng.dup_chars.tolist() == ora.dup_chars.tolist()
    assert eng.dup_fraction.tolist() == ora.dup_fraction.tolist()

def test_char_spans_partitioning_invariant(ray_session):
    """duplicated_char_spans output must not depend on block layout: the
    df exchange + broadcast probe are partials over distinct-(doc, gram)
    pairs, so 1-block and 7-block runs must agree exactly."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.corpus import duplicated_char_spans

    rng = np.random.default_rng(29)
    vocab = [f"tok{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(60)]
    texts += texts[:15]  # planted full duplicates
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    def run(parts):
        return (
            duplicated_char_spans(
                rd.from_pandas(docs).repartition(parts), ngram_chars=16
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert (a.set_index("doc_id").loc[0, "dup_fraction"] == 1.0)

def test_re2_tokenizer_hypothesis_differential():
    """Property fuzz of the tokenization contract, two legs matched to
    what each function actually promises:

    * ``re2_tokens`` (case-preserving) vs DuckDB's raw
      string_split_regex('\\s+') + empty-drop over the FULL alphabet
      (ASCII controls, Unicode spaces, CJK) — the split semantics are
      contract-exact on any input;
    * ``re2_words`` vs SQL ``lower(?)`` applied INSIDE DuckDB, over an
      ASCII-letter alphabet plus the hostile whitespace set — the
      lowercasing side of the contract is ASCII-exact by design: Python
      str.lower() and utf8proc diverge on special casings (e.g. U+0130
      'İ' → 'i̇' in Python but 'i' in DuckDB), which is documented in
      sketches.re2_words / SimHasher rather than papered over here.
    """
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polars_genson_ray.stages.sketches import re2_tokens, re2_words

    con = duckdb.connect()

    def duck_split(t: str, sql_lower: bool) -> list:
        expr = "lower(?)" if sql_lower else "?"
        return [
            r[0]
            for r in con.execute(
                f"SELECT UNNEST(string_split_regex({expr}, '\\s+')) AS w", [t]
            ).fetchall()
            if r[0] != ""
        ]

    full_alphabet = st.one_of(
        st.characters(min_codepoint=0, max_codepoint=0x7F),
        st.sampled_from("\xa0 \u2009 \x85\x0b\x1c\x1f"),
        st.characters(min_codepoint=0x80, max_codepoint=0x2FFF),
    )
    ascii_alphabet = st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.sampled_from("\t\n\f\r\x0b\x1c\x1f\xa0"),
    )

    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet=full_alphabet, max_size=40))
    def check_tokens(t):
        assert re2_tokens(t) == duck_split(t, sql_lower=False), repr(t)

    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet=ascii_alphabet, max_size=40))
    def check_words(t):
        assert re2_words(t) == duck_split(t, sql_lower=True), repr(t)

    check_tokens()
    check_words()


def test_corpus_ops_randomized_oracle_differential(ray_session):
    """Randomized engine-vs-shipped-oracle differential: small random
    corpora (tiny vocab → heavy accidental duplication, 0/1-word docs,
    high tie density) across seeds, comparing dup_spans, dup_spans_chars
    and doc_repetition against the exact SQL the driver runs."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    import __ray_entry__ as entry
    from polars_genson_ray.stages.corpus import (
        duplicated_char_spans,
        duplicated_spans,
    )
    from polars_genson_ray.stages.text import RepetitionScorer

    oracles = entry.oracle_sql()
    for seed in (3, 11, 42):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab → collisions
        texts = [
            " ".join(rng.choice(vocab, rng.integers(0, 12)))
            for _ in range(50)
        ]
        docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        con = duckdb.connect()
        con.register("documents", docs)
        ds = rd.from_pandas(docs)

        spans = (
            duplicated_spans(ds, ngram_words=5, min_docs=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        ora = (
            con.execute(oracles["dup_spans"]).fetchdf()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert spans.doc_id.tolist() == ora.doc_id.tolist(), seed
        assert spans.dup_words.tolist() == ora.dup_words.tolist(), seed
        assert spans.dup_fraction.tolist() == ora.dup_fraction.tolist(), seed

        cs = (
            duplicated_char_spans(ds, ngram_chars=24, min_docs=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        cora = (
            con.execute(oracles["dup_spans_chars"]).fetchdf()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert cs.doc_id.tolist() == cora.doc_id.tolist(), seed
        assert cs.dup_chars.tolist() == cora.dup_chars.tolist(), seed
        assert cs.dup_fraction.tolist() == cora.dup_fraction.tolist(), seed

        rep = (
            ds.map_batches(RepetitionScorer(), batch_format="pyarrow")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        rora = (
            con.execute(oracles["doc_repetition"]).fetchdf()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert rep.n_words.tolist() == rora.n_words.tolist(), seed
        assert rep.dup_word_frac.tolist() == rora.dup_word_frac.tolist(), seed
        assert rep.top_bigram_frac.tolist() == rora.top_bigram_frac.tolist(), seed
