"""Unit + integration tests for the Ray pipeline components: sketches,
image validator, checkpoint/resume, drift fixtures, skew ops, dedup,
similarity, windows (FIXTURES.md layer C behaviours)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from polars_genson_ray.sources.synth import (
    decode_image,
    encode_image,
    generate_image_table,
    psnr,
    reference_pixels,
)


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------

def test_hll_accuracy_and_merge():
    from polars_genson_ray.stages.sketches import HyperLogLog, hash64

    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashes(hash64(np.arange(0, 50_000, dtype=np.uint64)))
    h2.add_hashes(hash64(np.arange(25_000, 75_000, dtype=np.uint64)))
    h1.merge(h2)
    est = h1.estimate()
    assert abs(est - 75_000) / 75_000 < 0.05
    rt = HyperLogLog.from_bytes(h1.to_bytes())
    assert rt.estimate() == est


def test_tdigest_quantiles_and_merge():
    from polars_genson_ray.stages.sketches import TDigest

    rng = np.random.default_rng(1)
    data = rng.normal(50, 10, size=100_000)
    td = TDigest()
    for chunk in np.array_split(data, 23):
        part = TDigest()
        part.add_array(chunk)
        td.merge(part)
    for q in (0.1, 0.5, 0.9):
        assert abs(td.quantile(q) - np.quantile(data, q)) < 0.3


def test_histogram_drift_known_sign():
    # FIXTURES.md C: shifted distributions → known-sign KS/PSI
    from polars_genson_ray.stages.sketches import Histogram

    rng = np.random.default_rng(2)
    base = Histogram(0, 100, 32)
    base.add_array(rng.normal(40, 8, 20_000))
    same = Histogram(0, 100, 32)
    same.add_array(rng.normal(40, 8, 20_000))
    shifted = Histogram(0, 100, 32)
    shifted.add_array(rng.normal(60, 8, 20_000))
    assert base.ks(same) < 0.05 and base.psi(same) < 0.05
    assert base.ks(shifted) > 0.5 and base.psi(shifted) > 1.0


# ---------------------------------------------------------------------------
# synthetic codec + image validator
# ---------------------------------------------------------------------------

def test_codec_lossless_roundtrip_and_lossy_psnr():
    px = reference_pixels("img_000000000007", 32, 24)
    dec, fmt = decode_image(encode_image(px, "png"))
    assert fmt == "png" and np.array_equal(dec, px)
    lossy, _ = decode_image(encode_image(px, "jpeg"))
    assert 40.0 <= psnr(lossy, px) < 60.0
    with pytest.raises(ValueError):
        decode_image(encode_image(px, "png")[:15])


def test_decode_validator_batch():
    import pyarrow as pa

    from polars_genson_ray.stages.image import DecodeValidator

    good_px = reference_pixels("img_000000000001", 16, 16)
    batch = pa.table(
        {
            "image_id": ["img_000000000001", "img_000000000002", "img_000000000001"],
            "bytes": [
                encode_image(good_px, "png"),
                b"garbage",
                encode_image(good_px, "jpeg"),
            ],
            "w": pa.array([16, 16, 17], pa.int32()),  # third: dims mismatch
            "h": pa.array([16, 16, 16], pa.int32()),
            "fmt": ["png", "png", "jpeg"],
            "caption": ["a", "b", "c"],
            "phash": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = DecodeValidator()(batch)
    v = out["violation"].to_pylist()
    assert v[0] == ""
    assert v[1].startswith("decode_error")
    assert v[2].startswith("dims_mismatch")
    assert "bytes" not in out.column_names  # pixels never leave the stage


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------

def test_checkpoint_store_roundtrip(tmp_path):
    from polars_genson_ray.state.checkpoint import CheckpointStore

    frag = str(tmp_path / "frag-0.parquet")
    with open(frag, "w") as f:
        f.write("x")
    store = CheckpointStore(str(tmp_path / "ckpt"))
    assert not store.is_done(frag)
    store.record(frag, {"status": "done", "report": {"rows": 10}})
    assert store.is_done(frag)
    # input mutation invalidates the record
    with open(frag, "w") as f:
        f.write("different content")
    assert not store.is_done(frag)


def test_checkpoint_store_migrates_legacy_keys(tmp_path):
    """A store written before fragment keys gained the path digest must
    still resume: legacy basename-keyed records (and their hash sidecars)
    are found, verified against the embedded fragment path, and rewritten
    under the current key — same-named fragments from OTHER directories are
    left untouched (ADVICE r2)."""
    import json

    from polars_genson_ray.state.checkpoint import (
        CheckpointStore,
        _legacy_fragment_key,
        fragment_digest,
        fragment_key,
    )

    frag = str(tmp_path / "data" / "part-0.parquet")
    os.makedirs(os.path.dirname(frag))
    with open(frag, "w") as f:
        f.write("x")
    ckpt = tmp_path / "ckpt"
    store = CheckpointStore(str(ckpt))
    # hand-write a legacy-format record + sidecar, as an old build would
    legacy = _legacy_fragment_key(frag)
    rec = {
        "status": "done",
        "fragment": frag,
        "input_digest": fragment_digest(frag),
        "id_hashes_file": legacy + ".hashes.bin",
        "report": {"rows": 7},
    }
    with open(ckpt / (legacy + ".json"), "w") as f:
        json.dump(rec, f)
    with open(ckpt / (legacy + ".hashes.bin"), "wb") as f:
        f.write(b"\x01\x02\x03")
    # a colliding record for a same-named fragment in ANOTHER directory
    other = str(tmp_path / "other" / "part-1.parquet")
    with open(ckpt / "part-1.parquet.json", "w") as f:
        json.dump({"status": "done", "fragment": other}, f)

    assert store.is_done(frag)  # legacy record honored → no re-validation
    loaded = store.load(frag)
    assert loaded["report"] == {"rows": 7}
    assert store.load_hashes(loaded) == b"\x01\x02\x03"
    # migrated on disk: new-format key, legacy files gone
    new = fragment_key(frag)
    assert (ckpt / (new + ".json")).exists()
    assert (ckpt / (new + ".hashes.bin")).exists()
    assert not (ckpt / (legacy + ".json")).exists()
    assert not (ckpt / (legacy + ".hashes.bin")).exists()
    # the other-directory collision record was not claimed
    mine = str(tmp_path / "data2" / "part-1.parquet")
    os.makedirs(os.path.dirname(mine))
    with open(mine, "w") as f:
        f.write("y")
    assert store.load(mine) is None
    assert (ckpt / "part-1.parquet.json").exists()


def test_derive_dup_resident_limit():
    """Auto spill sizing: the index's TOTAL footprint stays within the
    budget fraction of node memory; toy nodes floor at 1M entries per
    shard (never spilling small runs); explicit config still wins (the
    run_validation wiring only derives when dup_resident_limit is None)."""
    from polars_genson_ray.pipelines.validation import (
        _derive_dup_resident_limit,
    )

    # 128 GiB node, 8 shards → 20% / 13 B / 8 ≈ 264M entries per shard
    lim = _derive_dup_resident_limit(8, mem_bytes=128 * 2**30)
    assert 200_000_000 < lim < 300_000_000
    assert lim * 8 * 13 <= 0.20 * 128 * 2**30 * 1.001
    # tiny node floors at 1M
    assert _derive_dup_resident_limit(8, mem_bytes=1 << 20) == 1_000_000


def test_validation_resume_skips_fragments(ray_session, tmp_path):
    from polars_genson_ray.pipelines.validation import run_validation

    img_dir = str(tmp_path / "imgs")
    paths = generate_image_table(img_dir, num_rows=300, num_fragments=3, seed=7)
    out1 = str(tmp_path / "out1")
    rep1 = run_validation(paths, out1)
    assert rep1.rows == 300
    assert len(rep1.fragment_reports) == 3
    assert rep1.violation_counts  # injected corruption shows up
    assert rep1.hot_phash_buckets[0]["n"] > 10  # hot bucket detected

    # resume with the same checkpoint dir: fragment reports come from lineage
    out2 = str(tmp_path / "out2")
    rep2 = run_validation(
        paths, out2, checkpoint_dir=os.path.join(out1, "_checkpoint")
    )
    assert {
        os.path.basename(p) for p in rep2.fragment_reports
    } == {os.path.basename(p) for p in rep1.fragment_reports}
    for p, r in rep1.fragment_reports.items():
        assert rep2.fragment_reports[p]["rows"] == r["rows"]


# ---------------------------------------------------------------------------
# skew / dedup / similarity / windows on small inline datasets
# ---------------------------------------------------------------------------

def test_salted_group_count(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.skew import salted_group_count, top_k_keys

    df = pd.DataFrame({"k": ["hot"] * 500 + [f"v{i}" for i in range(100)]})
    ds = rd.from_pandas(df).repartition(4)
    counts = {r["k"]: r["n"] for r in salted_group_count(ds, "k").take_all()}
    assert counts["hot"] == 500 and counts["v3"] == 1
    top = top_k_keys(ds, "k", k=3)
    assert top.iloc[0]["k"] == "hot" and top.iloc[0]["n"] == 500


def test_exact_dedup_keeps_min_id(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": [3, 1, 2, 5, 4], "text": ["a", "a", "b", "b", "c"]}
    )
    out = exact_dedup(rd.from_pandas(df).repartition(2), "text", "doc_id").take_all()
    got = {r["text"]: r["doc_id"] for r in out}
    assert got == {"a": 1, "b": 2, "c": 4}


def test_minhash_simhash_batch_kernels_match_reference():
    """The vectorized batch kernels must be bit-identical to the row-at-a-
    time reference formulations (which round 1 shipped as the hot path)."""
    from polars_genson_ray.stages.dedup import MinHasher, SimHasher

    rng = np.random.default_rng(11)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "ray", "arrow", "fox"]
    texts = [
        " ".join(rng.choice(words, size=int(n)).tolist())
        for n in rng.integers(0, 60, size=40)
    ]
    texts += ["", "  ", "ab", "é€漢字 mixed unicode", "x" * 3]
    mh = MinHasher()
    sig_batch = mh.signatures(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(sig_batch[i], mh.signature(t)), i
    sh = SimHasher()
    sim_batch = sh.simhashes(texts)
    for i, t in enumerate(texts):
        assert int(sim_batch[i]) == sh.simhash(t), i


def test_exact_dedup_ids_only_mode(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": [3, 1, 2, 5, 4], "text": ["a", "a", "b", "b", "c"]}
    )
    out = exact_dedup(
        rd.from_pandas(df).repartition(2), "text", "doc_id", keep_payload=False
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 4]
    assert all(set(r) == {"doc_id", "__h"} for r in out)


def test_minhash_finds_near_duplicates(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    far = "completely different content about ray data pipelines and arrow"
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, far]})
    pairs = minhash_lsh_pairs(
        rd.from_pandas(df), "text", "doc_id", min_jaccard=0.4
    ).take_all()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in keys
    assert all({a, b} != {1, 3} and {a, b} != {2, 3} for a, b in keys)
    assert ngram_jaccard(base, near) > 0.6 > ngram_jaccard(base, far)


def _brute_force_jaccard_pairs(texts: dict, threshold: float, n: int = 3):
    from polars_genson_ray.stages.setjoin import word_ngram_hashes

    sets = {i: set(word_ngram_hashes(t, n).tolist()) for i, t in texts.items()}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            if not a or not b:
                continue
            j = len(a & b) / len(a | b)
            if j >= threshold:
                out[(ids[x], ids[y])] = round(j, 6)
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.9])
def test_set_similarity_join_exact_vs_brute_force(ray_session, threshold):
    """The prefix filter must have NO false negatives at any threshold —
    this differential vs all-pairs brute force is the guard against
    prefix-length off-by-ones."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.setjoin import set_similarity_join

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for i in range(60):
        words = rng.choice(vocab, size=int(rng.integers(5, 30))).tolist()
        texts[i] = " ".join(words)
    # plant near-dups at varying overlap
    for i, keep in ((60, 0.95), (61, 0.8), (62, 0.6), (63, 0.4)):
        base = texts[0].split()
        cut = int(len(base) * keep)
        texts[i] = " ".join(base[:cut] + ["zz"] * (len(base) - cut))
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    got = set_similarity_join(
        rd.from_pandas(df), "text", "doc_id", threshold=threshold
    ).take_all()
    got_pairs = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in got}
    assert got_pairs == _brute_force_jaccard_pairs(texts, threshold)


def test_set_similarity_join_boilerplate_stays_exact(ray_session):
    """Every doc shares a boilerplate sentence (hot shingles). The
    frequency-aware prefix order must keep the join EXACT (brute-force
    differential) while keeping boilerplate shingles out of prefixes."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.setjoin import set_similarity_join

    rng = np.random.default_rng(29)
    vocab = [f"tok{i}" for i in range(200)]
    boiler = "all rights reserved click here to subscribe to our newsletter"
    texts = {}
    for i in range(80):
        words = rng.choice(vocab, size=int(rng.integers(15, 40))).tolist()
        texts[i] = boiler + " " + " ".join(words)
    base = texts[0].split()
    texts[80] = " ".join(base[:-2] + ["zz", "zz"])  # near-dup of doc 0
    df = pd.DataFrame({"doc_id": list(texts), "text": [texts[i] for i in texts]})
    got = set_similarity_join(
        rd.from_pandas(df), "text", "doc_id", threshold=0.7, hot_doc_frac=0.5
    ).take_all()
    got_pairs = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in got}
    assert got_pairs == _brute_force_jaccard_pairs(texts, 0.7)
    assert (0, 80) in got_pairs


def test_set_similarity_join_large_path_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the Dataset.join verify path; results must
    equal the broadcast path."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.setjoin import set_similarity_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [base, base.replace("zeta", "zz"), "unrelated words only here now",
             base + " extra tail words", "alpha beta gamma"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df)
    small = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
             for r in set_similarity_join(ds, "text", "doc_id",
                                          threshold=0.5).take_all()}
    large = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
             for r in set_similarity_join(ds, "text", "doc_id", threshold=0.5,
                                          broadcast_limit=0).take_all()}
    assert small == large and len(small) > 0


def test_write_partitioned_resume_semantics(ray_session, tmp_path):
    """Two-phase partitioned sink: full write marks all partitions; a
    resume skips marked ones; a crashed partition (files, no marker) is
    cleaned and rewritten without duplicate rows."""
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data as rd

    from polars_genson_ray.sources.partitioned_sink import write_partitioned

    df = pd.DataFrame({"lang": ["en"] * 6 + ["fr"] * 4, "v": range(10)})
    out = str(tmp_path / "parts")
    rep = write_partitioned(rd.from_pandas(df), out, "lang")
    assert rep == {"written": ["en", "fr"], "skipped": []}

    # resume: everything marked → nothing rewritten
    rep2 = write_partitioned(rd.from_pandas(df), out, "lang")
    assert rep2 == {"written": [], "skipped": ["en", "fr"]}

    # simulate a crash on fr: drop its marker (stale files remain)
    import os

    os.unlink(os.path.join(out, "lang=fr", "_SUCCESS"))
    rep3 = write_partitioned(rd.from_pandas(df), out, "lang")
    assert rep3 == {"written": ["fr"], "skipped": ["en"]}
    got = pq.read_table(out).to_pandas()
    assert len(got) == 10  # no duplicate rows after the rewrite
    assert sorted(got[got.lang == "fr"].v.tolist()) == [6, 7, 8, 9]


def test_grouped_topk_small_and_large_paths(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.aggregate import grouped_topk

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "id": np.arange(500),
            "key": rng.choice(list("abcd"), size=500),
            "v": rng.standard_normal(500).round(6),
        }
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("key")
        .head(3)
        .sort_values("id")
        .reset_index(drop=True)
    )
    ds = rd.from_pandas(df).repartition(8)  # partials really fan out
    for small in (True, False):
        got = (
            grouped_topk(ds, "key", "v", 3, tie_columns=("id",), small=small)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_asof_join_semantics(ray_session):
    """Backward as-of semantics vs a hand-computed expectation: greatest
    right ts <= left ts per key; no-match rows dropped; right ties broken
    by dedup_right_by max."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.asof import asof_join

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [10, 10, 20, 30],
            "ts": pd.to_datetime(
                ["2024-01-05", "2024-01-20", "2024-01-10", "2024-01-10"]
            ),
        }
    )
    od = pd.DataFrame(
        {
            "o_orderkey": [100, 101, 102, 103, 104],
            "o_custkey": [10, 10, 10, 20, 20],
            "o_orderdate": pd.to_datetime(
                # two orders for user 10 on 01-03 (tie → keep key 101);
                # user 20's only order is AFTER its event (no match);
                # user 30 has no orders at all
                ["2024-01-03", "2024-01-03", "2024-01-15", "2024-01-12", "2024-01-12"]
            ),
            "o_totalprice": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = asof_join(
        rd.from_pandas(ev),
        rd.from_pandas(od),
        key="user_id",
        ts="ts",
        right_key="o_custkey",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        dedup_right_by="o_orderkey",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == [1, 2]
    assert out["o_orderkey"].tolist() == [101, 102]
    assert out["o_totalprice"].tolist() == [2.0, 3.0]
    assert str(out["o_orderkey"].dtype) == "int64"  # upcast undone


def test_asof_join_randomized_vs_pandas(ray_session):
    """Randomized differential: distributed asof_join equals a single
    global pandas merge_asof (inner, backward) on keys present both
    sides, across skewed keys and unmatched rows."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.asof import asof_join

    rng = np.random.default_rng(41)
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l),
            "user_id": rng.choice([1, 2, 3, 5, 8, 99], size=n_l),  # 99: no orders
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="m"),
        }
    )
    right = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_r),
            "o_custkey": rng.choice([1, 2, 3, 5, 8, 42], size=n_r),  # 42: no events
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="m"),
            "o_totalprice": rng.random(n_r).round(4),
        }
    )
    # dedup right ties deterministically in the expectation too
    r2 = (
        right.sort_values("o_orderkey")
        .drop_duplicates(["o_custkey", "o_orderdate"], keep="last")
        .sort_values("o_orderdate", kind="mergesort")
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        r2,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        direction="backward",
    ).dropna(subset=["o_orderdate"])
    exp = (
        exp[["event_id", "user_id", "ts", "o_orderdate", "o_orderkey", "o_totalprice"]]
        .astype({"o_orderkey": "int64"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        asof_join(
            rd.from_pandas(left).repartition(7),
            rd.from_pandas(right).repartition(5),
            key="user_id",
            ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            right_values=["o_orderkey", "o_totalprice"],
            dedup_right_by="o_orderkey",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got["user_id"] = got["user_id"].astype(exp["user_id"].dtype)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_brute_force_topk(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.similarity import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8))
    vecs[7] = vecs[0] * 2.0  # same direction as row 0
    df = pd.DataFrame({"vec_id": range(50), "embedding": list(vecs)})
    out = brute_force_topk(rd.from_pandas(df), vecs[[0]], k=2)
    assert set(out["vec_id"]) == {0, 7}


def test_tumbling_and_session_windows(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.windows import session_windows, tumbling_window

    ts = pd.to_datetime(
        ["2024-01-01 00:05", "2024-01-01 00:55", "2024-01-01 01:05",
         "2024-01-01 03:00", "2024-01-01 03:10"]
    )
    df = pd.DataFrame({"ts": ts, "k": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    win = tumbling_window(rd.from_pandas(df), "ts", "k", "v", window="1h").take_all()
    by_start = {str(r["window_start"]): r["n"] for r in win}
    assert by_start["2024-01-01 00:00:00"] == 2
    assert by_start["2024-01-01 01:00:00"] == 1
    assert by_start["2024-01-01 03:00:00"] == 2

    sess = session_windows(
        rd.from_pandas(df), "ts", "k", gap_seconds=3600
    ).take_all()
    assert sorted(r["n_events"] for r in sess) == [2, 3]


# ---------------------------------------------------------------------------
# sharded uniqueness index + two-level aggregation
# ---------------------------------------------------------------------------

def test_unique_index_finds_exact_duplicates(ray_session):
    import ray.data as rd

    from polars_genson_ray.stages.unique import find_duplicate_ids

    ids = [f"id_{i:04d}" for i in range(500)]
    ids += ["id_0007", "id_0042", "id_0042"]  # 0007 x2, 0042 x3
    ds = rd.from_items([{"image_id": i} for i in ids]).repartition(8)
    dups = find_duplicate_ids(ds, "image_id", num_shards=4)
    assert dups == ["id_0007", "id_0042"]


def test_unique_index_observe_idempotent_under_retry(ray_session):
    import numpy as np
    import ray

    from polars_genson_ray.stages.unique import UniqueIndexShard

    shard = UniqueIndexShard.remote()
    h = np.array([1, 2, 3], dtype=np.uint64)
    first = ray.get(shard.observe.remote("tok", h))
    # a Ray task retry re-sends the same token + hashes: must NOT turn
    # first occurrences into duplicates
    again = ray.get(shard.observe.remote("tok", h))
    assert first == again == [False, False, False]
    ray.kill(shard)


def test_combine_partials_small_and_large(ray_session):
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.aggregate import combine_partials

    df = pd.DataFrame({"k": ["a", "b"] * 50, "n": [1] * 100, "m": list(range(100))})
    ds = rd.from_pandas(df).repartition(6)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("k", as_index=False).agg(n=("n", "sum"), m=("m", "max"))

    partials = ds.map_batches(partial, batch_format="pandas")
    for small in (True, False):
        out = (
            combine_partials(partials, ["k"], {"n": "sum", "m": "max"}, small=small)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out["n"].tolist() == [50, 50]
        assert out["m"].tolist() == [98, 99]


# ---------------------------------------------------------------------------
# multimodal stages (synthetic codec; stubs for absent codecs)
# ---------------------------------------------------------------------------

def test_image_resize_and_features(ray_session, tmp_path):
    import ray.data as rd

    from polars_genson_ray.stages.multimodal import ImageFeatures, ImageResize

    paths = generate_image_table(str(tmp_path / "imgs"), num_rows=60, num_fragments=2)
    ds = rd.read_parquet(paths, columns=["image_id", "bytes", "w", "h"])
    thumbs = ds.map_batches(
        ImageResize, fn_constructor_kwargs={"out_w": 8, "out_h": 8},
        batch_format="pyarrow", concurrency=2,
    ).take_all()
    assert len(thumbs) == 60
    ok = [t for t in thumbs if t["resize_ok"]]
    assert len(ok) > 50  # only injected-corrupt rows fail
    px, _ = decode_image(ok[0]["bytes"])
    assert px.shape == (8, 8, 3)

    feats = (
        rd.read_parquet(paths, columns=["image_id", "bytes"])
        .map_batches(ImageFeatures, batch_format="pyarrow", concurrency=2)
        .take_all()
    )
    assert len(feats) == 60
    assert len(feats[0]["features"]) == ImageFeatures.DIM


def test_audio_stub_and_video_frame_sample(ray_session):
    import struct

    import pytest as _pytest
    import ray.data as rd

    from polars_genson_ray.stages.multimodal import AudioFeatures, VideoFrameSample

    # non-WAV payload with no codec library present → decode_ok=False
    # violation row (the compressed-format gate), not a crash
    bad = (
        rd.from_items([{"id": "x", "audio": b"\xffOggS not a wav"}])
        .map_batches(AudioFeatures, batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    assert bad[0]["decode_ok"] is False and bad[0]["n_samples"] == 0

    pcm = (np.sin(np.linspace(0, 440, 16000)) * 20000).astype(np.int16).tobytes()
    ds = rd.from_items([{"id": "a0", "audio": pcm}])
    out = ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"fake_pcm": True},
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    assert abs(out[0]["duration_s"] - 1.0) < 1e-6
    assert 0.3 < out[0]["rms"] < 0.7

    frames = []
    for i in range(12):
        blob = encode_image(reference_pixels(f"f{i}", 8, 8), "png")
        frames.append(struct.pack("<I", len(blob)) + blob)
    video = b"".join(frames)
    vds = rd.from_items([{"vid": "v0", "video": video}])
    sampled = vds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"id_column": "vid", "every_n": 5},
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    assert [r["frame_index"] for r in sampled] == [0, 5, 10]
    px, _ = decode_image(sampled[0]["frame_bytes"])
    assert px.shape == (8, 8, 3)


def test_ivf_topk_recall_on_clustered_vectors(ray_session):
    import ray.data as rd

    from polars_genson_ray.stages.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((50, 16)) * 0.3 for c in centers]
    )
    items = [
        {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))
    ]
    ds = rd.from_items(items).repartition(8)
    queries = vecs[[0, 200]]
    exact = brute_force_topk(ds, queries, k=10)
    approx = ivf_topk(
        rd.from_items(items).repartition(8), queries, k=10, n_cells=8, nprobe=2,
        train_sample=400,
    )
    for qi in (0, 1):
        e = set(exact[exact.query_idx == qi]["vec_id"])
        a = set(approx[approx.query_idx == qi]["vec_id"])
        recall = len(e & a) / len(e)
        assert recall >= 0.8, f"query {qi} recall {recall}"


def test_validation_dup_ids_survive_resume(ray_session, tmp_path):
    from polars_genson_ray.pipelines.validation import run_validation

    img_dir = str(tmp_path / "imgs")
    paths = generate_image_table(
        img_dir, num_rows=400, num_fragments=4, seed=11, dup_rate=0.05
    )
    out1 = str(tmp_path / "o1")
    rep1 = run_validation(paths, out1)
    assert rep1.duplicate_image_ids  # injected duplicates found

    # full resume: dup list reconstructed from checkpoint records only
    rep2 = run_validation(
        paths, str(tmp_path / "o2"), checkpoint_dir=os.path.join(out1, "_checkpoint")
    )
    assert rep2.duplicate_image_ids == rep1.duplicate_image_ids

    # invalidate ONE fragment: only it revalidates; cross-fragment dups
    # against still-completed fragments must stay exact (index re-seeded
    # from stored hash arrays)
    os.utime(paths[0])
    rep3 = run_validation(
        paths, str(tmp_path / "o3"), checkpoint_dir=os.path.join(out1, "_checkpoint")
    )
    assert rep3.duplicate_image_ids == rep1.duplicate_image_ids


def test_uint64set_matches_python_set():
    from polars_genson_ray.stages.unique import UInt64Set

    rng = np.random.default_rng(5)
    s = UInt64Set(initial_pow2=4)  # tiny start exercises growth/rehash
    ref: set[int] = set()
    for _ in range(60):
        keys = rng.integers(0, 800, size=int(rng.integers(1, 300))).astype(np.uint64)
        keys[0] = 0  # zero-key path
        mask = s.add_many(keys)
        exp = []
        for k in keys.tolist():
            exp.append(k in ref)
            ref.add(k)
        assert mask.tolist() == exp
    assert len(s) == len(ref)


def test_unique_shard_memo_bounded_retry_window(ray_session):
    import ray

    from polars_genson_ray.stages.unique import UniqueIndexShard

    shard = UniqueIndexShard.remote(memo_limit=1024)
    try:
        h = np.array([1, 2, 3], dtype=np.uint64)
        first = ray.get(shard.observe.remote("tok-A", h))
        assert first == [False, False, False]
        # a prompt retry replays the memoized answer, not fresh membership
        assert ray.get(shard.observe.remote("tok-A", h)) == first
        # memo is a bounded FIFO window, not O(rows observed)
        limit = 1024
        for i in range(limit + 50):
            ray.get(shard.observe.remote(f"tok-{i}", np.array([10 + i], dtype=np.uint64)))
        assert ray.get(shard.memo_size.remote()) <= limit
        # evicted token now answers from live membership (all present)
        assert ray.get(shard.observe.remote("tok-A", h)) == [True, True, True]
    finally:
        ray.kill(shard)


def test_unique_shard_spill_differential(ray_session, tmp_path):
    """LSM spill path vs in-RAM shard: identical observe masks on a random
    duplicate-heavy stream; runs actually hit disk; compaction fires; final
    cardinality exact."""
    import ray

    from polars_genson_ray.stages.unique import UniqueIndexShard

    spill = UniqueIndexShard.remote(
        spill_dir=str(tmp_path / "runs"), resident_limit=64
    )
    plain = UniqueIndexShard.remote()
    try:
        rng = np.random.default_rng(11)
        ref: set[int] = set()
        for i in range(40):  # 40 batches × ~200 keys ≫ 64×MAX_RUNS → compacts
            keys = rng.integers(0, 2500, size=int(rng.integers(50, 350))).astype(
                np.uint64
            )
            a = ray.get(spill.observe.remote(f"t{i}", keys))
            b = ray.get(plain.observe.remote(f"t{i}", keys))
            assert a == b
            ref.update(keys.tolist())
        assert ray.get(spill.num_runs.remote()) >= 1  # spill really engaged
        assert ray.get(spill.size.remote()) == len(ref)
        assert ray.get(plain.size.remote()) == len(ref)
        import glob

        assert glob.glob(str(tmp_path / "runs" / "run_*.npy"))
    finally:
        ray.kill(spill)
        ray.kill(plain)


def test_unique_shard_compaction_kway_merge(ray_session, tmp_path):
    """Tiny compact_chunk forces many k-way merge rounds; post-compaction
    membership and cardinality must be exact and the merged run sorted."""
    import ray

    from polars_genson_ray.stages.unique import UniqueIndexShard

    shard = UniqueIndexShard.remote(
        spill_dir=str(tmp_path / "kway"), resident_limit=32, compact_chunk=8
    )
    try:
        rng = np.random.default_rng(3)
        ref: set[int] = set()
        for i in range(60):  # 60×~150 keys ≫ 32×MAX_RUNS → several compactions
            keys = rng.integers(1, 5000, size=150).astype(np.uint64)
            ray.get(shard.observe.remote(f"c{i}", keys))
            ref.update(keys.tolist())
        assert ray.get(shard.size.remote()) == len(ref)
        # every key ever seen answers present; fresh keys answer absent
        probe = np.array(sorted(ref)[:500] + [999999999], dtype=np.uint64)
        mask = ray.get(shard.observe.remote("probe", probe))
        assert mask == [True] * 500 + [False]
        import glob

        runs = glob.glob(str(tmp_path / "kway" / "run_*.npy"))
        for f in runs:
            arr = np.load(f, mmap_mode="r")
            assert (np.diff(np.asarray(arr).astype(np.int64)) > 0).all()
    finally:
        ray.kill(shard)


def test_unique_shard_spill_seed_and_validation(ray_session, tmp_path):
    """seed() registers through the spill path, and the flagship validation
    pipeline finds the same duplicate ids with spill enabled."""
    import ray

    from polars_genson_ray.stages.unique import UniqueIndexShard

    shard = UniqueIndexShard.remote(
        spill_dir=str(tmp_path / "seedruns"), resident_limit=16
    )
    try:
        h = np.arange(1, 100, dtype=np.uint64)
        ray.get(shard.seed.remote(h))
        assert ray.get(shard.size.remote()) == 99
        # all previously-seeded hashes answer present across run boundaries
        assert ray.get(shard.observe.remote("q", h)) == [True] * 99
    finally:
        ray.kill(shard)

    from polars_genson_ray.pipelines.validation import (
        ValidationConfig,
        run_validation,
    )
    from polars_genson_ray.sources.synth import generate_image_table

    img_dir = str(tmp_path / "imgs")
    generate_image_table(img_dir, num_rows=400, num_fragments=4, dup_rate=0.05)
    base = run_validation(img_dir, str(tmp_path / "o_plain"))
    spilled = run_validation(
        img_dir,
        str(tmp_path / "o_spill"),
        config=ValidationConfig(
            dup_spill_dir=str(tmp_path / "valruns"), dup_resident_limit=32
        ),
    )
    assert spilled.duplicate_image_ids == base.duplicate_image_ids
    assert len(base.duplicate_image_ids) > 0


def test_lance_source_gate_and_parquet_fallback(tmp_path):
    """The Lance reader is import-gated (package absent in this container);
    detection, the fragment-batch iterator, and checkpoint identity are
    real and run against parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from polars_genson_ray.sources import lance_io
    from polars_genson_ray.state.checkpoint import fragment_digest, fragment_key

    assert not lance_io.have_lance()
    with pytest.raises(NotImplementedError):
        lance_io.read_lance("/tmp/nope.lance")
    with pytest.raises(NotImplementedError):
        lance_io.fragment_specs("/tmp/nope.lance")
    with pytest.raises(NotImplementedError):
        list(lance_io.iter_fragment_batches("lance:///tmp/x#0", 128))

    # detection: spec / .lance suffix / _versions+data layout; parquet no
    assert lance_io.is_lance_dataset("lance:///data/t#3")
    assert lance_io.is_lance_dataset("/data/table.lance")
    lroot = tmp_path / "ds"
    (lroot / "_versions").mkdir(parents=True)
    (lroot / "data").mkdir()
    assert lance_io.is_lance_dataset(str(lroot))
    assert not lance_io.is_lance_dataset(str(tmp_path))

    assert lance_io.parse_spec("lance:///a/b#7") == ("/a/b", 7)
    assert fragment_key("lance:///a/b#7") == "lance_/a/b#7".replace("/", "_").replace("#", "_f")
    assert fragment_digest("lance:///a/b#7") == "lance:unavailable"

    # parquet path of the same iterator: row-group streaming
    p = str(tmp_path / "frag.parquet")
    pq.write_table(pa.table({"x": list(range(1000))}), p)
    batches = list(lance_io.iter_fragment_batches(p, 256))
    assert sum(b.num_rows for b in batches) == 1000
    assert max(b.num_rows for b in batches) <= 256


def test_session_windows_bucketed_matches_single_phase(ray_session):
    """The hot-key spill path (time-bucketed sessionize + session-row
    stitch) must reproduce the single-phase answer exactly, including
    sessions straddling bucket edges."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.windows import session_windows

    rng = np.random.default_rng(17)
    rows = []
    base = pd.Timestamp("2024-01-01")
    # hot key: 5000 events over ~40 days with gaps around the threshold,
    # including events within minutes of 7d bucket edges
    t = base
    for i in range(5000):
        step = float(rng.choice([60, 600, 2400], p=[0.6, 0.3, 0.1]))
        t = t + pd.Timedelta(seconds=step)
        rows.append({"user": "hot", "ts": t})
    # events hugging bucket boundaries explicitly
    for d in (7, 14, 21):
        edge = base + pd.Timedelta(days=d)
        rows.append({"user": "hot", "ts": edge - pd.Timedelta(seconds=30)})
        rows.append({"user": "hot", "ts": edge + pd.Timedelta(seconds=30)})
    for i in range(50):
        rows.append({"user": f"u{i}", "ts": base + pd.Timedelta(hours=i)})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(6)

    def norm(res):
        out = res.to_pandas().sort_values(["user", "session_start"]).reset_index(drop=True)
        return out

    bucketed = norm(session_windows(ds, "ts", "user", gap_seconds=1800, time_bucket="7d"))
    single = norm(session_windows(ds, "ts", "user", gap_seconds=1800, time_bucket=None))
    pd.testing.assert_frame_equal(bucketed, single)


def test_pair_dedup_bucketed_path_matches_small_path(ray_session):
    """dedup_pair_dataset's large-pair-set exchange (pair-key-bucketed
    groupby) must produce the same deduped pairs as the single-task path."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.dedup import dedup_pair_dataset

    rng = np.random.default_rng(23)
    a = rng.integers(0, 50, size=400)
    b = a + rng.integers(1, 10, size=400)
    df = pd.DataFrame({"id_a": a, "id_b": b, "est_jaccard": 0.9})
    ds = rd.from_pandas(df).repartition(4)

    def norm(d):
        out = d.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        return out

    small = norm(dedup_pair_dataset(
        rd.from_pandas(df).repartition(4), value_columns=["est_jaccard"]))
    bucketed = norm(dedup_pair_dataset(
        ds, value_columns=["est_jaccard"], pair_dedup_threshold=0))
    pd.testing.assert_frame_equal(small, bucketed)
    assert not small.duplicated(["id_a", "id_b"]).any()


def test_embedding_neardup_bucket_cap_and_tables(ray_session):
    """Capped, multi-table embedding near-dup still finds planted pairs."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.similarity import embedding_near_duplicates

    rng = np.random.default_rng(31)
    base = rng.standard_normal((60, 16))
    dups = base[:5] + 0.01 * rng.standard_normal((5, 16))
    vecs = np.vstack([base, dups])
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": list(vecs)})
    out = embedding_near_duplicates(
        rd.from_pandas(df).repartition(3), dim=16, threshold=0.95,
        approx_rows=len(vecs), num_tables=3, bucket_cap=40,
    ).to_pandas()
    found = {tuple(sorted((int(r.id_a), int(r.id_b)))) for r in out.itertuples()}
    expected = {(i, 60 + i) for i in range(5)}
    assert expected <= found


def test_embedding_neardup_oversized_bucket_refined_not_truncated(ray_session):
    """An LSH bucket larger than ``bucket_cap`` must be re-probed with finer
    planes, not truncated: the planted pair sits at the HIGHEST ids, so the
    old ``group.head(bucket_cap)`` id-order truncation would always drop it
    (1 plane → ~half of 100 vectors per bucket >> cap 8)."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.similarity import embedding_near_duplicates

    rng = np.random.default_rng(73)
    vecs = rng.standard_normal((100, 16))
    vecs[99] = vecs[98] + 0.001 * rng.standard_normal(16)
    df = pd.DataFrame({"vec_id": range(100), "embedding": list(vecs)})
    out = embedding_near_duplicates(
        rd.from_pandas(df).repartition(3), dim=16, threshold=0.99,
        num_planes=1, num_tables=2, bucket_cap=8,
    ).to_pandas()
    found = {tuple(sorted((int(r.id_a), int(r.id_b)))) for r in out.itertuples()}
    assert (98, 99) in found


def test_minhash_bands_fused_matches_two_stage():
    """The fused MinHashBands stage must emit exactly what
    MinHasher → BandExploder emits (same band hashes, ids, blobs)."""
    import pyarrow as pa

    from polars_genson_ray.stages.dedup import BandExploder, MinHasher, MinHashBands

    rng = np.random.default_rng(13)
    words = ["a", "bb", "ccc", "dd", "e"]
    texts = [" ".join(rng.choice(words, size=int(n)).tolist())
             for n in rng.integers(0, 40, size=30)]
    batch = pa.table({"doc_id": list(range(30)), "text": texts})
    two = BandExploder("doc_id", 16, 4)(MinHasher()(batch).select(["doc_id", "minhash"]))
    fused = MinHashBands("text", "doc_id")(batch)
    assert two.column_names == fused.column_names
    assert two["band_id"].to_pylist() == fused["band_id"].to_pylist()
    assert two["band_hash"].to_pylist() == fused["band_hash"].to_pylist()
    assert two["doc_id"].to_pylist() == fused["doc_id"].to_pylist()
    assert two["minhash"].to_pylist() == fused["minhash"].to_pylist()


# ---------------------------------------------------------------------------
# connected components (near-dup clusters)
# ---------------------------------------------------------------------------

def _bfs_components(edges, nodes):
    """Independent brute-force reference: per-node BFS min label."""
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        root = min(comp)
        for v in comp:
            label[v] = root
    return label


def test_label_components_numpy_matches_bfs():
    from polars_genson_ray.stages.components import label_components_numpy

    rng = np.random.default_rng(11)
    for trial in range(5):
        n_nodes = int(rng.integers(5, 200))
        n_edges = int(rng.integers(0, 300))
        ids = rng.choice(np.arange(1000, dtype=np.int64), size=n_nodes,
                         replace=False)
        src = rng.choice(ids, size=n_edges)
        dst = rng.choice(ids, size=n_edges)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        node_ids, roots = label_components_numpy(src, dst)
        ref = _bfs_components(list(zip(src.tolist(), dst.tolist())), [])
        assert len(node_ids) == len(ref)
        for nid, r in zip(node_ids.tolist(), roots.tolist()):
            assert ref[nid] == r, (trial, nid)


def test_connected_components_distributed_matches_driver(ray_session):
    """Force the distributed min-label-propagation path (threshold 0) and
    compare against the driver pointer-jumping path on a graph with long
    chains (exercises multi-iteration convergence)."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.components import connected_components

    rng = np.random.default_rng(23)
    # chain components force > 1 propagation iteration
    chains = []
    base = 0
    for length in (17, 5, 2, 9, 1):
        ids = np.arange(base, base + length, dtype=np.int64)
        rng.shuffle(ids)
        chains.extend(zip(ids[:-1].tolist(), ids[1:].tolist()))
        base += length + 3  # gaps → singleton nodes in between
    src = np.array([a for a, _ in chains], dtype=np.int64)
    dst = np.array([b for _, b in chains], dtype=np.int64)
    all_nodes = np.arange(base, dtype=np.int64)

    pairs = rd.from_arrow(pa.table({"id_a": src, "id_b": dst}))
    nodes = rd.from_arrow(pa.table({"doc_id": all_nodes}))
    small = (
        connected_components(pairs, nodes, node_column="doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pairs2 = rd.from_arrow(pa.table({"id_a": src, "id_b": dst}))
    nodes2 = rd.from_arrow(pa.table({"doc_id": all_nodes}))
    dist = (
        connected_components(
            pairs2, nodes2, node_column="doc_id", driver_threshold=0
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (small["doc_id"] == dist["doc_id"]).all()
    assert (small["cluster_id"] == dist["cluster_id"]).all()
    # independent reference
    ref = _bfs_components(list(zip(src.tolist(), dst.tolist())), all_nodes.tolist())
    got = dict(zip(small["doc_id"].tolist(), small["cluster_id"].tolist()))
    assert got == {n: ref.get(n, n) for n in all_nodes.tolist()}


def test_connected_components_exact_above_2pow53(ray_session):
    """Ids above 2^53 must round-trip the distributed finish pass exactly:
    a float64 detour would round 2^60+1 to ...976 (the ADVICE r2 finding —
    pandas-format batches converted the nullable label column through
    float64 before the coalesce ever ran)."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.components import connected_components

    base = 2**60
    # component {base+1, base+3}; singletons base+7 (unpaired) — all three
    # ids are unrepresentable in float64 (base itself IS representable)
    src = np.array([base + 1], dtype=np.int64)
    dst = np.array([base + 3], dtype=np.int64)
    all_nodes = np.array([base + 1, base + 3, base + 7], dtype=np.int64)
    pairs = rd.from_arrow(pa.table({"id_a": src, "id_b": dst}))
    nodes = rd.from_arrow(pa.table({"doc_id": all_nodes}))
    out = (
        connected_components(
            pairs, nodes, node_column="doc_id", driver_threshold=0
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [base + 1, base + 3, base + 7]
    assert out["cluster_id"].tolist() == [base + 1, base + 1, base + 7]


def test_pii_redactor_kernels():
    import pyarrow as pa

    from polars_genson_ray.stages.text import PIIRedactor

    batch = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "mail a.b-c_d@foo-bar.org and x@y.io now",
            "call 555-010-1234 from 10.0.3.77 twice 555.010.9999",
            "nothing sensitive here",
        ],
    })
    out = PIIRedactor()(batch)
    assert out.column("n_emails").to_pylist() == [2, 0, 0]
    assert out.column("n_phones").to_pylist() == [0, 2, 0]
    assert out.column("n_ips").to_pylist() == [0, 1, 0]
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail <EMAIL> and <EMAIL> now"
    assert red[1] == "call <PHONE> from <IP> twice <PHONE>"
    assert red[2] == "nothing sensitive here"


def test_kmeans_recovers_separated_clusters(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.cluster import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(3)
    dim, per = 16, 120
    centers = rng.normal(size=(4, dim)) * 6
    vecs, truth = [], []
    for ci, c in enumerate(centers):
        vecs.append(c + rng.normal(scale=0.05, size=(per, dim)))
        truth.extend([ci] * per)
    mat = np.concatenate(vecs).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(6)
    centroids = kmeans_fit(ds, k=4, approx_rows=len(mat), seed=9)
    assert centroids.shape == (4, dim)
    # unit-norm centroids
    assert np.allclose(np.linalg.norm(centroids, axis=1), 1.0)
    out = kmeans_assign(ds, centroids).to_pandas().sort_values("vec_id")
    truth = np.asarray(truth)
    got = out["cluster"].to_numpy()
    # purity: each fitted cluster maps to exactly one ground-truth blob
    purity = 0
    for c in np.unique(got):
        vals, counts = np.unique(truth[got == c], return_counts=True)
        purity += counts.max()
    assert purity == len(mat)
    assert (out["cosine"] > 0.9).all()


def test_kmeans_init_sample_unbiased_on_contiguous_blobs(ray_session):
    """Regression: with blobs laid out contiguously by position and more
    rows than ``init_sample``, the init sample must still span every blob.
    The old ``random_sample().limit(n)`` draw kept only the earliest blocks
    (Bernoulli sampling preserves row order), so k-means saw only the first
    few blobs and purity collapsed (~0.69 at 16 blobs / 200k rows)."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.cluster import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(11)
    dim, blobs, per = 16, 8, 500
    centers = rng.normal(size=(blobs, dim)) * 6
    truth = np.repeat(np.arange(blobs), per)
    mat = (centers[truth]
           + rng.normal(scale=0.05, size=(len(truth), dim))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(truth), dtype=np.int64)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
    })
    # repartition splits by row range → block i holds one blob's rows only
    ds = rd.from_arrow(tbl).repartition(16)
    centroids = kmeans_fit(ds, k=blobs, approx_rows=len(truth), seed=7,
                           init_sample=128)
    out = kmeans_assign(ds, centroids).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    purity = sum(
        np.unique(truth[got == c], return_counts=True)[1].max()
        for c in np.unique(got)
    )
    assert purity == len(truth)


def test_embedding_kmeans_query_shape(ray_session):
    from polars_genson_ray.pipelines.queries import r_embedding_kmeans

    out = r_embedding_kmeans("/root/testdata/sf0.001")
    assert list(out.columns) == ["vec_id", "cluster", "cosine"]
    assert len(out) == 500
    assert out["cluster"].nunique() <= 10


def test_semantic_dedup_drops_planted_copies(ray_session):
    from polars_genson_ray.pipelines.queries import r_semantic_dedup

    out = r_semantic_dedup("/root/testdata/sf0.001")
    assert len(out) == 508  # 500 + 8 planted
    planted = out[out.vec_id >= 10_000_000]
    originals = out[out.vec_id < 10_000_000]
    # every planted copy is within-cluster near-dup of its original:
    # exactly one of each (original, copy) pair survives
    assert len(planted) == 8
    dropped = out[~out.keep]
    assert len(dropped) == 8
    # each dropped row is one member of a planted pair
    pair_ids = set(planted.vec_id) | set(planted.vec_id - 10_000_000)
    assert set(dropped.vec_id).issubset(pair_ids)
    # and per pair exactly one member was dropped
    for pid in planted.vec_id:
        pair = out[out.vec_id.isin([pid, pid - 10_000_000])]
        assert pair.keep.sum() == 1
    # all untouched originals survive
    untouched = originals[~originals.vec_id.isin(pair_ids)]
    assert untouched.keep.all()


def test_keyed_gap_stats_bucketed_matches_single_phase(ray_session):
    """The time-bucketed gap-stat decomposition (per-bucket partials +
    boundary-gap stitch) must equal the one-group-per-key answer exactly,
    including max gaps that straddle bucket edges."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.windows import keyed_gap_stats

    rng = np.random.default_rng(29)
    rows = []
    base = pd.Timestamp("2024-01-01")
    t = base
    for i in range(3000):
        t = t + pd.Timedelta(seconds=float(rng.integers(10, 90000)))
        rows.append({"user": "hot", "ts": t})
    # gap spanning an entire 7d bucket (boundary gap IS the max)
    rows.append({"user": "hot", "ts": t + pd.Timedelta(days=16)})
    for i in range(40):
        rows.append({"user": f"u{i}", "ts": base + pd.Timedelta(hours=i)})
        rows.append(
            {"user": f"u{i}", "ts": base + pd.Timedelta(hours=i, minutes=i + 1)}
        )
    # single-event key must be dropped (no gaps)
    rows.append({"user": "lonely", "ts": base})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(6)

    def norm(res):
        return (
            res.to_pandas().sort_values("user").reset_index(drop=True)
        )

    bucketed = norm(keyed_gap_stats(ds, "ts", "user", time_bucket="7d"))
    single = norm(keyed_gap_stats(ds, "ts", "user", time_bucket=None))
    pd.testing.assert_frame_equal(bucketed, single)
    assert "lonely" not in set(bucketed["user"])
    hot = bucketed[bucketed.user == "hot"].iloc[0]
    assert hot.max_gap_s == pd.Timedelta(days=16).total_seconds()


def test_keyed_running_total_matches_global_scan(ray_session):
    """Two-pass distributed prefix sum == a single global pandas cumsum,
    across bucket edges and with duplicate timestamps (tie column)."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.windows import keyed_running_total

    rng = np.random.default_rng(31)
    n = 4000
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "user": rng.integers(0, 25, size=n),
            # coarse second grid forces (user, ts) ties → tie column decides
            "ts": base
            + pd.to_timedelta(rng.integers(0, 30 * 86400, size=n) // 7 * 7, unit="s"),
            "cents": rng.integers(-500, 5000, size=n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = (
        keyed_running_total(
            ds, "user", "ts", "id", "cents", out_column="run", time_bucket="7d"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user", "ts", "id"]).copy()
    exp["run"] = exp.groupby("user")["cents"].cumsum()
    exp = exp.sort_values("id").reset_index(drop=True)
    assert np.array_equal(out["run"].to_numpy(), exp["run"].to_numpy())


def test_keyed_time_rolling_matches_global_window(ray_session):
    """Bucketed rolling (edge-context replication) == a global per-key
    RANGE-frame computation, including ts ties (peers see the same frame)
    and windows reaching across bucket edges."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.windows import keyed_time_rolling

    rng = np.random.default_rng(41)
    n = 3000
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "user": rng.integers(0, 15, size=n),
            # coarse grid → (user, ts) ties exist; spread over ~5 buckets
            "ts": base
            + pd.to_timedelta(
                rng.integers(0, 10 * 86400, size=n) // 600 * 600, unit="s"
            ),
            "v": rng.integers(-100, 1000, size=n).astype(np.int64),
        }
    )
    # rows hugging a 2d bucket edge so lookback crosses it
    edge = base + pd.Timedelta(days=2)
    extra = pd.DataFrame(
        {
            "id": np.arange(n, n + 4, dtype=np.int64),
            "user": [3, 3, 3, 3],
            "ts": [
                edge - pd.Timedelta(minutes=50),
                edge - pd.Timedelta(minutes=5),
                edge + pd.Timedelta(minutes=5),
                edge + pd.Timedelta(minutes=50),
            ],
            "v": [10, 20, 40, 80],
        }
    )
    df = pd.concat([df, extra], ignore_index=True)
    ds = rd.from_pandas(df).repartition(7)
    out = (
        keyed_time_rolling(
            ds, "user", "ts", "v", window="1h", out_prefix="r",
            time_bucket="2d",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    # global reference with RANGE semantics (peers included)
    def ref_key(g):
        g = g.sort_values("ts", kind="mergesort")
        ticks = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals = g["v"].to_numpy()
        pref = np.concatenate([[0], np.cumsum(vals)])
        lo = np.searchsorted(ticks, ticks - 3_600_000_000, side="left")
        hi = np.searchsorted(ticks, ticks, side="right")
        return g.assign(r_sum=pref[hi] - pref[lo], r_n=hi - lo)

    exp = (
        df.groupby("user", group_keys=False)[df.columns]
        .apply(ref_key)
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out["r_sum"].to_numpy(), exp["r_sum"].to_numpy())
    assert np.array_equal(out["r_n"].to_numpy(), exp["r_n"].to_numpy())
    assert len(out) == len(df)


def test_phash_hamming_pairs_matches_brute_force(ray_session):
    """Banded Hamming LSH + popcount verify == brute force over distinct
    phashes (pigeonhole guarantee for hamming < bands), with the hot
    exact-group collapsed instead of pairwise-expanded."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from polars_genson_ray.stages.dedup import (
        _popcount64,
        phash_hamming_pairs,
    )

    rng = np.random.default_rng(47)
    ph = rng.integers(0, 2**62, size=400, dtype=np.int64)
    # planted near pairs at hamming 1..3
    for i, bits in ((0, 0b1), (1, 0b11), (2, 0b111), (3, 0b101)):
        ph[200 + i] = ph[i] ^ bits
    # hot exact group: 60 rows share one phash
    ph[300:360] = 0x5A5A5A5A
    df = pd.DataFrame(
        {"image_id": [f"img_{i:04d}" for i in range(400)], "phash": ph}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = (
        phash_hamming_pairs(ds, max_hamming=3, bands=4, num_buckets=16)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )

    # brute force over DISTINCT phashes (reps = min id per phash)
    reps = (
        df.groupby("phash", as_index=False)
        .agg(rid=("image_id", "min"), n=("image_id", "size"))
    )
    vals = reps["phash"].to_numpy().astype(np.uint64)
    ids = reps["rid"].to_numpy()
    ns = reps["n"].to_numpy()
    exp = []
    for i in range(len(vals) - 1):
        hd = _popcount64(vals[i] ^ vals[i + 1:])
        for j in np.where(hd <= 3)[0]:
            a, b = ids[i], ids[i + 1 + j]
            na, nb = ns[i], ns[i + 1 + j]
            if a > b:
                a, b, na, nb = b, a, nb, na
            exp.append((a, b, int(hd[j]), int(na), int(nb)))
    exp_df = (
        pd.DataFrame(exp, columns=["id_a", "id_b", "hamming", "n_a", "n_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(exp_df) >= 4  # the planted pairs exist
    pd.testing.assert_frame_equal(out, exp_df, check_dtype=False)
    # the hot group produced member counts, not 60·59/2 pairs
    hot_rep = df.loc[df.phash == 0x5A5A5A5A, "image_id"].min()
    hot_rows = out[(out.id_a == hot_rep) | (out.id_b == hot_rep)]
    assert (hot_rows[["n_a", "n_b"]].max(axis=1) == 60).all() or hot_rows.empty


def test_phash_oversized_run_verified_exactly(ray_session):
    """A (band, value) run longer than ``bucket_cap`` must be verified in
    full via the blocked pair sweep — the ADVICE r2 finding was that such
    runs were silently truncated at the cap, dropping true pairs.

    Construct 120 distinct phashes sharing band 0 (low 16 bits identical)
    with pairwise-distant high bits, plus planted near pairs whose indices
    land in DIFFERENT cap-blocks (cap=16), so truncation or a
    diagonal-only sweep would miss them."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.dedup import (
        _popcount64,
        phash_hamming_pairs,
    )

    rng = np.random.default_rng(91)
    n = 120
    low = np.uint64(0xBEEF)
    # distinct random high 48 bits, same low 16 bits → one shared band-0 run
    high = rng.choice(2**46, size=n, replace=False).astype(np.uint64)
    ph = ((high << np.uint64(16)) | low).astype(np.int64)
    # plant pairs across distant positions (blocks of 16): flip high bits
    ph[100] = ph[3] ^ (0b101 << 20)   # hamming 2, blocks 0 vs 6
    ph[77] = ph[18] ^ (0b1 << 33)     # hamming 1, blocks 1 vs 4
    df = pd.DataFrame(
        {"image_id": [f"i{i:03d}" for i in range(n)], "phash": ph}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    out = (
        phash_hamming_pairs(
            ds, max_hamming=3, bands=4, num_buckets=8, bucket_cap=16
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # brute-force truth
    vals = ph.astype(np.uint64)
    exp = set()
    for i in range(n - 1):
        hd = _popcount64(vals[i] ^ vals[i + 1:])
        for j in np.where(hd <= 3)[0]:
            a, b = sorted((f"i{i:03d}", f"i{i + 1 + j:03d}"))
            exp.add((a, b, int(hd[j])))
    got = set(zip(out.id_a, out.id_b, out.hamming))
    assert ("i003", "i100", 2) in exp and ("i018", "i077", 1) in exp
    assert got == exp


def test_spacesaving_heavy_hitters_vs_exact():
    """SpaceSaving guarantees: every item with true count > N/capacity is
    tracked, counts bound truth from above by ≤ error, and a partitioned
    sketch-merge finds the same heavy hitters as a global count on a
    zipf-skewed stream."""
    from collections import Counter

    from polars_genson_ray.stages.sketches import SpaceSaving

    rng = np.random.default_rng(53)
    stream = rng.zipf(1.5, size=200_000)
    stream = stream[stream < 10_000]
    exact = Counter(stream.tolist())
    n = len(stream)
    cap = 256

    # partitioned: 8 shards, one sketch each, tree-merged
    sketches = []
    for part in np.array_split(stream, 8):
        sk = SpaceSaving(cap)
        sk.add_many(part.tolist())
        sketches.append(sk)
    merged = sketches[0]
    for sk in sketches[1:]:
        merged.merge(sk)

    thresh = n // cap
    for item, true_c in exact.items():
        if true_c > thresh:
            assert item in merged.counts, f"guaranteed HH {item} missing"
            est = merged.counts[item]
            err = merged.errors[item]
            assert est >= true_c, "SpaceSaving must over-estimate"
            assert est - err <= true_c, "error bound violated"
    # top-10 by sketch == top-10 by exact count (zipf head is far above
    # the error floor)
    top_sketch = [it for it, _, _ in merged.topk(10)]
    top_exact = [it for it, _ in exact.most_common(10)]
    assert set(top_sketch) == set(top_exact)


def test_spacesaving_merge_credits_evicted_mass():
    """An item heavy overall but EVICTED from one shard must keep its
    over-estimate invariant after merge: the absent side credits its
    eviction floor (the mass may hide in another item's error there)."""
    from polars_genson_ray.stages.sketches import SpaceSaving

    a = SpaceSaving(4)
    a.add_many(["x"] * 100)
    b = SpaceSaving(2)
    # b sees x 50 times but churn evicts it: p and q end up tracked
    b.add_many(["x"] * 50)
    b.add_many(["p"] * 60)
    b.add_many(["q"] * 70)
    assert "x" not in b.counts  # the hazard exists
    true_x = 150
    a.merge(b)
    assert a.counts["x"] >= true_x, "merge must over-estimate"
    assert a.counts["x"] - a.errors["x"] <= true_x, "error bound"
    # eviction still works after merge (lazy heap rebuilt)
    a.add_many([f"fresh{i}" for i in range(10)] * 3)
    assert len(a.counts) <= 4


def test_tree_reduce_blobs_matches_serial_merge(ray_session):
    """The distributed sketch tree reduce (fanin forcing ≥2 rounds) must
    preserve the SpaceSaving guarantees the serial driver loop gave: the
    over-estimate envelope against exact counts, and recovery of every
    well-separated heavy hitter. (Tree grouping may change floor credits,
    so bit-identity with a serial fold is NOT the contract — the envelope
    is.)"""
    import pickle

    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.sketches import SpaceSaving, tree_reduce_blobs

    import collections

    rng = np.random.default_rng(59)
    # 40 partial sketches: 10 well-separated heavy hitters + a noise tail
    exact: collections.Counter = collections.Counter()
    partials = []
    for i in range(40):
        items = []
        for h in range(10):
            items += [f"hot{h}"] * (30 - 2 * h)
        items += [f"noise{int(v)}" for v in rng.integers(0, 400, size=120)]
        rng.shuffle(items)
        exact.update(items)
        sk = SpaceSaving(128)
        sk.add_many(items)
        partials.append(sk)
    blobs_ds = rd.from_pandas(
        pd.DataFrame({"blob": [pickle.dumps(s) for s in partials]})
    ).repartition(40)

    def combine(blobs):
        merged = None
        for b in blobs:
            s = pickle.loads(b)
            merged = s if merged is None else merged.merge(s)
        return pickle.dumps(merged)

    out = tree_reduce_blobs(blobs_ds, combine, fanin=4)  # ≥2 rounds
    assert len(out) <= 4
    tree_merged = pickle.loads(combine(out))

    # SpaceSaving envelope holds through the tree merge: over-estimate,
    # and count − error never exceeds the true count
    for item, c in tree_merged.counts.items():
        true_c = exact.get(item, 0)
        assert c >= true_c, item
        assert c - tree_merged.errors[item] <= true_c, item
    # the well-separated heavy hitters are exactly the sketch's top-10
    top = [it for it, _, _ in tree_merged.topk(10)]
    assert set(top) == {f"hot{h}" for h in range(10)}


def test_ivf_index_full_probe_equals_brute_force(ray_session, tmp_path):
    """The persisted IVF index with nprobe == n_cells must reproduce the
    exact brute-force top-k (the partitioned layout changes WHERE rows
    are read from, never the result); with few probes on clustered data,
    recall of the true top-k stays perfect."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from polars_genson_ray.stages.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_index_topk,
    )

    rng = np.random.default_rng(61)
    blobs, dim, per = 8, 16, 200
    centers = _normalize_rows(rng.normal(size=(blobs, dim)))
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        scale=0.05, size=(blobs * per, dim)
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6).materialize()
    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(
        ds, idx_dir, n_cells=8, approx_rows=len(vecs), train_sample=512
    )
    queries = centers[:3] + 0.01
    exact = brute_force_topk(ds, queries, k=10)
    full = ivf_index_topk(idx_dir, queries, k=10, nprobe=8)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True)
    )
    pruned = ivf_index_topk(idx_dir, queries, k=10, nprobe=2)
    for qi in range(3):
        want = set(exact[exact.query_idx == qi]["vec_id"])
        got = set(pruned[pruned.query_idx == qi]["vec_id"])
        assert got == want  # clustered data: the true cell is probed
    # idempotent rebuild: a complete index is reused, not rewritten
    c2 = build_ivf_index(ds, idx_dir, n_cells=8, approx_rows=len(vecs))
    assert c2.shape == (8, 16)


def _normalize_rows(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


def test_pair_dedup_empty_keeps_types(ray_session):
    """Zero duplicate pairs must not degrade the pair schema to inferred
    doubles — downstream joins/unions key on the real id types."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from polars_genson_ray.stages.dedup import dedup_pair_dataset

    empty = pa.table(
        {
            "id_a": pa.array([], pa.string()),
            "id_b": pa.array([], pa.string()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    out = dedup_pair_dataset(
        rd.from_arrow(empty), value_columns=["hamming"]
    )
    assert out.count() == 0
    assert [str(t) for t in out.schema().types] == [
        "string", "string", "int64",
    ]


def test_confirm_duplicates_drops_collision_false_positives(
    ray_session, tmp_path
):
    """The confirmation scan keeps only ids that truly occur >1 time —
    a hash-collision suspect (unique id flagged because its 64-bit hash
    matched another id's) is dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polars_genson_ray.pipelines.validation import (
        ValidationConfig,
        _confirm_duplicates,
    )

    p = str(tmp_path / "frag.parquet")
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array(
                    ["img_a", "img_b", "img_a", "img_c"], pa.string()
                )
            }
        ),
        p,
    )
    out = _confirm_duplicates(
        [p], ["img_a", "img_c"], ValidationConfig()
    )
    assert out == ["img_a"]  # img_c occurs once: collision false positive


def test_embedding_neardup_hot_exact_group_collapses(ray_session):
    """An oversized bucket dominated by byte-identical embeddings must
    collapse to star pairs (rep → member, cosine 1.0) — linear output,
    never the quadratic pairwise expansion, and refinement then splits
    the remaining distinct vectors."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.similarity import embedding_near_duplicates

    rng = np.random.default_rng(41)
    base = rng.standard_normal(16)
    hot = np.tile(base, (300, 1))  # 300 identical copies
    others = rng.standard_normal((50, 16))
    vecs = np.vstack([hot, others])
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": list(vecs)})
    out = embedding_near_duplicates(
        rd.from_pandas(df).repartition(3), dim=16, threshold=0.95,
        num_planes=1, num_tables=2, bucket_cap=16,
    ).to_pandas()
    # every hot member links to the min-id representative (id 0)
    star = out[(out.id_a == 0) & (out.cosine >= 0.999)]
    assert set(star.id_b) == set(range(1, 300))
    # linear, not quadratic: 300 identical rows would make 44850 pairs
    assert len(out) < 2000


def test_embedding_neardup_collinear_bucket_star_sweep(ray_session):
    """DISTINCT collinear vectors defeat hyperplane refinement at every
    depth; the bounded fallback must emit pivot-star pairs covering every
    member instead of OOM-ing on the full quadratic set."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.similarity import embedding_near_duplicates

    rng = np.random.default_rng(43)
    base = rng.standard_normal(8)
    scales = 1.0 + 0.01 * np.arange(120)  # distinct positive multiples
    vecs = base[None, :] * scales[:, None]
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": list(vecs)})
    out = embedding_near_duplicates(
        rd.from_pandas(df).repartition(2), dim=8, threshold=0.99,
        num_planes=1, num_tables=1, bucket_cap=8,
    ).to_pandas()
    # all 120 members are mutually cosine-1: star pairs must link every
    # id to pivot 0, with linear (not 7140-pair quadratic) output
    linked = set(out.id_b[out.id_a == 0]) | set(out.id_a[out.id_b == 0])
    assert linked == set(range(1, 120))
    assert len(out) < 1000


def test_md5_hash_strings_unique_scatter_matches_direct():
    """The distinct-hash + scatter fast path must be byte-identical to
    hashing each occurrence directly (incl. heavy repetition)."""
    import hashlib

    from polars_genson_ray.stages.sketches import md5_hash_strings

    words = ["the", "cat", "the", "", "dog", "the", "cat"] * 13
    got = md5_hash_strings(words)
    exp = np.array(
        [
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            for w in words
        ],
        dtype=np.uint64,
    )
    assert (got == exp).all()
    assert len(md5_hash_strings([])) == 0


def test_tree_reduce_blobs_tolerates_empty_blocks(ray_session):
    """A 0-row block reaching a merge round must emit nothing — not a
    combine([]) artifact that poisons the next round."""
    import pickle

    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.sketches import tree_reduce_blobs

    blobs = [pickle.dumps({i: i}) for i in range(7)]
    # more partitions than rows → guaranteed empty blocks
    ds = rd.from_pandas(pd.DataFrame({"blob": blobs})).repartition(20)

    def combine(bs):
        assert bs, "combine must never see an empty list"
        merged = {}
        for b in bs:
            merged.update(pickle.loads(b))
        return pickle.dumps(merged)

    out = tree_reduce_blobs(ds, combine, fanin=2)
    merged = {}
    for b in out:
        merged.update(pickle.loads(b))
    assert merged == {i: i for i in range(7)}


def test_simhash_ascii_whitespace_matches_duckdb_oracle():
    """SimHash tokenization must match the oracle's RE2 '\\s+' (ASCII):
    a non-breaking space stays INSIDE a token on both sides."""
    import duckdb
    import pandas as pd

    from polars_genson_ray.stages.dedup import SimHasher

    texts = ["foo bar baz", "foo bar baz", "plain ascii text"]
    sh = SimHasher()
    ours = [sh.simhash(t) for t in texts]
    assert ours == [int(v) for v in sh.simhashes(texts)]
    con = duckdb.connect()
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents", docs)
    sql = """
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ), words AS (
            SELECT doc_id, UNNEST(w) AS word FROM toks
        ), wh AS (
            SELECT doc_id, ('0x' || substr(md5(word), 1, 16))::UBIGINT AS h
            FROM words WHERE word <> ''
        ), bits AS (
            SELECT doc_id, b AS bit,
                   SUM(((h >> b::INTEGER) & 1)::BIGINT) AS ones,
                   COUNT(*) AS n
            FROM wh, (SELECT UNNEST(range(0, 63)) AS b)
            GROUP BY doc_id, b
        ), sh AS (
            SELECT doc_id,
                   SUM(CASE WHEN 2 * ones > n
                            THEN (1::BIGINT << bit::INTEGER)
                            ELSE 0 END) AS simhash
            FROM bits GROUP BY doc_id
        )
        SELECT doc_id, CAST(COALESCE(simhash, 0) AS BIGINT) AS simhash
        FROM sh ORDER BY doc_id
    """
    theirs = con.execute(sql).df()["simhash"].tolist()
    assert ours == theirs


def _aspect_input(n=500, seed=3):
    import pandas as pd

    rng = np.random.default_rng(seed)
    w = rng.integers(64, 2048, size=n)
    h = rng.integers(64, 2048, size=n)
    return pd.DataFrame(
        {"image_id": [f"img_{i:05d}" for i in range(n)], "w": w, "h": h}
    )


def test_aspect_bucket_batches_shape_and_determinism(ray_session):
    """Batches are full (except one partial per rung), slots are dense,
    target dims are multiples of 64 within the pixel budget, and the
    assignment is IDENTICAL under different input partitionings
    (cluster-size-independent resume invariant)."""
    import ray.data as rd

    from polars_genson_ray.stages.image import aspect_bucket_batches

    df = _aspect_input()
    a = (
        aspect_bucket_batches(rd.from_pandas(df).repartition(2), batch_size=16)
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    b = (
        aspect_bucket_batches(rd.from_pandas(df).repartition(9), batch_size=16)
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) == len(df)
    assert set(a.image_id) == set(df.image_id)
    assert (a.target_w % 64 == 0).all() and (a.target_h % 64 == 0).all()
    assert (a.target_w * a.target_h <= (1 << 20)).all()
    for rung, g in a.groupby("bucket_id"):
        sizes = g.groupby("batch_index")["slot"].agg(["size", "min", "max"])
        assert (sizes["min"] == 0).all()
        assert (sizes["max"] == sizes["size"] - 1).all()  # dense slots
        assert (sizes["size"].iloc[:-1] == 16).all() if len(sizes) > 1 else True
        last = sizes["size"].iloc[-1]
        assert 1 <= last <= 16
        # batch_index dense from 0
        assert sorted(sizes.index) == list(range(len(sizes)))


def test_aspect_bucket_rung_assignment(ray_session):
    """Known ratios land on the right rungs: square → middle rung,
    2:1 → top rung, 1:2 → bottom rung (ladder ±1 in steps of 0.25)."""
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.image import aspect_bucket_batches

    df = pd.DataFrame(
        {
            "image_id": ["sq", "wide", "tall"],
            "w": [512, 1024, 256],
            "h": [512, 512, 512],
        }
    )
    out = (
        aspect_bucket_batches(rd.from_pandas(df), batch_size=4)
        .to_pandas().set_index("image_id")
    )
    n_rungs = 9  # ladder -1..1 step .25
    assert out.loc["sq", "bucket_id"] == (n_rungs - 1) // 2
    assert out.loc["wide", "bucket_id"] == n_rungs - 1
    assert out.loc["tall", "bucket_id"] == 0
    assert out.loc["sq", "target_w"] == out.loc["sq", "target_h"]
    assert out.loc["wide", "target_w"] > out.loc["wide", "target_h"]
    assert out.loc["tall", "target_w"] < out.loc["tall", "target_h"]

def test_kmeans_fit_never_materializes(ray_session, monkeypatch):
    """Scale guard: the default (sample-based) fit must not pin the
    projected embedding column — at 10^10 rows x 768-d the projection is
    ~30 TB, past any cluster's aggregate object store. Any materialize()
    call inside fit is a regression."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.cluster import kmeans_fit

    def _boom(self, *a, **kw):
        raise AssertionError("kmeans_fit must not materialize the dataset")

    monkeypatch.setattr(rd.Dataset, "materialize", _boom)

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(600, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    centroids = kmeans_fit(ds, k=3, approx_rows=len(mat), seed=1)
    assert centroids.shape == (3, 8)
    assert np.allclose(np.linalg.norm(centroids, axis=1), 1.0)


def test_kmeans_sampled_and_streaming_fits_agree(ray_session):
    """The bounded-sample fit (default) and the exact streaming full-corpus
    fit (fit_sample=None) must recover the same planted structure — same
    per-row assignment up to cluster relabeling."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.cluster import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(17)
    dim, blobs, per = 12, 5, 200
    centers = rng.normal(size=(blobs, dim)) * 6
    truth = np.repeat(np.arange(blobs), per)
    mat = (centers[truth]
           + rng.normal(scale=0.05, size=(len(truth), dim))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(truth), dtype=np.int64)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(8)

    def assignment(centroids):
        out = kmeans_assign(ds, centroids).to_pandas().sort_values("vec_id")
        return out["cluster"].to_numpy()

    a = assignment(kmeans_fit(ds, k=blobs, approx_rows=len(truth), seed=3))
    b = assignment(kmeans_fit(ds, k=blobs, approx_rows=len(truth), seed=3,
                              fit_sample=None))
    # same partition structure (label-invariant): every a-cluster maps to
    # exactly one b-cluster and vice versa
    for x, y in ((a, b), (b, a)):
        for c in np.unique(x):
            assert len(np.unique(y[x == c])) == 1
    # and both are pure against the planted truth
    for got in (a, b):
        purity = sum(
            np.unique(truth[got == c], return_counts=True)[1].max()
            for c in np.unique(got)
        )
        assert purity == len(truth)

def test_audio_features_real_wav_decode(ray_session):
    """AudioFeatures decodes genuine RIFF/WAVE PCM via stdlib wave: rate
    and channel count come from each file's own header, features are
    unit-pinned against the known planted signals (8/16/24/32-bit)."""
    import io
    import wave

    import ray.data as rd

    from polars_genson_ray.stages.multimodal import AudioFeatures, decode_wav_pcm

    def make_wav(samples_f32, rate, nch, sampwidth):
        x = np.clip(np.asarray(samples_f32, dtype=np.float64), -1.0, 1.0)
        if sampwidth == 2:
            raw = (x * 32767).astype("<i2").tobytes()
        elif sampwidth == 1:
            raw = ((x * 127) + 128).astype(np.uint8).tobytes()
        elif sampwidth == 4:
            raw = (x * 2147483647).astype("<i4").tobytes()
        elif sampwidth == 3:
            v = (x * 8388607).astype(np.int32)
            v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
            b = np.zeros((len(v), 3), dtype=np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            raw = b.tobytes()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sampwidth)
            w.setframerate(rate)
            w.writeframes(raw)
        return buf.getvalue()

    # planted signals: half-amplitude sine (rms ≈ 0.5/√2), DC 0.25, silence
    t = np.linspace(0, 2 * np.pi * 440, 8000, endpoint=False)
    rows = [
        {"id": "sine16", "audio": make_wav(0.5 * np.sin(t), 8000, 1, 2)},
        {"id": "dc24", "audio": make_wav(np.full(4000, 0.25), 16000, 1, 3)},
        {"id": "sil8", "audio": make_wav(np.zeros(2205), 22050, 1, 1)},
        {"id": "stereo32",
         "audio": make_wav(np.repeat(0.5 * np.sin(t), 2), 8000, 2, 4)},
    ]
    out = {
        r["id"]: r
        for r in rd.from_items(rows)
        .map_batches(AudioFeatures, batch_format="pyarrow", concurrency=1)
        .take_all()
    }
    assert all(r["decode_ok"] for r in out.values())
    s = out["sine16"]
    assert s["sample_rate"] == 8000 and s["n_channels"] == 1
    assert abs(s["duration_s"] - 1.0) < 1e-9
    assert abs(s["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    d = out["dc24"]
    assert d["sample_rate"] == 16000 and abs(d["duration_s"] - 0.25) < 1e-9
    assert abs(d["rms"] - 0.25) < 1e-4
    z = out["sil8"]
    assert z["rms"] < 0.01 and abs(z["duration_s"] - 0.1) < 1e-9
    st = out["stereo32"]
    assert st["n_channels"] == 2 and st["n_samples"] == 8000
    assert abs(st["rms"] - 0.5 / np.sqrt(2)) < 1e-3

    # direct kernel check: 24-bit round-trip is sample-exact to 1 LSB
    x, rate, nch = decode_wav_pcm(rows[1]["audio"])
    assert rate == 16000 and nch == 1
    assert np.allclose(x[:, 0], 0.25, atol=2.0 / 8388608)

def test_window_bucket_rejects_null_ts_and_subunit_bucket(ray_session):
    """_bucket_ticks guards: a null timestamp must raise (the float64
    round-trip would fabricate a year-2262 bucket and cost precision on
    valid ns ticks); a time_bucket finer than the column unit must raise
    (step would floor to 0 and collapse all rows into the epoch bucket)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from polars_genson_ray.stages.windows import session_windows

    ts = pa.array(
        [1_700_000_000_000_000, None, 1_700_000_360_000_000],
        pa.timestamp("us"),
    )
    tbl = pa.table({"user_id": pa.array([1, 2, 3]), "ts": ts})
    with pytest.raises(Exception, match="null timestamps"):
        session_windows(
            rd.from_arrow(tbl), "ts", "user_id"
        ).materialize()

    ok = pa.table({
        "user_id": pa.array([1, 2]),
        "ts": pa.array(
            [1_700_000_000_000_000, 1_700_000_360_000_000],
            pa.timestamp("us"),
        ),
    })
    with pytest.raises(Exception, match="whole multiple of the timestamp"):
        session_windows(
            rd.from_arrow(ok), "ts", "user_id", time_bucket="500ns"
        ).materialize()
    # non-integral multiples of the unit must ALSO raise (1500ns on a us
    # column would silently truncate the bucket width to 1us)
    with pytest.raises(Exception, match="whole multiple of the timestamp"):
        session_windows(
            rd.from_arrow(ok), "ts", "user_id", time_bucket="1500ns"
        ).materialize()


def test_kmeans_fit_without_approx_rows_is_unbiased(ray_session):
    """Without approx_rows, kmeans_fit derives the row count via
    ds.count() so the Bernoulli draw stays unbiased — it must NOT fall
    back to sample_embedding_rows' positional-head sampling. Planted
    position-contiguous blobs with a fit_sample smaller than one blob
    must all be recovered (the head fallback would see only blob 0)."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.cluster import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(31)
    dim, blobs, per = 8, 4, 300
    centers = rng.normal(size=(blobs, dim)) * 6
    truth = np.repeat(np.arange(blobs), per)  # position-contiguous
    mat = (centers[truth]
           + rng.normal(scale=0.05, size=(len(truth), dim))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(truth), dtype=np.int64)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(8)
    # no approx_rows + a fit_sample SMALLER than one blob: the prefix
    # fallback would see only blob 0; the streaming path sees everything
    centroids = kmeans_fit(ds, k=blobs, seed=5, fit_sample=200)
    got = (
        kmeans_assign(ds, centroids).to_pandas()
        .sort_values("vec_id")["cluster"].to_numpy()
    )
    purity = sum(
        np.unique(truth[got == c], return_counts=True)[1].max()
        for c in np.unique(got)
    )
    assert purity == len(truth)
    assert len(np.unique(got)) == blobs

def test_money_queries_empty_results(ray_session):
    """A filter that matches nothing (unknown segment / region) must
    return the typed empty frame, not KeyError on Ray's zero-row schema
    loss (found by review after the exact-arithmetic migration)."""
    from polars_genson_ray.pipelines.queries import (
        q_local_supplier_revenue,
        q_shipping_priority,
    )

    sf = "/root/testdata/sf0.001"
    out = q_shipping_priority(sf, segment="NO_SUCH_SEGMENT")
    assert list(out.columns) == [
        "o_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    ]
    assert len(out) == 0
    out2 = q_local_supplier_revenue(sf, region="NO_SUCH_REGION")
    assert list(out2.columns) == ["n_name", "revenue"]
    assert len(out2) == 0

def test_pq_adc_exact_and_deterministic(ray_session):
    """ADC via LUT gathers must equal the squared distance to the
    reconstructed vector exactly (same float path), codes must be
    rerun-deterministic, and codebooks block-layout-independent."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.pq import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(5)
    dim, n = 32, 1500
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    m = 8
    cb = pq_train(ds, dim=dim, m=m, nbits=6, train_sample=1500,
                  approx_rows=n, seed=3)
    assert cb.shape == (m, 64, dim // m)
    # layout independence: 1-block training gives the same codebooks
    cb1 = pq_train(rd.from_arrow(tbl), dim=dim, m=m, nbits=6,
                   train_sample=1500, approx_rows=n, seed=3)
    assert np.array_equal(cb, cb1)

    codes = pq_encode(ds, cb).to_pandas().set_index("vec_id").sort_index()
    codes2 = pq_encode(ds, cb).to_pandas().set_index("vec_id").sort_index()
    assert (codes.pq_code == codes2.pq_code).all()
    assert len(codes.pq_code.iloc[0]) == m

    q = rng.normal(size=(3, dim))
    out = pq_topk(pq_encode(ds, cb), cb, q, k=7)
    assert set(out.columns) == {"query_id", "vec_id", "adc_dist", "rank"}
    assert (out.groupby("query_id").size() == 7).all()
    for _, row in out.head(5).iterrows():
        code = np.frombuffer(codes.loc[int(row.vec_id), "pq_code"],
                             dtype=np.uint8)
        recon = np.concatenate([cb[j][code[j]] for j in range(m)])
        expect = float(((q[int(row.query_id)] - recon) ** 2).sum())
        assert abs(row.adc_dist - expect) < 1e-9


def test_pq_recall_and_cluster_retrieval(ray_session):
    """Quality contract: with fine subspaces (dsub=2) a gaussian cloud
    recalls every true top-10 neighbor inside the ADC top-20; on
    well-separated blobs every retrieved candidate comes from the
    query's own blob (PQ's coarse regime)."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.pq import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(7)
    dim, n = 32, 4000
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    cb = pq_train(ds, dim=dim, m=16, nbits=8, train_sample=4000,
                  approx_rows=n, seed=3)
    q = rng.normal(size=(5, dim))
    out = pq_topk(pq_encode(ds, cb), cb, q, k=20)
    d2 = ((mat.astype(np.float64)[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    for i in range(5):
        true10 = set(np.argsort(d2[i])[:10])
        got20 = set(out[out.query_id == i].vec_id.astype(int))
        assert len(true10 & got20) >= 9, (i, len(true10 & got20))

    blobs, per = 10, 200
    centers = rng.normal(size=(blobs, dim)) * 5
    truth = np.repeat(np.arange(blobs), per)
    mat2 = (centers[truth]
            + rng.normal(scale=0.2, size=(len(truth), dim))).astype(np.float32)
    t2 = pa.table({
        "vec_id": pa.array(np.arange(len(mat2), dtype=np.int64)),
        "embedding": pa.array(list(mat2), pa.list_(pa.float32())),
    })
    ds2 = rd.from_arrow(t2).repartition(4)
    cb2 = pq_train(ds2, dim=dim, m=8, nbits=6, train_sample=2000,
                   approx_rows=len(mat2), seed=3)
    out2 = pq_topk(pq_encode(ds2, cb2), cb2,
                   mat2[::per][:4].astype(np.float64), k=10)
    assert all(truth[int(v)] == qi
               for qi, v in zip(out2.query_id, out2.vec_id))

def test_ivfpq_residual_recall_beats_plain_pq(ray_session):
    """Residual encoding is the point of IVF-PQ: within-cluster neighbor
    structure that plain PQ quantizes away (whole blobs share codes) is
    preserved by encoding x - centroid. On 10 tight blobs, IVF-PQ@m=16
    must recall ≥0.8 of the true top-10 and strictly beat plain PQ at the
    same code budget; every result must also come from a probed cell of
    the right region (no cross-blob leakage)."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.pq import (
        ivfpq_build,
        ivfpq_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(5)
    dim, blobs, per = 32, 10, 200
    centers = rng.normal(size=(blobs, dim)) * 5
    truth = np.repeat(np.arange(blobs), per)
    mat = (centers[truth]
           + rng.normal(scale=0.2, size=(len(truth), dim))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    q = mat[:3].astype(np.float64)
    d2 = ((mat.astype(np.float64)[None, :, :] - q[:, None, :]) ** 2).sum(-1)

    def recall(out):
        return np.mean([
            len(set(np.argsort(d2[i])[:10])
                & set(out[out.query_id == i].vec_id.astype(int))) / 10
            for i in range(3)
        ])

    coarse, cb, codes = ivfpq_build(
        ds, dim=dim, n_cells=16, m=16, nbits=8, train_sample=2000,
        approx_rows=len(mat), seed=3,
    )
    codes = codes.materialize()
    ivf_out = ivfpq_topk(codes, coarse, cb, q, k=10, nprobe=4)
    r_ivfpq = recall(ivf_out)

    cb_plain = pq_train(ds, dim=dim, m=16, nbits=8, train_sample=2000,
                        approx_rows=len(mat), seed=3)
    plain_out = pq_topk(pq_encode(ds, cb_plain), cb_plain, q, k=10)
    r_plain = recall(plain_out)

    assert r_ivfpq >= 0.8, (r_ivfpq, r_plain)
    assert r_ivfpq > r_plain, (r_ivfpq, r_plain)
    # cross-blob leakage bounded: ≥9 of each query's 10 hits are in its
    # own blob (quantized distances may let the odd foreign row in)
    for qi in range(3):
        hits = ivf_out[ivf_out.query_id == qi].vec_id.astype(int)
        own = sum(truth[v] == truth[qi] for v in hits)
        assert own >= 9, (qi, own)


def test_ivfpq_adc_matches_reconstruction(ray_session):
    """Residual ADC exactness: the LUT-sum distance equals
    ||q − (centroid + reconstructed residual)||² to float precision."""
    import pyarrow as pa
    import ray.data as rd

    from polars_genson_ray.stages.pq import ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(11)
    dim, n = 16, 800
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    m = 4
    coarse, cb, codes_ds = ivfpq_build(
        ds, dim=dim, n_cells=8, m=m, nbits=6, train_sample=800,
        approx_rows=n, seed=2,
    )
    codes_ds = codes_ds.materialize()
    codes = codes_ds.to_pandas().set_index("vec_id")
    q = rng.normal(size=(2, dim))
    out = ivfpq_topk(codes_ds, coarse, cb, q, k=5, nprobe=3)
    assert (out.groupby("query_id").size() == 5).all()
    for _, row in out.iterrows():
        rec = codes.loc[int(row.vec_id)]
        code = np.frombuffer(rec["pq_code"], dtype=np.uint8)
        recon = coarse[int(rec["cell"])] + np.concatenate(
            [cb[j][code[j]] for j in range(m)]
        )
        expect = float(((q[int(row.query_id)] - recon) ** 2).sum())
        assert abs(row.adc_dist - expect) < 1e-9


def test_audio_features_ieee_float_and_extensible_wav(ray_session):
    """decode_wav_ext handles what stdlib wave rejects: IEEE-float WAV
    (format tag 3, 32/64-bit) and WAVE_FORMAT_EXTENSIBLE (0xFFFE wrapping
    PCM or float). Features unit-pinned (sine rms = amp/√2, DC); compressed
    tags still raise (honest codec gate)."""
    import struct

    import ray.data as rd

    from polars_genson_ray.stages.multimodal import AudioFeatures, decode_wav_ext

    def make_wav_raw(raw, *, tag, nch, rate, bits, extensible=False):
        block = nch * (bits // 8)
        if extensible:
            sub = struct.pack("<H", tag) + bytes.fromhex(
                "0000000000100080 00aa00389b71".replace(" ", "")
            )
            fmt = struct.pack(
                "<HHIIHHHHI", 0xFFFE, nch, rate, rate * block, block, bits,
                22, bits, 3 if nch == 2 else 1,  # mask is a 4-byte dword
            ) + sub
        else:
            fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * block, block, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + (b"\x00" if len(fmt) & 1 else b"")
        chunks += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    t = np.linspace(0, 2 * np.pi * 440, 8000, endpoint=False)
    sine = (0.5 * np.sin(t)).astype(np.float64)
    rows = [
        {"id": "f32", "audio": make_wav_raw(
            sine.astype("<f4").tobytes(), tag=3, nch=1, rate=8000, bits=32)},
        {"id": "f64dc", "audio": make_wav_raw(
            np.full(4000, 0.25, "<f8").tobytes(), tag=3, nch=1, rate=16000, bits=64)},
        {"id": "ext_pcm16", "audio": make_wav_raw(
            (sine * 32767).astype("<i2").tobytes(), tag=1, nch=1, rate=8000,
            bits=16, extensible=True)},
        {"id": "ext_f32_stereo", "audio": make_wav_raw(
            np.repeat(sine, 2).astype("<f4").tobytes(), tag=3, nch=2,
            rate=8000, bits=32, extensible=True)},
        {"id": "adpcm", "audio": make_wav_raw(
            b"\x00" * 256, tag=2, nch=1, rate=8000, bits=16)},  # compressed
    ]
    out = {
        r["id"]: r
        for r in rd.from_items(rows)
        .map_batches(AudioFeatures, batch_format="pyarrow", concurrency=1)
        .take_all()
    }
    rms = 0.5 / np.sqrt(2)
    f = out["f32"]
    assert f["decode_ok"] and f["sample_rate"] == 8000 and f["n_channels"] == 1
    assert abs(f["duration_s"] - 1.0) < 1e-9 and abs(f["rms"] - rms) < 1e-3
    d = out["f64dc"]
    assert d["decode_ok"] and abs(d["rms"] - 0.25) < 1e-6
    assert abs(d["duration_s"] - 0.25) < 1e-9
    e = out["ext_pcm16"]
    assert e["decode_ok"] and abs(e["rms"] - rms) < 1e-3
    s = out["ext_f32_stereo"]
    assert s["decode_ok"] and s["n_channels"] == 2 and s["n_samples"] == 8000
    assert not out["adpcm"]["decode_ok"]  # violation row, not job failure

    # direct kernel: float32 samples survive bit-exact
    x, rate, nch = decode_wav_ext(rows[0]["audio"])
    assert rate == 8000 and nch == 1
    assert np.array_equal(x[:, 0], sine.astype(np.float32))


def test_video_frame_sample_real_avi_demux(ray_session):
    """VideoFrameSample demuxes genuine RIFF/AVI containers (stdlib struct
    writer + demuxer): frame counts, sampled indexes and timestamps are
    unit-pinned against the planted stream headers; payloads round-trip
    byte-exact; non-decodable frame payloads surface as decode_ok=False."""
    import ray.data as rd

    from polars_genson_ray.sources.synth import (
        encode_avi,
        encode_image,
        reference_pixels,
    )
    from polars_genson_ray.stages.multimodal import VideoFrameSample, demux_avi

    frames = [
        encode_image(reference_pixels(f"f{i}", 8, 8), "png") for i in range(13)
    ]
    avi24 = encode_avi(frames, fps_num=24, fps_den=1)
    # NTSC-style rational fps + undecodable (raw JPEG-ish) frame payloads
    avi_ntsc = encode_avi([b"\xff\xd8 fake jpeg" * 3] * 7,
                          fps_num=30000, fps_den=1001)

    out = (
        rd.from_items([
            {"vid": "a", "video": avi24},
            {"vid": "b", "video": avi_ntsc},
        ])
        .map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"id_column": "vid", "every_n": 5},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    a = [r for r in out if r["vid"] == "a"]
    b = [r for r in out if r["vid"] == "b"]
    assert [r["frame_index"] for r in a] == [0, 5, 10]
    assert [r["timestamp_s"] for r in a] == [0.0, 5 / 24.0, 10 / 24.0]
    assert all(r["decode_ok"] for r in a)
    assert [r["frame_bytes"] for r in a] == [frames[0], frames[5], frames[10]]
    assert [r["frame_index"] for r in b] == [0, 5]
    assert abs(b[1]["timestamp_s"] - 5 * 1001 / 30000.0) < 1e-12
    assert not any(r["decode_ok"] for r in b)  # violation rows, no failure

    # direct demux: all 13 frames byte-exact, fps from dwRate/dwScale
    fr, fps = demux_avi(avi24)
    assert fr == frames and fps == 24.0


def test_video_frame_sample_truncated_avi_is_violation_row(ray_session):
    """Every truncation of a valid AVI must yield a violation row
    (frame_index=-1, decode_ok=False) or a clean partial demux — never a
    struct.error that kills the map_batches task."""
    import ray.data as rd

    from polars_genson_ray.sources.synth import (
        encode_avi,
        encode_image,
        reference_pixels,
    )
    from polars_genson_ray.stages.multimodal import VideoFrameSample

    frames = [
        encode_image(reference_pixels(f"t{i}", 8, 8), "png") for i in range(4)
    ]
    blob = encode_avi(frames, fps_num=24, fps_den=1)
    cuts = [
        {"vid": f"c{cut}", "video": blob[:cut]}
        for cut in range(12, len(blob), 7)
    ]
    out = (
        rd.from_items(cuts)
        .map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"id_column": "vid", "every_n": 1},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    # no task death; corrupt rows surface as frame_index=-1 violations
    bad = [r for r in out if r["frame_index"] == -1]
    assert all(not r["decode_ok"] and r["frame_bytes"] == b"" for r in bad)


def test_video_frames_real_png_decode(ray_session):
    """An AVI carrying REAL PNG frames now decodes (functions/imagecodec
    through stages.image.decode_any) — decode_ok=True without the synth
    codec ever seeing the payload."""
    import ray.data as rd

    from polars_genson_ray.functions.imagecodec import encode_png
    from polars_genson_ray.sources.synth import encode_avi, reference_pixels
    from polars_genson_ray.stages.multimodal import VideoFrameSample

    png_frames = [
        encode_png(reference_pixels(f"pf{i}", 10, 6)) for i in range(6)
    ]
    avi = encode_avi(png_frames, fps_num=12, fps_den=1)
    out = (
        rd.from_items([{"vid": "p", "video": avi}])
        .map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"id_column": "vid", "every_n": 2},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    assert [r["frame_index"] for r in out] == [0, 2, 4]
    assert all(r["decode_ok"] for r in out)
    assert [r["frame_bytes"] for r in out] == [
        png_frames[0], png_frames[2], png_frames[4]
    ]
