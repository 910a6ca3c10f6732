"""Dedup/similarity scale smoke: 20× the sf0.1 document volume (plus
round-3 legs: Dataset.join verify branch, 6M-edge distributed components,
spill-active uniqueness index at 16M ids).

Builds a deterministic 100k-doc corpus (16 fragments) with PLANTED
structure — 10k exact duplicates, 10k near duplicates (one word swapped
in a 50-word doc → trigram Jaccard ≈ 0.89), and a boilerplate sentence
shared by every doc (the hot-shingle hazard of real web text) — then runs
the three dedup operators and asserts exact recoveries:

  exact_dedup            → exactly 90,000 survivors
  minhash_lsh_pairs      → superset check on planted pair recall
  set_similarity_join    → exactly the 20,000 planted pairs (near + exact)
                           at threshold 0.8, boilerplate notwithstanding

Usage: python scripts/scale_smoke.py [--docs 100000]
Timings print per stage; on this shared-steal host compare only within a
run. The corpus caches under /tmp/pgr_smoke_docs_<n>_v2.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = "all rights reserved click here to subscribe to our newsletter today"


def build_corpus(out_dir: str, n_docs: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(71)
    vocab = np.array([f"w{i}" for i in range(20_000)])
    n_planted = n_docs // 10  # 10% exact + 10% near
    n_base = n_docs - 2 * n_planted
    texts = [
        BOILER + " " + " ".join(rng.choice(vocab, size=50))
        for _ in range(n_base)
    ]
    # exact dups of the first n_planted docs
    texts.extend(texts[i] for i in range(n_planted))
    # near dups: swap one word in the middle
    for i in range(n_planted):
        w = texts[i].split()
        w[30] = "swapped"
        texts.append(" ".join(w))
    n_frag = 16
    per = (len(texts) + n_frag - 1) // n_frag
    for f in range(n_frag):
        lo, hi = f * per, min(len(texts), (f + 1) * per)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(lo, hi), pa.int64()),
                    "text": pa.array(texts[lo:hi], pa.string()),
                }
            ),
            os.path.join(out_dir, f"part-{f:03d}.parquet"),
        )
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as fh:
        fh.write("ok")


def main() -> None:
    n_docs = 100_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    out_dir = f"/tmp/pgr_smoke_docs_{n_docs}_v2"
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        build_corpus(out_dir, n_docs)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from polars_genson_ray.stages.dedup import exact_dedup, minhash_lsh_pairs
    from polars_genson_ray.stages.setjoin import set_similarity_join

    n_planted = n_docs // 10
    report: dict = {"docs": n_docs, "planted_each": n_planted}

    ds = rd.read_parquet(out_dir, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    survivors = exact_dedup(ds, "text", "doc_id", approx_rows=n_docs).count()
    report["exact_dedup_s"] = round(time.perf_counter() - t0, 2)
    assert survivors == n_docs - n_planted, survivors
    report["exact_survivors"] = survivors

    ds = rd.read_parquet(out_dir, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    pairs = set_similarity_join(
        ds, "text", "doc_id", threshold=0.8, approx_rows=n_docs
    ).take_all()
    report["setjoin_s"] = round(time.perf_counter() - t0, 2)
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    n_base = n_docs - 2 * n_planted
    # base↔exact-copy, base↔near-copy, and exact-copy↔near-copy of the
    # same base doc (the copies are near-dups of each other too)
    expected = (
        {(i, n_base + i) for i in range(n_planted)}
        | {(i, n_base + n_planted + i) for i in range(n_planted)}
        | {(n_base + i, n_base + n_planted + i) for i in range(n_planted)}
    )
    assert got == expected, (len(got), len(expected))
    report["setjoin_pairs"] = len(got)

    ds = rd.read_parquet(out_dir, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    mh = minhash_lsh_pairs(
        ds, "text", "doc_id", min_jaccard=0.5, approx_rows=n_docs
    ).take_all()
    report["minhash_s"] = round(time.perf_counter() - t0, 2)
    mh_pairs = {(r["id_a"], r["id_b"]) for r in mh}
    exact_pairs = {(i, n_base + i) for i in range(n_planted)}
    report["minhash_pairs"] = len(mh_pairs)
    report["minhash_exact_recall"] = round(
        len(mh_pairs & exact_pairs) / n_planted, 4
    )
    report["minhash_near_recall"] = round(
        len(mh_pairs & {(i, n_base + n_planted + i) for i in range(n_planted)})
        / n_planted,
        4,
    )

    # connected components over the verified pair set: each planted triple
    # {base, exact copy, near copy} is one component → survivors
    # (node == cluster_id) must be exactly n_docs - 2*n_planted
    import pyarrow as pa

    from polars_genson_ray.stages.components import connected_components

    pair_tbl = pa.table({
        "id_a": pa.array([a for a, _ in got], pa.int64()),
        "id_b": pa.array([b for _, b in got], pa.int64()),
    })
    for label, thr in (("components_driver", 5_000_000),
                       ("components_distributed", 0)):
        pairs_ds = rd.from_arrow(pair_tbl)
        nodes = rd.read_parquet(out_dir, columns=["doc_id"])
        t0 = time.perf_counter()
        clusters = connected_components(
            pairs_ds, nodes, node_column="doc_id", driver_threshold=thr
        )
        surv = clusters.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int((b.column("doc_id").to_numpy()
                      == b.column("cluster_id").to_numpy()).sum())])}),
            batch_format="pyarrow",
        ).sum("s")
        report[f"{label}_s"] = round(time.perf_counter() - t0, 2)
        assert surv == n_docs - 2 * n_planted, (label, surv)
        report[f"{label}_survivors"] = int(surv)

    # distributed k-means at 2× the doc volume: 16 planted blobs must be
    # recovered with full purity (init is kmeans++ on a canonicalized
    # seeded sample; Lloyd passes are streaming partial reduces)
    from polars_genson_ray.stages.cluster import kmeans_assign, kmeans_fit

    n_vec, dim, blobs = 2 * n_docs, 64, 16
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(blobs, dim)) * 5
    truth = np.repeat(np.arange(blobs), n_vec // blobs)
    vecs = (centers[truth]
            + rng.normal(scale=0.05, size=(len(truth), dim))).astype(np.float32)
    vec_tbl = pa.table({
        "vec_id": pa.array(np.arange(len(truth), dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    })
    vds = rd.from_arrow(vec_tbl).repartition(32).materialize()
    t0 = time.perf_counter()
    centroids = kmeans_fit(vds, k=blobs, approx_rows=len(truth), seed=3)
    report["kmeans_fit_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out = kmeans_assign(vds, centroids).to_pandas().sort_values("vec_id")
    report["kmeans_assign_s"] = round(time.perf_counter() - t0, 2)
    gotc = out["cluster"].to_numpy()
    purity = sum(
        np.unique(truth[gotc == c], return_counts=True)[1].max()
        for c in np.unique(gotc)
    )
    report["kmeans_purity"] = round(purity / len(truth), 4)
    assert purity == len(truth), purity

    # phash Hamming dedup at 1M hashes: 100k-row hot exact group (10%),
    # 5k planted bit-flip near-dups, rest random — collapse-first must
    # keep the hot group out of the pairwise phase entirely
    from polars_genson_ray.stages.dedup import phash_hamming_pairs

    n_ph = 1_000_000
    rng_ph = np.random.default_rng(83)
    ph = rng_ph.integers(0, 2**62, size=n_ph, dtype=np.int64)
    ph[:n_ph // 10] = 0x5A5A5A5A
    n_near = 5_000
    base_idx = rng_ph.choice(
        np.arange(n_ph // 10, n_ph - n_near), size=n_near, replace=False
    )
    for j, bi in enumerate(base_idx):
        # hamming-2 perturbations (mask is never 0 → never an exact dup)
        ph[n_ph - n_near + j] = ph[bi] ^ ((1 << (j % 3 + 1)) | 1)
    ph_tbl = pa.table(
        {
            "image_id": pa.array(
                [f"i{i:07d}" for i in range(n_ph)], pa.string()
            ),
            "phash": pa.array(ph, pa.int64()),
        }
    )
    pds = rd.from_arrow(ph_tbl).repartition(32).materialize()
    t0 = time.perf_counter()
    ppairs = phash_hamming_pairs(
        pds, max_hamming=3, bands=4, approx_rows=n_ph
    ).to_pandas()
    report["phash_s"] = round(time.perf_counter() - t0, 2)
    report["phash_pairs"] = len(ppairs)
    # every planted pair recovered (hamming 2-3 ≤ 3); the hot group shows
    # up only through its n_a/n_b member count, never as 100k² pairs
    planted_ids = {f"i{n_ph - n_near + j:07d}" for j in range(n_near)}
    found_planted = sum(
        (a in planted_ids) or (b in planted_ids)
        for a, b in zip(ppairs["id_a"], ppairs["id_b"])
    )
    report["phash_planted_found"] = int(found_planted)
    assert found_planted >= n_near, (found_planted, n_near)

    # --- round-3 legs (VERDICT r2 §7) -----------------------------------

    # setjoin's Dataset.join verify branch: broadcast_limit=0 forces the
    # two-pass Dataset.join blob attach (the >500k-token path at real
    # scale) on the same corpus — answers must be IDENTICAL to the
    # broadcast branch asserted above
    ds = rd.read_parquet(out_dir, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    pairs_dj = set_similarity_join(
        ds, "text", "doc_id", threshold=0.8, approx_rows=n_docs,
        broadcast_limit=0,
    ).take_all()
    report["setjoin_datasetjoin_s"] = round(time.perf_counter() - t0, 2)
    got_dj = {(r["id_a"], r["id_b"]) for r in pairs_dj}
    assert got_dj == expected, (len(got_dj), len(expected))
    report["setjoin_datasetjoin_pairs"] = len(got_dj)

    # connected components ABOVE the 5M-pair driver threshold: 8M nodes in
    # chains of 4 → 6M edges route to the distributed min-label branch by
    # size (no threshold override); survivors = one per chain
    n_nodes, chain = 8_000_000, 4
    base_ids = np.arange(n_nodes, dtype=np.int64)
    in_chain = base_ids % chain != chain - 1
    big_src = base_ids[in_chain]
    big_dst = big_src + 1
    big_pairs = rd.from_arrow(
        pa.table({"id_a": big_src, "id_b": big_dst})
    ).repartition(64).materialize()
    big_nodes = rd.from_arrow(
        pa.table({"doc_id": base_ids})
    ).repartition(64).materialize()
    t0 = time.perf_counter()
    clusters = connected_components(
        big_pairs, big_nodes, node_column="doc_id"
    )
    surv = clusters.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int((b.column("doc_id").to_numpy()
                  == b.column("cluster_id").to_numpy()).sum())])}),
        batch_format="pyarrow",
    ).sum("s")
    report["components_6M_edges_s"] = round(time.perf_counter() - t0, 2)
    assert surv == n_nodes // chain, surv
    report["components_6M_edges_survivors"] = int(surv)

    # spill-ACTIVE uniqueness index: 16M ids (1% planted repeats) through
    # 4 shards capped at 500k resident entries each → every shard spills
    # multiple sorted runs; the duplicate count must stay exact
    import shutil

    from polars_genson_ray.stages.unique import create_index, route_observe

    spill_root = "/tmp/pgr_smoke_spill"
    shutil.rmtree(spill_root, ignore_errors=True)
    n_ids, dup_every = 16_000_000, 100
    actors = create_index(4, spill_dir=spill_root, resident_limit=500_000)
    t0 = time.perf_counter()
    total_dups = 0
    chunk_sz = 1_000_000
    for lo in range(0, n_ids, chunk_sz):
        ids = np.arange(lo, min(lo + chunk_sz, n_ids), dtype=np.int64)
        # every dup_every-th id repeats its predecessor → exact planted dups
        ids[ids % dup_every == dup_every - 1] -= 1
        total_dups += len(
            route_observe(actors, f"smoke:{lo}", ids.tolist())
        )
    report["unique_spill_s"] = round(time.perf_counter() - t0, 2)
    expected_dups = n_ids // dup_every
    assert total_dups == expected_dups, (total_dups, expected_dups)
    report["unique_spill_dups"] = int(total_dups)
    run_files = [
        f
        for root, _, files in os.walk(spill_root)
        for f in files
        if f.endswith(".npy")
    ]
    assert run_files, "spill never activated — resident cap not honored"
    report["unique_spill_runs"] = len(run_files)
    for a in actors:
        ray.kill(a)
    shutil.rmtree(spill_root, ignore_errors=True)

    # --- round-3 session additions -------------------------------------
    # embedding hot exact group: the pre-fix pathology (100k identical
    # embeddings in one LSH bucket → 5e9-pair quadratic verify). Post-fix:
    # exact collapse → 99,999 star pairs, seconds not OOM.
    import pandas as pd

    hot_n, dim = 100_000, 32
    rng = np.random.default_rng(5)
    base = rng.standard_normal(dim)
    others = rng.standard_normal((5_000, dim))
    emb = np.vstack([np.tile(base, (hot_n, 1)), others])
    import pyarrow as pa

    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(len(emb)), pa.int64()),
            "embedding": pa.array([r.tolist() for r in emb],
                                  pa.list_(pa.float64())),
        }
    )
    from polars_genson_ray.stages.similarity import embedding_near_duplicates

    t0 = time.perf_counter()
    hot_pairs = embedding_near_duplicates(
        rd.from_arrow(emb_tbl).repartition(16), dim=dim, threshold=0.95,
        approx_rows=len(emb), bucket_cap=4096,
    ).count()
    report["embedding_hot_group_s"] = round(time.perf_counter() - t0, 2)
    # ≥ the 99,999 star pairs; incidental distinct-vector near-dups possible
    assert hot_pairs >= hot_n - 1, hot_pairs
    assert hot_pairs < hot_n + 50_000, hot_pairs  # linear, never quadratic
    report["embedding_hot_group_pairs"] = int(hot_pairs)

    # duplicated spans over the smoke corpus: every base doc shares the
    # BOILER prefix → its windows are corpus-wide duplicated; exact dups
    # are 100%-covered
    from polars_genson_ray.stages.corpus import duplicated_spans

    ds = rd.read_parquet(out_dir, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    spans = duplicated_spans(ds, "text", "doc_id", ngram_words=8).to_pandas()
    report["dup_spans_s"] = round(time.perf_counter() - t0, 2)
    assert len(spans) == n_docs
    exact_ids = set(range(n_base := n_docs - 2 * n_planted, n_base + n_planted))
    full = spans[spans.doc_id.isin(exact_ids)]
    assert (full.dup_fraction == 1.0).all(), "exact dups must be 100% covered"
    report["dup_spans_mean_fraction"] = round(float(spans.dup_fraction.mean()), 4)

    # char-level dup spans over the same corpus: ~chars/words x more
    # windows than the word pass, same two-pass exchange; exact dups must
    # be 100% covered at char level too
    from polars_genson_ray.stages.corpus import duplicated_char_spans

    t0 = time.perf_counter()
    cspans = duplicated_char_spans(
        rd.read_parquet(out_dir, columns=["doc_id", "text"]),
        "text", "doc_id", ngram_chars=24,
    ).to_pandas()
    report["dup_spans_chars_s"] = round(time.perf_counter() - t0, 2)
    assert len(cspans) == n_docs
    cfull = cspans[cspans.doc_id.isin(exact_ids)]
    assert (cfull.dup_fraction == 1.0).all(), "exact dups 100% char-covered"
    report["dup_spans_chars_mean_fraction"] = round(
        float(cspans.dup_fraction.mean()), 4
    )

    # bloom decontamination at size: filter built over 10% of the corpus,
    # probed over the rest; must flag every exact dup of a benchmark doc
    from polars_genson_ray.stages.decontam import bloom_decontaminate

    def _mod10(eq: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = df.doc_id % 10 == 0
            return df[m if eq else ~m]

        return f

    bench_ds = rd.read_parquet(out_dir, columns=["doc_id", "text"]).map_batches(
        _mod10(True), batch_format="pandas"
    )
    probe_ds = rd.read_parquet(out_dir, columns=["doc_id", "text"]).map_batches(
        _mod10(False), batch_format="pandas"
    )
    t0 = time.perf_counter()
    tagged = bloom_decontaminate(probe_ds, bench_ds, ngram_words=8).to_pandas()
    report["bloom_decontam_s"] = round(time.perf_counter() - t0, 2)
    # every doc shares BOILER with the benchmark side → all contaminated
    assert bool(tagged.contaminated.all()), "BOILER prefix must contaminate all"
    report["bloom_flagged"] = int(tagged.contaminated.sum())

    # --- round-4 leg: sample-based k-means fit is O(fit_sample), not
    # O(rows) — 2M x 32-d planted blobs (≈512 MB as float64 lists; the old
    # materialize() design would pin all of it for the whole Lloyd loop),
    # fit bounded at 8192 sample rows, assignment still streams the full
    # set and must recover the planted structure exactly
    from polars_genson_ray.stages.cluster import kmeans_assign, kmeans_fit

    km_rows, km_dim, km_blobs = 2_000_000, 32, 8
    rng = np.random.default_rng(23)
    km_centers = rng.normal(size=(km_blobs, km_dim)) * 6

    def _blob_batch(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        lab = ids % km_blobs
        r = np.random.default_rng(101)  # noise per batch; labels drive blobs
        emb_ = km_centers[lab] + r.normal(scale=0.05, size=(len(ids), km_dim))
        return pd.DataFrame({
            "vec_id": ids,
            "embedding": list(emb_.astype(np.float32)),
        })

    km_ds = rd.range(km_rows).map_batches(
        _blob_batch, batch_format="pandas"
    )
    t0 = time.perf_counter()
    cent = kmeans_fit(km_ds, column="embedding", k=km_blobs,
                      approx_rows=km_rows, fit_sample=8192, seed=13)
    report["kmeans_fit_2m_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    assigned = kmeans_assign(km_ds, cent).map_batches(
        lambda df: pd.DataFrame({
            "lab": df["vec_id"] % km_blobs, "cluster": df["cluster"]
        }).groupby(["lab", "cluster"], as_index=False).agg(
            n=("cluster", "size")),
        batch_format="pandas",
    ).to_pandas().groupby(["lab", "cluster"], as_index=False).agg(
        n=("n", "sum"))
    report["kmeans_assign_2m_s"] = round(time.perf_counter() - t0, 2)
    # purity: each planted blob maps to exactly one fitted cluster AND
    # the 8 blobs land on 8 DISTINCT clusters (8 rows alone would also
    # pass a merged-blob fit with an empty centroid)
    assert len(assigned) == km_blobs, assigned
    assert assigned.cluster.nunique() == km_blobs, assigned
    assert int(assigned.n.sum()) == km_rows

    # --- round-4 leg: PQ / IVF-PQ at 2M vectors — encode streams (codes
    # are 8 B/vector: 16 MB searchable state for 2M x 32-d = 256 MB of
    # floats), ADC search scans codes only; planted blobs must be
    # retrieved from the right blob
    from polars_genson_ray.stages.pq import ivfpq_build, ivfpq_topk

    pq_rows, pq_dim, pq_blobs = 2_000_000, 32, 8
    rng_pq = np.random.default_rng(41)
    pq_centers = rng_pq.normal(size=(pq_blobs, pq_dim)) * 6

    def _pq_blob_batch(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        lab = ids % pq_blobs
        r = np.random.default_rng(103)
        emb_ = pq_centers[lab] + r.normal(scale=0.2, size=(len(ids), pq_dim))
        return pd.DataFrame({
            "vec_id": ids,
            "embedding": list(emb_.astype(np.float32)),
        })

    pq_ds = rd.range(pq_rows).map_batches(_pq_blob_batch, batch_format="pandas")
    t0 = time.perf_counter()
    coarse, cbk, pq_codes = ivfpq_build(
        pq_ds, dim=pq_dim, n_cells=32, m=8, nbits=8,
        train_sample=16384, approx_rows=pq_rows, seed=17,
    )
    pq_codes = pq_codes.materialize()
    report["ivfpq_encode_2m_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pq_q = (pq_centers[:4]
            + rng_pq.normal(scale=0.2, size=(4, pq_dim)))
    pq_out = ivfpq_topk(pq_codes, coarse, cbk, pq_q, k=10, nprobe=4)
    report["ivfpq_search_2m_s"] = round(time.perf_counter() - t0, 2)
    assert (pq_out.groupby("query_id").size() == 10).all()
    # every hit's blob (vec_id % blobs) must equal the query's blob
    ok_hits = sum(
        int(v) % pq_blobs == qi
        for qi, v in zip(pq_out.query_id, pq_out.vec_id)
    )
    assert ok_hits == len(pq_out), (ok_hits, len(pq_out))
    report["ivfpq_hits_correct"] = int(ok_hits)

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
