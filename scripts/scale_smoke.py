"""Dedup/similarity scale smoke: 20× the sf0.1 document volume.

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

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
