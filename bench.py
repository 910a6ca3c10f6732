"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "images": N, "images_per_sec": N}

``--scaling`` runs the flagship validation job in fresh processes at two
parallelism levels (num_cpus=2 and 8 by default — N and 4N, both under
this host's memory-bandwidth knee; override with GRAFT_SCALING_LO/HI) on
the same input, interleaved best-of-N with bracketing machine
calibration, and reports throughput at both levels plus raw and
machine-normalized scaling efficiency (the sandbox evidence for the
north_rule's two-cluster-size criterion). Each leg is CONFINED to a CPU
set of its size via taskset — a fixed-size N-node cluster has only N
nodes' cores for everything, and confinement also removed most
run-to-run variance (repeats went ±40% → ±4%).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "event_windows_hourly",
    "schema_infer_events_props",
    "normalise_events_props",
    "exact_dedup_docs",
    "minhash_neardup_docs",
    "jaccard_neardup_docs",
    "neardup_clusters",
    "curation_filter",
    "events_asof_orders",
    "shipping_priority",
    "customer_order_counts",
    "user_rolling_hour",
    "token_counts",
    "doc_logprob",
    "decontaminate_docs",
    "ann_topk",
    "nation_revenue",
    # round-3 second-session additions
    "dup_spans",
    "bm25_docs",
    "value_outliers",
    "local_supplier_revenue",
]

# Round-4/5 operators, benched as SEPARATE entries so the frozen-23 total
# above stays comparable to BENCH_r03/r04 (reported under "queries_new" /
# "value_new"). ivfpq_build is timed on its own below — build cost is the
# number that matters at 10^12 rows, independent of search latency.
NEW_BENCH_QUERIES = [
    "dup_spans_chars",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "audio_features",
    "video_frames",
    # round-5: real stdlib PNG/BMP decode through the flagship validator;
    # ORC source round-trip (stripe-streaming datasource); Q10-shape
    # join composition; schema-evolution union; melt
    "image_formats_real",
    "orders_from_orc",
    "returned_items_report",
    "events_union_by_name",
    "lineitem_unpivot",
]


def _bench_ivfpq_build(sf_dir: str) -> int:
    """Time the IVF-PQ index build (coarse+codebook train on a bounded
    sample + ONE streaming residual-encode pass) over the embeddings
    table; returns the number of encoded codes (consumes the lazy encode)."""
    from polars_genson_ray.pipelines import queries as Q
    from polars_genson_ray.stages.pq import ivfpq_build

    qvecs = Q._query_vectors(sf_dir, ids=(0,))
    ds = Q._read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = Q._table_rows(sf_dir, "embeddings")
    _, _, codes = ivfpq_build(
        ds, dim=len(qvecs[0]), n_cells=16, m=8, nbits=8,
        train_sample=65536, approx_rows=n, seed=11,
    )
    return codes.count()


def _consume(result):
    """Force execution of a lazy Dataset without materializing to the driver
    beyond a row count; pandas results are already materialized."""
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.count()
    return len(result)


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod
    from polars_genson_ray.pipelines import queries as Q

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    timings_new: dict[str, float] = {}

    # warm EVERY input the suite touches (untimed): populates the one-time
    # reshard cache (functions/context.maybe_reshard) and the page cache,
    # so timings measure compute + shuffle, not first-touch file re-layout
    # (BENCH_r01 read 4.0 s for pricing_summary vs 0.64 s warm — all
    # first-query reshard cost)
    for table in ("lineitem", "events", "documents", "embeddings",
                  "orders", "customer", "part", "nation"):
        path = os.path.join(SF_DIR, f"{table}.parquet")
        if os.path.exists(path):
            from polars_genson_ray.functions.context import maybe_reshard

            maybe_reshard(path)
    # touch every Ray worker process once (untimed): first use of a cold
    # worker pays the pandas/numpy import (~0.5-1 s each), which otherwise
    # lands in whichever query first fans out wide
    import ray.data as _rd

    _rd.range(NUM_CPUS * 2000, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda df: df, batch_format="pandas"
    ).count()
    Q.q_doc_lang_counts(SF_DIR)

    # headline: flagship validation over the synthetic image table
    sf_name = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    if os.environ.get("GRAFT_BENCH_IMAGES"):
        images = int(os.environ["GRAFT_BENCH_IMAGES"])
    else:
        try:
            images = max(1000, int(float(sf_name) * 200_000))
        except ValueError:
            images = 2000
    img_dir = Q._image_table_dir(images)  # generation is cached & untimed
    from polars_genson_ray.pipelines.validation import run_validation
    import shutil
    import tempfile

    # Interleaved passes, per-query minimum: this host steals CPU in
    # bursts (identical suites measured 13 s and 78 s an hour apart with
    # zero local load), so a single-sample suite time measures the host's
    # mood, not the engine. The per-query minimum across passes is the
    # engine measurement; later passes are also the honest warm numbers
    # (pass 1 carries any remaining first-touch costs). Three passes
    # because a steal burst comfortably outlives one full pass.
    for _pass in range(int(os.environ.get("GRAFT_BENCH_PASSES", "3"))):
        out_dir = tempfile.mkdtemp(prefix="pgr_bench_val_")
        t0 = time.perf_counter()
        run_validation(img_dir, out_dir, resume=False)
        dt = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        prev = timings.get("validation_image_table")
        timings["validation_image_table"] = dt if prev is None else min(prev, dt)

        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            _consume(qs[name](SF_DIR))
            dt = time.perf_counter() - t0
            prev = timings.get(name)
            timings[name] = dt if prev is None else min(prev, dt)

        for name in NEW_BENCH_QUERIES:
            t0 = time.perf_counter()
            _consume(qs[name](SF_DIR))
            dt = time.perf_counter() - t0
            prev = timings_new.get(name)
            timings_new[name] = dt if prev is None else min(prev, dt)
        t0 = time.perf_counter()
        _bench_ivfpq_build(SF_DIR)
        dt = time.perf_counter() - t0
        prev = timings_new.get("ivfpq_build")
        timings_new["ivfpq_build"] = dt if prev is None else min(prev, dt)

    total = sum(timings.values())
    out = {
        "metric": "headline pipeline suite wall time (validation + operator queries; per-query best-of-N interleaved passes)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "value_new": round(sum(timings_new.values()), 3),
        "queries_new": {k: round(v, 3) for k, v in timings_new.items()},
        "sf": sf_name,
        "num_cpus": NUM_CPUS,
        "images": images,
        "images_per_sec": round(images / timings["validation_image_table"], 1),
    }
    ray.shutdown()
    return out


def _scaling_table(images: int) -> str:
    """Dedicated larger-image table for the scaling measurement: the
    per-row decode/PSNR work must dominate fixed pipeline overheads (actor
    startup, final task wave) for a parallelism comparison to be
    meaningful, and ~1000-row fragments keep the last task wave short."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from polars_genson_ray.sources.synth import generate_image_table

    out = f"/tmp/pgr_scale_{images}_v4"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        generate_image_table(
            out,
            num_rows=images,
            num_fragments=max(16, min(1024, images // 1000)),
            min_side=48,
            max_side=96,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out


def run_validation_only(images: int) -> dict:
    """Time ONLY the flagship validation pipeline (the headline metric:
    validated images/sec) on the scaling table."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import shutil
    import tempfile

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from polars_genson_ray.pipelines.validation import run_validation

    img_dir = _scaling_table(images)
    out_dir = tempfile.mkdtemp(prefix="pgr_scale_val_")
    t0 = time.perf_counter()
    rep = run_validation(img_dir, out_dir, resume=False)
    elapsed = time.perf_counter() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return {
        "metric": "validated images/sec (flagship pipeline)",
        "value": round(elapsed, 3),
        "unit": "sec",
        "images": images,
        "rows": rep.rows,
        "images_per_sec": round(images / elapsed, 1),
        "num_cpus": NUM_CPUS,
        "timings": rep.timings,
    }


def _calibrate(workers: int) -> float:
    """Machine calibration: the validation pipeline's own per-row kernel
    (decode + reference render + PSNR) on a plain process pool — NO Ray —
    at ``workers`` parallelism; returns kernel-iterations/sec. Bracketing
    each timed run, this measures what the *host* can deliver for THIS
    workload at that moment: the sandbox VM shares its host (bursty
    steal), and the kernel is memory-bandwidth-bound, so its process-pool
    scaling is the hardware ceiling. raw_eff / machine_eff then isolates
    what the engine (Ray scheduling, shuffle, actor spawn) adds on top of
    that ceiling. Confined to the same ``workers``-CPU affinity set as
    the timed run it brackets."""
    n = workers * 8
    import os as _os
    from concurrent.futures import ProcessPoolExecutor

    try:
        prev_aff = _os.sched_getaffinity(0)
        _os.sched_setaffinity(0, set(range(workers)))
    except (AttributeError, OSError):
        prev_aff = None
    try:
        with ProcessPoolExecutor(max_workers=workers) as pool:
            list(pool.map(_warm_task, range(workers)))  # spawn outside timing
            t0 = time.perf_counter()
            list(pool.map(_calib_task, range(n)))
            elapsed = time.perf_counter() - t0
    finally:
        if prev_aff is not None:
            _os.sched_setaffinity(0, prev_aff)
    return n / elapsed


def _warm_task(i: int) -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import polars_genson_ray.sources.synth  # noqa: F401

    return i


def _calib_task(i: int) -> float:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from polars_genson_ray.sources.synth import (
        decode_image,
        encode_image,
        psnr,
        reference_pixels,
    )

    data = encode_image(reference_pixels(f"calib_{i % 8}", 72, 72), "jpeg")
    s = 0.0
    for _ in range(300):
        dec, _ = decode_image(data)
        ref = reference_pixels(f"calib_{i % 8}", 72, 72)
        s += min(psnr(dec, ref), 99.0)
    return s


def run_scaling(lo: int = 4, hi: int = 16) -> dict:
    """Same job, two parallelism levels, fresh Ray sessions. Interleaved
    best-of-N per level: the sandbox VM shares its host, so single runs see
    ±30% external noise — the per-level minimum is the contention-free
    measurement of the engine itself. Each timed run is paired with a
    machine calibration at the same parallelism; the report carries raw
    efficiency AND engine efficiency normalized by the host's own scaling."""
    images = int(os.environ.get("GRAFT_SCALING_IMAGES", "600000"))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    _scaling_table(images)  # generate once, outside all timed runs

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # confine the whole session (workers, raylet, driver, object
        # store) to ncpu CPUs: a fixed-size N-node cluster has only N
        # nodes' cores for EVERYTHING, while an unconfined num_cpus=4
        # session on a 32-core host lets Ray's system processes ride the
        # other 28 (measured ~12% lo-leg inflation, which deflates the
        # efficiency ratio)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--validation-only", str(images)]
        import shutil as _sh

        if _sh.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    runs_lo, runs_hi = [], []
    calib_lo, calib_hi = [], []
    for i in range(repeats):
        if i:
            time.sleep(5)  # let the previous session's raylet fully exit
        c0 = _calibrate(lo)
        runs_lo.append(run(lo))
        # bracket each timed run with calibrations (a steal burst that
        # starts mid-run is invisible to a single pre-run sample); the
        # pair's mean is the host rate attributed to that run
        calib_lo.append((c0 + _calibrate(lo)) / 2)
        time.sleep(5)
        c0 = _calibrate(hi)
        runs_hi.append(run(hi))
        calib_hi.append((c0 + _calibrate(hi)) / 2)
    i_lo = min(range(repeats), key=lambda i: runs_lo[i]["value"])
    i_hi = min(range(repeats), key=lambda i: runs_hi[i]["value"])
    r_lo, r_hi = runs_lo[i_lo], runs_hi[i_hi]
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    # host's own scaling at the moments of the selected runs
    machine_eff = (calib_hi[i_hi] / calib_lo[i_lo]) / (hi / lo)
    return {
        "metric": "scaling efficiency (two parallelism levels, fresh sessions)",
        "images": images,
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "sec_lo_all": [r["value"] for r in runs_lo],
        "sec_hi_all": [r["value"] for r in runs_hi],
        "images_per_sec_lo": r_lo["images_per_sec"],
        "images_per_sec_hi": r_hi["images_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "machine_calib_tasks_per_sec_lo": round(calib_lo[i_lo], 1),
        "machine_calib_tasks_per_sec_hi": round(calib_hi[i_hi], 1),
        "machine_calib_all_lo": [round(c, 1) for c in calib_lo],
        "machine_calib_all_hi": [round(c, 1) for c in calib_hi],
        "machine_scaling_efficiency": round(machine_eff, 3),
        "engine_scaling_efficiency_normalized": round(
            min(1.0, eff / machine_eff) if machine_eff > 0 else eff, 3
        ),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
        hi = int(os.environ.get("GRAFT_SCALING_HI", str(lo * 4)))
        print(json.dumps(run_scaling(lo, hi)))
    elif "--validation-only" in sys.argv:
        idx = sys.argv.index("--validation-only")
        n = int(sys.argv[idx + 1]) if idx + 1 < len(sys.argv) else 150000
        print(json.dumps(run_validation_only(n)))
    else:
        print(json.dumps(run_bench()))
