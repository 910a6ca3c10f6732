"""Single-node parity micro-benchmark against the reference's own workload.

Replays /root/reference/bench/bench_test.py exactly — first 10 rows of the
Wikidata ``labels.parquet`` column, ``wrap_root="labels"`` — through THIS
engine's pure-Python core (no Ray; the reference numbers are single-process
too). Prints one JSON line comparable to bench/README.md's ms/op tables.

The distributed engine's value is at 10^8+ rows; this exists so BASELINE.md
can report both ends: same-workload single-node ms/op here, streaming
images/sec + scaling efficiency from bench.py --scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LABELS = "/root/reference/bench/data/labels.parquet"
ROUNDS = 20


def main() -> None:
    import pyarrow.parquet as pq

    from polars_genson_ray.core import (
        NormaliseConfig,
        SchemaInferenceConfig,
        infer_json_schema_from_strings,
        normalise_values,
    )

    texts = [
        t
        for t in pq.read_table(LABELS, columns=["labels"])["labels"].to_pylist()[:10]
        if t
    ]

    def timeit(fn) -> float:
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            fn()
        return (time.perf_counter() - t0) / ROUNDS * 1000.0

    cfg = SchemaInferenceConfig(wrap_root="labels")
    avro_cfg = SchemaInferenceConfig(wrap_root="labels", avro=True)

    def infer_json():
        infer_json_schema_from_strings(texts, cfg)

    def infer_avro():
        infer_json_schema_from_strings(texts, avro_cfg)

    def normalise_no_decode():
        result = infer_json_schema_from_strings(texts, avro_cfg)
        parsed = [json.loads(t) for t in texts]
        normalise_values(
            parsed,
            result.schema,
            NormaliseConfig(wrap_root="labels", map_encoding="kv"),
        )

    out = {
        "workload": "reference bench_test.py: labels.parquet head(10), wrap_root=labels",
        "rounds": ROUNDS,
        "ms_per_op": {
            "infer_json_schema": round(timeit(infer_json), 2),
            "infer_avro_schema": round(timeit(infer_avro), 2),
            "normalise_infer_no_decode": round(timeit(normalise_no_decode), 2),
        },
        "reference_ms_per_op": {
            "infer_json_schema": "20.15 (v0.2.2) … 27.31 (v0.7.0)",
            "infer_avro_schema": "20.65 (v0.2.2) … 29.0 (v0.7.0)",
            "normalise_infer_no_decode": "43.44 (v0.2.2) … 61.40 (v0.7.0)",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
