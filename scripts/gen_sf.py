"""Deterministic scale-up of the driver's testdata: replicate a source sf
directory K× with per-replica key offsets, producing an sf-one-decade-up
table set under /tmp for scale evidence (the sandbox's testdata tops out at
sf0.1; TESTDATA.md forbids writing there).

Semantics of the upsample (replica r ∈ [0, K)):
  * fixed-size dimensions (region, nation) copy through unchanged — their
    cardinality does not scale with SF in TPC-H either;
  * every scaling table's primary key gets ``+ r * OFFSET`` so PKs stay
    unique; every foreign key gets the SAME offset as its target's PK, so
    referential structure replicates exactly (orphan sets, join fan-outs
    and key-overlap patterns are K identical copies);
  * event timestamps get ``+ r`` microseconds — keeps ordering realistic
    instead of manufacturing K-way exact ties on every ts;
  * document LETTERS are Caesar-shifted per replica (shift = r): a
    bijection on char sequences, so each replica reproduces the original's
    duplicate/near-dup structure EXACTLY at both word and char-gram
    granularity while replica token sets stay disjoint — the corpus
    becomes K independent shards. This is deliberate — byte-identical
    replicas were tried first and make the near-dup SQL *oracles*
    quadratic per identical group (every pair shares every token: the
    DuckDB inverted-index self-join grew past 50 GB at K=10 before being
    killed), while the engine side collapses identical docs up front and
    never sees the blow-up. A suffix salt (``word`` → ``wordqr<r>``) was
    tried second: word oracles stayed linear, but the shared per-word
    suffix added identical boundary char-grams to every doc and pushed all
    within-replica pairs of this tiny-vocab corpus over char-5-gram
    minhash's 0.8 threshold (256 → 27.6M pairs). Oracle cost must scale
    linearly for a tractable side-by-side sweep; the engine still sees the
    full 10× volume;
  * embeddings replicate byte-identically (K-way exact cosine/ADC ties —
    the brute-force oracle cost is linear in rows, so ties are free to
    keep and exercise the deterministic tie-breaking).

OFFSET = 10^9 stays clear of the engine's planted-id convention
(embedding/phash near-dup queries plant copies at id + 10^7).

Usage: python scripts/gen_sf.py [SRC=/root/testdata/sf0.1] [DST=/tmp/pgr_sf1] [K=10]
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 1_000_000_000

# table → (int64 key columns to offset, timestamp columns to perturb)
PLAN = {
    "region": None,  # fixed-size dimension: copy
    "nation": None,
    "customer": (["c_custkey"], []),
    "supplier": (["s_suppkey"], []),
    "part": (["p_partkey"], []),
    "orders": (["o_orderkey", "o_custkey"], []),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "events": (["event_id", "user_id"], ["ts"]),
    "documents": (["doc_id"], []),
    "embeddings": (["vec_id"], []),
}


def upsample(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name, spec in PLAN.items():
        src_path = os.path.join(src, f"{name}.parquet")
        dst_path = os.path.join(dst, f"{name}.parquet")
        t = pq.read_table(src_path)
        if spec is None:
            pq.write_table(t, dst_path)
            print(f"{name}: copied {t.num_rows}")
            continue
        key_cols, ts_cols = spec
        reps = []
        for r in range(k):
            rep = t
            if r and name == "documents":
                # salt by CAESAR-SHIFTING letters per replica, not by
                # appending a suffix: a shift is a bijection on char
                # sequences, so within-replica WORD and CHAR-GRAM
                # similarity is preserved EXACTLY (replica r's dup/near-dup
                # structure == the original's at every granularity), while
                # replica token sets stay disjoint (word-level oracles stay
                # linear). The first scheme (word -> word+"qr<r>") added
                # the SAME boundary char-grams to every word of every doc,
                # which pushed ALL within-replica pairs of this tiny-vocab
                # synthetic corpus over char-5-gram minhash's 0.8 threshold
                # (256 -> 27.6M pairs at K=10 — an upsampler artifact, not
                # an engine behavior).
                lo = "abcdefghijklmnopqrstuvwxyz"
                hi = lo.upper()
                shift = r % 26 or 13
                table = str.maketrans(
                    lo + hi, lo[shift:] + lo[:shift] + hi[shift:] + hi[:shift]
                )
                texts = [
                    s.translate(table) if s else s
                    for s in rep["text"].to_pylist()
                ]
                idx = rep.schema.get_field_index("text")
                rep = rep.set_column(
                    idx, rep.schema.field("text"), pa.array(texts, pa.string())
                )
                # n_chars needs no recompute: translate preserves length
                # (and len(None) on a null text row would crash)
            if r:
                for c in key_cols:
                    idx = rep.schema.get_field_index(c)
                    shifted = pc.add(rep[c], pa.scalar(r * OFFSET, rep.schema.field(c).type))
                    rep = rep.set_column(idx, rep.schema.field(c), shifted)
                for c in ts_cols:
                    idx = rep.schema.get_field_index(c)
                    typ = rep.schema.field(c).type
                    ticks = rep[c].cast(pa.int64())
                    rep = rep.set_column(
                        idx, rep.schema.field(c),
                        pc.add(ticks, pa.scalar(r, pa.int64())).cast(typ),
                    )
            reps.append(rep)
        out = pa.concat_tables(reps)
        pq.write_table(out, dst_path, row_group_size=1 << 17)
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pgr_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upsample(src, dst, k)
