#!/usr/bin/env python3
"""Dev tool (r14): time the DuckDB oracle execution of every oracled
query — the external performance yardstick the "within 2x of BASELINE"
gate has lacked for 13 rounds. BASELINE.json defines the metric but the
reference publishes no wall-times (its queries run inside Druid /
Superset containers), so every bench claim so far was round-over-round
self-comparison. This runs the SAME SQL the correctness gate trusts,
over the SAME parquet tables the Spark bench reads, on the SAME
machine — a cross-engine denominator on identical data.

Methodology (mirrors graft.Bench): every query runs once UNTIMED
(catalog + buffer warm), then `--passes` timed runs graded min.
DuckDB materializes via fetchall() — the analog of Bench's noop sink
(both pay full result production, neither pays serialization to a
client). Threads default to the machine's cores, same as local[32]'s
32 threads on the 32-core box; override with --threads for a pinned
run. The point is NOT to win at sf0.1 — a single-process columnar
engine on 60 MB should win — it is the RATIO's stability across SF
and the per-query outliers: any query where Spark's plan is an order
off the columnar baseline has a plan bug worth reading.

Usage:
  python3 tools/oracle_bench.py SF_DIR ORACLE_SQL_JSON [OUT_JSON]
  # e.g. after a Verify dump:
  python3 tools/oracle_bench.py /root/testdata/sf0.1 \
      /tmp/verify_out/oracle_sql.json /tmp/oracle_bench_sf01.json

tools/yardstick.py merges these with a bench_detail sidecar into the
committed ORACLE_BENCH.json ratio table.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run(sf_dir, oracle_path, out_path=None, passes=3, threads=None):
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warm: catalog, page cache, JIT-ish
            times = []
            for _ in range(passes):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            out[name] = round(min(times), 4)
            print(f"{name:32s} {out[name]:8.3f}s")
        except Exception as e:  # a failing oracle is a loud entry, not a gap
            out[name] = None
            print(f"{name:32s} FAIL {type(e).__name__}: {e}")
    total = sum(v for v in out.values() if v is not None)
    doc = {
        "sf_dir": sf_dir,
        "engine": f"duckdb {duckdb.__version__}",
        "threads": threads or "default(all cores)",
        "passes": passes,
        "methodology": "warm pass + min of timed passes, fetchall()",
        "total_sec": round(total, 3),
        "n": len(out),
        "failed": sum(1 for v in out.values() if v is None),
        "queries": out,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
    print(f"\ntotal {total:.2f}s over {len(out)} queries "
          f"({doc['failed']} failed) -> {out_path or 'stdout only'}")
    return doc


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    orc = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    dst = sys.argv[3] if len(sys.argv) > 3 else None
    n_passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    run(sf, orc, dst, passes=n_passes)
