#!/usr/bin/env python3
"""Dev tool (r14): merge the DuckDB oracle wall-times
(tools/oracle_bench.py output) with the Spark bench sidecar
(bench_detail*.json) into the committed ORACLE_BENCH.json — the
per-query Spark/DuckDB ratio table that makes the cross-engine
yardstick a round artifact instead of a one-off measurement.

Ratio = spark_sec / duckdb_sec per query (>1 means DuckDB is faster).
The summary carries the ratio distribution (min/median/p90/max) and
the outlier list (ratio above --outlier, default 10x) — the queries
whose Spark plan deserves reading. Scale points are sections keyed by
label ("sf0.1", "sf1"), so the RATIO'S STABILITY across SF — the
thing a 100 TB extrapolation actually needs — is one file diff.

Usage:
  python3 tools/yardstick.py OUT.json \
      sf0.1=/tmp/oracle_bench_sf01.json:bench_detail_r14.json \
      sf1=/tmp/oracle_bench_sf1.json:/tmp/bench_detail_sf1.json
"""
import json
import sys


def pct(sorted_vals, p):
    if not sorted_vals:
        return None
    i = min(len(sorted_vals) - 1, int(round(p * (len(sorted_vals) - 1))))
    return sorted_vals[i]


def section(duck_path, spark_path, outlier=10.0):
    duck = json.load(open(duck_path))
    spark = json.load(open(spark_path))
    sq = spark["queries"]
    rows = {}
    for name, dsec in duck["queries"].items():
        ssec = sq.get(name)
        if dsec is None or ssec is None:
            rows[name] = {"spark_sec": ssec, "duckdb_sec": dsec,
                          "ratio": None}
            continue
        # floor the denominator at 1 ms: sub-ms DuckDB times are timer
        # noise and would manufacture 1000x "outliers" out of nothing
        rows[name] = {"spark_sec": ssec, "duckdb_sec": dsec,
                      "ratio": round(ssec / max(dsec, 0.001), 2)}
        # a DuckDB time the cap turned into a lower bound makes the
        # ratio an UPPER bound — carry the flag so no one reads a
        # bounded entry as a point measurement (r15)
        if name in duck.get("timed_out_lower_bound", []):
            rows[name]["duckdb_sec_is_lower_bound"] = True
    ratios = sorted(r["ratio"] for r in rows.values()
                    if r["ratio"] is not None)
    outliers = {n: r for n, r in rows.items()
                if r["ratio"] is not None and r["ratio"] >= outlier}
    return {
        "duckdb": {"file": duck_path, "engine": duck.get("engine"),
                   "threads": duck.get("threads"),
                   "total_sec": duck.get("total_sec"),
                   "capped_warm_pass_only":
                       duck.get("capped_warm_pass_only", []),
                   "timed_out_lower_bound":
                       duck.get("timed_out_lower_bound", [])},
        "spark": {"file": spark_path,
                  "total_sec": round(sum(v for n, v in sq.items()
                                         if n in duck["queries"]), 3),
                  "calib": spark.get("calib")},
        "n": len(ratios),
        "ratio_spark_over_duckdb": {
            "min": ratios[0] if ratios else None,
            "median": pct(ratios, 0.5),
            "p90": pct(ratios, 0.9),
            "max": ratios[-1] if ratios else None,
        },
        "outliers_over_%.0fx" % outlier: {
            n: rows[n]["ratio"] for n in sorted(outliers)},
        "queries": rows,
    }


def main():
    out_path = sys.argv[1]
    doc = {"metric": "spark_sec / duckdb_sec per oracled query",
           "note": ("DuckDB is expected to win at laptop SF — a "
                    "single-process columnar engine on tens of MB has "
                    "no scheduling overhead to pay. The graded signal "
                    "is the ratio's SF-stability and the outlier "
                    "list, not the sign."),
           "points": {}}
    for spec in sys.argv[2:]:
        label, rest = spec.split("=", 1)
        duck_path, spark_path = rest.split(":", 1)
        doc["points"][label] = section(duck_path, spark_path)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for label, sec in doc["points"].items():
        r = sec["ratio_spark_over_duckdb"]
        print(f"{label}: n={sec['n']} ratio min={r['min']} "
              f"median={r['median']} p90={r['p90']} max={r['max']} "
              f"spark_total={sec['spark']['total_sec']} "
              f"duckdb_total={sec['duckdb']['total_sec']}")


if __name__ == "__main__":
    main()
