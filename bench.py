"""Benchmark harness — prints ONE JSON line per the driver contract.

Two parts:
1. Headline analytics queries (the oracle battery's heavier members) at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
   local[$SPARK_GRAFT_CPUS]: per-query seconds in "queries".
2. The north-star metric: compaction + Z-order rewrite throughput (GB/s and
   sequences/s) over a deterministic synthetic `sequences` table, run at TWO
   parallelism levels — local[N] and local[4N] on IDENTICAL input — and the
   scaling efficiency (throughput_4N / throughput_N) / 4 (see BASELINE.md:
   the sandbox stand-in for the two-cluster-size criterion).

The target file size is scaled down so the bench table's hot partition still
produces many write tasks — the same task-count geometry a 512MB target
yields at 100TB.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1500000"))
# tmpfs by default: this sandbox's virtio disk is slow and its async
# writeback bleeds across runs (observed 10× wall-time variance); RAM is the
# honest medium for a CPU-scaling measurement
_DEFAULT_BENCH_DIR = "/dev/shm/octocode_bench" if os.path.isdir("/dev/shm") else "/tmp/octocode_bench"
BENCH_DIR = os.environ.get("SPARK_GRAFT_BENCH_DIR", _DEFAULT_BENCH_DIR)

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q06_top3_orders_per_customer",
    "q07_cumulative_quantity",
    "q08_weighted_rrf_users",
    "q16_ngram_jaccard_pairs",
    "q17_cosine_topk",
    "q19_asof_last_click_before_purchase",
    "q21_events_within_hour_after_purchase",
    "q26_minhash_signatures",
    "q27_simhash_values",
]


def _spark(cores: int):
    from octocode_spark import get_spark

    # Scan-split geometry must scale with the bench's shrunken file targets:
    # at 100TB/512MB files the default 128MB splits give ~1000s of tasks per
    # partition; here the whole table is ~GBs, so 128MB splits would collapse
    # each partition's pipeline to 1-2 tasks and idle every core past ~8.
    # heap sized for 32 concurrent parquet writers of array<int> rows: at 8g
    # the 32-core run loses ~35% of its wall time to GC (measured)
    s = get_spark(
        app=f"bench-{cores}", cpus=cores, shuffle_partitions=max(cores, 8),
        driver_memory="64g",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1 * 1024 * 1024),
            "spark.local.dir": os.path.join(BENCH_DIR, "spark-local"),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_queries(spark) -> dict[str, float]:
    from octocode_spark.queries import queries

    qs = queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        # noop sink forces FULL execution (count() would let Catalyst prune
        # the computed columns and under-report)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


INPUT_FILES = 96          # fixed: identical input layout at every parallelism
TARGET_FILE_SIZE = 12 * 1024 * 1024  # fixed: identical output geometry


def build_input(tag: str) -> str:
    """Generate the bench table once (deterministic), at a fixed parallelism
    so every measured run sees bitwise-identical input."""
    from octocode_spark.datagen import sequences
    from octocode_spark.lakehouse import LakeTable

    root = os.path.join(BENCH_DIR, f"sequences-{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(BENCH_DIR, exist_ok=True)
    spark = _spark(CPUS)
    try:
        df = sequences(spark, BENCH_ROWS, max_tok_cap=2048)
        t = LakeTable.create(root, df.schema, partition_by=["source"], stat_cols=["n_tok", "doc_id"])
        # the small-files problem: one logical append fragmented into many files
        t.append(df.repartition(INPUT_FILES))
    finally:
        spark.stop()
    return root


def _burn(n):
    import hashlib

    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def hw_ceiling() -> dict:
    """Calibrate what THIS host's CPUs can scale to, independent of Spark:
    the sandbox VM shows all-core turbo/quota throttling (measured ~2.9×
    from 8→32 procs on pure hashing), so software efficiency is reported
    both raw and normalized against this ceiling."""
    import multiprocessing as mp

    out = {}
    small = max(CPUS // 4, 2)
    for procs in (small, CPUS):
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(_burn, [300000] * procs)
            best = max(best, procs * 300000 / (time.time() - t0) / 1e6)
        out[procs] = round(best, 2)
    out["ratio"] = round(out[CPUS] / out[small], 3)
    return out


def maintenance_run(cores: int, input_root: str, tag: str, cluster_by: str | None = "zorder",
                    repeats: int = 3) -> dict:
    """Fresh session at `cores`; identical input copies; one warmup rewrite
    (JIT/codegen steady state) then best-of-``repeats`` timed runs of the
    full compaction + Z-order clustered rewrite (single global scan+shuffle,
    per-partition atomic commits + ledger rows)."""
    from octocode_spark.lakehouse import LakeTable, Ledger
    from octocode_spark.lakehouse.maintenance import plan_compaction, rewrite_global

    spark = _spark(cores)
    try:
        def one(i: int, timed: bool):
            root = os.path.join(BENCH_DIR, f"run-{tag}-{i}")
            shutil.rmtree(root, ignore_errors=True)
            shutil.copytree(input_root, root)
            t = LakeTable.load(root)
            ledger = Ledger(os.path.join(BENCH_DIR, f"ledger-{tag}"))
            ledger.clear()
            plan = plan_compaction(t, target_file_size=TARGET_FILE_SIZE)
            t0 = time.monotonic()
            res = rewrite_global(spark, t, plan, ledger=ledger, cluster_by=cluster_by)
            secs = time.monotonic() - t0
            shutil.rmtree(root, ignore_errors=True)
            return secs, res

        one(0, timed=False)  # warmup
        best_secs, best_res = None, None
        for i in range(1, repeats + 1):
            secs, res = one(i, timed=True)
            if best_secs is None or secs < best_secs:
                best_secs, best_res = secs, res
        gb = best_res.bytes_in / 1e9
        return {
            "cores": cores,
            "seconds": round(best_secs, 3),
            "bytes_in": best_res.bytes_in,
            "rows": best_res.rows,
            "files_in": best_res.files_in,
            "files_out": best_res.files_out,
            "gb_per_sec": round(gb / best_secs, 4),
            "seq_per_sec": round(best_res.rows / best_secs, 1),
            "partitions": len(best_res.partitions_done),
        }
    finally:
        spark.stop()


def main() -> None:
    hw = hw_ceiling()
    # Part 2 first (it restarts sessions); small cluster then big
    small_cores = max(CPUS // 4, 2)
    input_root = build_input("input")
    m_small = maintenance_run(small_cores, input_root, f"n{small_cores}")
    m_big = maintenance_run(CPUS, input_root, f"n{CPUS}")
    shutil.rmtree(input_root, ignore_errors=True)
    ratio = m_big["gb_per_sec"] / m_small["gb_per_sec"]
    efficiency = ratio / (CPUS / small_cores)
    # normalized: how much of the HOST's own 8→32 scaling ceiling we capture
    # (this VM throttles all-core turbo; pure-CPU hashing only scales ~2.9×/4)
    eff_normalized = ratio / hw["ratio"] if hw.get("ratio") else None

    spark = _spark(CPUS)
    try:
        t0 = time.monotonic()
        queries = run_queries(spark)
        total = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()

    print(json.dumps({
        "metric": "maintenance+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1 if "sf0.1" in SF_DIR else SF_DIR,
        "maintenance": {
            "task": "bin-pack compaction + Z-order clustered rewrite (sequences table)",
            "rows": BENCH_ROWS,
            f"local[{small_cores}]": m_small,
            f"local[{CPUS}]": m_big,
            "speedup_Nto4N": round(ratio, 3),
            "scaling_efficiency_raw": round(efficiency, 3),
            "hw_cpu_ceiling_mhash": hw,
            "scaling_efficiency_vs_hw_ceiling": round(eff_normalized, 3) if eff_normalized else None,
        },
    }))


if __name__ == "__main__":
    main()
