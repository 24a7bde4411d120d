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
# 1M rows (was 1.5M in r3): shorter measured units buy MORE window-paired
# rounds inside the same phase budget — the gate fails when one 20-60s
# rewrite spans a host-weather change, so more/shorter rounds raise the odds
# the median lands on clean windows (round-3 verdict ask #5)
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))
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
    "q26_sketch_signatures",
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


def build_input(tag: str, rows: int | None = None) -> str:
    """Generate the bench table once (deterministic), at a fixed parallelism
    so every measured run sees bitwise-identical input."""
    from octocode_spark.datagen import sequences
    from octocode_spark.lakehouse import LakeTable

    root = os.path.join(BENCH_DIR, f"sequences-{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(BENCH_DIR, exist_ok=True)
    spark = _spark(CPUS)
    try:
        df = sequences(spark, rows or BENCH_ROWS, max_tok_cap=2048)
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


def _membw(n_mb):
    import time as _t

    import numpy as np

    a = np.ones(n_mb * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    t0 = _t.time()
    k = 0
    while _t.time() - t0 < 1.5:
        np.copyto(b, a)
        k += 1
    return k * n_mb * 2 / (_t.time() - t0)  # MB/s (read+write)


def hw_ceiling() -> dict:
    """Calibrate what THIS host's CPUs can scale to, independent of Spark:
    the sandbox VM shows all-core turbo/quota throttling (measured ~2.9×
    from 8→32 procs on pure hashing), so software efficiency is reported
    both raw and normalized against this ceiling."""
    import multiprocessing as mp

    import statistics

    out: dict = {"cpu_mhash": {}, "membw_gbps": {}}
    small = max(CPUS // 4, 2)
    # the host is bimodal (measured 1.5 vs 140+ GB/s bandwidth windows that
    # last minutes) — a ratio is only meaningful when BOTH levels sample the
    # SAME window, so measure back-to-back per round and median the ratios
    cpu_ratios, bw_ratios = [], []
    for _ in range(3):
        cpu, bw = {}, {}
        for procs in (small, CPUS):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(_burn, [300000] * procs)
            cpu[procs] = procs * 300000 / (time.time() - t0) / 1e6
            with mp.Pool(procs) as p:
                bw[procs] = sum(p.map(_membw, [192] * procs)) / 1000
        cpu_ratios.append(cpu[CPUS] / cpu[small])
        bw_ratios.append(bw[CPUS] / bw[small])
        for procs in (small, CPUS):
            out["cpu_mhash"][procs] = round(max(out["cpu_mhash"].get(procs, 0), cpu[procs]), 2)
            out["membw_gbps"][procs] = round(max(out["membw_gbps"].get(procs, 0), bw[procs]), 3)
    out["cpu_ratio"] = round(statistics.median(cpu_ratios), 3)
    out["membw_ratio"] = round(statistics.median(bw_ratios), 3)
    return out


def _one_rewrite(spark, input_root: str, tag: str, cluster_by: str | None):
    from octocode_spark.lakehouse import LakeTable, Ledger
    from octocode_spark.lakehouse.maintenance import plan_compaction, rewrite_global

    root = os.path.join(BENCH_DIR, f"run-{tag}")
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


MAINT_BUDGET_S = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))
STALL_FACTOR = 2.0  # see _valid_rounds in maintenance_interleaved


def _round_cpu_ratio(small: int, big: int, reps: int = 3) -> float:
    """SAME-WINDOW cpu-scaling sample (pure hashing, no Spark): what THIS
    minute's silicon gives going small→big procs. Median of ``reps``
    back-to-back pairs — a single pair is itself one draw from the same
    stall-contaminated distribution as the rewrites (observed: pre/post
    samples of 2.8 and 1.1 bracketing one round), and a corrupted ceiling
    corrupts vs_cpu_ceiling even when the measured pair was clean."""
    import multiprocessing as mp
    import statistics

    ratios = []
    for _ in range(reps):
        ratio = {}
        for procs in (small, big):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(_burn, [200000] * procs)
            ratio[procs] = procs * 200000 / (time.time() - t0)
        ratios.append(ratio[big] / ratio[small])
    return statistics.median(ratios)


# Pre-round admission gate (round-4 verdict ask #2: sample the ceiling FIRST,
# defer the measured pair when the window can't scale): a measured round costs
# 2×(warmup+rewrite) ≈ 30-60s of budget; burning one in a window where even
# pure hashing scales < CLEAN_CPU_RATIO at 4× procs buys a sample the stall
# filter will likely discard anyway. Waiting is BOUNDED (max_wait_s) and spent
# in ~3s probes — when the host never offers a clean window, the round runs
# regardless and the window-paired normalization still tells the truth.
# 2.4, not the nominal 3.0: this host's measured ceiling under normal
# co-tenancy is 2.2-2.9 (BENCH.md) — gating at 3.0 would defer forever and
# spend the phase budget on probes instead of rounds; 2.4 separates the
# collapsed windows (<2, where rounds are stall-filtered anyway) from the
# workable ones.
CLEAN_CPU_RATIO = float(os.environ.get("SPARK_GRAFT_CLEAN_CPU_RATIO", "2.4"))


def _await_clean_window(small: int, big: int, max_wait_s: float = 45.0,
                        poll_sleep_s: float = 4.0) -> float:
    # returns the LAST probe deliberately — it is the weather of the window
    # the measured pair is about to run in, which is what the bracketing
    # ceiling estimate wants (not the best window seen while waiting)
    t0 = time.monotonic()
    while True:
        r = _round_cpu_ratio(small, big, reps=1)  # cheap probe for gating only
        if r >= CLEAN_CPU_RATIO or time.monotonic() - t0 >= max_wait_s:
            return r
        time.sleep(poll_sleep_s)


def maintenance_interleaved(input_root: str, levels: list[int], rounds: int = 3,
                            cluster_by: str | None = "zorder",
                            max_extra_rounds: int = 6,
                            warmup_root: str | None = None) -> tuple[dict[int, dict], dict]:
    """Alternate parallelism levels round-robin so BOTH sample the same host
    window (this VM's effective hardware is bimodal on minute scales — a
    sequential N-then-4N schedule can hand either level a bad window and
    corrupt the ratio). One warmup rewrite per fresh JVM.

    STATISTIC: the N→4N speedup is the MEDIAN of per-round ratios over
    STALL-FREE rounds — each ratio taken from the two ADJACENT same-window
    runs of one round, each round also sampling the host's own cpu-scaling
    ceiling in that same window, and a round discarded (symmetrically, see
    _valid_rounds) when either of its runs took > STALL_FACTOR× that
    level's cross-round minimum. Independent per-level minima (the round-2
    statistic) can pair a clean small-level window with a contended
    big-level one and under-report scaling by 2×; window-paired ratios are
    the only meaningful unit on this host. Per-level minima are still
    reported for absolute throughput.

    If the planned rounds all landed in windows where even the HOST ceiling
    collapsed (cpu ratio < 1.5 at 4× procs), up to ``max_extra_rounds`` more
    rounds are added — bounded persistence. A wall-clock budget
    (MAINT_BUDGET_S) caps the whole phase: in the worst contended windows
    one rewrite has measured 9× its clean-window time."""
    best: dict[int, tuple[float, object]] = {}
    per_round: list[dict] = []
    t_phase = time.monotonic()
    small, big = levels[0], levels[-1]

    def one_round(rnd: int) -> None:
        # SAMPLE-THEN-MEASURE: gate the round on a pre-sampled window (defer
        # while the host can't scale, bounded), then bracket the measured
        # pair with a post sample — the normalizing ceiling is the mean of
        # the two, i.e. the weather the pair actually ran in, not the
        # weather after it ended
        budget_left = MAINT_BUDGET_S - (time.monotonic() - t_phase)
        pre_r = _await_clean_window(small, big, max_wait_s=min(45.0, max(budget_left / 6, 0.0)))
        secs_at: dict[int, float] = {}
        # alternate which level runs first each round: any systematic
        # first-mover effect (page-cache priming, co-tenant drift within the
        # round) then averages out of the median instead of biasing one level
        order = list(levels) if rnd % 2 == 0 else list(reversed(levels))
        for cores in order:
            spark = _spark(cores)
            try:
                # warmup compiles the same codegen paths; a smaller table
                # does that at a fraction of the cost, buying more measured
                # rounds inside the phase budget
                _one_rewrite(spark, warmup_root or input_root, f"w{cores}-{rnd}", cluster_by)
                # TWO measured rewrites per level, keep the round-min: a
                # single sample is one draw from a stall-contaminated
                # distribution (observed: adjacent identical 32-core runs at
                # 7.1s and 21.1s); min-of-2 suppresses one-off intra-round
                # stalls SYMMETRICALLY (both levels get the same treatment),
                # narrowing the per-round ratio without biasing it
                for rep in range(2):
                    secs, res = _one_rewrite(spark, input_root, f"t{cores}-{rnd}r{rep}", cluster_by)
                    if cores not in secs_at or secs < secs_at[cores]:
                        secs_at[cores] = secs
                    if cores not in best or secs < best[cores][0]:
                        best[cores] = (secs, res)
            finally:
                spark.stop()
        post_r = _round_cpu_ratio(small, big)
        cpu_r = (pre_r + post_r) / 2
        ratio = secs_at[small] / secs_at[big]
        per_round.append({
            "round": rnd,
            f"s{small}": round(secs_at[small], 3),
            f"s{big}": round(secs_at[big], 3),
            "speedup": round(ratio, 3),
            "cpu_ratio": round(cpu_r, 3),
            "cpu_ratio_pre": round(pre_r, 3),
            "cpu_ratio_post": round(post_r, 3),
            "vs_cpu_ceiling": round(ratio / cpu_r, 3),
        })

    for rnd in range(rounds):
        one_round(rnd)
        if rnd + 1 < rounds and time.monotonic() - t_phase > MAINT_BUDGET_S:
            break
    def _valid_rounds() -> list[dict]:
        """Symmetric stall filter: a sample running > STALL_FACTOR × its own
        level's cross-round minimum was stalled by the co-tenant (observed:
        27× on one 32-core run minutes after a 12s one). Stalls DEFLATE the
        ratio when they hit the big level and INFLATE it when they hit the
        small level — the rule drops both directions, so it cannot
        cherry-pick. Kept samples are whole window-paired rounds."""
        lo_s = min(r[f"s{small}"] for r in per_round)
        lo_b = min(r[f"s{big}"] for r in per_round)
        return [
            r for r in per_round
            if r[f"s{small}"] <= STALL_FACTOR * lo_s and r[f"s{big}"] <= STALL_FACTOR * lo_b
        ]

    extra = 0
    while (
        extra < max_extra_rounds
        and time.monotonic() - t_phase < MAINT_BUDGET_S
        and (
            max(r["cpu_ratio"] for r in per_round) < 1.5  # every window was dead
            # fewer than 2 stall-free window pairs → the median rests on one
            # sample; buy another round — bounded persistence, the filter
            # and medians stay the statistic
            or len(_valid_rounds()) < 2
        )
    ):
        one_round(len(per_round))
        extra += 1

    import statistics

    valid = _valid_rounds() or per_round
    rounds_stats = {
        "per_round": per_round,
        "rounds_stalled": len(per_round) - len(valid),
        "stall_factor": STALL_FACTOR,
        "speedup_median_of_rounds": round(statistics.median(r["speedup"] for r in valid), 3),
        "cpu_ratio_median_of_rounds": round(statistics.median(r["cpu_ratio"] for r in valid), 3),
        "vs_cpu_ceiling_median_of_rounds": round(
            statistics.median(r["vs_cpu_ceiling"] for r in valid), 3
        ),
    }
    out: dict[int, dict] = {}
    for cores, (secs, res) in best.items():
        gb = res.bytes_in / 1e9
        out[cores] = {
            "cores": cores,
            "seconds": round(secs, 3),
            "bytes_in": res.bytes_in,
            "rows": res.rows,
            "files_in": res.files_in,
            "files_out": res.files_out,
            "gb_per_sec": round(gb / secs, 4),
            "seq_per_sec": round(res.rows / secs, 1),
            "partitions": len(res.partitions_done),
            "phases": dict(res.phases),  # scan+shuffle+write / move / harvest / commit
        }
    return out, rounds_stats


def main() -> None:
    hw = hw_ceiling()
    # Part 2 first (it restarts sessions); levels interleaved per round
    small_cores = max(CPUS // 4, 2)
    input_root = build_input("input")
    warmup_root = build_input("warmup", rows=max(BENCH_ROWS // 8, 50_000))
    levels, rstats = maintenance_interleaved(
        input_root, [small_cores, CPUS], rounds=9, warmup_root=warmup_root
    )
    m_small, m_big = levels[small_cores], levels[CPUS]
    shutil.rmtree(input_root, ignore_errors=True)
    shutil.rmtree(warmup_root, ignore_errors=True)
    # the headline ratio is WINDOW-PAIRED: median of per-round (adjacent
    # same-window) speedups, each normalized by that round's own host cpu
    # ceiling — independent per-level minima can mix windows on this
    # bimodal host and under-report scaling by 2×
    ratio = rstats["speedup_median_of_rounds"]
    efficiency = ratio / (CPUS / small_cores)
    eff_vs_cpu = rstats["vs_cpu_ceiling_median_of_rounds"]
    eff_vs_membw = ratio / hw["membw_ratio"] if hw.get("membw_ratio") else None

    spark = _spark(CPUS)
    try:
        t0 = time.monotonic()
        queries = run_queries(spark)
        total = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()

    # STDOUT CONTRACT (round-3 postmortem): the driver captures only the LAST
    # ~2000 chars of stdout — r3's one-line JSON carried full per-round/
    # per-phase detail, overflowed the capture, and the round lost its
    # machine-readable bench record (`parsed: null`). The headline line stays
    # compact (hard-guarded < 1900 chars); everything else goes to
    # BENCH_DETAIL.json next to this script.
    detail = {
        "rows": BENCH_ROWS,
        "input_files": INPUT_FILES,
        "target_file_size": TARGET_FILE_SIZE,
        f"local[{small_cores}]": m_small,
        f"local[{CPUS}]": m_big,
        "scaling_rounds": rstats,
        "hw_ceilings": hw,
        "scaling_efficiency_vs_membw_ceiling": round(eff_vs_membw, 3) if eff_vs_membw else None,
        "queries": queries,
    }
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    def _level_brief(m: dict) -> dict:
        return {k: m[k] for k in ("seconds", "gb_per_sec", "seq_per_sec", "files_in", "files_out")}

    headline = {
        "metric": "maintenance+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1 if "sf0.1" in SF_DIR else SF_DIR,
        "maintenance": {
            "task": "bin-pack compaction + Z-order clustered rewrite (sequences table)",
            "rows": BENCH_ROWS,
            f"local[{small_cores}]": _level_brief(m_small),
            f"local[{CPUS}]": _level_brief(m_big),
            "speedup_Nto4N": round(ratio, 3),
            "scaling_efficiency_raw": round(efficiency, 3),
            "scaling_efficiency_vs_cpu_ceiling": round(eff_vs_cpu, 3) if eff_vs_cpu else None,
            "rounds": len(rstats["per_round"]),
            "rounds_stalled": rstats["rounds_stalled"],
            "detail": "BENCH_DETAIL.json",
        },
    }
    line = json.dumps(headline)
    if len(line) > 1900:  # belt-and-braces: never overflow the capture again
        headline.pop("queries")
        headline["queries_in"] = "BENCH_DETAIL.json"
        line = json.dumps(headline)
    print(line)


if __name__ == "__main__":
    main()
