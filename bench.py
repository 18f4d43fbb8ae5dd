"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced through a noop sink (full materialization of every
column, no collect-to-driver cost, no count()-style projection pruning that
would let Spark skip the work being measured).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative slice of the operator inventory: scan/agg, multiway join,
# window, sessionization, fuzzy dedup, vector search, text analysis, and
# the zip-explode pipeline itself.
HEADLINE = [
    "q1_pricing_summary",
    "filter_pushdown_project",
    "join_broadcast_dim",
    "join_multiway_q5",
    "window_rank_topn",
    "events_sessionize",
    "join_asof_last_click",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_stats",
    "doc_fingerprint",
    "zip_explode_hash",
    "stream_tumbling_window",
]

# Registry-heaviest keys (~35-45 s each at sf0.1), measured OUTSIDE the
# headline so their cost trend is driver-recorded every round (VERDICT
# r11 ask #5) without inflating the comparable headline total. Reported
# under "heavy_queries" in the JSON; run FIRST in the session (r13: the
# r12 storms clustered late and steal-marked both samples), min-of-2
# plus bounded retries for keys without a clean sample — a steal-clean
# sample is preferred over a faster contaminated one, since steal only
# inflates. SPARK_GRAFT_SKIP_HEAVY=1 skips them for fast local loops.
HEAVY = [
    "graph_jaccard_linkpred",
    "graph_resource_allocation",
    "graph_adamic_adar",
    # r14: the holdout-split precision@k evaluation — Jaccard-shaped wedge
    # pipeline on the 80% training graph plus a constant-size eval tail.
    "linkpred_precision_at_k",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("zip-to-parquet-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Codegen-heavy plans (128-perm MinHash, 60-bit SimHash) overflow the
        # default ~240 MB JIT code cache; once full the JVM stops compiling
        # and EVERYTHING afterwards runs interpreted at 4-10x cost.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from zip_to_parquet_spark.plans import all_queries
    from zip_to_parquet_spark.plans.zipparity import _zip_fixture_dir

    # Warmup outside the timed region: JVM/codegen/class-loading spin-up,
    # Python-worker + addPyFile shipping for the zipmembers source, and the
    # one-time deterministic zip-fixture build (setup, not operator work —
    # each timed query still does its full scan + compute cold).
    import zipfile as _zf

    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().withColumn(
        "rn", _F.row_number().over(_W.partitionBy("r_name").orderBy("count"))
    ).collect()
    _zip_fixture_dir(sf_dir)
    _warm_zip = "/tmp/z2ps_bench_warm.zip"
    if not os.path.exists(_warm_zip):
        with _zf.ZipFile(_warm_zip, "w") as z:
            z.writestr("warm.txt", b"warmup")
    from zip_to_parquet_spark.sources.zipsource import read_zip_members

    read_zip_members(spark, _warm_zip).count()

    queries = all_queries()

    # Codegen warmup: run every headline query once at the smallest SF.
    # Janino compilation of large expression trees (e.g. the 128-perm
    # MinHash) costs seconds and is cached by generated source — the same
    # plan shape at the target SF then reuses the compiled classes. This is
    # one-time-per-JVM cost, not operator work; data-proportional work is
    # still fully measured below.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        _zip_fixture_dir(warm_sf)
        for name in HEADLINE + HEAVY:
            try:
                queries[name](spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # pragma: no cover - warmup is best-effort
                print(f"  warmup {name} failed: {exc}", file=sys.stderr)

    # Best of three passes per query: this box shows intermittent multi-
    # second interference (hypervisor steal from co-tenant VMs — visible as
    # the 9th /proc/stat field — plus the driver-harness cron); min-of-N is
    # the standard way to report achievable per-query cost. Steal is logged
    # per pass so a contaminated run is diagnosable from the stderr log.
    def _steal() -> float:
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()[1:]
            return int(parts[7]) / 100.0 if len(parts) > 7 else 0.0
        except OSError:  # pragma: no cover - non-Linux fallback
            return 0.0

    def _await_quiet(max_wait: float, probe: float = 10.0) -> None:
        # Measurement hygiene: hold (bounded) for a window where the
        # hypervisor is taking < 1% from us before starting a pass.
        # Steal bursts on this box run minutes-long; starting inside one
        # contaminates every sample of the pass. Bounded so a permanently
        # noisy box still completes — min-of-N then remains an upper bound.
        waited = 0.0
        while waited < max_wait:
            s0 = _steal()
            time.sleep(probe)
            waited += probe
            d = _steal() - s0
            if d < 0.1:
                return
            print(
                f"  waiting for quiet window: steal {d:.1f}s/{probe:.0f}s",
                file=sys.stderr,
            )

    print(f"  load at start: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    # Heavy keys run FIRST (VERDICT r12 ask #3): both r12 heavy samples
    # were steal-marked because the box's storms clustered late in the
    # session — fronting the ~40 s/key section maximizes the odds of a
    # steal-clean driver-visible record. Two passes always (min-of-2, the
    # steady-state policy), plus up to two retry passes ONLY for keys
    # whose recorded minimum is still dirty.
    heavy_timings: dict[str, float] = {}
    heavy_best_clean: dict[str, bool] = {}
    if os.environ.get("SPARK_GRAFT_SKIP_HEAVY") != "1":
        heavy_t0 = time.perf_counter()
        # Up to 8 passes (VERDICT r13 ask #2, was 4): passes 3+ run ONLY
        # for keys still lacking a steal-clean sample — r13 landed one
        # clean heavy row (RA) and left Jaccard/AA dirty-marked with the
        # old 2-retry budget, so the retry ceiling rises while the 600 s
        # wall cap still bounds a hopeless box (a retry pass with one
        # ~40 s key costs ~40 s, so the cap, not the pass count, binds).
        for _pass in range(8):
            if _pass == 2:
                # The retry wall counts from the END of the two mandatory
                # passes: a storm-era pass 0 (r14 measured one at 302 s)
                # must not eat the budget meant for catching a quiet
                # window afterwards.
                heavy_t0 = time.perf_counter()
            if _pass >= 2 and all(heavy_best_clean.get(n) for n in HEAVY):
                break
            # Wall budget: on a hopeless box the retry passes must not
            # starve the headline section (min-of-2 is already recorded).
            if _pass >= 2 and time.perf_counter() - heavy_t0 > 600:
                print("  heavy wall budget reached", file=sys.stderr)
                break
            _await_quiet(max_wait=240.0 if _pass == 0 else 90.0)
            for name in HEAVY:
                if _pass >= 2 and heavy_best_clean.get(name):
                    continue
                s0 = _steal()
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                dirty = _steal() - s0 >= 0.5
                # A clean sample is never displaced by a faster dirty
                # one (steal only inflates — a "faster" dirty sample is
                # variance, and the marker matters more than the ms).
                cur_clean = heavy_best_clean.get(name, False)
                if name not in heavy_timings or (
                    not (dirty and cur_clean)
                    and (
                        dt < heavy_timings[name]
                        or (not dirty and not cur_clean)
                    )
                ):
                    heavy_timings[name] = dt
                    heavy_best_clean[name] = not dirty
                print(
                    f"  heavy{_pass} {name}: {dt:.2f}s"
                    + (" [steal]" if dirty else ""),
                    file=sys.stderr,
                )

    _await_quiet(max_wait=180.0)
    bench_t0 = time.perf_counter()
    timings: dict[str, float] = {}
    best_clean: dict[str, bool] = {}  # was the RECORDED (min) sample clean?
    clean: set[str] = set()
    # Ad-hoc heavy-only sessions (clean-sample hunting between storms)
    # skip the headline loop entirely; the driver never sets this.
    headline_passes = (
        0 if os.environ.get("SPARK_GRAFT_HEAVY_ONLY") == "1" else 10
    )
    for _pass in range(headline_passes):
        # Adaptive pass count: minimum 5 passes; later passes run only
        # while some query still lacks a steal-clean sample (a window
        # where the hypervisor took < 0.5 s from us). Steal can only
        # inflate a timing, so min-of-all-samples is always a valid upper
        # bound — the extra passes just raise the odds of an uncontended
        # sample. A wall budget caps the retrying on a hopeless box.
        # Five, not three: the heavy Arrow-UDF queries (MinHash, GEMM)
        # keep dropping through pass ~3 as JIT tiering and Python-worker
        # reuse converge — a 3-pass min reports pre-steady-state cost
        # (measured: dedup_minhash_lsh 2.33 -> 1.40 s over 5 back-to-back
        # sf0.1 runs on a steal-clean box).
        if _pass >= 5 and len(clean) == len(HEADLINE):
            break
        if _pass >= 5 and time.perf_counter() - bench_t0 > 840:
            print("  wall budget reached; stopping passes", file=sys.stderr)
            break
        if _pass > 0:
            _await_quiet(max_wait=60.0)
        st_pass = _steal()
        for name in HEADLINE:
            fn = queries[name]
            s0 = _steal()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            dirty = _steal() - s0 >= 0.5
            if not dirty:
                clean.add(name)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
                best_clean[name] = not dirty
            print(
                f"  pass{_pass} {name}: {dt:.2f}s"
                + (" [steal]" if dirty else ""),
                file=sys.stderr,
            )
        print(
            f"  pass{_pass} steal: {_steal() - st_pass:.1f}s "
            f"load: {os.getloadavg()[0]:.2f}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # Round-6 lesson: a steal-contaminated headline recorded without a
    # marker makes round-over-round deltas unreadable (+15% on identical
    # code). If ANY recorded per-query minimum came from a dirty window —
    # i.e. the retry loop never caught a quiet sample for it — say so in
    # the JSON itself, not just the stderr tail.
    dirty_queries = sorted(n for n, ok in best_clean.items() if not ok)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if heavy_timings:
        result["heavy_queries"] = heavy_timings
        heavy_dirty = sorted(
            n for n, ok in heavy_best_clean.items() if not ok
        )
        if heavy_dirty:
            result["heavy_dirty_queries"] = heavy_dirty
    if dirty_queries:
        result["noisy"] = True
        result["dirty_queries"] = dirty_queries
        print(
            f"  NOISY RUN: no steal-clean sample for {dirty_queries}",
            file=sys.stderr,
        )
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
