"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the harvest pipeline (frontier → fetch ⋈ pages → extract →
fixups → dedup → write) over a deterministic corpus matching the sf
tier, timed end-to-end (session startup + corpus generation excluded);
plus the analytics suite over $SPARK_GRAFT_SF_DIR tables.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_HARVEST_PAGES (override corpus size)
  BENCH_CORPUS_DIR    (reuse a pre-generated corpus parquet)
  BENCH_HARVEST_ONLY  (=1: skip the analytics suite; for scaling runs)
  BENCH_IDLE_GATE     (=0: disable the idle-host gate)
  BENCH_IDLE_THRESH   (1-min loadavg gate threshold, default 3.0)
  BENCH_DRAM_THRESH   (DRAM sweep-probe gate seconds, default 0.012; 0 disables)
  BENCH_IDLE_WAIT_S   (startup gate cap, default 600)
  BENCH_SAMPLE_WAIT_S (inter-sample gate cap, default 120)
  BENCH_CANARY_CORE   (core for the DRAM canary, default last)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _dram_probe(sweeps: int = 3) -> float:
    """Best-of-N strided 128 MB sweep time — the only contention
    signal that sees the NEIGHBOURS on this box: it is a Firecracker
    microVM, so /proc/loadavg counts only our own processes while the
    host's other VMs share the DRAM bus (sweeps measured 0.011 s on a
    quiet bus and 0.06 s under neighbour pressure with our loadavg
    near zero both times). Same kernel as the scaling harness canary;
    min (not median) because our own probe can only be slowed."""
    import numpy as np

    arr = np.arange(4 * 1024 * 1024, dtype=np.uint64)  # 32 MB buffer
    best = float("inf")
    for i in range(sweeps + 1):
        t0 = time.perf_counter()
        for _ in range(4):
            arr[::8].sum()
        if i:  # first sweep warms the buffer (page faults)
            best = min(best, time.perf_counter() - t0)
    return best


def _wait_for_probe(dram_thresh: float, max_wait_s: float) -> float:
    """Probe-only gate for BETWEEN-query re-arms: mid-suite our OWN
    decaying 1-min loadavg sits above any useful threshold, so the
    loadavg term of _wait_for_idle would block until the cap on every
    query. The DRAM sweep sees only the neighbours (our Spark is idle
    between queries; the canary is 0.5% duty-cycle), so it alone
    decides. Returns seconds waited."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if _dram_probe() <= dram_thresh:
            break
        time.sleep(2)
    return round(time.time() - t0, 1)


def _wait_for_idle(thresh: float, max_wait_s: float,
                   dram_thresh: float | None = None) -> float:
    """Idle-host gate (VERDICT r4 #1, ported from tools/bench_scaling):
    neighbour load on this shared VM only ever slows a sample, so the
    timed window starts when the 1-min loadavg drops under ``thresh``
    AND (when ``dram_thresh`` is set) a DRAM sweep probe runs under
    ``dram_thresh`` — loadavg alone is blind to other VMs on the host
    (capped so the benchmark always completes). Returns seconds waited."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if _loadavg() <= thresh and (
            dram_thresh is None or _dram_probe() <= dram_thresh
        ):
            break
        time.sleep(10)
    return round(time.time() - t0, 1)


_CANARY_SRC = """
import time
import numpy as np
arr = np.arange(4 * 1024 * 1024, dtype=np.uint64)   # 32 MB buffer
while True:
    t0 = time.perf_counter()
    for _ in range(4):
        arr[::8].sum()                              # touch every cache line
    print(f"{time.perf_counter() - t0:.6f}", flush=True)
    time.sleep(3)
"""


class _Canary:
    """Mid-run DRAM-contention probe (same kernel as the scaling
    harness): a ~0.5%-duty-cycle strided 128 MB sweep timed every 3 s
    on one core. bench.py's job is NOT core-pinned, so the sweep time
    mixes the job's own pressure with the neighbours' — it is an
    ANNOTATION for cross-pass comparison (which pass was contended),
    not an estimator filter; min-of-N remains the estimator."""

    def __init__(self, core: int):
        self.proc = subprocess.Popen(
            ["taskset", "-c", str(core), sys.executable, "-c", _CANARY_SRC],
            stdout=subprocess.PIPE, text=True,
        )

    def stop(self) -> float | None:
        self.proc.terminate()
        try:
            out, _ = self.proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            self.proc.kill()
            out, _ = self.proc.communicate()
        dts = [float(l) for l in out.strip().splitlines()[1:] if l.strip()]
        return round(statistics.median(dts), 6) if dts else None


def _scratch_base() -> str:
    """Scratch filesystem for bench working state (corpus, lakes,
    Spark local dirs). Prefers tmpfs: this box is a microVM whose
    default tempdir rides a shared virtio disk — create+fsync+rename
    measured 25 µs/file on /dev/shm vs 0.9–40 ms on /tmp depending on
    neighbour pressure, and that axis (not our plans) contaminated the
    r4/r5 artifacts (BENCH/ATTEMPTS.md: identical-code harvests 8.0 s
    vs 82.6 s back-to-back). The engine under test is unchanged; this
    pins the benchmark's storage substrate so wall times measure OUR
    plans, not the neighbours' fsyncs — the same reasoning as the
    idle gate, applied to the I/O axis. Override with
    BENCH_SCRATCH_DIR; falls back to the default tempdir when tmpfs
    is absent or has <16 GB free (sf0.1 working state is ~1 GB)."""
    env = os.environ.get("BENCH_SCRATCH_DIR")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if (os.access(shm, os.W_OK)
                and st.f_bavail * st.f_frsize >= 16 * 1024 ** 3):
            return shm
    except OSError:
        pass
    return tempfile.gettempdir()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default 24 threads, not 32: the sandbox shares its host (~7 cores
    # of steady neighbour load, see BENCH/BASELINE.md); measured peak
    # throughput is at ~24 (8: 28.7k, 16: 33.2k, 24: 38.3k, 32: 31.8k
    # units/s). An explicit SPARK_GRAFT_CPUS always wins.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS",
                              str(min(24, os.cpu_count() or 24))))
    sf = _sf_of(sf_dir)
    # default 100k pages at sf0.1: big enough that the timed phase is
    # dominated by per-page work, not job-scheduling fixed costs
    n_pages = int(os.environ.get("BENCH_HARVEST_PAGES", str(int(sf * 1_000_000))))
    harvest_only = os.environ.get("BENCH_HARVEST_ONLY") == "1"

    # idle-gate the whole timed window once up front (VERDICT r4 #1);
    # per-pass gates below re-arm between interleaved passes. The
    # threshold leaves headroom for our own decaying 1-min loadavg.
    gate_on = os.environ.get("BENCH_IDLE_GATE", "1") == "1"
    idle_thresh = float(os.environ.get("BENCH_IDLE_THRESH", "3.0"))
    idle_wait = float(os.environ.get("BENCH_IDLE_WAIT_S", "600"))
    dram_thresh = float(os.environ.get("BENCH_DRAM_THRESH", "0.012")) or None
    gate_waits: list[float] = []
    if gate_on:
        gate_waits.append(_wait_for_idle(idle_thresh, idle_wait, dram_thresh))
    canary_core = int(os.environ.get("BENCH_CANARY_CORE",
                                     str((os.cpu_count() or 32) - 1)))

    from gleaner_spark.session import build_session

    # all bench writes (corpus, per-run lakes, shuffle/spill) go to the
    # pinned scratch filesystem — see _scratch_base
    scratch = _scratch_base()
    spark_local = tempfile.mkdtemp(prefix="gleaner-bench-spark-", dir=scratch)
    os.environ.setdefault("SPARK_LOCAL_DIRS", spark_local)
    # tmpfs holds RAM until deleted — sweep every scratch dir this run
    # creates even on a crash path (SIGTERM included: atexit only runs
    # on normal interpreter exit, so route the signal through exit)
    import atexit
    import signal

    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    atexit.register(shutil.rmtree, spark_local, ignore_errors=True)

    spark = build_session("gleaner-bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # ---------------- harvest headline ----------------
    from gleaner_spark.plans.lake import Lake
    from gleaner_spark.plans.pipeline import run_harvest
    from gleaner_spark.sources import corpus

    corpus_dir = os.environ.get("BENCH_CORPUS_DIR")
    if corpus_dir and os.path.isdir(corpus_dir):
        pages = spark.read.parquet(corpus_dir)
    else:
        pages = corpus.build_pages(spark, n_pages, partitions=max(cpus * 2, 16))
        tmp_corpus = tempfile.mkdtemp(prefix="gleaner-bench-corpus-", dir=scratch)
        atexit.register(shutil.rmtree, tmp_corpus, ignore_errors=True)
        pages.write.mode("overwrite").parquet(tmp_corpus)
        pages = spark.read.parquet(tmp_corpus)
    sitemaps = corpus.build_sitemaps(n_pages)
    robots = corpus.build_robots()
    sources = corpus.build_sources()

    # warm the session (codegen, committer paths) and pre-fork one
    # python worker per core with the kernel modules imported, so the
    # timed region measures the job, not JVM/daemon/worker startup —
    # at production scale worker startup amortizes to zero
    pages.limit(64).count()
    warm_dir = tempfile.mkdtemp(prefix="gleaner-bench-warm-", dir=scratch)
    atexit.register(shutil.rmtree, warm_dir, ignore_errors=True)
    spark.createDataFrame([(1, "w")], "x long, s string").write.mode(
        "overwrite"
    ).parquet(warm_dir)
    corpus.build_pages(spark, 64, partitions=max(2 * cpus, 8)).count()

    def _warm(batches):
        import pandas as _pd

        from gleaner_spark.core import extract as _ex
        from gleaner_spark.core import fixups as _fx
        from gleaner_spark.core import identifier as _id  # noqa: F401
        from gleaner_spark.core.prov import prov_graph as _pg  # noqa: F401

        for pdf in batches:
            _fx.process_json('{"@context":"http://schema.org/","@type":"Dataset","@id":"x"}')
            _ex.find_jsonld_in_page("u", "text/html", b"<html></html>")
            time.sleep(0.25)  # hold the slot so every core forks a worker
            yield _pd.DataFrame({"id": pdf["id"]})

    spark.range(0, 4 * cpus, 1, 4 * cpus).mapInPandas(_warm, "id long").count()

    # harvest headline: best of BENCH_HARVEST_RUNS fresh-lake runs
    # (default 5 — same min-of-N reasoning as the suite; raised from 3
    # after the host's I/O-latency variance widened to ~10× between
    # back-to-back identical runs, see BENCH/ATTEMPTS.md round 4; the
    # scaling harness pins 1, interleaving min-of-N across rounds)
    n_hruns = max(1, int(os.environ.get("BENCH_HARVEST_RUNS", "5")))
    sample_wait = float(os.environ.get("BENCH_SAMPLE_WAIT_S", "120"))
    best = None
    hloads = []
    hcanary = []
    hsamples: list[float] = []
    htimings: list[dict] = []
    # adaptive budget: same one-sided-min reasoning as the suite —
    # if the two fastest harvest phases disagree by >15% the min is
    # probably still contaminated, take extra gated runs (bounded).
    hruns_max = max(n_hruns, int(os.environ.get("BENCH_HARVEST_RUNS_MAX", "7")))
    i = 0
    def _harvest_needs_more() -> bool:
        if i < n_hruns:
            return True
        if i >= hruns_max:
            return False
        if len(hsamples) < 2:  # single-run mode (scaling harness): no
            return False       # disagreement test possible, stop here
        s = sorted(hsamples)
        if s[1] > 1.15 * s[0]:
            return True  # two fastest draws disagree → min contaminated
        # two draws can CONCORDANTLY land in the same contended window
        # (both slow together); only accept the stop when the best
        # draw's mid-run canary says its window was actually quiet
        bi = hsamples.index(s[0])
        c = hcanary[bi]
        return c is not None and dram_thresh is not None and c > 1.5 * dram_thresh

    while _harvest_needs_more():
        if gate_on and i > 0:  # run 0 is covered by the startup gate
            gate_waits.append(_wait_for_idle(idle_thresh, sample_wait, dram_thresh))
        hloads.append(_loadavg())
        canary = _Canary(canary_core)
        lake_dir = tempfile.mkdtemp(prefix="gleaner-bench-lake-", dir=scratch)
        atexit.register(shutil.rmtree, lake_dir, ignore_errors=True)
        t0 = time.time()
        r = run_harvest(
            spark, Lake(lake_dir), sources, pages, sitemaps, robots,
            run_id="bench", run_date="2024-01-01",
        )
        t = time.time() - t0
        hcanary.append(canary.stop())
        hsamples.append(r.timings["harvest"])
        htimings.append(dict(r.timings, _total=t))
        if best is None or r.timings["harvest"] < best[0].timings["harvest"]:
            if best is not None:
                shutil.rmtree(best[2], ignore_errors=True)
            best = (r, t, lake_dir)
        else:
            shutil.rmtree(lake_dir, ignore_errors=True)
        i += 1
    res, total_s, lake_dir = best
    extra["harvest_runs"] = len(hsamples)
    extra["harvest_samples"] = [round(s, 3) for s in hsamples]
    extra["harvest_loadavg_pre"] = hloads
    extra["harvest_canary_dt"] = hcanary
    # the BASELINE.json metric is fetch+extract throughput over an
    # existing frontier (at CC scale the 10^10-URL frontier is a
    # persisted table, not rebuilt per run) → rate uses the harvest
    # phase; seed-list/frontier build is reported alongside.
    phase_s = res.timings["harvest"]
    # per-key MIN across runs: every reported timing is a min-of-N
    # estimator in its own right — riding the run that won the
    # harvest key would charge frontier/phase2 with that run's noise
    # (frontier and fetch are separate jobs; their noise draws are
    # independent)
    def _min_of(key: str) -> float:
        vals = [ht[key] for ht in htimings if key in ht]
        return round(min(vals), 3)

    for k in htimings[0]:
        # sketch_bg is the OVERLAPPED bloom-build duration (it runs
        # behind metrics+prov; its wall-clock contribution is the
        # snap_count join wait) — summing it into the headline would
        # double-count time the overlap removed, so report it as an
        # annotation instead
        if k.startswith("phase2.") and k != "phase2.sketch_bg":
            timings[k] = _min_of(k)
    if any("phase2.sketch_bg" in ht for ht in htimings):
        extra["sketch_bg_overlapped_s"] = _min_of("phase2.sketch_bg")
    timings["harvest"] = round(phase_s, 3)
    timings["harvest_total_with_frontier"] = _min_of("_total")
    timings["frontier_build"] = _min_of("frontier")
    work_units = res.fetched + res.extracted  # URLs fetched + docs extracted
    extra["harvest_pages"] = n_pages
    extra["harvest_fetched"] = res.fetched
    extra["harvest_docs"] = res.extracted
    extra["docs_per_sec"] = round(work_units / phase_s, 1)

    # byte-identical extraction pass rate (BASELINE.json per-row
    # invariant): sample harvested documents vs the reference-exact
    # driver-side extraction+fixup of the same pages
    from pyspark.sql import functions as F

    from gleaner_spark.core import fixups as fx
    from gleaner_spark.plans.pipeline import read_documents

    docs_df = read_documents(spark, Lake(lake_dir))
    step = max(1, n_pages // 500)
    sample_idx = list(range(0, n_pages, step))
    expected: dict[str, list[str]] = {}
    for i in sample_idx:
        u = corpus.url_for(i)
        expected[u] = [
            fx.process_json(d)[0] for d in corpus.expected_documents_for_page(i)
        ]
    rows = (
        docs_df.filter(F.col("url").isin(list(expected)))
        .select("url", "jsonld")
        .collect()
    )
    matched = sum(1 for r in rows if r["jsonld"] in expected.get(r["url"], []))
    extra["byte_identity_sampled"] = len(rows)
    extra["byte_identical_rate"] = round(matched / max(len(rows), 1), 4)
    shutil.rmtree(lake_dir, ignore_errors=True)

    # ---------------- analytics suite ----------------
    # De-noised protocol (VERDICT r2 #6): the host is a shared VM, so
    # single-shot per-query wall times confound code changes with
    # neighbour load (identical jobs measured 17.8k vs 34.2k u/s in
    # round 2). The suite runs BENCH_SUITE_RUNS (default 3) interleaved
    # passes; per query the reported number is the BEST (neighbour load
    # only ever slows a run — timeit's min-of-N reasoning) with the
    # median alongside, plus the pre-pass loadavg for auditability.
    if not harvest_only:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        suite = [
            "tpch_pricing", "fetch_join", "events_sessionize", "events_tumbling",
            "dedup_exact", "dedup_ngram", "dedup_ngram_capped", "dedup_minhash",
            "dedup_simhash", "embedding_neardup", "ann_topk", "ann_lsh", "ann_ivf",
            "text_langid", "text_quality", "text_tokens", "text_fingerprint",
            "politeness_window", "dedup_antijoin", "metrics_agg",
            "multimodal_features",
        ]
        n_runs = int(os.environ.get("BENCH_SUITE_RUNS", "3"))
        query_gate_s = 0.0
        samples: dict[str, list[float]] = {name: [] for name in suite}
        qloads: dict[str, list[float]] = {name: [] for name in suite}
        loads = []
        pass_canary = []
        for p in range(n_runs):
            if gate_on and p > 0:  # pass 0 rides the harvest's window
                gate_waits.append(_wait_for_idle(idle_thresh, sample_wait, dram_thresh))
            loads.append(_loadavg())
            canary = _Canary(canary_core)
            for name in suite:
                if gate_on and dram_thresh:
                    # per-query probe-only re-arm (VERDICT r4 #1): a
                    # neighbour burst arriving MID-pass otherwise
                    # contaminates every remaining sample of the pass
                    # (r4's artifact of record). Cheap (~0.05 s when
                    # quiet), capped so a busy hour can't stall the
                    # suite (21 queries × 20 s worst case).
                    query_gate_s += _wait_for_probe(dram_thresh, 20)
                qloads[name].append(round(_loadavg(), 2))
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                samples[name].append(time.time() - t0)
            pass_canary.append(canary.stop())
        # adaptive retries: the reported number is a MIN, so its error
        # is one-sided — if the two fastest draws of a query disagree
        # by >15% the min itself is probably still contaminated (a
        # neighbour burst can span a whole pass). Give those queries
        # extra gated draws, bounded at 5 total per query.
        retry_cap = int(os.environ.get("BENCH_QUERY_DRAWS_MAX", "5"))
        for name in suite:
            while len(samples[name]) < retry_cap:
                s = sorted(samples[name])
                if len(s) >= 2 and s[1] <= 1.15 * s[0]:
                    break
                if gate_on and dram_thresh:
                    query_gate_s += _wait_for_probe(dram_thresh, 20)
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                samples[name].append(time.time() - t0)
        for name in suite:
            timings[name] = round(min(samples[name]), 3)
        # round-5 additions measured OUTSIDE the headline sum: the
        # suite list (and therefore "value") stays composition-stable
        # across rounds; one gated draw each, reported separately
        xq = {}
        for name in ("dedup_components", "text_topk_ngrams", "text_boilerplate",
                     "corpus_split", "corpus_sample", "corpus_pack",
                     "text_redact", "corpus_rollup", "decontaminate",
                     "text_repetition", "corpus_resample",
                     "corpus_token_budget", "corpus_shuffle", "url_filter",
                     "span_dedup", "text_nll", "text_tf_embed", "url_index",
                     "crawl_diff", "host_stats", "host_rank",
                     "anchor_texts", "domain_graph", "text_nb",
                     "recrawl_priority", "text_bpe_tokens",
                     "recrawl_lastmod"):
            if name not in qs:
                continue
            if gate_on and dram_thresh:
                query_gate_s += _wait_for_probe(dram_thresh, 20)
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            xq[name] = round(time.time() - t0, 3)
        extra["extra_queries"] = xq
        extra["queries_median"] = {
            name: round(statistics.median(samples[name]), 3) for name in suite
        }
        # per-query pre-run loadavg per pass (VERDICT r4 #7): lets a
        # cross-round comparison exclude contended draws mechanically
        extra["queries_loadavg_pre"] = qloads
        extra["suite_runs"] = n_runs
        extra["suite_loadavg_pre"] = loads
        extra["suite_canary_dt"] = pass_canary
        extra["query_gate_waited_s"] = round(query_gate_s, 1)

    out = {
        "metric": "harvest+analytics suite wall time (docs_per_sec = URLs fetched + JSON-LD docs extracted per second in the harvest phase; suite timings = best of suite_runs interleaved passes, medians in queries_median)",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extra,
        "cpus": cpus,
        "idle_gate": {
            "enabled": gate_on, "thresh": idle_thresh,
            "waited_s": gate_waits,
        },
    }
    print(json.dumps(out))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
