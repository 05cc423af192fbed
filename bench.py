"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

Headline = flagship image dedup (signatures -> LSH -> verified pairs ->
clusters) on the deterministic synthetic image+caption fixture
(BENCH_ROWS rows, cached under /tmp), reporting images/sec as well.
The headline is the MEDIAN of GRAFT_FLAGSHIP_RUNS (default 3) in-process
runs, with a concurrently measured pure-CPU parallel-speedup sample
recorded alongside (host tenancy context — VERDICT r3 item 2).

--scaling: runs bench.py twice in FRESH processes at num_cpus=8 and 32
on the same input (the sandbox substitute for the north rule's N vs 4N
node clusters), prints both throughputs + scaling efficiency, and
records the result in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "50000"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# representative per-operator queries timed over the sf dir
BENCH_QUERIES = [
    "exact_dedup_docs",
    "incremental_neardup_semijoin",
    "hll_distinct_docs",
    "tfidf_top_terms",
    "windowed_chunk_embed",
    "cdc_chunk_index",
    "fixed_chunk_histogram",
    "token_counts",
    "dup_ratio_by_source",
    "events_window_agg",
    "orders_by_segment",
    "ann_topk",
    "semantic_dedup",
    "minhash_doc_pairs",
    "doc_clusters",
    "substring_dup_pairs",
    "audio_features",
    "video_frame_stats",
]


def consume(res) -> int:
    """Consume a Dataset/DataFrame/Table without materializing extras."""
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.count()
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hmse_ray.util import tune_data_context

    tune_data_context(NCPU)
    from hmse_ray.config import DEFAULT_CONFIG as cfg
    from hmse_ray.pipelines import dedup
    from hmse_ray.pipelines.queries import QUERIES
    from hmse_ray.sources import fixtures

    # fixture is cached on disk; generate before timing (one untimed read
    # warms the page cache per the measurement protocol)
    fdir = fixtures.fixture_dir(BENCH_ROWS, seed=42)
    _ = dedup.read_images(fdir + "/images").count()

    # The headline is the MEDIAN of n flagship runs (default 3 — VERDICT
    # r3 item 2: a single sample on this shared VM measured anywhere in a
    # 1.5-2x band and round-over-round deltas were unattributable), with
    # a concurrent pure-CPU burn ceiling recorded next to it so a slow
    # headline can be pinned to host tenancy instead of guessed at.
    # Scaling legs set GRAFT_FLAGSHIP_RUNS=1 (their protocol medians over
    # whole lo/hi pairs already).
    n_flag = int(os.environ.get("GRAFT_FLAGSHIP_RUNS", "3"))
    walls = []
    n_images = 0
    clusters = None
    for i in range(n_flag):
        t0 = time.time()
        # pass the PATH, not a Dataset: each branch then reads only its
        # columns (pushdown) instead of re-reading the full table (bytes
        # included) three times
        clusters = dedup.cluster_assignments(fdir + "/images", cfg)
        if i == n_flag - 1:
            # last run materializes (same execution cost as count on a
            # lazy ds) so the north-metric recall check below does not
            # re-run the pipeline
            clusters = clusters.materialize()
        n_images = clusters.count()
        walls.append(round(time.time() - t0, 3))
    # north metric: dup-pair recall on the fixture's REQUIRED golden
    # pairs (>= 0.99 per the north rule), computed from the last run's
    # assignments — reported every bench so a recall regression is as
    # visible as a slowdown
    import pyarrow.parquet as pq

    gp = pq.read_table(fdir + "/golden_pairs.parquet").to_pandas()
    req = gp[gp.required]
    lbl_df = clusters.to_pandas()
    lbl = dict(zip(lbl_df["image_id"], lbl_df["cluster_id"]))
    dup_pair_recall = (
        sum(lbl[a] == lbl[b] for a, b in zip(req["id_a"], req["id_b"]))
        / max(1, len(req))
    )
    srt = sorted(walls)
    headline = (
        srt[len(srt) // 2]
        if len(srt) % 2
        else round((srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2, 3)
    )
    host_speedup = _host_parallel_speedup(NCPU)
    if "--stats" in sys.argv:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/STATS.txt", "w") as f:
            f.write(clusters.stats())

    queries = {"flagship_dedup": round(headline, 3)}
    # scaling runs skip the per-operator queries: the efficiency metric
    # uses only the flagship wall time
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        # per-query times are MEDIANS of GRAFT_QUERY_RUNS samples (default
        # 3) for the same reason the flagship headline is: single samples
        # on this shared VM drift 1.5-2x and round-over-round per-query
        # deltas were unattributable (VERDICT r3). Sample 1 additionally
        # pays per-process warm-up, so the median is the warm number.
        n_q = int(os.environ.get("GRAFT_QUERY_RUNS", "3"))
        for name in BENCH_QUERIES:
            samples = []
            for _ in range(n_q):
                t0 = time.time()
                consume(QUERIES[name](SF_DIR))
                samples.append(round(time.time() - t0, 3))
            samples.sort()
            queries[name] = (
                samples[len(samples) // 2]
                if len(samples) % 2
                else round((samples[len(samples) // 2 - 1] + samples[len(samples) // 2]) / 2, 3)
            )

    out = {
        "metric": "flagship image dedup wall time (synthetic fixture, "
        f"{BENCH_ROWS} rows) + per-operator query times over {SF_DIR} "
        "(flagship and per-query times are medians of repeated runs)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "bench_rows": BENCH_ROWS,
        "images_per_sec": round(n_images / headline, 1),
        "dup_pair_recall": round(dup_pair_recall, 4),
        "golden_required_pairs": int(len(req)),
        "flagship_runs": walls,
        # effective parallel speedup a pure-CPU burn achieves at NCPU
        # procs RIGHT NOW (vs 1 proc) — the tenancy context for the
        # headline; ~16-18 on this 32-hyperthread/16-core VM when free
        "host_parallel_speedup": host_speedup,
    }
    ray.shutdown()
    return out


def _host_parallel_speedup(n: int) -> float:
    """Concurrently-measured effective cores: wall(1 proc) * n / wall(n
    procs) for a pure-python burn; bounded by physical cores + tenancy."""
    import multiprocessing as mp

    def _wall(k: int) -> float:
        t0 = time.time()
        with mp.Pool(k) as p:
            p.map(_burn, [0] * k)
        return time.time() - t0

    _wall(2)  # warm fork infra
    w1 = min(_wall(1) for _ in range(2))
    wn = min(_wall(n) for _ in range(2))
    return round(w1 * n / wn, 2) if wn else float(n)


def run_scaling() -> dict:
    # The scaling criterion probes the 10^12-row regime where compute
    # dominates; at the default 50k rows fixed per-stage latency (~10s
    # of Ray stage barriers) swamps the parallel work and the ratio
    # measures overhead, not scaling. 200k rows puts the flagship back
    # in the compute-bound regime on this host.
    #
    # --runs R (default 3): the whole lo/hi sequence runs R times and the
    # MEDIAN raw efficiency is the headline (VERDICT r02: a single
    # quiet-host-window best case is not a robust measurement on this
    # shared VM, where identical runs vary 1.5-2x).
    scale_rows = os.environ.get("GRAFT_SCALE_ROWS", "200000")
    n_runs = 3
    if "--runs" in sys.argv:
        n_runs = int(sys.argv[sys.argv.index("--runs") + 1])

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_ROWS=scale_rows,
            GRAFT_SKIP_QUERIES="1", GRAFT_FLAGSHIP_RUNS="1",
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    # This host exposes 32 logical CPUs over ~16 physical cores (measured
    # with a pure-CPU burn: 32 procs reach only ~16x). N vs 4N must stay
    # within physical cores for the comparison to be meaningful -> 4 vs 16.
    lo_n, hi_n = int(os.environ.get("GRAFT_SCALE_LO", "4")), int(os.environ.get("GRAFT_SCALE_HI", "16"))
    runs = []
    for _ in range(n_runs):
        lo = run(lo_n)
        hi = run(hi_n)
        eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
        ceiling = _cpu_ceiling(lo_n, hi_n)
        runs.append(
            {
                f"sec_{lo_n}": lo["value"],
                f"sec_{hi_n}": hi["value"],
                f"images_per_sec_{lo_n}": lo["images_per_sec"],
                f"images_per_sec_{hi_n}": hi["images_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "host_cpu_ceiling": round(ceiling, 3),
                "efficiency_vs_ceiling": round(eff / ceiling, 3),
            }
        )
    effs = sorted(r["scaling_efficiency"] for r in runs)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    res = {
        "metric": f"scaling efficiency, fresh ray.init at num_cpus={lo_n} vs "
        f"{hi_n} (sandbox substitute for N vs 4N nodes); median of {n_runs} runs",
        "median_scaling_efficiency": median_eff,
        "n_runs": n_runs,
        "runs": runs,
        "bench_rows": lo["bench_rows"],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling series ({time.strftime('%Y-%m-%d %H:%M:%S')}), "
            f"protocol declared up front: median of n={n_runs} consecutive "
            f"lo/hi pairs, rows={lo['bench_rows']}\n\n"
            f"**median raw efficiency = {median_eff}** (target >= 0.8)\n\n"
            f"| run | sec@{lo_n} | sec@{hi_n} | eff | cpu ceiling | eff/ceiling |\n"
            f"|---|---|---|---|---|---|\n"
            + "".join(
                f"| {i+1} | {r[f'sec_{lo_n}']} | {r[f'sec_{hi_n}']} | "
                f"{r['scaling_efficiency']} | {r['host_cpu_ceiling']} | "
                f"{r['efficiency_vs_ceiling']} |\n"
                for i, r in enumerate(runs)
            )
        )
    return res


def _cpu_ceiling(lo_n: int, hi_n: int) -> float:
    """Measured upper bound for scaling on THIS host: even an
    embarrassingly parallel pure-python burn cannot exceed this
    (hyperthreads + VM throttling). Used to contextualize the pipeline
    efficiency number, not to replace it."""
    import multiprocessing as mp

    def _wall(n: int) -> float:
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_burn, [0] * n)
        return time.time() - t0

    _wall(2)  # warm up / spin up fork infra
    lo_w = min(_wall(lo_n) for _ in range(2))
    hi_w = min(_wall(hi_n) for _ in range(2))
    # n procs do n work units: throughput ratio / cpu ratio = lo_w/hi_w
    # (1.0 when both walls are equal, i.e. perfect scaling)
    return lo_w / hi_w if hi_w else 1.0


def _burn(_):
    x = 0
    for i in range(6_000_000):
        x += i * i
    return x


def _sustained_ceiling(lo_n: int, hi_n: int, waves: int = 12) -> float:
    """Fixed-WORK ceiling over ~25 s legs: `waves` burn tasks per proc,
    so both legs do identical per-proc work and the wall ratio is 1.0
    under perfect scaling. Distinguishes sustained tenancy from the
    2-second spot samples of _cpu_ceiling, which fit between host
    stalls and systematically overstate what a 10-minute scaling leg
    sees (measured 0.995 spot vs 0.928 sustained in one window,
    BENCH/BASELINE.md 2026-08-19)."""
    import multiprocessing as mp

    def _wall(n: int) -> float:
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_burn, [0] * (n * waves))
        return time.time() - t0

    _wall(2)  # warm fork infra
    lo_w = _wall(lo_n)
    hi_w = _wall(hi_n)
    return lo_w / hi_w if hi_w else 1.0


def run_gate() -> dict:
    """Pre-flight quiet gate for a scaling series launch. PASS requires
    spot ceiling >= 0.95 AND sustained ceiling >= 0.95 AND 1-min load
    < 1 before the poll. The sustained leg is the binding check on this
    host (see _sustained_ceiling)."""
    import statistics

    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    load1 = os.getloadavg()[0]
    spot = [round(_cpu_ceiling(lo_n, hi_n), 3) for _ in range(5)]
    spot_med = statistics.median(spot)
    sustained = round(_sustained_ceiling(lo_n, hi_n), 3)
    return {
        "metric": f"scaling-launch gate at lo={lo_n} hi={hi_n}",
        "pre_poll_load1": round(load1, 2),
        "spot_ceiling_samples": spot,
        "spot_ceiling_median": spot_med,
        "sustained_ceiling": sustained,
        "gate_pass": bool(load1 < 1.0 and spot_med >= 0.95
                          and sustained >= 0.95),
    }


if __name__ == "__main__":
    if "--gate" in sys.argv:
        print(json.dumps(run_gate()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
