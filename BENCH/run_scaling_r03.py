"""Round-3 pinned N-vs-4N scaling measurement (the north rule's two
cluster-size criterion, evidenced as two taskset-pinned parallelism
levels on one box — see BENCH/BASELINE.md).

Same job, same on-disk corpus at local[4] and local[16], each level's
whole process tree (JVM + Python workers) confined to exactly N cores.
The workload is the seed-list-replay design point the north metric
names: seeds at the datagen maximum (~pages/3), politeness window 900s,
and ``max_rounds`` bounded so every measured round is a large batch —
at a 10^10-URL frontier *every* round is millions of URLs, so the
sandbox's sub-second BFS-drain tail rounds are the unfaithful part of
small-corpus runs, not the big rounds.

Usage:
    python BENCH/run_scaling_r03.py [pages] [hosts] [rounds] [out.json]

Defaults: 12M pages / 160k hosts / 4 rounds, output
BENCH/scaling_r03.json (existing keys in the output file are preserved;
this run's point is merged in).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 160_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    out_path = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaling_r03.json")

    seeds = pages  # datagen caps at ~pages/3 via the stride-3 seed set
    os.environ["SPARK_GRAFT_SCALE_CRAWL_PAGES"] = str(pages)
    os.environ["SPARK_GRAFT_SCALE_CRAWL_HOSTS"] = str(hosts)
    os.environ["SPARK_GRAFT_SCALE_SEEDS"] = str(seeds)
    os.environ["SPARK_GRAFT_SCALE_ROUNDS"] = str(rounds)
    os.environ["SPARK_GRAFT_TRACE_ROUNDS"] = "1"
    # re-read module-level knobs
    bench.SCALE_CRAWL_PAGES = pages
    bench.SCALE_CRAWL_HOSTS = hosts
    bench.SCALE_CRAWL_SEEDS = seeds
    bench.SCALE_CRAWL_ROUNDS = rounds

    shared = tempfile.mkdtemp(prefix="scaling-r03-")
    corpus = os.path.join(shared, "pages")
    print("datagen %d pages / %d hosts -> %s" % (pages, hosts, corpus),
          flush=True)
    boot = bench._session("32", "scaling-r03-datagen")
    t0 = time.time()
    from scrapely_spark.spark import datagen
    datagen.pages_df(boot, pages, hosts).write.parquet(corpus)
    boot.stop()
    print("datagen done in %.0fs" % (time.time() - t0), flush=True)

    point = {
        "workload": {"pages": pages, "hosts": hosts,
                     "seeds_requested": seeds,
                     "max_rounds": rounds,
                     "politeness_round_seconds": 900},
    }
    try:
        for cpus in (bench.SCALE_SMALL, bench.SCALE_LARGE):
            print("running pinned local[%s]..." % cpus, flush=True)
            t0 = time.time()
            r = bench._pinned_level(cpus, "large_crawl", corpus)
            print("local[%s]: %.1fs wall, %.0f urls/s" %
                  (cpus, r["wall_sec"], r["urls_per_sec"]), flush=True)
            point["local[%s]" % cpus] = r
    finally:
        shutil.rmtree(shared, ignore_errors=True)

    factor = int(bench.SCALE_LARGE) / int(bench.SCALE_SMALL)
    small = point["local[%s]" % bench.SCALE_SMALL]
    large = point["local[%s]" % bench.SCALE_LARGE]
    point["efficiency"] = round(
        (large["urls_per_sec"] / small["urls_per_sec"]) / factor, 3)
    print("efficiency %s->%s cores: %.3f" %
          (bench.SCALE_SMALL, bench.SCALE_LARGE, point["efficiency"]),
          flush=True)

    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["pinned_%d_vs_%d_%dM_%dr" % (
        int(bench.SCALE_SMALL), int(bench.SCALE_LARGE),
        pages // 1_000_000, rounds)] = point
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
