"""Round-4 pinned 2-vs-8 scaling for the EMBEDDING axis (hard-negative
mining), complementing the crawl-axis measurement in scaling_r04.json.

Same protocol as run_scaling_r03.py: one shared on-disk input (sf0.1
embeddings replicated 4x -> 240k vectors so the job dwarfs fixed
session overheads), each level a fresh subprocess whose WHOLE process
tree is taskset-pinned to exactly N cores, shuffle partitions = N.
Metric: anchors ranked per second by simsearch.hard_negatives.

Usage: python BENCH/run_scaling_embed_r04.py [replicas] [out.json]
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def level(cpus: int, corpus: str) -> dict:
    code = (
        "import json, sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[%d]')\n"
        "         .appName('scaling-embed-%d')\n"
        "         .config('spark.sql.shuffle.partitions', '%d')\n"
        "         .config('spark.driver.memory', '16g')\n"
        "         .config('spark.sql.adaptive.enabled', 'true')\n"
        "         .getOrCreate())\n"
        "from scrapely_spark.spark import simsearch\n"
        "emb = spark.read.parquet(%r)\n"
        "planes = simsearch.hyperplanes(64, 16)\n"
        "# warm: JIT + arrow init on a slice\n"
        "simsearch.hard_negatives(emb.limit(2000), k=3,\n"
        "    dup_threshold=0.5, planes=planes).count()\n"
        "t0 = time.time()\n"
        "n = simsearch.hard_negatives(emb, k=3, dup_threshold=0.5,\n"
        "    planes=planes).count()\n"
        "wall = time.time() - t0\n"
        "n_vec = emb.count()\n"
        "print('RESULT ' + json.dumps({'cpus': %d, 'wall_s': round(wall, 2),\n"
        "    'out_rows': n, 'vectors': n_vec,\n"
        "    'vectors_per_sec': round(n_vec / wall, 1)}))\n"
        % (ROOT, cpus, cpus, cpus, corpus, cpus))
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", "0-%d" % (cpus - 1)] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=3600)
    for ln in out.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "BENCH", "scaling_r04.json")
    shared = tempfile.mkdtemp(prefix="scaling-embed-")
    corpus = os.path.join(shared, "emb")
    sys.path.insert(0, ROOT)
    from pyspark.sql import SparkSession, functions as F
    boot = (SparkSession.builder.master("local[32]")
            .appName("scaling-embed-datagen").getOrCreate())
    base = boot.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = base.count()
    parts = [base.select((F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                         "embedding") for i in range(replicas)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.parquet(corpus)
    boot.stop()
    try:
        r2 = level(2, corpus)
        r8 = level(8, corpus)
        eff = round((r8["vectors_per_sec"] / r2["vectors_per_sec"]) / 4,
                    3)
        point = {"protocol": "pinned 2 vs 8, fresh subprocess per "
                             "level, shared on-disk corpus, "
                             "shuffle.partitions = N",
                 "replicas": replicas, "local[2]": r2, "local[8]": r8,
                 "scaling_efficiency_2_to_8": eff}
        data = {}
        if os.path.exists(out_path):
            data = json.load(open(out_path))
        data["embed_hard_negatives_2_vs_8"] = point
        json.dump(data, open(out_path, "w"), indent=2)
        print(json.dumps(point, indent=2))
    finally:
        shutil.rmtree(shared, ignore_errors=True)


if __name__ == "__main__":
    main()
