"""Extra measurement harness for the optimization round (guide §1).

NOT part of the frozen driver contract (bench.py is untouched).  This
tool isolates individual declared queries:

  python bench_extra.py time q1 q2 ...     # wall seconds + job/stage counts
  python bench_extra.py plan q1 q2 ...     # write plans/r06/<q>_<tag>.txt
  python bench_extra.py all                # time every HEADLINE query once

Timing methodology mirrors bench.py exactly (same session factory, same
warmup, `.count()` on the declared DataFrame) so numbers are comparable;
`--noop` switches the sink to the noop writer (computes every column).
Set PLAN_TAG=after to write ..._after.txt plan files.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r06")


def _qs():
    import __spark_entry__ as contract
    import bench
    return dict(contract.queries(), **bench._approx_twins())


def _session(extra_conf=None):
    import bench
    if extra_conf:
        from scrapely_spark.spark.session import get_spark
        spark = get_spark("scrapely-spark-bench-extra",
                          master="local[%s]" % CPUS,
                          shuffle_partitions=int(CPUS),
                          extra_conf=extra_conf)
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = bench._session(CPUS, "scrapely-spark-bench-extra")
    bench.warmup(spark)
    return spark


def _extra_conf_from_argv():
    conf = {}
    for a in sys.argv[1:]:
        if a.startswith("--conf="):
            k, v = a.split("=", 2)[1:]
            conf[k] = v
        elif a.startswith("--conf:"):
            k, v = a[len("--conf:"):].split("=", 1)
            conf[k] = v
    return conf or None


def time_queries(names, noop=False, repeats=1):
    qs = _qs()
    spark = _session(_extra_conf_from_argv())
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        for r in range(repeats):
            j0 = tracker.getJobIdsForGroup(None)
            sc.setJobDescription(name)
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.time() - t0
            sc.setJobDescription(None)
            j1 = tracker.getJobIdsForGroup(None)
            rec = {"sec": round(dt, 3), "rows": n,
                   "n_jobs": len(set(j1) - set(j0))}
            out.setdefault(name, []).append(rec)
            print(json.dumps({name: rec}), flush=True)
    spark.stop()
    return out


def plan_queries(names, tag="before"):
    qs = _qs()
    spark = _session()
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(PLAN_DIR, "%s_%s.txt" % (name, tag))
        with open(path, "w") as fh:
            fh.write(txt)
        print("wrote", path, flush=True)
    spark.stop()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    repeats = 1
    for a in sys.argv[1:]:
        if a.startswith("--repeats="):
            repeats = int(a.split("=")[1])
    mode, names = args[0], args[1:]
    if mode == "all":
        import bench
        names = list(bench.HEADLINE)
        out = time_queries(names, noop=noop, repeats=repeats)
        total = sum(v[-1]["sec"] for v in out.values())
        print(json.dumps({"_total_sec": round(total, 3)}))
    elif mode == "time":
        time_queries(names, noop=noop, repeats=repeats)
    elif mode == "plan":
        plan_queries(names, tag=os.environ.get("PLAN_TAG", "before"))
    else:
        raise SystemExit("usage: bench_extra.py {time|plan|all} [names...]")


if __name__ == "__main__":
    main()
