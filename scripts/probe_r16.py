"""r16 optimization probes (guide §1): isolated per-query timing, conf
A/B (interleaved, one session), bench-order interference, formatted-plan
capture for plans/r16/, and streaming micro-batch decomposition.

Usage:
  python scripts/probe_r16.py plan  <before|after> <query> [query ...]
  python scripts/probe_r16.py time  <query> [query ...]      # count+noop, 3x
  python scripts/probe_r16.py ab    <query> [query ...]      # A=session conf,
        # B=AB_CONF env (JSON dict of spark confs), interleaved ABAB x3
  python scripts/probe_r16.py order <q_first> <q_second>     # interference:
        # 3x (q_second alone) vs 3x (q_first then q_second), interleaved
  python scripts/probe_r16.py mb    <stream query> [query ...]  # listener
        # decomposition of every micro-batch the drain executes

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, AB_CONF.
"""

from __future__ import annotations

import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry  # noqa: E402
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _warmup(spark) -> None:
    # same JVM/worker/HOF warmup as bench.py so timings are comparable
    from pyspark.sql import functions as F

    from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.functions import dedup

    registry.QUERIES["q_ops_by_table_op"](spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    docs64 = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(64)
        .select("doc_id", "text")
    )
    dedup.with_simhash(docs64).agg(F.max("simhash")).collect()
    dedup.minhash_signatures(docs64).agg(F.max("h")).collect()
    spark.catalog.clearCache()


def _run_once(spark, name: str, label: str) -> float:
    spark.sparkContext.setJobDescription(f"{name} {label}")
    t0 = time.perf_counter()
    registry.QUERIES[name](spark, SF_DIR).count()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    mode = sys.argv[1]
    if mode == "plan":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]
    registry.load_all()
    spark = get_spark("probe_r16")
    _warmup(spark)
    out_dir = REPO / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)

    if mode == "plan":
        for name in names:
            df = registry.QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"# wrote plans/r16/{name}_{tag}.txt")
            spark.catalog.clearCache()

    elif mode == "time":
        for name in names:
            for i in range(3):
                dt = _run_once(spark, name, f"count#{i}")
                spark.sparkContext.setJobDescription(f"{name} noop#{i}")
                t1 = time.perf_counter()
                registry.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dn = time.perf_counter() - t1
                spark.catalog.clearCache()
                print(f"# {name} run{i}: count={dt:.3f}s noop={dn:.3f}s", flush=True)

    elif mode == "ab":
        b_conf = json.loads(os.environ.get("AB_CONF", "{}"))
        assert b_conf, "set AB_CONF to a JSON dict of spark confs for the B arm"
        saved = {k: spark.conf.get(k, None) for k in b_conf}
        for name in names:
            a_times, b_times = [], []
            for i in range(3):
                a_times.append(_run_once(spark, name, f"A#{i}"))
                for k, v in b_conf.items():
                    spark.conf.set(k, v)
                try:
                    b_times.append(_run_once(spark, name, f"B#{i}"))
                finally:
                    for k, v in saved.items():
                        if v is None:
                            spark.conf.unset(k)
                        else:
                            spark.conf.set(k, v)
                print(
                    f"# {name} rep{i}: A={a_times[-1]:.3f}s B={b_times[-1]:.3f}s",
                    flush=True,
                )
            ma, mb_ = statistics.median(a_times), statistics.median(b_times)
            print(
                f"## {name}: A_median={ma:.3f}s B_median={mb_:.3f}s "
                f"speedup={ma / mb_:.3f}x",
                flush=True,
            )

    elif mode == "order":
        first, second = names
        alone, after = [], []
        for i in range(3):
            alone.append(_run_once(spark, second, f"alone#{i}"))
            _run_once(spark, first, f"pre#{i}")
            after.append(_run_once(spark, second, f"after#{i}"))
            print(
                f"# rep{i}: {second} alone={alone[-1]:.3f}s "
                f"after {first}={after[-1]:.3f}s",
                flush=True,
            )
        print(
            f"## {second}: alone_median={statistics.median(alone):.3f}s "
            f"after_{first}_median={statistics.median(after):.3f}s",
            flush=True,
        )

    elif mode == "mb":
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                d = dict(p.durationMs or {})
                print(
                    f"#   batch={p.batchId} rows={p.numInputRows} "
                    f"durations={json.dumps(d, sort_keys=True)}",
                    flush=True,
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        spark.streams.addListener(_L())
        for name in names:
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR).count()
            print(
                f"## {name}: total={time.perf_counter() - t0:.3f}s", flush=True
            )
            spark.catalog.clearCache()

    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
