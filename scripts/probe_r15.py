"""r15 optimization probes: per-query isolated timing (guide §1.4 noop
sink + §1.5 job labels) and formatted-plan capture for
plans/r15/<query>_{before,after}.txt.

Usage:
  python scripts/probe_r15.py plan  <before|after> <query> [query ...]
  python scripts/probe_r15.py time  <query> [query ...]   # count + noop, 3x
"""

from __future__ import annotations

import io
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry  # noqa: E402
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    mode = sys.argv[1]
    if mode == "plan":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]
    registry.load_all()
    spark = get_spark("probe_r15")
    # same JVM/worker warmup as bench.py so timings are comparable
    registry.QUERIES["q_ops_by_table_op"](spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    spark.catalog.clearCache()

    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = registry.QUERIES[name]
        if mode == "plan":
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"# wrote plans/r15/{name}_{tag}.txt")
            spark.catalog.clearCache()
        else:
            for i in range(3):
                spark.sparkContext.setJobDescription(f"{name} count#{i}")
                t0 = time.perf_counter()
                n = fn(spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name} noop#{i}")
                t1 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dn = time.perf_counter() - t1
                spark.catalog.clearCache()
                print(
                    f"# {name} run{i}: count={dt:.3f}s (rows={n}) "
                    f"noop={dn:.3f}s",
                    flush=True,
                )
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
