"""Reproduce the q_web_corpus_e2e -> q_weighted_mix cold poisoning at
32 cores (r16 item 2): fresh artifact roots, run the web build cold,
then time q_weighted_mix stage by stage, emitting driver jstacks if a
stage stalls. Diagnostic only — not part of the bench path.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark import registry  # noqa: E402
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jvm_pid() -> str | None:
    out = subprocess.run(
        ["pgrep", "-P", str(os.getpid()), "java"], capture_output=True, text=True
    )
    pids = out.stdout.split()
    return pids[0] if pids else None


def watchdog(tag: str, after_s: float, stop: threading.Event) -> None:
    if stop.wait(after_s):
        return
    pid = _jvm_pid()
    if pid is None:
        return
    out = subprocess.run(["jstack", pid], capture_output=True, text=True)
    Path(f"/tmp/jstack_{tag}.txt").write_text(out.stdout)
    print(f"# wrote /tmp/jstack_{tag}.txt", flush=True)


def timed(spark, name: str, fn, stall_s: float = 3.0):
    stop = threading.Event()
    t = threading.Thread(target=watchdog, args=(name, stall_s, stop), daemon=True)
    t.start()
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    stop.set()
    print(f"# {name}: {dt:.3f}s", flush=True)
    return r


def main() -> None:
    registry.load_all()
    spark = get_spark("probe_wmix")
    registry.QUERIES["q_ops_by_table_op"](spark, SF_DIR).count()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    spark.catalog.clearCache()

    timed(
        spark,
        "web_corpus_cold",
        lambda: registry.QUERIES["q_web_corpus_e2e"](spark, SF_DIR).count(),
        stall_s=20.0,
    )
    spark.catalog.clearCache()
    timed(
        spark,
        "wmix_after_web",
        lambda: registry.QUERIES["q_weighted_mix"](spark, SF_DIR).count(),
        stall_s=2.5,
    )
    spark.catalog.clearCache()
    for i in range(3):
        timed(
            spark,
            f"wmix_warm{i}",
            lambda: registry.QUERIES["q_weighted_mix"](spark, SF_DIR).count(),
            stall_s=2.5,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
