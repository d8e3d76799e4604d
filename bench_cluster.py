"""Multi-executor scaling measurement (north rule, literal form).

BASELINE.json demands: "runs via spark-submit --py-files on
multi-executor clusters at N and 4N executors with >=0.8 scaling
efficiency". bench.py evidences scaling with taskset-pinned local-mode
processes (a single-JVM stand-in); THIS script removes that caveat by
running the SAME build on a real Spark standalone cluster on this box:

  * one Master JVM + K Worker JVMs (1 core, 3.5 GiB each), every
    worker taskset-pinned to its own physical CPU so "K executors" is
    a hard budget;
  * each worker hosts one separate 1-core Executor JVM — true
    multi-executor topology: cross-JVM shuffle over netty, per-executor
    Python worker pools, driver in its own JVM;
  * the build job is submitted with
    `spark-submit --master spark://... --py-files embedanything_spark.zip`
    exactly as the north rule prescribes;
  * N = 2 executors vs 4N = 8 executors, same materialized input,
    1 discarded warmup + SPARK_GRAFT_BENCH_REPEATS (default 3) timed
    builds per level, median as headline.

Writes BENCH/cluster.json; bench.py folds it into its JSON line and
BENCH/BASELINE.md (labeled with its measurement timestamp — rerun with
`python bench_cluster.py` after engine changes).

Env knobs: SPARK_GRAFT_BENCH_CONVS (default 250000 ≈ 2M turns),
SPARK_GRAFT_BENCH_REPEATS, SPARK_GRAFT_CLUSTER_N (default 2),
SPARK_HOME_DIST (default /opt/spark).
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
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SPARK_DIST = os.environ.get("SPARK_HOME_DIST", "/opt/spark")
SPARK_CLASS = f"{SPARK_DIST}/bin/spark-class"
SPARK_SUBMIT = f"{SPARK_DIST}/bin/spark-submit"
MASTER_URL = "spark://127.0.0.1:7077"
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "250000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
LOW_EXEC = int(os.environ.get("SPARK_GRAFT_CLUSTER_N", "2"))
HIGH_EXEC = LOW_EXEC * 4

JOB = """
import shutil, sys, time
from pyspark.sql import SparkSession
from embedanything_spark.index.build import IndexWriter

src, root, repeats = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = SparkSession.builder.getOrCreate()
t = spark.read.parquet(src)
w = t.sample(False, 0.01, seed=1)      # warmup: full path, 1% input
shutil.rmtree(root + "_w", ignore_errors=True)
IndexWriter(root + "_w").build(w)
for _ in range(repeats):
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    IndexWriter(root).build(t)
    print("BUILD_SEC", time.time() - t0, flush=True)
spark.stop()
"""


def _zip_pkg(work: Path) -> str:
    zpath = work / "embedanything_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "embedanything_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return str(zpath)


def _env(extra: dict | None = None) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_LOCAL_IP": "127.0.0.1",
        "SPARK_NO_DAEMONIZE": "1",
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    })
    env.update(extra or {})
    return env


class Cluster:
    """Master + n_workers 1-core Worker JVMs, each pinned to its own
    CPU (executor JVMs inherit the worker's affinity mask)."""

    def __init__(self, n_workers: int, log_dir: Path):
        self.procs: list[subprocess.Popen] = []
        self.log_dir = log_dir
        self.n_workers = n_workers

    def start(self):
        self.procs.append(self._spawn(
            "master", [SPARK_CLASS,
                       "org.apache.spark.deploy.master.Master",
                       "-h", "127.0.0.1", "-p", "7077",
                       "--webui-port", "8090"]))
        time.sleep(5)
        for i in range(self.n_workers):
            self.procs.append(self._spawn(
                f"worker{i}",
                ["taskset", "-c", str(i), SPARK_CLASS,
                 "org.apache.spark.deploy.worker.Worker",
                 "-c", "1", "-m", "3500m", "-h", "127.0.0.1",
                 "-p", str(20000 + i), "--webui-port", str(8190 + i),
                 MASTER_URL]))
        time.sleep(8)

    def _spawn(self, name: str, cmd: list[str]) -> subprocess.Popen:
        logf = (self.log_dir / f"{name}.log").open("w")
        return subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                env=_env())

    def stop(self):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
        self.procs.clear()


def _submit(pyz: str, job: str, args: list[str], n_exec: int) -> str:
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", MASTER_URL,
         "--deploy-mode", "client",
         "--py-files", pyz,
         "--conf", "spark.executor.cores=1",
         "--conf", "spark.executor.memory=3g",
         "--conf", f"spark.cores.max={n_exec}",
         "--conf", f"spark.sql.shuffle.partitions={max(n_exec, 8)}",
         "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
         job] + args,
        capture_output=True, text=True, timeout=5400, env=_env())
    if out.returncode != 0:
        raise RuntimeError(f"spark-submit failed:\n{out.stderr[-4000:]}")
    return out.stdout


def measure(n_exec: int, work: Path, pyz: str, job: str,
            src: str, n_turns: int) -> list[float]:
    cl = Cluster(n_exec, work)
    cl.start()
    try:
        root = str(work / f"cidx{n_exec}")
        stdout = _submit(pyz, job, [src, root, str(REPEATS)], n_exec)
    finally:
        cl.stop()
    times = [float(ln.split()[1]) for ln in stdout.splitlines()
             if ln.startswith("BUILD_SEC")]
    if len(times) != REPEATS:
        raise RuntimeError(f"expected {REPEATS} builds, got {times}")
    print(f"[{n_exec} executors] builds: "
          f"{[round(x, 1) for x in times]} sec "
          f"(median {statistics.median(times):.1f}, "
          f"{n_turns / statistics.median(times):,.0f} turns/s)",
          flush=True)
    return times


def main():
    work = Path(tempfile.mkdtemp(prefix="ea_cluster_"))
    try:
        pyz = _zip_pkg(work)
        job = str(work / "job.py")
        Path(job).write_text(JOB)

        # materialize input once (local mode, not timed)
        from embedanything_spark.datagen import gen_transcripts_df
        from embedanything_spark.session import get_spark
        spark = get_spark(app="cluster-datagen", master="local[32]",
                          shuffle_partitions=32)
        src = str(work / "transcripts")
        gen_transcripts_df(spark, N_CONVS, partitions=64) \
            .write.mode("overwrite").parquet(src)
        n_turns = spark.read.parquet(src).count()
        spark.stop()

        t_lo = measure(LOW_EXEC, work, pyz, job, src, n_turns)
        t_hi = measure(HIGH_EXEC, work, pyz, job, src, n_turns)

        lo, hi = statistics.median(t_lo), statistics.median(t_hi)
        ratio = HIGH_EXEC / LOW_EXEC
        res = {
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
            "topology": (f"standalone cluster on one box: 1 master + "
                         f"K taskset-pinned 1-core workers, one "
                         f"executor JVM per worker, driver separate; "
                         f"spark-submit --py-files"),
            "n_convs": N_CONVS, "n_turns": n_turns,
            "repeats": REPEATS,
            "executors_low": LOW_EXEC,
            "build_sec_low": round(lo, 2),
            "build_sec_low_all": [round(x, 1) for x in t_lo],
            "turns_per_sec_low": round(n_turns / lo, 1),
            "executors_high": HIGH_EXEC,
            "build_sec_high": round(hi, 2),
            "build_sec_high_all": [round(x, 1) for x in t_hi],
            "turns_per_sec_high": round(n_turns / hi, 1),
            "scaling_efficiency": round(lo / (ratio * hi), 3),
            "scaling_efficiency_range": [
                round(min(t_lo) / (ratio * max(t_hi)), 3),
                round(max(t_lo) / (ratio * min(t_hi)), 3)],
        }
        (REPO / "BENCH").mkdir(exist_ok=True)
        (REPO / "BENCH" / "cluster.json").write_text(
            json.dumps(res, indent=2) + "\n")
        print(json.dumps(res))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
