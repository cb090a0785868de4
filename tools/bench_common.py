"""Shared launch recipe for every bench runner (bench.py, bench_scaling.py,
tools/bench_worker.py).

One copy of the measurement-critical configuration — taskset pinning,
spark-submit flags, the load-bearing confs (driver JVM options, 12g driver
memory, tmpfs spark.local.dir) and WORKER_ENV — so bench.py and
bench_scaling.py can never drift apart and silently measure different
engine configurations while claiming the same methodology (r3 review
finding: three hand-kept copies of this recipe).
"""

from __future__ import annotations

import json
import os
import subprocess

from deidcm_spark.session import DRIVER_JAVA_OPTIONS, WORKER_ENV

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pin_args(cores: int) -> list[str]:
    """taskset prefix confining the child to exactly ``cores`` CPUs —
    without it per-worker library thread pools leak onto idle cores and a
     'local[8]' run secretly uses 32."""
    return ["taskset", "-c", f"0-{cores - 1}"]


def spark_submit_json(
    script: str,
    args: list[str],
    cores: int,
    require_json: bool = True,
    timeout: int = 3600,
) -> dict | None:
    """Run ``script`` under a pinned fresh spark-submit and return the first
    JSON line it prints (None when ``require_json=False`` and the child
    exited 0 without printing one — the prepare-mode contract)."""
    env = dict(os.environ, PYTHONPATH=REPO, **WORKER_ENV)
    # same writability guard as session.get_spark — the recipe this module
    # exists to unify must not diverge from the session factory's handling
    local_dir = (
        "/dev/shm/spark-local"
        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)
        else "/tmp/spark-local"
    )
    res = subprocess.run(
        pin_args(cores)
        + [
            "spark-submit", "--master", f"local[{cores}]",
            "--driver-java-options", DRIVER_JAVA_OPTIONS,
            "--conf", "spark.driver.memory=12g",
            "--conf", f"spark.local.dir={local_dir}",
            script,
        ]
        + args,
        capture_output=True, text=True, cwd=REPO, env=env, timeout=timeout,
    )
    if res.returncode == 0:
        # a nonzero-exit child is NEVER a sample, even if it printed a
        # JSON-looking line before dying — a failed worker folded into the
        # min-across-workers headline would publish a corrupt measurement
        for line in res.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        if not require_json:
            return None
    raise RuntimeError(
        f"bench child {script} local[{cores}] failed "
        f"(exit {res.returncode}): "
        f"{res.stdout[-500:]} {res.stderr[-1500:]}"
    )


def sf_from_dir(sf_dir: str) -> float:
    """Scale factor from an sf-dir path (ONE copy — a drifted duplicate of
    this measurement-identity helper would misreport sf in the headline)."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def replicate_docs(base, n_replicas: int):
    """Deterministically replicate a documents frame ``n_replicas``× by
    offsetting doc_id per replica (same text distribution, bigger
    cardinality so runtime >> startup).  Caller repartitions the result."""
    from pyspark.sql import functions as F

    out = base
    for i in range(1, n_replicas):
        out = out.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                *[c for c in base.columns if c != "doc_id"],
            )
        )
    return out
