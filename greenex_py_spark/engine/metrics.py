"""Per-stage metrics (north_rule: row-count / latency per stage).

Thin instrumentation layer: ``StageMetrics`` wraps named actions with
wall-clock + row counts and dumps one JSON file per run under BENCH/.
Executor-side counters ride Spark accumulators; plan-level IO metrics
come free from Spark's own SQL metrics (the UI/eventlog), so this layer
only adds what the driver contract needs to persist.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame


class StageMetrics:
    def __init__(self, run_name: str, out_dir: str = "BENCH"):
        self.run_name = run_name
        self.out_dir = out_dir
        self.stages: list[dict] = []

    def measure(self, name: str, df: DataFrame, count: bool = True) -> DataFrame:
        t0 = time.time()
        rows = df.count() if count else None
        self.stages.append(
            {"stage": name, "rows": rows, "wall_ms": int((time.time() - t0) * 1000)}
        )
        return df

    def timed(self, name: str):
        """Context manager for arbitrary stage bodies."""
        metrics = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                metrics.stages.append(
                    {"stage": name, "rows": None,
                     "wall_ms": int((time.time() - self.t0) * 1000)}
                )
                return False

        return _Ctx()

    def dump(self) -> str:
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"metrics_{self.run_name}.json")
        with open(path, "w") as f:
            json.dump({"run": self.run_name, "ts": time.time(), "stages": self.stages}, f, indent=2)
        return path
