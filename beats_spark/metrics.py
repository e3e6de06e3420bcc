"""Per-stage lineage and row-count metrics.

The Spark restatement of Beats' pipeline monitoring counters
(reference: /root/reference/libbeat/publisher/pipeline/monitoring.go:24-179 —
events total/filtered/published/failed/dropped, and the per-input counters in
/root/reference/filebeat/input/filestream/input.go:632-744).

Each pipeline stage is wrapped in `df.observe(...)` with named aggregate
expressions: the metrics are computed BY THE SAME JOB that executes the
stage (no second pass over the data), collected on the driver after the
action completes, and emitted as a lineage manifest. At 100 TB this costs
one extra aggregate per stage fused into the existing whole-stage plans.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class StageMetric:
    stage: str
    observation: Observation
    attached_at: float = field(default_factory=time.time)


class PipelineMetrics:
    """Collects named per-stage observations across one pipeline run.

    Usage:
        m = PipelineMetrics()
        df = m.observe(df, "parse", failed=F.sum(...))
        ... action ...
        m.report()  # {"parse": {"rows": N, "failed": K}, ...}
    """

    def __init__(self) -> None:
        self._stages: list[StageMetric] = []

    def observe(self, df: DataFrame, stage: str, **metrics: Column) -> DataFrame:
        obs = Observation(stage)
        exprs = [F.count(F.lit(1)).alias("rows")]
        exprs += [c.alias(name) for name, c in metrics.items()]
        self._stages.append(StageMetric(stage, obs))
        return df.observe(obs, *exprs)

    def report(self) -> dict[str, dict]:
        """Metrics for every stage whose action has completed (Observation.get
        blocks until the observed DataFrame was used in an action)."""
        return {s.stage: dict(s.observation.get) for s in self._stages}

    def lineage(self) -> list[dict]:
        """Ordered stage lineage: what ran, in what order, with row counts —
        the registrar/monitoring snapshot equivalent."""
        rep = self.report()
        return [
            {"stage": s.stage, "order": i, **rep.get(s.stage, {})}
            for i, s in enumerate(self._stages)
        ]

    def to_json(self) -> str:
        return json.dumps(self.lineage(), default=str)


def with_standard_metrics(m: PipelineMetrics, df: DataFrame, stage: str) -> DataFrame:
    """Attach the standard counter set for a transcript-pipeline stage:
    rows (≅ events.total), flagged (≅ events.failed), convs seen."""
    metrics = {}
    if "flags" in df.columns:
        metrics["flagged"] = F.sum(
            F.when(F.size(F.coalesce(F.col("flags"), F.array())) > 0, 1).otherwise(0)
        )
    if "conv_id" in df.columns:
        metrics["convs"] = F.approx_count_distinct("conv_id")
    return m.observe(df, stage, **metrics)
