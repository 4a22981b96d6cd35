"""DataFrame pipeline composition — the Spark-idiomatic face of the
reference's stage graph (SURVEY §1.2, §4.2).

A ``DFStage`` is a named ``DataFrame -> DataFrame`` transform. Wiring
stages composes plans *lazily*, so Catalyst fuses the whole chain into one
optimized plan — strictly better than the reference's thread-per-stage
pipelining, which executes its graph literally (runtime.rs:467; no
cross-stage fusion). Ports/edges therefore cost nothing at runtime; the
graph structure maps:

- mapper (macros.rs:2-41)        → select/withColumn stage
- splitter (macros.rs:44-85)    → explode stage
- OutputMap (messaging.rs:255-274) → project + filter stage
- funnel (messaging.rs:413-423) → unionByName of upstream stages
- broadcast/fanout (messaging.rs:425-436, 72-95) → reuse one stage's
  DataFrame in several downstream chains (cache() when executed eagerly)
- SinkAdapter cap (messaging.rs:211-253) → limit(cap)

Per-stage metrics parity (metrics.rs) uses ``pyspark.sql.Observation`` —
row counts/aggregates collected DURING the single fused job, no extra
pass over the data.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from gasket_rs_spark.pipeline.metrics import Registry
from gasket_rs_spark.pipeline.retries import RetryPolicy, retry_call


@dataclass
class DFStage:
    """One named transform in a DataFrame pipeline."""

    name: str
    transform: Callable[[DataFrame], DataFrame]
    observe_rows: bool = False

    def apply(self, df: DataFrame) -> tuple[DataFrame, Observation | None]:
        out = self.transform(df)
        obs = None
        if self.observe_rows:
            obs = Observation(self.name)
            out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        return out, obs


@dataclass
class DFPipeline:
    """Linear chain of stages with optional branches.

    ``run`` materializes via the supplied action under a retry policy —
    the analogue of the reference work loop executing units with
    retry/backoff (runtime.rs:244-289) applied to a whole Spark action
    (the natural unit at this layer: one job/batch).
    """

    stages: list[DFStage] = field(default_factory=list)
    metrics: Registry = field(default_factory=Registry)

    def stage(self, name: str, transform: Callable[[DataFrame], DataFrame], observe_rows: bool = False) -> "DFPipeline":
        self.stages.append(DFStage(name, transform, observe_rows))
        return self

    def build(self, source: DataFrame) -> DataFrame:
        """Compose all stages lazily (Catalyst fuses into one plan)."""
        df = source
        self._observations: list[tuple[str, Observation]] = []
        for st in self.stages:
            df, obs = st.apply(df)
            if obs is not None:
                self._observations.append((st.name, obs))
        return df

    def run(
        self,
        source: DataFrame,
        action: Callable[[DataFrame], object] = lambda df: df.collect(),
        policy: RetryPolicy | None = None,
    ):
        """Build + execute the action with retry/backoff; publish observed
        per-stage row counts into the metrics registry."""
        df = self.build(source)
        attempts = self.metrics.track_counter("attempts")

        def attempt():
            attempts.inc()
            return action(df)

        result = retry_call(attempt, policy or RetryPolicy())
        for name, obs in getattr(self, "_observations", []):
            self.metrics.track_gauge(f"{name}.rows").set(float(obs.get["rows"]))
        return result


def funnel(*branches: DataFrame) -> DataFrame:
    """N:1 merge of branch outputs (messaging.rs:413-423 → unionByName)."""
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def tee(df: DataFrame, *transforms: Callable[[DataFrame], DataFrame]) -> list[DataFrame]:
    """1:N broadcast: every transform sees the full upstream
    (messaging.rs:425-436). Lazy plan reuse; callers batch-executing all
    branches should ``df.persist()`` first."""
    return [t(df) for t in transforms]
