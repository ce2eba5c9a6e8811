"""Declarative pipeline spec — the YAML-pipeline / integration-template analog.

The reference wires receivers -> processors -> exporters from YAML
(distributions/elastic-components/manifest.yaml:1-77) and can instantiate an
embedded pipeline from a template with variable substitution
(receiver/integrationreceiver/receiver.go:1-325,
pkg/integrations/rawtemplate.go:1-214).  Spark-first, a pipeline is just a
list of named stage configs compiled into one lazy DataFrame plan —
Catalyst fuses the narrow stages into a single whole-stage-codegen span
exactly like the collector runs processors synchronously on one goroutine.

``run_e2e`` is the flagship parse -> enrich -> route -> aggregate job the
benchmarks measure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregate import interval_rollup
from ..operators.enrich import derive_event_fields, enrich_with_dim
from ..operators.parse import parse_pages
from ..operators.partition import salted_repartition
from ..operators.route import with_cardinality_route, with_data_stream_route
from ..sources.dims import generate_domain_dim
from ..sources.pages import generate_pages

# stage type -> builder(df, spark, **params); mirrors the component registry
# idea of manifest.yaml without any YAML machinery.
_STAGES = {
    "parse": lambda df, spark, **p: parse_pages(df, **p),
    "enrich": lambda df, spark, **p: enrich_with_dim(df, p.pop("dim", None) or generate_domain_dim(spark), **p),
    "derive": lambda df, spark, **p: derive_event_fields(df),
    "route": lambda df, spark, **p: with_data_stream_route(df, **p),
    "cardinality_route": lambda df, spark, **p: with_cardinality_route(df, **p),
    "salt": lambda df, spark, **p: salted_repartition(df, **p),
}


def _substitute(value: Any, variables: dict[str, str]) -> Any:
    """``${name}`` / ``${name:default}`` substitution in string params —
    the integration-template variable resolution analog
    (pkg/integrations/rawtemplate.go:1-214)."""
    if not isinstance(value, str):
        return value

    def repl(m: "re.Match[str]") -> str:
        name, _, default = m.group(1).partition(":")
        if name in variables:
            return str(variables[name])
        if default:
            return default
        raise KeyError(f"unresolved pipeline variable ${{{name}}}")

    return re.sub(r"\$\{([^}]+)\}", repl, value)


@dataclass
class PipelineSpec:
    """Ordered stage configs: [{"type": "parse", ...params}, ...]."""

    stages: list[dict[str, Any]] = field(default_factory=list)

    def build(
        self,
        df: DataFrame,
        spark: SparkSession,
        variables: dict[str, str] | None = None,
        observe: bool = False,
    ) -> DataFrame:
        """Compile the stage list into one lazy plan.

        ``variables`` resolves ``${name}`` / ``${name:default}`` in string
        params (rawtemplate.go analog).  ``observe=True`` attaches a named
        ``Observation`` after every stage — the telemetryBuilder per-stage
        counter analog, collected by Spark DURING the action (no extra
        pass); read them with ``stage_metrics()`` after an action runs.
        """
        from pyspark.sql import Observation

        self._observations: dict[str, "Observation"] = {}
        for i, cfg in enumerate(self.stages):
            cfg = {k: _substitute(v, variables or {}) for k, v in cfg.items()}
            kind = cfg.pop("type")
            if kind not in _STAGES:
                raise ValueError(f"unknown stage type {kind!r}; known: {sorted(_STAGES)}")
            df = _STAGES[kind](df, spark, **cfg)
            if observe:
                from pyspark.sql import functions as F

                obs = Observation(f"stage{i}:{kind}")
                df = df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
                self._observations[f"stage{i}:{kind}"] = obs
        return df

    def stage_metrics(self) -> dict[str, dict[str, Any]]:
        """Per-stage observed metrics (valid after an action has run on the
        built frame). Counters ride inside the job like the collector's
        telemetryBuilder counters ride each ConsumeX call."""
        return {name: dict(obs.get) for name, obs in getattr(self, "_observations", {}).items()}


DEFAULT_SPEC = PipelineSpec(
    stages=[
        {"type": "parse", "engine": "sql"},
        {"type": "enrich"},
        {"type": "derive"},
        {"type": "route"},
    ]
)


def run_e2e(
    spark: SparkSession,
    n_rows: int,
    spec: PipelineSpec = DEFAULT_SPEC,
    intervals: tuple[str, ...] = ("1m", "10m", "60m"),
    agg_keys: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Flagship job: synthetic pages -> pipeline -> per-interval aggregates.

    Returns the interval aggregate frames (callers trigger actions);
    the routed frame is under key '_routed'.
    """
    pages = generate_pages(spark, n_rows)
    routed = spec.build(pages, spark)
    out = interval_rollup(routed, keys=agg_keys or ["sink", "geo"], intervals=intervals)
    out["_routed"] = routed
    return out
