"""PipelineStep protocol + named-step registry (the user-extension surface).

SURVEY §2.10 names the Ray-native equivalent of the reference's
config-properties extension surface (config-authors-bnf.properties,
loaded at MainNELApp.java:104-123; new-source subclassing at
ldextractor/QuerySourceInterface.java:12-40): *"a PipelineStep protocol
(``def apply(self, ds) -> ds``), config dataclass mirroring the
properties file, registry for candidate sources and centrality
measures."*  The config dataclass is ``config.LinkerConfig``, the source
registry is ``sources.registry``, the centrality registry is
``core.centrality.MEASURES`` — this module supplies the remaining piece:

- ``PipelineStep``: the structural protocol every composable stage obeys;
- ``@register_step("name")``: factory registry so a chain can be
  declared as DATA (a list of ``{"step": ..., **params}`` dicts — the
  moral equivalent of a properties file) and built with ``build_chain``;
- ``apply_steps``: fold a chain over a Dataset (still lazy — each step
  only wires more of the streaming DAG).

Registered steps wrap the existing webtext/textstats/urls/dedup stages
verbatim, so a declared chain is exactly as scale-safe as the underlying
stage (no step materializes; shuffles only where the stage shuffles).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa
import ray.data as rd


@runtime_checkable
class PipelineStep(Protocol):
    """Anything with ``apply(ds) -> ds`` composes into a chain."""

    name: str

    def apply(self, ds: rd.Dataset) -> rd.Dataset: ...


@dataclass
class FnStep:
    """Adapter: wrap a ``Dataset -> Dataset`` callable as a step."""

    name: str
    fn: Callable[[rd.Dataset], rd.Dataset]

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        return self.fn(ds)


STEP_BUILDERS: dict[str, Callable[..., PipelineStep]] = {}


def register_step(name: str):
    def deco(factory: Callable[..., PipelineStep]):
        STEP_BUILDERS[name] = factory
        return factory

    return deco


def build_step(spec: dict) -> PipelineStep:
    """``{"step": "gopher_filter", "max_symbol_ratio": 0.1}`` -> step."""
    spec = dict(spec)
    try:
        name = spec.pop("step")
    except KeyError:
        raise ValueError(f"step spec missing 'step' key: {spec!r}") from None
    try:
        factory = STEP_BUILDERS[name]
    except KeyError:
        raise ValueError(
            f"unknown step {name!r}; registered: {sorted(STEP_BUILDERS)}"
        ) from None
    return factory(**spec)


def build_chain(specs: list[dict] | str) -> list[PipelineStep]:
    """Build a chain from a spec list or a JSON string/file of one."""
    if isinstance(specs, str):
        text = specs
        if not specs.lstrip().startswith("["):
            with open(specs) as f:
                text = f.read()
        specs = json.loads(text)
    return [build_step(s) for s in specs]


def apply_steps(ds: rd.Dataset, steps) -> rd.Dataset:
    for step in steps:
        ds = step.apply(ds)
    return ds


def run_chain(ds: rd.Dataset, specs: list[dict] | str) -> rd.Dataset:
    return apply_steps(ds, build_chain(specs))


# --- registered steps (thin adapters over existing stages) -----------------


def _map_step(name: str, make_fn, **mb_kwargs) -> PipelineStep:
    """A map_batches step; ``make_fn`` builds the per-batch callable once
    (regex compiles etc. happen at build time, then ride to workers in
    the serialized closure — once per worker, not per batch)."""
    fn = make_fn()

    def apply(ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, **mb_kwargs)

    return FnStep(name, apply)


@register_step("gopher_filter")
def _gopher(**thresholds) -> PipelineStep:
    from ..stages.webtext import gopher_filter

    return FnStep("gopher_filter", lambda ds: gopher_filter(ds, **thresholds))


@register_step("pii_redact")
def _pii(text_column: str = "text", id_column: str = "doc_id") -> PipelineStep:
    from ..stages.webtext import PIIRedactor

    redactor = PIIRedactor(id_column=id_column, text_column=text_column)

    def make():
        def redact(batch: pa.Table) -> pa.Table:
            out = redactor(batch)
            i = batch.schema.get_field_index(text_column)
            return batch.set_column(i, text_column, out.column("text"))

        return redact

    return _map_step("pii_redact", make)


@register_step("exact_dedup")
def _exact_dedup(column: str = "text", id_column: str = "doc_id") -> PipelineStep:
    from ..stages.dedup import exact_dedup

    return FnStep(
        "exact_dedup", lambda ds: exact_dedup(ds, column=column, id_column=id_column)
    )


@register_step("span_dedup")
def _span_dedup(**kwargs) -> PipelineStep:
    from ..stages.webtext import span_dedup

    return FnStep("span_dedup", lambda ds: span_dedup(ds, **kwargs))


@register_step("token_stats")
def _token_stats() -> PipelineStep:
    from ..stages.textstats import TokenStats

    return _map_step("token_stats", TokenStats)


@register_step("quality_score")
def _quality() -> PipelineStep:
    from ..stages.textstats import QualityScore

    return _map_step("quality_score", QualityScore)


@register_step("lang_id")
def _langid() -> PipelineStep:
    from ..stages.textstats import LangId

    return _map_step("lang_id", LangId)


@register_step("fingerprint")
def _fingerprint(column: str = "text") -> PipelineStep:
    from ..stages.textstats import fingerprint_batch

    return _map_step("fingerprint", lambda: lambda b: fingerprint_batch(b, column=column))


@register_step("min_quality")
def _min_quality(threshold: float = 0.5, column: str = "quality") -> PipelineStep:
    import pyarrow.compute as pc

    return _map_step(
        "min_quality",
        lambda: lambda b: b.filter(pc.greater_equal(b[column], threshold)),
    )


@register_step("keep_lang")
def _keep_lang(langs, column: str = "lang") -> PipelineStep:
    import pyarrow.compute as pc

    value_set = pa.array(sorted({langs} if isinstance(langs, str) else set(langs)))
    return _map_step(
        "keep_lang",
        lambda: lambda b: b.filter(pc.is_in(b[column], value_set=value_set)),
    )


@register_step("url_normalize")
def _url_normalize(url_column: str = "url") -> PipelineStep:
    from ..stages.urls import UrlNormalizer

    return _map_step("url_normalize", lambda: UrlNormalizer(url_column=url_column))


@register_step("block_domains")
def _block_domains(blocklist, domain_column: str = "domain") -> PipelineStep:
    from ..stages.urls import filter_blocked_domains

    return FnStep(
        "block_domains",
        lambda ds: filter_blocked_domains(ds, blocklist, domain_column=domain_column),
    )


@register_step("dedup_recrawls")
def _dedup_recrawls(**kwargs) -> PipelineStep:
    from ..stages.urls import dedup_recrawls

    return FnStep("dedup_recrawls", lambda ds: dedup_recrawls(ds, **kwargs))


@register_step("select_columns")
def _select(columns) -> PipelineStep:
    return FnStep("select_columns", lambda ds: ds.select_columns(list(columns)))
