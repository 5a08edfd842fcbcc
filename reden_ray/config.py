"""Pipeline configuration.

Mirrors the reference's ``config/*.properties`` surface
(/root/reference/config/config-authors-bnf.properties; loaded at
/root/reference/src/fr/lip6/reden/MainNELApp.java:104-123) as a frozen
dataclass. Each field's doc comment cites the property it re-expresses.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LinkerConfig:
    """Knobs of the NEL/KG-construction pipeline.

    Reference properties (config-authors-bnf.properties):
      - ``annotationTag`` (line 4)    -> ``ne_types`` (ordered; later types
        overwrite earlier ones for homonym surfaces, MainNELApp.java:255-256)
      - ``baseURIs``                  -> ``base_uri_filter`` (substring test)
      - ``sameAsproperty`` (line ~71) -> ``same_as_property``
      - ``crawlSameAs``               -> ``crawl_same_as`` ("ALL" or a prefix)
      - ``preferedURI`` (line 39)     -> ``preferred_uri`` ("ALL" or substring)
      - ``centralityMeasure`` (line 24) -> ``measure``
      - ``-relsFile=`` CLI arg        -> ``rel_weights`` (pred -> weight,
        default 1.0; GraphHandlerNEL.java:236-249)
    """

    ne_types: tuple[str, ...] = ("PER", "LOC")
    base_uri_filter: str = "http://kb.test/"
    same_as_property: str = "http://kb.test/sameAs"
    crawl_same_as: str = "ALL"
    preferred_uri: str = "ALL"
    measure: str = "DegreeCentrality"
    rel_weights: dict[str, float] = field(default_factory=dict)
    # Lucene search cap: DicoProcessingNEL.java:319 `search(query, 100)`
    max_candidate_rows: int = 100
    # SKEW GUARD (no reference analogue — the reference would OOM): a
    # pathological mega-context (e.g. a spam page with thousands of
    # annotated mentions of a hot entity) is truncated to its first N
    # mentions in document order before linking; None disables.  The
    # truncation is deterministic and surfaces in the link rows' route
    # column as 'OkTruncated'.
    max_context_mentions: int | None = None

    def weight_for(self, pred: str) -> float:
        return self.rel_weights.get(pred.lower(), 1.0)


@dataclass(frozen=True)
class ExecConfig:
    """Physical execution knobs (Ray-side only; no reference analogue)."""

    batch_size: int = 4096
    # actor pool sizes for stateful stages: (min, max) AUTOSCALING tuples.
    # A bare int pins min == max, which can deadlock when several pools
    # plus task stages contend for a small CPU count — keep min at 1.
    lookup_concurrency: tuple[int, int] = (1, 4)
    fuse_concurrency: tuple[int, int] = (1, 8)
    # salt modulus for skewed hot keys before wide stages
    salt_buckets: int = 16
    # number of hash buckets for the bucketed hash-join fallback
    join_buckets: int = 32
    # context buckets for the fusion stage: the shuffle's partition count
    # AND the map_groups parallelism (one bucket = one task); size to
    # ~2-4x the worker count
    fuse_buckets: int = 16
    # stateless=True runs lookup/fusion as task pools with worker-global
    # index caches instead of actor pools: no actor-spawn latency, fully
    # elastic scheduling; same semantics.  Actor pools remain the default
    # (explicit state lifecycle; required if indices ever shard).
    stateless: bool = False
