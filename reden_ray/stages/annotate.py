"""Annotated-page reconstruction — the reference's PRIMARY artifact.

ResultsAndEvaluationNEL.produceResults (/root/reference/src/fr/lip6/
reden/nelinker/ResultsAndEvaluationNEL.java:67-128) writes the chosen
URI back into each named-entity element as a ``ref_auto`` attribute
(optionally ``uri(score)``) and re-serializes the whole document next
to the input.  The web analogue here: every ``<span class="ne"
data-type="T">`` opening tag of a linked mention gains
``ref_auto="uri"`` and the page html is re-emitted byte-for-byte
otherwise.

Deviations from the reference, both cited:
- the reference keys ``choosenUris`` by mention TEXT (:86-93), so two
  same-surface mentions in one paragraph share one attribute value;
  we key by (context_id, mention_id) — positionally exact;
- Java's ``Map.get`` returns null for unlinked mentions and DOM
  ``setAttribute`` stringifies it to ``"null"``; we simply omit the
  attribute for NIL mentions.

Distribution shape: links collapse to one small blob row per url
(groupby url), then a hash join against pages on url (pages' binary
html rides the shuffle once), then a stateless per-page rewrite.
Attribute insertion only touches tag bytes, so the tag-stripped text —
the per-url byte-identical invariant — is provably unchanged (tested).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..core.textextract import _NE_OPEN_RE, _P_RE

_REC_SEP = "\x1e"
_FIELD_SEP = "\x1f"


def _links_to_blobs(links: rd.Dataset, add_scores: bool = False) -> rd.Dataset:
    """links -> one (url, ann_blob) row per url.

    The blob serializes (context_id, mention_id, ref) triplets with
    control-character separators — a plain string column, so it rides
    Ray's hash join (which rejects list payloads)."""

    from ..stages.joins import default_join_partitions
    from ..stages.partition import part_column, sorted_segments

    n_parts = default_join_partitions()

    def flatten(batch: pa.Table) -> pa.Table:
        urls, cids, mids, recs = [], [], [], []
        for url, cid, mid, chosen, score in zip(
            batch.column("url").to_pylist(),
            batch.column("context_id").to_pylist(),
            batch.column("mention_id").to_pylist(),
            batch.column("chosen_uris").to_pylist(),
            batch.column("score").to_pylist(),
        ):
            if not chosen:
                continue
            ref = " ".join(chosen)
            if add_scores:
                ref = f"{ref}({score})"
            urls.append(url)
            cids.append(cid)
            mids.append(mid)
            recs.append(f"{cid}{_FIELD_SEP}{mid}{_FIELD_SEP}{ref}")
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "cid": pa.array(cids, pa.int64()),
                "mid": pa.array(mids, pa.int64()),
                "rec": pa.array(recs, pa.string()),
            }
        )
        return t.append_column("__part", part_column(t, ["url"], n_parts))

    def pack_part(group: pa.Table) -> pa.Table:
        # ONE call per coarse url-hash partition (a 10^12-page corpus
        # would pay 10^12 per-url map_groups calls in the naive shape):
        # vectorized sort + url segment boundaries, then a string join
        # per url
        t, starts, ends = sorted_segments(
            group, ["url"], extra_sort=[("cid", "ascending"), ("mid", "ascending")]
        )
        recs = t.column("rec").to_pylist()
        url_col = t.column("url")
        return pa.table(
            {
                "url": url_col.take(pa.array(starts)),
                "ann_blob": pa.array(
                    [_REC_SEP.join(recs[s:e]) for s, e in zip(starts, ends)], pa.string()
                ),
            }
        )

    return (
        links.map_batches(flatten, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pack_part, batch_format="pyarrow")
    )


def annotate_html(html: bytes, refs: dict[tuple[int, int], str]) -> bytes:
    """Insert ``ref_auto`` attributes into one page's NE opening tags.

    Pure per-page primitive (also the naive oracle surface for the
    golden test).  Only bytes inside tags change; the tag-stripped text
    is untouched."""
    out = bytearray()
    last = 0
    for cid, p_match in enumerate(_P_RE.finditer(html)):
        inner = p_match.group(1).decode("utf-8")
        new_inner_parts: list[str] = []
        ipos = 0
        for mid, m in enumerate(_NE_OPEN_RE.finditer(inner)):
            new_inner_parts.append(inner[ipos : m.end() - 1])  # up to '>'
            ref = refs.get((cid, mid))
            if ref is not None:
                quoted = ref.replace("&", "&amp;").replace('"', "&quot;")
                new_inner_parts.append(f' ref_auto="{quoted}"')
            new_inner_parts.append(">")
            ipos = m.end()
        new_inner_parts.append(inner[ipos:])
        new_inner = "".join(new_inner_parts)
        out += html[last : p_match.start(1)]
        out += new_inner.encode("utf-8")
        last = p_match.end(1)
    out += html[last:]
    return bytes(out)


def annotated_pages(
    pages: rd.Dataset,
    links: rd.Dataset,
    add_scores: bool = False,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """pages ⨝ links -> (url, html) with ``ref_auto`` attributes — the
    produceResults sink as a streaming Dataset (write_parquet it).

    Pages without any link pass through unmodified (left outer join)."""
    from .joins import default_join_partitions, staged_nonempty

    # Build side must be staged+compacted: an all-empty blobs side (no
    # linked mentions at all) would otherwise hit the Ray 2.49
    # first-block schema-broadcast trap (see joins.staged_nonempty).
    blobs = staged_nonempty(_links_to_blobs(links, add_scores=add_scores))
    if blobs is None:
        # left_outer identity: no annotations to insert anywhere.
        return pages.map_batches(
            lambda b: b.select(["url", "html"]), batch_format="pyarrow"
        )
    # the LEFT side hits the same trap (a filter-emptied leading pages
    # block loses the broadcast — canonicalize_triples_join's rule)
    pages = staged_nonempty(pages)
    if pages is None:  # no pages at all -> nothing to annotate
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())})
        )
    joined = pages.join(
        blobs,
        join_type="left_outer",
        num_partitions=num_partitions or default_join_partitions(),
        on=("url",),
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        blobs_col = batch.column("ann_blob").to_pylist()
        out = []
        for html, blob in zip(htmls, blobs_col):
            if not blob:
                out.append(html)
                continue
            refs: dict[tuple[int, int], str] = {}
            for rec in blob.split(_REC_SEP):
                cid, mid, ref = rec.split(_FIELD_SEP, 2)
                refs[(int(cid), int(mid))] = ref
            out.append(annotate_html(html, refs))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(out, pa.binary())}
        )

    return joined.map_batches(rewrite, batch_format="pyarrow")
