"""Stateless map_batches stages: extract text, split contexts, detect mentions.

Re-expresses S1/S2/M4/M15 (SURVEY.md §2) over Arrow batches.  All three
UDFs are ``pa.Table -> pa.Table`` (``batch_format="pyarrow"``); Ray's
operator fusion runs them as one pipelined stage, and the ``html``
column is DROPPED at the first opportunity (SURVEY.md §7.5: multi-MB
binary rows must not travel further than necessary).

HTML parsing and mention scanning are intrinsically per-document string
work; the UDFs loop over the column's pylist once and build output
columns in one shot (no per-row Dataset ops, no pandas round-trip).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.normalize import normalize_mention
from ..core.textextract import detect_mentions, extract_text, split_context_html, strip_tags

CONTEXT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("context_id", pa.int32()),
        ("context_html", pa.string()),
        ("text", pa.string()),
    ]
)

MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("context_id", pa.int32()),
        ("mention_id", pa.int32()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("ne_type", pa.string()),
    ]
)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages -> (url, warc_ts, lang, html, text_extracted): M15.

    Recomputes ``text`` from ``html``; the per-url byte-identical
    invariant (BASELINE.json input_hint) is checked by comparing to the
    input's ``text`` column (see pipelines.kg.verify_text_invariant).
    """
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()], pa.string()
    )
    return batch.append_column("text_extracted", texts)


def pages_to_contexts(batch: pa.Table) -> pa.Table:
    """page rows -> context rows (S2); drops ``html`` afterwards."""
    urls_in = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    urls: list[str] = []
    ctx_ids: list[int] = []
    ctx_htmls: list[str] = []
    texts: list[str] = []
    for url, html in zip(urls_in, htmls):
        for i, inner in enumerate(split_context_html(html)):
            urls.append(url)
            ctx_ids.append(i)
            ctx_htmls.append(inner)
            texts.append(strip_tags(inner))
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ctx_ids, pa.int32()),
            pa.array(ctx_htmls, pa.string()),
            pa.array(texts, pa.string()),
        ],
        schema=CONTEXT_SCHEMA,
    )


def contexts_to_mentions(batch: pa.Table) -> pa.Table:
    """context rows -> mention rows (M4 + M1 normalization fused in)."""
    urls_in = batch.column("url").to_pylist()
    ctx_ids_in = batch.column("context_id").to_pylist()
    ctx_htmls = batch.column("context_html").to_pylist()
    cols: dict[str, list] = {k: [] for k in MENTION_SCHEMA.names}
    for url, cid, inner in zip(urls_in, ctx_ids_in, ctx_htmls):
        for mid, m in enumerate(detect_mentions(inner)):
            cols["url"].append(url)
            cols["context_id"].append(cid)
            cols["mention_id"].append(mid)
            cols["surface"].append(m.surface)
            cols["norm"].append(normalize_mention(m.surface))
            cols["span_start"].append(m.start)
            cols["span_end"].append(m.end)
            cols["ne_type"].append(m.ne_type)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in MENTION_SCHEMA],
        schema=MENTION_SCHEMA,
    )
