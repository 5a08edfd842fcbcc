"""TEI XML ingestion: the reference's native corpus format -> pages table.

The reference consumes TEI files (file or folder expansion,
MainNELApp.java:184-226), splits contexts with a configurable XPath
(default ``//body//p``; the semi-automatic tool uses
``//body//head|//body//item|//body//l|//body//p``,
SemiAutomaticTEIAnnotation.java:47), and scans ``persName`` /
``placeName`` descendants for pre-tagged mentions
(MainNELApp.java:233-244).  Gold TEI carries the truth in each tag's
``ref`` attribute (ResultsAndEvaluationNEL.java:240-257).

This module is the adoption bridge: a directory of TEI files becomes
the engine's ``pages`` table — each context element re-serialized as a
``<p>`` whose NE tags become ``<span class="ne" data-type="T">`` (the
web analogue used everywhere downstream), with the ``extract_text``
invariant holding by construction — plus an optional ``gold`` table
from the ``ref`` attributes.

Distribution shape: ``ray.data.read_binary_files`` (one file = one row,
many files = many blocks) -> stateless ``map_batches`` parse.  Parsing
is stdlib ``xml.etree`` (namespace-agnostic via localname matching); a
malformed file yields one error row (``parse_ok=false``) rather than
failing the job — at 10^7 files some WILL be malformed.
"""

from __future__ import annotations

import html as _html
import xml.etree.ElementTree as ET

import pyarrow as pa
import ray.data as rd

# TEI tag -> engine NE type (the reference's annotationTag config,
# config-authors-bnf.properties line 4)
DEFAULT_TAG_MAP = {"persName": "PER", "placeName": "LOC"}
# context-splitting element localnames (the union XPath of
# SemiAutomaticTEIAnnotation.java:47; plain //body//p configs are a
# subset and produce identical pages for p-only documents)
CONTEXT_TAGS = ("head", "item", "l", "p")


def _localname(tag) -> str:
    return tag.split("}", 1)[-1] if isinstance(tag, str) else ""


def _iter_contexts(root: ET.Element):
    """Context elements under //body, document order, non-nested (an
    <item> inside a <p> is part of the outer context, not its own)."""
    for body in root.iter():
        if _localname(body.tag) != "body":
            continue
        stack = list(reversed(list(body)))
        while stack:
            el = stack.pop()
            if _localname(el.tag) in CONTEXT_TAGS:
                yield el
            else:
                stack.extend(reversed(list(el)))
        return


def _render_context(el: ET.Element, tag_map: dict[str, str]):
    """(html_fragment, records) for one context element: NE descendants
    become ``<span class="ne" data-type>`` tags; everything else is
    flattened to escaped text, so ``extract_text`` recovers exactly the
    concatenated character data.  records = (mention_id, surface,
    ne_type, ref-attr-or-None) in document order."""
    parts: list[str] = []
    records: list[tuple[int, str, str, str | None]] = []

    def esc(s: str | None) -> str:
        return _html.escape(s or "", quote=False)

    def walk(node: ET.Element, inside_ne: bool) -> None:
        ne_type = tag_map.get(_localname(node.tag))
        if ne_type is not None and not inside_ne:
            surface = "".join(node.itertext())
            records.append((len(records), surface, ne_type, node.get("ref")))
            parts.append(f'<span class="ne" data-type="{ne_type}">')
            parts.append(esc(surface))
            parts.append("</span>")
        else:
            parts.append(esc(node.text))
            for child in node:
                walk(child, inside_ne or ne_type is not None)
        parts.append(esc(node.tail))

    parts.append(esc(el.text))
    for child in el:
        walk(child, False)
    return "".join(parts), records


def parse_tei_batch(batch: pa.Table, tag_map: dict[str, str] | None = None) -> pa.Table:
    """(path, bytes) rows -> pages rows (url, html, text, parse_ok) +
    serialized gold records (tab/record-separator packed — split by the
    ``tei_gold`` view)."""
    from ..core.textextract import extract_text

    tag_map = tag_map or DEFAULT_TAG_MAP
    urls, htmls, texts, oks, golds = [], [], [], [], []
    for path, data in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
        url = "file://" + path
        try:
            root = ET.fromstring(data)
            paras, gold_recs = [], []
            for cid, el in enumerate(_iter_contexts(root)):
                frag, records = _render_context(el, tag_map)
                paras.append(f"<p>{frag}</p>")
                for mid, surface, ne_type, ref in records:
                    gold_recs.append(
                        f"{cid}\x1f{mid}\x1f{surface}\x1f{ne_type}\x1f{ref or ''}"
                    )
            html_doc = ("<html><body>" + "".join(paras) + "</body></html>").encode("utf-8")
            urls.append(url)
            htmls.append(html_doc)
            texts.append(extract_text(html_doc))
            oks.append(True)
            golds.append("\x1e".join(gold_recs))
        except ET.ParseError:
            urls.append(url)
            htmls.append(b"<html><body></body></html>")
            texts.append("")
            oks.append(False)
            golds.append("")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "parse_ok": pa.array(oks, pa.bool_()),
            "__gold": pa.array(golds, pa.string()),
        }
    )


def read_tei_pages(
    paths: str | list[str], tag_map: dict[str, str] | None = None
) -> rd.Dataset:
    """Directory (or file list) of TEI XML -> pages Dataset with the
    engine's (url, html, text) schema; feed straight to
    ``run_pipeline``.  One file per row; block parallelism comes from
    the file count exactly as with parquet shards."""
    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(
        lambda t: parse_tei_batch(t, tag_map).drop_columns("__gold"),
        batch_format="pyarrow",
    )


def read_tei_gold(
    paths: str | list[str], tag_map: dict[str, str] | None = None
) -> rd.Dataset:
    """Gold rows (url, context_id, mention_id, surface, ne_type,
    gold_uri) from the TEI ``ref`` attributes — the reference's gold
    evaluation input (ResultsAndEvaluationNEL.java:240-257), as a
    Dataset joinable against the pipeline's links."""

    def unpack(batch: pa.Table) -> pa.Table:
        urls, cids, mids, surfs, types, refs = [], [], [], [], [], []
        for url, blob in zip(
            batch.column("url").to_pylist(), batch.column("__gold").to_pylist()
        ):
            if not blob:
                continue
            for rec in blob.split("\x1e"):
                cid, mid, surface, ne_type, ref = rec.split("\x1f")
                urls.append(url)
                cids.append(int(cid))
                mids.append(int(mid))
                surfs.append(surface)
                types.append(ne_type)
                refs.append(ref or None)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "context_id": pa.array(cids, pa.int32()),
                "mention_id": pa.array(mids, pa.int32()),
                "surface": pa.array(surfs, pa.string()),
                "ne_type": pa.array(types, pa.string()),
                "gold_uri": pa.array(refs, pa.string()),
            }
        )

    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(
        lambda t: unpack(parse_tei_batch(t, tag_map)), batch_format="pyarrow"
    )
