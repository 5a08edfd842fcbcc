"""URL canonicalization, domain extraction, and recrawl dedup for
Common-Crawl-style page tables (the ``input_hint`` schema: url, warc_ts,
html, text, lang).

Standard webtext-pipeline front matter (C4/CCNet both key their page
dedup and blocklists on a normalized URL): canonicalization makes
recrawls of the same resource collide; the blocklist filter and the
latest-capture-wins dedup then run on the canonical key.

Ray shape: canonicalization is a stateless ``map_batches`` (stdlib
``urllib`` parsing per row — text-opaque work, same contract as the
HTML extract stage); blocklists broadcast via ``ray.put``; recrawl
dedup is a hash-partitioned ``groupby(canonical_url)`` argmax on
``warc_ts`` with per-block pre-reduction so the shuffle only carries
one candidate row per (block, url).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

#: query params that never identify content (tracking/session noise)
TRACKING_PARAMS = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref", "referrer",
        "sessionid", "phpsessid", "jsessionid", "sid",
    }
)

#: minimal multi-label public suffixes for registered-domain splitting.
#: Honest limitation: the full Mozilla public-suffix list isn't bundled
#: in this environment; unknown multi-label suffixes fall back to the
#: last-two-labels rule.
_TWO_LABEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
        "co.nz", "co.za", "com.ar", "com.tr", "com.sg",
    }
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Normalize one URL: lowercase scheme+host, strip default port and
    fragment, drop tracking params, sort surviving query params, and
    normalize an empty path to '/'.  Malformed inputs return stripped
    lowercase as-is (never raises — one bad row must not kill a block)."""
    try:
        s = urlsplit(url.strip())
    except ValueError:
        return url.strip().lower()
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or "/"
    q = [
        (k, v)
        for k, v in parse_qsl(s.query, keep_blank_values=True)
        if k.lower() not in TRACKING_PARAMS
    ]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


def registered_domain(host: str) -> str:
    """example.org for www.sub.example.org; co.uk-style suffixes from
    the bundled table, else last-two-labels."""
    labels = host.lower().strip(".").split(".")
    if len(labels) <= 2:
        return ".".join(labels)
    if ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


class UrlNormalizer:
    """map_batches stage: adds canonical_url / host / domain /
    path_depth columns to a pages batch."""

    def __init__(self, url_column: str = "url") -> None:
        self.url_column = url_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        canon, hosts, domains, depth = [], [], [], []
        for u in batch.column(self.url_column).to_pylist():
            cu = canonicalize_url(u or "")
            s = urlsplit(cu)
            host = s.hostname or ""
            canon.append(cu)
            hosts.append(host)
            domains.append(registered_domain(host) if host else "")
            depth.append(sum(1 for p in (s.path or "").split("/") if p))
        return (
            batch.append_column("canonical_url", pa.array(canon, pa.string()))
            .append_column("host", pa.array(hosts, pa.string()))
            .append_column("domain", pa.array(domains, pa.string()))
            .append_column("path_depth", pa.array(depth, pa.int64()))
        )


def filter_blocked_domains(pages: rd.Dataset, blocklist, domain_column: str = "domain") -> rd.Dataset:
    """Drop pages whose registered domain is blocklisted; the list is
    broadcast once (blocklists are thousands of entries, never
    corpus-sized)."""
    import ray

    bref = ray.put(frozenset(d.lower() for d in blocklist))

    def filt(batch: pa.Table) -> pa.Table:
        blocked = ray.get(bref)
        mask = [d not in blocked for d in batch.column(domain_column).to_pylist()]
        return batch.filter(pa.array(mask))

    return pages.map_batches(filt, batch_format="pyarrow", batch_size=None)


def dedup_recrawls(
    pages: rd.Dataset,
    url_column: str = "canonical_url",
    ts_column: str = "warc_ts",
) -> rd.Dataset:
    """Latest-capture-wins page dedup on the canonical URL (the
    Common-Crawl recrawl collapse).  Per-block argmax first, so the
    ``groupby`` shuffle moves at most one row per (block, url); ties on
    the timestamp break deterministically by max raw ``url`` so output
    is partition-invariant."""

    def block_latest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        # timestamps sort as int64 after us-normalization (CLAUDE.md:
        # pandas-written parquet is ns, fixture data us)
        ts = t.column(ts_column).cast(pa.timestamp("us"))
        t = t.set_column(t.schema.get_field_index(ts_column), ts_column, ts)
        order = pc.sort_indices(
            t,
            sort_keys=[
                (url_column, "ascending"),
                (ts_column, "descending"),
                ("url", "descending"),
            ],
        )
        t = t.take(order)
        urls = t.column(url_column).to_pylist()
        first = np.ones(len(urls), dtype=bool)
        first[1:] = np.asarray(urls[1:]) != np.asarray(urls[:-1])
        return t.filter(pa.array(first))

    blocked = pages.map_batches(block_latest, batch_format="pyarrow", batch_size=None)

    def group_latest(t: pa.Table) -> pa.Table:
        return block_latest(t)

    return blocked.groupby(url_column).map_groups(group_latest, batch_format="pyarrow")
