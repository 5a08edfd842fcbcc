"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on /root/testdata/sf0.001-scale
synthetic fixtures; ``queries()`` exposes 90 callables covering the
SURVEY.md §2 operator families plus the training-data extras;
``oracle_sql()`` gives the DuckDB equivalent for the 58 SQL-expressible
queries (same column names — the driver hash-compares values with
columns sorted by name; floats rounded identically on both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in reden_ray) calls ``ray.init``/``ray.shutdown``.

KG-specific queries (kg_*) and the LSH/dedup approximations run on this
repo's deterministic fixture tables (generated under /tmp, seeded) and
are checked by the in-repo golden tests instead of SQL oracles — the
driver records rows-only checks for them.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_FIXTURE_SCALE = {  # sf_dir basename -> fixture generation params
    "sf0.001": dict(n_docs=60, n_entities=60, n_topics=10, seed=42),
    "sf0.01": dict(n_docs=200, n_entities=60, n_topics=10, seed=42),
    "sf0.1": dict(n_docs=2000, n_entities=120, n_topics=16, seed=42),
}


def _fixture_for(sf_dir: str) -> str:
    import os

    from reden_ray.sources.fixtures import fixture_dir

    base = os.path.basename(sf_dir.rstrip("/"))
    params = _FIXTURE_SCALE.get(base, _FIXTURE_SCALE["sf0.01"])
    return fixture_dir(**params)


def _kg_entity_pagerank(sf_dir: str):
    """Corpus-level PageRank over the emitted subject→object entity
    graph (rows-only; the recurrence is golden-locked against a numpy
    reference in tests/test_graphrank.py).  Iterations bounded for the
    driver check; at scale raise max_iters / tighten tol."""
    from reden_ray.pipelines.graphrank import entity_pagerank
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    triples = triples_view(run_fixture_pipeline(_fixture_for(sf_dir)))
    return entity_pagerank(triples, max_iters=5, tol=1e-4)


def _kg_entity_pagerank_2it(sf_dir: str):
    """TWO fixed power iterations of the PRODUCTION ``pagerank_ds`` over
    the emitted subject→object entity graph (tol=None -> exactly 2
    rounds).  A fixed iteration count makes the recurrence
    SQL-expressible as unrolled MATERIALIZED CTEs over the oracled
    kg_triples linker SQL — so the driver-free PageRank machinery
    (edge⨝outdeg join, dangling-mass scalar, update join) sits under a
    DuckDB hash gate; the tol-converged production variant
    (kg_entity_pagerank) stays numpy-golden."""
    import numpy as np
    import pyarrow as pa

    from reden_ray.pipelines.graphrank import entity_pagerank
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    triples = triples_view(run_fixture_pipeline(_fixture_for(sf_dir)))
    ranks = entity_pagerank(triples, max_iters=2, tol=None)

    def rnd(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": t.column("u"),
                "rank": pa.array(np.floor(r * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def _web_url_dedup(sf_dir: str):
    """Pages front matter: canonicalize urls, drop blocklisted domains,
    collapse recrawls latest-capture-wins.  The fixture's urls are all
    clean and unique, so the input is AUGMENTED with deterministic messy
    variants that make every rule demonstrably fire: doc%3==0 gets an
    UPPERCASE-host + explicit-default-port + tracking-params recrawl one
    day later (canonicalizes back onto the original url -> the dedup
    argmax must pick the later capture), doc%5==0 gets an unsorted
    mixed query (tracking params dropped, survivors sorted -> a NEW
    canonical key), doc%7==0 gets a blocklisted-domain copy (filtered).
    Hash-verified: the oracle replays the derivation and the known
    canonical forms in SQL."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.urls import UrlNormalizer, dedup_recrawls, filter_blocked_domains

    pages = rd.read_parquet(
        f"{_fixture_for(sf_dir)}/pages.parquet", columns=["url", "warc_ts"]
    )

    def augment(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        ts = (
            t.column("warc_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
        )
        day = np.timedelta64(86400_000_000, "us")
        out_u: list[str] = []
        out_t: list = []
        for u, w in zip(urls, ts):
            i = int(u[-8:])
            path = u[19:]  # strip 'https://example.org'
            out_u.append(u)
            out_t.append(w)
            if i % 3 == 0:  # messy recrawl, one day later
                out_u.append(f"HTTPS://EXAMPLE.ORG:443{path}?utm_source=feed&ref=x")
                out_t.append(w + day)
            if i % 5 == 0:  # unsorted query with tracking noise
                out_u.append(f"{u}?b=2&a=1&utm_campaign=z")
                out_t.append(w)
            if i % 7 == 0:  # blocklisted domain copy
                out_u.append(f"https://spam.invalid{path}")
                out_t.append(w)
        return pa.table(
            {
                "url": pa.array(out_u, pa.string()),
                "warc_ts": pa.array(np.array(out_t, dtype="datetime64[us]")),
            }
        )

    aug = pages.map_batches(augment, batch_format="pyarrow", batch_size=None)
    norm = aug.map_batches(UrlNormalizer(), batch_format="pyarrow", batch_size=None)
    return dedup_recrawls(
        filter_blocked_domains(norm, ["spam.invalid"])
    ).select_columns(["canonical_url", "domain", "warc_ts"])


# ---------------------------------------------------------------------------
# Full degree-centrality linker expressed in DuckDB SQL (the kg_links_degree /
# kg_triples / kg_pred_frequency / kg_ambiguity_report oracles).  Replicates,
# over the fixture parquet, the exact per-context algorithm of
# reden_ray.core.linker (mention extraction, dictionary candidate groups with
# last-NE-type-wins merge, sameAs equivalence crediting in canonical scan
# order, hub fusion with first-edge-wins, 2-surface pruning, weighted degree
# centrality / (n-1), argmax with last-inserted tie-break, preferred-URI ALL
# expansion via the last-writer inverted index).  Verified MATCH vs the Ray
# pipeline at sf0.001 and sf0.01.  {FX} is the fixture dir (sf0.01 shape --
# the scale the driver and the pytest oracle harness compare at).
_KG_HEAD = """\
-- Full degree-centrality entity-linking oracle over the fixture parquet.
-- {FX} is replaced with the fixture dir.
WITH ser AS (SELECT unnest(generate_series(0, 255)) AS k),
pg AS (SELECT url, decode(html) AS h
       FROM read_parquet('{FX}/pages.parquet/*.parquet')),
ctx AS (
  SELECT url, k AS context_id,
         list_extract(regexp_extract_all(h, '(?s)<p(?:\\s[^>]*)?>(.*?)</p>', 1), k + 1) AS ctx_html
  FROM pg, ser
  WHERE k < len(regexp_extract_all(h, '(?s)<p(?:\\s[^>]*)?>(.*?)</p>', 1))
),
"""

# tagged-path mention + candidate-map CTEs (the reference's own
# <span class="ne"> annotations); the untagged NER variant below
# defines the SAME men2/cmap names so _KG_BODY composes with either.
_KG_MEN_TAGGED = """\
men AS (
  SELECT url, context_id, k AS mention_id,
         list_extract(regexp_extract_all(ctx_html, '(?s)<span class="ne" data-type="([A-Z]+)">(.*?)</span>', 2), k + 1) AS surface,
         list_extract(regexp_extract_all(ctx_html, '(?s)<span class="ne" data-type="([A-Z]+)">(.*?)</span>', 1), k + 1) AS ne_type
  FROM ctx, ser
  WHERE k < len(regexp_extract_all(ctx_html, '(?s)<span class="ne" data-type="([A-Z]+)">(.*?)</span>', 1))
),
men2 AS (SELECT *, lower(regexp_replace(surface, '(\\s|''|-)', '', 'g')) AS norm FROM men),
dict AS (SELECT alias_norm, kind, uri_group, file_row_number AS rn
         FROM read_parquet('{FX}/dictionary.parquet', file_row_number = true)),
grp0 AS (
  SELECT kind, alias_norm, uri_group, min(rn) AS grn
  FROM dict GROUP BY kind, alias_norm, uri_group
),
grp AS (SELECT kind, alias_norm, uri_group,
               row_number() OVER (PARTITION BY kind, alias_norm ORDER BY grn) AS g_idx,
               count(*) OVER (PARTITION BY kind, alias_norm) AS n_groups
        FROM grp0),
-- candidate map per (ctx, surface): last NE type in (PER, LOC) order wins
sk AS (
  SELECT DISTINCT m.url, m.context_id, m.surface, m.norm, m.ne_type
  FROM men2 m
  WHERE EXISTS (SELECT 1 FROM grp g WHERE g.kind = m.ne_type AND g.alias_norm = m.norm)
),
smap AS (
  SELECT url, context_id, surface, norm,
         CASE max(CASE ne_type WHEN 'PER' THEN 1 WHEN 'LOC' THEN 2 END)
              WHEN 1 THEN 'PER' ELSE 'LOC' END AS kind
  FROM sk GROUP BY 1, 2, 3, 4
),
cmap AS (
  SELECT s.url, s.context_id, s.surface, g.uri_group, g.g_idx, g.n_groups
  FROM smap s JOIN grp g ON g.kind = s.kind AND g.alias_norm = s.norm
),
"""

_KG_BODY = """\
route AS (
  SELECT url, context_id,
         CASE WHEN max(n_groups) >= 2 THEN 'Ok' ELSE 'NoAmbiguity' END AS route
  FROM cmap GROUP BY 1, 2
),
-- surfaces in first-appearance order among candidate surfaces
srank AS (
  SELECT url, context_id, surface,
         row_number() OVER (PARTITION BY url, context_id ORDER BY min(first_mid)) AS s_rank
  FROM (
    SELECT c.url, c.context_id, c.surface, min(m.mention_id) AS first_mid
    FROM (SELECT DISTINCT url, context_id, surface FROM cmap) c
    JOIN men2 m USING (url, context_id, surface)
    GROUP BY 1, 2, 3
  ) GROUP BY url, context_id, surface
),
-- (ctx, surface, group, uri) enumeration in canonical scan order
gu AS (
  SELECT c.url, c.context_id, c.surface, r.s_rank, c.g_idx, k + 1 AS u_idx,
         list_extract(c.uri_group, k + 1) AS uri,
         contains(list_extract(c.uri_group, k + 1), 'http://kb.test/') AS is_base
  FROM cmap c JOIN srank r USING (url, context_id, surface), ser
  WHERE k < len(c.uri_group)
),
gbase AS (
  SELECT url, context_id, surface, s_rank, g_idx,
         min(CASE WHEN is_base THEN uri END) AS base
  FROM gu GROUP BY 1, 2, 3, 4, 5
),
adj AS (SELECT subj, pred, obj, file_row_number AS arow
        FROM read_parquet('{FX}/adjacency.parquet', file_row_number = true)),
hasdata AS (SELECT DISTINCT subj FROM adj),
rels AS (SELECT lower(pred) AS pred, weight
         FROM read_parquet('{FX}/rels.parquet')),
-- equivalence references in canonical scan order; first credit per alias wins
refs AS (
  SELECT g.url, g.context_id, gb.base, a.obj AS alias,
         g.s_rank, g.g_idx, g.u_idx, a.arow
  FROM gu g
  JOIN gbase gb USING (url, context_id, surface, s_rank, g_idx)
  JOIN adj a ON a.subj = g.uri AND a.pred = 'http://kb.test/sameAs'
  WHERE g.is_base AND a.obj IN (SELECT subj FROM hasdata)
  UNION ALL
  SELECT g.url, g.context_id, gb.base, g.uri AS alias,
         g.s_rank, g.g_idx, g.u_idx, -1 AS arow
  FROM gu g
  JOIN gbase gb USING (url, context_id, surface, s_rank, g_idx)
  WHERE NOT g.is_base AND g.uri IN (SELECT subj FROM hasdata)
),
cred AS (
  SELECT url, context_id, base, alias, s_rank, g_idx, u_idx, arow,
         row_number() OVER (PARTITION BY url, context_id, alias
                            ORDER BY s_rank, g_idx, u_idx, arow) AS rnk
  FROM refs
),
equiv AS (
  SELECT url, context_id, base, alias,
         row_number() OVER (PARTITION BY url, context_id, base
                            ORDER BY s_rank, g_idx, u_idx, arow) AS eq_order
  FROM cred WHERE rnk = 1
),
-- fusion edges: hub base -> statement objects of each equivalent alias
eraw AS (
  SELECT e.url, e.context_id, e.base AS src, a.obj AS dst, a.pred,
         COALESCE(r.weight, 1.0) AS w, e.eq_order, a.arow
  FROM equiv e
  JOIN adj a ON a.subj = e.alias
  LEFT JOIN rels r ON r.pred = lower(a.pred)
  WHERE a.pred <> 'http://kb.test/sameAs'
    AND lower(e.alias) <> lower(e.base)
    AND lower(a.obj) <> lower(e.base)
),
e1 AS (
  SELECT url, context_id, src, dst, pred, w FROM (
    SELECT *, row_number() OVER (PARTITION BY url, context_id, src, dst
                                 ORDER BY eq_order, arow) AS ernk
    FROM eraw
  ) WHERE ernk = 1
),
colored AS (SELECT DISTINCT url, context_id, base AS uri FROM gbase),
-- inverted index: uri -> LAST-writing surface in canonical scan order
inv AS (
  SELECT url, context_id, uri, surface FROM (
    SELECT url, context_id, uri, surface,
           row_number() OVER (PARTITION BY url, context_id, uri
                              ORDER BY s_rank DESC, g_idx DESC, u_idx DESC) AS rn
    FROM gu
  ) WHERE rn = 1
),
-- prune: non-colored dst kept only if its colored neighbors span >= 2 surfaces
noncol AS (
  SELECT DISTINCT e.url, e.context_id, e.dst
  FROM e1 e
  LEFT JOIN colored c ON c.url = e.url AND c.context_id = e.context_id AND c.uri = e.dst
  WHERE c.uri IS NULL
),
kept_noncol AS (
  SELECT n.url, n.context_id, n.dst
  FROM noncol n
  JOIN e1 e ON e.url = n.url AND e.context_id = n.context_id AND e.dst = n.dst
  JOIN inv i ON i.url = n.url AND i.context_id = n.context_id AND i.uri = e.src
  GROUP BY 1, 2, 3
  HAVING count(DISTINCT i.surface) >= 2
),
pruned_edges AS (
  SELECT e.* FROM e1 e
  WHERE EXISTS (SELECT 1 FROM colored c WHERE c.url = e.url AND c.context_id = e.context_id AND c.uri = e.dst)
     OR EXISTS (SELECT 1 FROM kept_noncol k WHERE k.url = e.url AND k.context_id = e.context_id AND k.dst = e.dst)
),
verts AS (
  SELECT url, context_id, uri FROM colored
  UNION
  SELECT url, context_id, dst AS uri FROM kept_noncol
),
nv AS (SELECT url, context_id, count(*) AS n FROM verts GROUP BY 1, 2),
wd AS (
  SELECT url, context_id, uri, sum(w) AS wdeg FROM (
    SELECT url, context_id, src AS uri, w FROM pruned_edges
    UNION ALL
    SELECT url, context_id, dst AS uri, w FROM pruned_edges
  ) GROUP BY 1, 2, 3
),
cent AS (
  SELECT v.url, v.context_id, v.uri,
         CASE WHEN nv.n <= 1 THEN 0.0
              ELSE COALESCE(wd.wdeg, 0.0) / (nv.n - 1) END AS c
  FROM verts v
  JOIN nv USING (url, context_id)
  LEFT JOIN wd ON wd.url = v.url AND wd.context_id = v.context_id AND wd.uri = v.uri
),
-- per-surface argmax with reference tie-break (last-inserted among max ties)
sres AS (
  SELECT g.url, g.context_id, g.surface, g.uri AS base,
         min(g.g_idx * 1000 + g.u_idx) AS ins
  FROM gu g
  WHERE EXISTS (SELECT 1 FROM colored c WHERE c.url = g.url AND c.context_id = g.context_id AND c.uri = g.uri)
  GROUP BY 1, 2, 3, 4
),
win AS (
  SELECT url, context_id, surface, winner, wscore FROM (
    SELECT s.url, s.context_id, s.surface, s.base AS winner, ct.c AS wscore,
           row_number() OVER (PARTITION BY s.url, s.context_id, s.surface
                              ORDER BY ct.c DESC, s.ins DESC) AS rnk
    FROM sres s
    JOIN cent ct ON ct.url = s.url AND ct.context_id = s.context_id AND ct.uri = s.base
  ) WHERE rnk = 1
),
-- preferred-URI 'ALL' expansion via the winner's inverted-index owner
chosen_str AS (
  SELECT w.url, w.context_id, w.surface, w.wscore,
         string_agg(g.uri, ' ' ORDER BY g.g_idx, g.u_idx) AS chosen
  FROM win w
  JOIN inv o ON o.url = w.url AND o.context_id = w.context_id AND o.uri = w.winner
  JOIN gu g ON g.url = w.url AND g.context_id = w.context_id AND g.surface = o.surface
  WHERE EXISTS (SELECT 1 FROM gu g2
                WHERE g2.url = g.url AND g2.context_id = g.context_id
                  AND g2.surface = g.surface AND g2.g_idx = g.g_idx AND g2.uri = w.winner)
  GROUP BY 1, 2, 3, 4
),
-- group 0 string for NoAmbiguity links
grp1 AS (
  SELECT c.url, c.context_id, c.surface,
         array_to_string(c.uri_group, ' ') AS g0
  FROM cmap c WHERE c.g_idx = 1
),
linked AS (
  SELECT m.url, m.context_id,
         COALESCE(r.route, 'NoAmbiguity') AS route,
         m.mention_id, m.surface, m.ne_type,
         CASE WHEN r.route = 'Ok' AND ch.chosen IS NOT NULL THEN ch.chosen
              WHEN COALESCE(r.route, 'NoAmbiguity') = 'NoAmbiguity' AND g1.g0 IS NOT NULL THEN g1.g0
              ELSE '' END AS chosen,
         CASE WHEN r.route = 'Ok' AND ch.chosen IS NOT NULL
              THEN ROUND(ch.wscore, 6) END AS score,
         CASE WHEN r.route = 'Ok' AND ch.chosen IS NOT NULL THEN 'centrality'
              WHEN COALESCE(r.route, 'NoAmbiguity') = 'NoAmbiguity' AND g1.g0 IS NOT NULL THEN 'unambiguous'
              ELSE 'nil' END AS method
  FROM men2 m
  LEFT JOIN route r USING (url, context_id)
  LEFT JOIN chosen_str ch ON ch.url = m.url AND ch.context_id = m.context_id AND ch.surface = m.surface
  LEFT JOIN grp1 g1 ON g1.url = m.url AND g1.context_id = m.context_id AND g1.surface = m.surface
)
"""

_KG_LINKER_CTES = _KG_HEAD + _KG_MEN_TAGGED + _KG_BODY

# untagged-path mention + candidate-map CTEs: the heuristic NER
# (stages/ner.py) replayed in SQL.  Connector tokens (particles,
# honorific periods) contain no capitals, so every join edge links
# idx-CONSECUTIVE capitalized tokens and runs fall out of a window
# cumsum — no recursion.  Surfaces are rebuilt exactly from the
# token/separator factoring of the tag-stripped context text; the
# ANY-kind candidate lookup is the per-norm dictionary in global row
# order with first-occurrence dedup (state/dictionary.py groups()).
_KG_NER_TOKRE = (
    "[A-ZÀ-Þ][0-9A-Za-z_À-ÿ''-]*|[a-zà-ÿ][a-zà-ÿA-ZÀ-ÿ-]*''?|[^\\s0-9A-Za-z_À-ÿ]"
)
_KG_NER_PARTICLES = "('de','du','des','d''','l''','le','la','les','van','von','da')"
_KG_NER_HONORIFICS = "('M','Mme','Mlle','Dr','Pr','St','Ste')"
_KG_MEN_UNTAGGED = f"""\
ctxt AS (SELECT url, context_id,
   replace(regexp_replace(ctx_html, '<[^>]*>', '', 'g'), '&amp;', '&') AS txt FROM ctx),
ntk AS MATERIALIZED (SELECT url, context_id,
   regexp_extract_all(txt, '{_KG_NER_TOKRE}') AS tk,
   string_split_regex(txt, '{_KG_NER_TOKRE}') AS sp,
   len(regexp_extract_all(txt, '{_KG_NER_TOKRE}')) AS nt FROM ctxt),
toks AS MATERIALIZED (SELECT url, context_id, i.i AS idx, tk[i.i] AS tok
   FROM ntk, unnest(range(1, nt + 1)) i(i)),
caps AS MATERIALIZED (SELECT url, context_id, idx, tok,
   row_number() OVER (PARTITION BY url, context_id ORDER BY idx) AS cap_no
   FROM toks WHERE regexp_matches(tok, '^[A-ZÀ-Þ]')),
eok AS (SELECT a.url, a.context_id, a.cap_no,
   CASE WHEN b.idx = a.idx + 1 THEN TRUE
        WHEN b.idx = a.idx + 2 AND lower(n.tk[a.idx + 1]) IN
          {_KG_NER_PARTICLES} THEN TRUE
        WHEN b.idx = a.idx + 2 AND n.tk[a.idx + 1] = '.' AND
          (a.tok IN {_KG_NER_HONORIFICS} OR length(a.tok) = 1) THEN TRUE
        WHEN b.idx = a.idx + 3 AND n.tk[a.idx + 1] = '.' AND
          (a.tok IN {_KG_NER_HONORIFICS} OR length(a.tok) = 1) AND
          lower(n.tk[a.idx + 2]) IN {_KG_NER_PARTICLES} THEN TRUE
        ELSE FALSE END AS joined
   FROM caps a
   JOIN caps b ON b.url = a.url AND b.context_id = a.context_id AND b.cap_no = a.cap_no + 1
   JOIN ntk n ON n.url = a.url AND n.context_id = a.context_id),
nrn AS (SELECT c.url, c.context_id, c.cap_no, c.idx,
   CASE WHEN e.joined THEN 0 ELSE 1 END AS newr
   FROM caps c LEFT JOIN eok e ON e.url = c.url AND e.context_id = c.context_id
                              AND e.cap_no = c.cap_no - 1),
runs0 AS (SELECT *, sum(newr) OVER (PARTITION BY url, context_id ORDER BY cap_no) AS run_id FROM nrn),
runsg AS (SELECT url, context_id, run_id, min(idx) AS fidx, max(idx) AS lidx,
   count(*) AS n_caps FROM runs0 GROUP BY 1, 2, 3),
runs1 AS (SELECT r.url, r.context_id, r.fidx, r.lidx, r.n_caps, n.tk, n.sp,
   (r.fidx > 1 AND lower(n.tk[r.fidx - 1]) IN ('d''', 'l''') AND n.sp[r.fidx] = '') AS elision,
   (r.fidx = 1 OR n.tk[r.fidx - 1] IN ('.', '!', '?')) AS sent0
   FROM runsg r JOIN ntk n ON n.url = r.url AND n.context_id = r.context_id),
emitr AS (SELECT *,
   CASE WHEN elision THEN tk[fidx - 1] ELSE '' END ||
   array_to_string(list_transform(range(fidx, lidx + 1),
     j -> tk[j] || if(j < lidx, sp[j + 1], '')), '') AS surface
   FROM runs1 WHERE (NOT (sent0 AND NOT elision)) OR n_caps >= 2),
men2 AS (SELECT url, context_id,
   CAST(row_number() OVER (PARTITION BY url, context_id ORDER BY fidx) - 1 AS BIGINT) AS mention_id,
   surface, 'ANY' AS ne_type,
   lower(regexp_replace(surface, '(\\s|''|-)', '', 'g')) AS norm
   FROM emitr),
dict AS (SELECT alias_norm, kind, uri_group, file_row_number AS rn
         FROM read_parquet('{{FX}}/dictionary.parquet', file_row_number = true)),
grpu0 AS (SELECT alias_norm, uri_group, min(rn) AS grn
          FROM dict GROUP BY alias_norm, uri_group),
grp AS (SELECT 'ANY' AS kind, alias_norm, uri_group,
               row_number() OVER (PARTITION BY alias_norm ORDER BY grn) AS g_idx,
               count(*) OVER (PARTITION BY alias_norm) AS n_groups
        FROM grpu0),
cmap AS (
  SELECT DISTINCT m.url, m.context_id, m.surface, g.uri_group, g.g_idx, g.n_groups
  FROM men2 m JOIN grp g ON g.alias_norm = m.norm
),
"""

_KG_LINKER_CTES_UNTAGGED = _KG_HEAD + _KG_MEN_UNTAGGED + _KG_BODY

# dictionary-alias-tagged mention + candidate-map CTEs (stages/dicttag
# replayed in SQL): aliases tokenize with the SAME regex as context
# text, longest-match-per-position is a max() over exact token-window
# joins, and the greedy left-to-right NON-OVERLAPPING sweep is a
# recursive scan whose cursor advances by the match length (or 1) —
# each round advances every context one step, so depth <= tokens per
# context.  Mention kinds come from the alias (single kind, or 'ANY'
# for cross-kind homonyms); the candidate map routes ANY through the
# per-norm dictionary with last-type-wins merge (PER < LOC < ANY).
_KG_MEN_DICTTAG = f"""\
ctxt AS (SELECT url, context_id,
   replace(regexp_replace(ctx_html, '<[^>]*>', '', 'g'), '&amp;', '&') AS txt FROM ctx),
ntk AS MATERIALIZED (SELECT url, context_id,
   regexp_extract_all(txt, '{_KG_NER_TOKRE}') AS tk,
   string_split_regex(txt, '{_KG_NER_TOKRE}') AS sp,
   len(regexp_extract_all(txt, '{_KG_NER_TOKRE}')) AS nt FROM ctxt),
ctxn AS MATERIALIZED (SELECT url, context_id, nt FROM ntk),
dict AS (SELECT alias_norm, kind, alias_raw, uri_group, file_row_number AS rn
         FROM read_parquet('{{FX}}/dictionary.parquet', file_row_number = true)),
atoks AS (SELECT alias_raw, kind,
   regexp_extract_all(alias_raw, '{_KG_NER_TOKRE}') AS atk FROM (
     SELECT DISTINCT alias_raw, kind FROM dict)),
aliases AS MATERIALIZED (
   SELECT array_to_string(atk, ' ') AS akey, len(atk) AS alen,
          CASE WHEN count(DISTINCT kind) = 1 THEN any_value(kind)
               ELSE 'ANY' END AS ne_type
   FROM atoks WHERE len(atk) > 0 GROUP BY 1, 2),
alens AS (SELECT DISTINCT alen FROM aliases),
poskeys AS MATERIALIZED (
   SELECT n.url, n.context_id, p.p, l.alen,
          array_to_string(n.tk[p.p : p.p + l.alen - 1], ' ') AS akey
   FROM ntk n, unnest(range(1, n.nt + 1)) p(p), alens l
   WHERE p.p + l.alen - 1 <= n.nt),
best AS MATERIALIZED (
   SELECT k.url, k.context_id, k.p, max(k.alen) AS mlen
   FROM poskeys k JOIN aliases a ON a.akey = k.akey AND a.alen = k.alen
   GROUP BY 1, 2, 3),
scan AS (
   SELECT url, context_id, 1 AS pos FROM ctxn WHERE nt > 0
   UNION ALL
   SELECT s.url, s.context_id, s.pos + COALESCE(b.mlen, 1) AS pos
   FROM scan s
   JOIN ctxn c ON c.url = s.url AND c.context_id = s.context_id
   LEFT JOIN best b ON b.url = s.url AND b.context_id = s.context_id AND b.p = s.pos
   WHERE s.pos <= c.nt),
hitsm AS (
   SELECT s.url, s.context_id, s.pos AS p, b.mlen AS alen
   FROM scan s JOIN best b ON b.url = s.url AND b.context_id = s.context_id AND b.p = s.pos),
emitd AS (
   SELECT h.url, h.context_id, h.p, h.alen,
          array_to_string(list_transform(range(h.p, h.p + h.alen),
            j -> n.tk[j] || if(j < h.p + h.alen - 1, n.sp[j + 1], '')), '') AS surface,
          array_to_string(n.tk[h.p : h.p + h.alen - 1], ' ') AS akey
   FROM hitsm h JOIN ntk n ON n.url = h.url AND n.context_id = h.context_id),
men2 AS (
   SELECT e.url, e.context_id,
          CAST(row_number() OVER (PARTITION BY e.url, e.context_id ORDER BY e.p) - 1
               AS BIGINT) AS mention_id,
          e.surface, a.ne_type,
          lower(regexp_replace(e.surface, '(\\s|''|-)', '', 'g')) AS norm
   FROM emitd e JOIN aliases a ON a.akey = e.akey AND a.alen = e.alen),
grpk0 AS (SELECT kind, alias_norm, uri_group, min(rn) AS grn
          FROM dict GROUP BY kind, alias_norm, uri_group),
grpk AS (SELECT kind, alias_norm, uri_group,
                row_number() OVER (PARTITION BY kind, alias_norm ORDER BY grn) AS g_idx,
                count(*) OVER (PARTITION BY kind, alias_norm) AS n_groups
         FROM grpk0),
grpu0 AS (SELECT alias_norm, uri_group, min(rn) AS grn
          FROM dict GROUP BY alias_norm, uri_group),
grpu AS (SELECT alias_norm, uri_group,
                row_number() OVER (PARTITION BY alias_norm ORDER BY grn) AS g_idx,
                count(*) OVER (PARTITION BY alias_norm) AS n_groups
         FROM grpu0),
sk AS (SELECT DISTINCT m.url, m.context_id, m.surface, m.norm, m.ne_type FROM men2 m
   WHERE (m.ne_type = 'ANY' AND EXISTS (SELECT 1 FROM grpu g WHERE g.alias_norm = m.norm))
      OR (m.ne_type <> 'ANY' AND EXISTS (SELECT 1 FROM grpk g
            WHERE g.kind = m.ne_type AND g.alias_norm = m.norm))),
smap AS (SELECT url, context_id, surface, norm,
   CASE max(CASE ne_type WHEN 'PER' THEN 1 WHEN 'LOC' THEN 2 WHEN 'ANY' THEN 3 END)
        WHEN 1 THEN 'PER' WHEN 2 THEN 'LOC' ELSE 'ANY' END AS kind
   FROM sk GROUP BY 1, 2, 3, 4),
cmap AS (
  SELECT s.url, s.context_id, s.surface, g.uri_group, g.g_idx, g.n_groups
  FROM smap s JOIN grpk g ON g.kind = s.kind AND g.alias_norm = s.norm
  WHERE s.kind <> 'ANY'
  UNION ALL
  SELECT s.url, s.context_id, s.surface, g.uri_group, g.g_idx, g.n_groups
  FROM smap s JOIN grpu g ON g.alias_norm = s.norm
  WHERE s.kind = 'ANY'
),
"""

_KG_LINKER_CTES_DICTTAG = (_KG_HEAD + _KG_MEN_DICTTAG + _KG_BODY).replace(
    "WITH ser AS", "WITH RECURSIVE ser AS", 1
)

_KG_LINKS_TAIL = """\
SELECT url, CAST(context_id AS INT) AS context_id, route,
       CAST(mention_id AS INT) AS mention_id, surface, ne_type, chosen, score, method
FROM linked
"""

_KG_TRIPLES_TAIL = """\
SELECT e.url, CAST(e.context_id AS INT) AS context_id, e.src AS subj, e.pred,
       e.dst AS obj, e.w AS weight
FROM pruned_edges e JOIN route r ON r.url = e.url AND r.context_id = e.context_id
WHERE r.route = 'Ok'
"""

_KG_PREDFREQ_TAIL = """\
SELECT e.pred, CAST(count(*) AS BIGINT) AS n
FROM pruned_edges e JOIN route r ON r.url = e.url AND r.context_id = e.context_id
WHERE r.route = 'Ok' GROUP BY e.pred
"""

_KG_AMBIGUITY_TAIL = """\
, mng AS (
  SELECT m.url, m.context_id, m.mention_id, m.surface,
         COALESCE(g.n_groups, 0) AS n_groups
  FROM men2 m
  LEFT JOIN (SELECT kind, alias_norm, max(n_groups) AS n_groups
             FROM grp GROUP BY 1, 2) g
         ON g.kind = m.ne_type AND g.alias_norm = m.norm
)
SELECT surface, CAST(count(*) AS BIGINT) AS n_mentions,
       ROUND(avg(n_groups), 6) AS mean_referents,
       CAST(max(n_groups) AS INT) AS max_referents
FROM mng GROUP BY surface
"""

# per-mention candidate groups in dictionary insertion order (the
# ``candidates`` logical table, uri_group tab-joined — the same wire
# format the Ray side emits across Arrow joins)
_KG_CAND_TAIL = """\
SELECT m.url, CAST(m.context_id AS INT) AS context_id,
       CAST(m.mention_id AS INT) AS mention_id,
       CAST(g.g_idx - 1 AS INT) AS cand_rank,
       array_to_string(g.uri_group, chr(9)) AS uri_group_str
FROM men2 m
JOIN grp g ON g.kind = m.ne_type AND g.alias_norm = m.norm
"""

# the seven Hachey-et-al. headline metrics (pipelines/evaluate.py): the
# substring-containment correctness tests ride on a per-(kind, norm)
# space-joined URI concatenation (URIs contain no spaces, so a substring
# can never span two entries), chosen containment on the linked CTE's
# space-joined wire string.  All ratios are count ratios: ROUND in
# DuckDB is half-away, and the Ray side rounds half-away to match.
_KG_EVAL_TAIL = """\
, gold AS (SELECT url, context_id, mention_id, gold_uri
           FROM read_parquet('{FX}/gold.parquet')),
gcat AS (
  SELECT kind, alias_norm, max(n_groups) AS n_groups,
         string_agg(uri, ' ') AS all_uris
  FROM (SELECT g.kind, g.alias_norm, g.n_groups, x.u AS uri
        FROM grp g, unnest(g.uri_group) AS x(u))
  GROUP BY 1, 2
),
pm AS (
  SELECT l.url, l.context_id, l.mention_id,
         COALESCE(gc.n_groups, 0) AS n,
         g.gold_uri IS NOT NULL AND g.gold_uri IS DISTINCT FROM '' AS has_gold,
         g.gold_uri,
         gc.all_uris,
         l.chosen,
         l.chosen <> '' AS has_choice
  FROM linked l
  LEFT JOIN gcat gc
    ON gc.kind = l.ne_type
   AND gc.alias_norm = lower(regexp_replace(l.surface, '(\\s|''|-)', '', 'g'))
  LEFT JOIN gold g ON g.url = l.url AND g.context_id = l.context_id
                  AND g.mention_id = l.mention_id
),
pm2 AS (
  SELECT *,
         has_gold AND COALESCE(contains(all_uris, gold_uri), FALSE) AS gin,
         has_gold AND has_choice AND contains(chosen, gold_uri) AS correct
  FROM pm
)
SELECT CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(sum(CASE WHEN has_gold THEN 1 ELSE 0 END) AS BIGINT) AS n_manual,
       CAST(sum(CASE WHEN NOT has_gold THEN 1 ELSE 0 END) AS BIGINT) AS n_manual_nil,
       ROUND(sum(n)::DOUBLE / count(*), 6) AS candidate_cardinality_mean,
       COALESCE(ROUND(sum(CASE WHEN n > 0 AND gin THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END), 0), 6), 0.0) AS candidate_precision,
       COALESCE(ROUND(sum(CASE WHEN has_gold AND gin THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(sum(CASE WHEN has_gold THEN 1 ELSE 0 END), 0), 6), 0.0) AS candidate_recall,
       COALESCE(ROUND(sum(CASE WHEN n = 0 AND NOT has_gold THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END), 0), 6), 0.0) AS nil_precision,
       COALESCE(ROUND(sum(CASE WHEN n = 0 AND NOT has_gold THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(sum(CASE WHEN NOT has_gold THEN 1 ELSE 0 END), 0), 6), 0.0) AS nil_recall,
       COALESCE(ROUND(sum(CASE WHEN n > 1 AND gin AND correct THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(sum(CASE WHEN n > 1 AND gin THEN 1 ELSE 0 END), 0), 6), 0.0) AS disambiguation_accuracy,
       COALESCE(ROUND((sum(CASE WHEN has_gold AND correct THEN 1 ELSE 0 END)
              + sum(CASE WHEN n = 0 AND NOT has_gold AND NOT has_choice THEN 1 ELSE 0 END))::DOUBLE
             / NULLIF(count(*), 0), 6), 0.0) AS overall_linking_accuracy
FROM pm2
"""


# S7 produceResults under a DuckDB gate: re-serialize every page with
# ref_auto attributes inserted into linked mentions' NE opening tags —
# per-paragraph split/extract on the NE-open regex, positional LEFT
# JOIN against the linked CTE's (context_id, mention_id), then the
# paragraphs spliced back into the page byte-for-byte.
_KG_ANNOT_TAIL = """\
, arefs AS (
  SELECT url, context_id, mention_id,
         ' ref_auto="' || replace(replace(chosen, '&', '&amp;'), '"', '&quot;') || '"' AS ins
  FROM linked WHERE chosen <> ''
),
cseg AS (
  SELECT url, context_id, ctx_html,
         regexp_split_to_array(ctx_html, '(?s)<span\\s+class="ne"\\s+data-type="[^"]+"\\s*>') AS segs,
         regexp_extract_all(ctx_html, '(?s)<span\\s+class="ne"\\s+data-type="[^"]+"\\s*>') AS tags
  FROM ctx
),
cpiece AS (
  SELECT c.url, c.context_id, s.k AS i,
         c.segs[s.k + 1] || substr(c.tags[s.k + 1], 1, length(c.tags[s.k + 1]) - 1)
           || COALESCE(r.ins, '') || '>' AS piece
  FROM cseg c JOIN ser s ON s.k < len(c.tags)
  LEFT JOIN arefs r ON r.url = c.url AND r.context_id = c.context_id
                  AND r.mention_id = s.k
),
cinner AS (
  SELECT c.url, c.context_id,
         COALESCE(b.body, '') || c.segs[len(c.tags) + 1] AS new_inner
  FROM cseg c
  LEFT JOIN (SELECT url, context_id, string_agg(piece, '' ORDER BY i) AS body
             FROM cpiece GROUP BY 1, 2) b USING (url, context_id)
),
pseg AS (
  SELECT url, h,
         regexp_split_to_array(h, '(?s)<p(?:\\s[^>]*)?>.*?</p>') AS segs,
         regexp_extract_all(h, '(?s)(<p(?:\\s[^>]*)?>).*?</p>', 1) AS opens,
         len(regexp_extract_all(h, '(?s)<p(?:\\s[^>]*)?>.*?</p>')) AS np
  FROM pg
),
ppiece AS (
  SELECT p.url, s.k AS i,
         p.segs[s.k + 1] || p.opens[s.k + 1] || ci.new_inner || '</p>' AS piece
  FROM pseg p JOIN ser s ON s.k < p.np
  JOIN cinner ci ON ci.url = p.url AND ci.context_id = s.k
)
SELECT p.url, COALESCE(b.body, '') || p.segs[p.np + 1] AS html
FROM pseg p
LEFT JOIN (SELECT url, string_agg(piece, '' ORDER BY i) AS body
           FROM ppiece GROUP BY url) b USING (url)
"""


# S12/A2/M10 dictionary build in SQL: the author_bnf + place_bnf source
# routes over the entity dump — Java-clean (dash->space, trim), the
# full makeAliases expansion (title/dotted-title/initials variants;
# the fixture dump has no honorific particles or rejected forms, so
# those branches contribute nothing here), LOC dash-variant aliases,
# mention normalization, uri_group = [uri, *equivalents] tab-joined.
_DICT_SOURCES_SQL = """\
WITH dump AS (SELECT * FROM read_parquet('{FX}/entity_dump.parquet')),
per AS (
  SELECT uri, trim(replace(firstname, '-', ' ')) AS f,
         trim(replace(lastname, '-', ' ')) AS l,
         CASE WHEN lower(gender) = 'female' THEN 'Mme' ELSE 'M' END AS t,
         COALESCE(equivalents, []::VARCHAR[]) AS eq
  FROM dump
  WHERE kind = 'PER' AND lastname IS NOT NULL AND lastname <> ''
),
peri AS (
  SELECT *, array_to_string(
      list_filter(string_split(f, ''), c -> regexp_matches(c, '^[A-ZÀ-Þ]$')), ' ') AS ini
  FROM per
),
peralias AS (
  SELECT p.uri, p.eq, a.alias
  FROM peri p,
  unnest(list_distinct(list_concat(list_concat(
    CASE WHEN p.f NOT IN ('-', '')
         THEN [p.f || ' ' || p.l, p.t || ' ' || p.f || ' ' || p.l,
               p.t || '. ' || p.f || ' ' || p.l]
         ELSE []::VARCHAR[] END,
    [p.l, p.t || ' ' || p.l, p.t || '. ' || p.l]),
    CASE WHEN p.ini <> ''
         THEN [p.ini || ' ' || p.l, replace(p.ini, ' ', '. ') || '. ' || p.l]
         ELSE []::VARCHAR[] END
  ))) AS a(alias)
),
loc AS (
  SELECT uri, lastname AS nm, COALESCE(equivalents, []::VARCHAR[]) AS eq
  FROM dump WHERE kind = 'LOC' AND lastname IS NOT NULL AND lastname <> ''
),
localias AS (
  SELECT loc.uri, loc.eq, a.alias
  FROM loc, unnest(list_distinct([nm, replace(nm, '-', ' ')])) AS a(alias)
),
allrows AS (
  SELECT alias, 'PER' AS kind, uri, eq FROM peralias
  UNION ALL
  SELECT alias, 'LOC' AS kind, uri, eq FROM localias
)
SELECT lower(regexp_replace(alias, '(\\s|''|-)', '', 'g')) AS alias_norm,
       alias AS alias_raw, kind,
       array_to_string(list_prepend(uri, eq), chr(9)) AS uri_group_str
FROM allrows
"""

# M15 text-extract invariant recomputed INDEPENDENTLY in SQL: per-page
# tag-strip + entity-unescape (the fixture's only entity is &amp;) of
# each <p> inner, newline-joined, compared against the stored text
# column.  A regression in the engine's extractor flips the Ray side's
# bad_rows off 0 while the SQL stays 0 -> hash mismatch caught.
_KG_TEXTINV_TAIL = """\
, ptext AS (
  SELECT p.url,
         COALESCE(string_agg(replace(regexp_replace(c.ctx_html, '<[^>]*>', '', 'g'),
                                     '&amp;', '&'), chr(10) ORDER BY c.context_id), '') AS ext
  FROM pg p LEFT JOIN ctx c USING (url)
  GROUP BY p.url
)
SELECT CAST(count(*) FILTER (s.text IS DISTINCT FROM t.ext) AS BIGINT) AS bad_rows
FROM read_parquet('{FX}/pages.parquet/*.parquet') s
JOIN ptext t USING (url)
"""


def _kg_canon_sql(pre: str, fx: str, rounds: int = 8) -> str:
    """kg_canonical_triples oracle: min-label connected components over
    the sameAs pairs + dictionary uri_groups (pipelines/canonicalize.py
    semantics — rank-prefixed labels so http://kb.test/ representatives
    win, '0|'/'1|' exactly as init_labels does), UNROLLED min-label
    propagation.  The alias clusters have tiny diameter (the Ray side
    converges within max_iters=5); extra rounds are idempotent, so 8
    gives margin.  Plain CTEs would re-inline the whole chain per round
    — AS MATERIALIZED is load-bearing (CLAUDE.md kcore lesson)."""
    head = f"""\
, cpairs AS MATERIALIZED (
  SELECT subj AS u, obj AS v FROM adj WHERE pred = 'http://kb.test/sameAs'
  UNION ALL
  SELECT obj AS u, subj AS v FROM adj WHERE pred = 'http://kb.test/sameAs'
  UNION ALL
  SELECT d.uri_group[1] AS u, x.o AS v
  FROM (SELECT DISTINCT uri_group FROM read_parquet('{fx}/dictionary.parquet')) d,
       unnest(d.uri_group[2:]) AS x(o)
  UNION ALL
  SELECT x.o AS u, d.uri_group[1] AS v
  FROM (SELECT DISTINCT uri_group FROM read_parquet('{fx}/dictionary.parquet')) d,
       unnest(d.uri_group[2:]) AS x(o)
),
lab0 AS MATERIALIZED (
  SELECT u, min(CASE WHEN contains(u, 'http://kb.test/') THEN '0|' || u
                     ELSE '1|' || u END) AS label
  FROM (SELECT u FROM cpairs UNION SELECT v FROM cpairs) GROUP BY u
)"""
    rounds_sql = []
    for k in range(1, rounds + 1):
        rounds_sql.append(
            f""",
lab{k} AS MATERIALIZED (
  SELECT l.u, least(l.label, COALESCE(min(ln.label), l.label)) AS label
  FROM lab{k - 1} l
  LEFT JOIN cpairs p ON p.u = l.u
  LEFT JOIN lab{k - 1} ln ON ln.u = p.v
  GROUP BY l.u, l.label
)"""
        )
    triples = _KG_TRIPLES_TAIL.strip()
    tail = f""",
canon AS MATERIALIZED (
  SELECT u, substr(label, 3) AS canonical FROM lab{rounds}
)
SELECT t.url, t.context_id,
       COALESCE(cs.canonical, t.subj) AS subj, t.pred,
       COALESCE(co.canonical, t.obj) AS obj, t.weight
FROM ({triples}) t
LEFT JOIN canon cs ON cs.u = t.subj
LEFT JOIN canon co ON co.u = t.obj
"""
    return pre + head + "".join(rounds_sql) + tail


def _kg_pr2_sql(pre: str) -> str:
    """kg_entity_pagerank_2it oracle: the pagerank_ds recurrence
    unrolled twice over the linker-SQL triples.  Mirrors the engine
    bit-for-bit where float literals matter: base is (1.0 - 0.85)/n
    (NOT the 0.15 literal — the EWMA lesson), damping*mass/n keeps the
    engine's left association, update is w*0.85 + add."""
    triples = _KG_TRIPLES_TAIL.strip()
    it = []
    for k in range(2):
        it.append(
            f""",
dm{k} AS (SELECT coalesce(sum(rank) FILTER (dang), 0.0) AS m FROM r{k}),
c{k} AS MATERIALIZED (
  SELECT e.dst AS u, sum(r.rank / CAST(d.dg AS DOUBLE)) AS w
  FROM ed e JOIN r{k} r ON r.u = e.src JOIN odeg d ON d.u = e.src
  GROUP BY 1
),
r{k + 1} AS MATERIALIZED (
  SELECT r{k}.u,
         coalesce(c{k}.w, 0.0) * 0.85
           + ((1.0 - 0.85) / nn.n + 0.85 * dm{k}.m / nn.n) AS rank,
         r{k}.dang
  FROM r{k} LEFT JOIN c{k} ON c{k}.u = r{k}.u, nn, dm{k}
)"""
        )
    return (
        pre
        + f""",
ed AS MATERIALIZED (SELECT subj AS src, obj AS dst FROM ({triples})),
nodes AS MATERIALIZED (SELECT src AS u FROM ed UNION SELECT dst AS u FROM ed),
odeg AS MATERIALIZED (SELECT src AS u, count(*) AS dg FROM ed GROUP BY 1),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS MATERIALIZED (
  SELECT nodes.u, 1.0 / nn.n AS rank, odeg.u IS NULL AS dang
  FROM nodes LEFT JOIN odeg ON odeg.u = nodes.u, nn
)"""
        + "".join(it)
        + "\nSELECT u, ROUND(rank, 6) AS rank FROM r2"
    )


def _kg_oracle_entries() -> dict:
    """Fixture-path-bound oracle SQL for the KG family.  The driver (and
    the pytest oracle harness) compare at sf0.01, so the fixture path is
    pinned to that shape; calling _fixture_for also (re)generates the
    content-addressed fixture so the oracle never races the query."""
    fx = _fixture_for("/root/testdata/sf0.01")
    pre = _KG_LINKER_CTES.replace("{FX}", fx)
    # web_url_dedup: replay the deterministic augmentation and the KNOWN
    # canonical forms of each variant class (see _web_url_dedup), then
    # latest-capture-wins; blocklisted spam.invalid rows never emitted.
    web_url_sql = f"""
WITH p AS (SELECT url, CAST(warc_ts AS TIMESTAMP) AS warc_ts,
                  CAST(substr(url, length(url) - 7, 8) AS INT) AS i,
                  substr(url, 20) AS path
           FROM read_parquet('{fx}/pages.parquet/*.parquet')),
aug AS (
  SELECT url AS canonical_url, warc_ts FROM p
  UNION ALL
  SELECT 'https://example.org' || path, warc_ts + INTERVAL 1 DAY FROM p WHERE i % 3 = 0
  UNION ALL
  SELECT url || '?a=1&b=2', warc_ts FROM p WHERE i % 5 = 0
)
SELECT canonical_url, 'example.org' AS domain, max(warc_ts) AS warc_ts
FROM aug GROUP BY 1
"""
    # two-run composites: tagged and untagged linker SQLs as subqueries
    ta = "(" + pre + _KG_LINKS_TAIL + ")"
    tb = "(" + _KG_LINKER_CTES_UNTAGGED.replace("{FX}", fx) + _KG_LINKS_TAIL + ")"
    two_run_join = (
        f"FROM {ta} a FULL JOIN {tb} b "
        "ON a.url = b.url AND a.context_id = b.context_id "
        "AND a.mention_id = b.mention_id"
    )
    run_diff_sql = (
        "SELECT COALESCE(a.url, b.url) AS url, "
        "CAST(COALESCE(a.context_id, b.context_id) AS BIGINT) AS context_id, "
        "CAST(COALESCE(a.mention_id, b.mention_id) AS BIGINT) AS mention_id, "
        "a.chosen AS chosen_a, b.chosen AS chosen_b, "
        "CASE WHEN a.url IS NULL THEN 'only_b' WHEN b.url IS NULL THEN 'only_a' "
        "ELSE 'changed' END AS status "
        + two_run_join
        + " WHERE a.url IS NULL OR b.url IS NULL OR a.chosen <> b.chosen"
    )
    sig_pairs_sql = (
        "SELECT COALESCE(a.url, b.url) AS url, "
        "CAST(COALESCE(a.context_id, b.context_id) AS BIGINT) AS context_id, "
        "CAST(COALESCE(a.mention_id, b.mention_id) AS BIGINT) AS mention_id, "
        "COALESCE(CASE WHEN a.chosen <> '' THEN a.score END, 0.0) AS score_a, "
        "COALESCE(CASE WHEN b.chosen <> '' THEN b.score END, 0.0) AS score_b "
        + two_run_join
    )
    sig_t_sql = (
        f"WITH p AS ({sig_pairs_sql}), "
        "s AS (SELECT sum(score_a - score_b) AS sum_d, "
        "sum((score_a - score_b) * (score_a - score_b)) AS sum_d2, "
        "count(*) AS n FROM p), "
        "m AS (SELECT n, sum_d / n AS mean, "
        "sqrt(greatest(0.0, (sum_d2 - n * (sum_d / n) * (sum_d / n)) / (n - 1))) AS sd "
        "FROM s) "
        "SELECT CAST(n AS BIGINT) AS n, ROUND(mean, 6) AS mean_diff, "
        "ROUND(sd, 6) AS sd_diff, "
        "ROUND(CASE WHEN sd > 0 THEN mean / (sd / sqrt(n)) ELSE 0.0 END, 6) AS t "
        "FROM m"
    )
    return {
        "kg_links_degree": pre + _KG_LINKS_TAIL,
        "kg_links_untagged_degree": _KG_LINKER_CTES_UNTAGGED.replace("{FX}", fx)
        + _KG_LINKS_TAIL,
        "kg_links_dict_tagged_degree": _KG_LINKER_CTES_DICTTAG.replace("{FX}", fx)
        + _KG_LINKS_TAIL,
        "kg_run_diff": run_diff_sql,
        "kg_significance_pairs": sig_pairs_sql,
        "kg_significance_t": sig_t_sql,
        "kg_triples": pre + _KG_TRIPLES_TAIL,
        "kg_pred_frequency": pre + _KG_PREDFREQ_TAIL,
        "kg_ambiguity_report": pre + _KG_AMBIGUITY_TAIL,
        "kg_candidates": pre + _KG_CAND_TAIL,
        "kg_eval_metrics": pre + _KG_EVAL_TAIL.replace("{FX}", fx),
        "kg_canonical_triples": _kg_canon_sql(pre, fx),
        "kg_entity_pagerank_2it": _kg_pr2_sql(pre),
        "kg_annotated_pages": pre + _KG_ANNOT_TAIL,
        "kg_text_invariant": pre + _KG_TEXTINV_TAIL.replace("{FX}", fx),
        "dict_from_sources": _DICT_SOURCES_SQL.replace("{FX}", fx),
        "web_url_dedup": web_url_sql,
    }


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns the links dataset."""
    from reden_ray.pipelines.kg import links_view, run_fixture_pipeline

    fd = _fixture_for("/root/testdata/sf0.001")
    return links_view(run_fixture_pipeline(fd))


# --- KG pipeline queries (fixture-backed, golden-tested; rows-only) ------

def _kg_links(sf_dir: str):
    from reden_ray.pipelines.kg import links_view, run_fixture_pipeline

    return links_view(run_fixture_pipeline(_fixture_for(sf_dir)))


def _kg_links_degree(sf_dir: str):
    """The full NEL link table under a DuckDB hash gate: links_view with
    ``chosen_uris`` space-joined (the reference's own wire format — the
    preferred-URI 'ALL' expansion is a space-joined string it splits)
    and the degree-centrality score rounded half-away at 6 dp on both
    sides.  Oracle: _KG_LINKER_CTES + _KG_LINKS_TAIL — the whole
    fuse -> prune -> degree -> choose algorithm in SQL."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from reden_ray.pipelines.kg import links_view, run_fixture_pipeline

    links = links_view(run_fixture_pipeline(_fixture_for(sf_dir)))
    return _links_hashable(links)


def _links_hashable(links):
    """links_view -> driver-hashable table: chosen_uris space-joined
    (the reference's own wire format), score rounded half-away 6 dp."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fin(t: pa.Table) -> pa.Table:
        chosen = pc.binary_join(t.column("chosen_uris"), " ")
        s = t.column("score").to_numpy(zero_copy_only=False).astype(np.float64)
        mask = np.isnan(s)
        r = np.floor(s * 1e6 + 0.5) / 1e6  # half-away, scores >= 0
        return pa.table(
            {
                "url": t.column("url"),
                "context_id": t.column("context_id"),
                "route": t.column("route"),
                "mention_id": t.column("mention_id"),
                "surface": t.column("surface"),
                "ne_type": t.column("ne_type"),
                "chosen": chosen,
                "score": pa.array(np.where(mask, np.nan, r), pa.float64(), mask=mask),
                "method": t.column("method"),
            }
        )

    return links.map_batches(fin, batch_format="pyarrow", batch_size=None)


def _kg_links_dict_tagged_degree(sf_dir: str):
    """The dictionary-alias-tagged (semi-automatic annotation) NEL
    pipeline under a DuckDB hash gate: the greedy longest-match alias
    sweep is replayed in SQL as a recursive cursor over precomputed
    best-match-per-position windows, mention kinds come from the alias
    (cross-kind homonyms -> 'ANY'), and the candidate map applies the
    reference's last-type-wins merge (PER < LOC < ANY).  Oracle:
    _KG_LINKER_CTES_DICTTAG + _KG_LINKS_TAIL."""
    from reden_ray.pipelines.kg import links_view, run_dict_tagged_pipeline

    return _links_hashable(links_view(run_dict_tagged_pipeline(_fixture_for(sf_dir))))


def _kg_links_untagged_degree(sf_dir: str):
    """The UNTAGGED (heuristic-NER) NEL pipeline under a DuckDB hash
    gate: the capitalized-run detector (particles, honorific periods,
    elisions, the sentence-initial >=2-caps rule) is replayed in SQL as
    chain edges over idx-consecutive capitals, the ANY-kind candidate
    route as the per-norm global-row-order dictionary, and everything
    downstream (fuse/prune/degree/choose) is the SAME SQL text the
    tagged gate uses (_KG_BODY).  Oracle: _KG_LINKER_CTES_UNTAGGED +
    _KG_LINKS_TAIL."""
    from reden_ray.pipelines.kg import links_view, run_untagged_pipeline

    return _links_hashable(links_view(run_untagged_pipeline(_fixture_for(sf_dir))))


def _kg_triples(sf_dir: str):
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    return triples_view(run_fixture_pipeline(_fixture_for(sf_dir)))


def _kg_candidates(sf_dir: str):
    """Per-candidate rows under a DuckDB hash gate (oracle:
    _KG_LINKER_CTES + _KG_CAND_TAIL): uri_group is tab-joined — the
    same serialization the engine uses across Arrow joins — so the
    driver's CSV canon sees a plain string column."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from reden_ray.pipelines.kg import candidates_dataset, fixture_config, mentions_dataset
    from reden_ray.stages.candidates import explode_candidates
    import ray.data as rd

    fd = _fixture_for(sf_dir)
    cfg = fixture_config(fd)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg)

    def flat(t: pa.Table) -> pa.Table:
        e = explode_candidates(t)
        return pa.table(
            {
                "url": e.column("url"),
                "context_id": e.column("context_id"),
                "mention_id": e.column("mention_id"),
                "cand_rank": e.column("cand_rank"),
                "uri_group_str": pa.array(
                    ["\t".join(g) for g in e.column("uri_group").to_pylist()],
                    pa.string(),
                ),
            }
        )

    return cands.map_batches(flat, batch_format="pyarrow")


def _kg_eval(sf_dir: str):
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from reden_ray.pipelines.evaluate import compute_metrics, eval_records
    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )

    fd = _fixture_for(sf_dir)
    cfg = fixture_config(fd)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    # cands feeds TWO consumers (the linker and the eval join) -> stage
    # it once; links has ONE consumer, so it stays lazy and the linker
    # runs inside the eval execution (one fewer materialization).
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg).materialize()
    links = links_view(linked_dataset(cands, adj_ref, cfg))
    gold = pq.read_table(f"{fd}/gold.parquet")
    m = compute_metrics(eval_records(cands, links, gold))
    # all seven ratios are COUNT ratios: round half-away at 6 dp (DuckDB
    # ROUND semantics) — np.round's half-even diverges on dyadic halves
    import numpy as np

    m = {
        k: (float(np.floor(v * 1e6 + 0.5) / 1e6) if isinstance(v, float) else v)
        for k, v in m.items()
    }
    return pd.DataFrame([m])


def _kg_text_invariant(sf_dir: str):
    import pandas as pd
    import ray.data as rd

    from reden_ray.pipelines.kg import verify_text_invariant

    fd = _fixture_for(sf_dir)
    pages = rd.read_parquet(f"{fd}/pages.parquet")
    return pd.DataFrame([{"bad_rows": verify_text_invariant(pages)}])


def _kg_ambiguity_report(sf_dir: str):
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from reden_ray.pipelines.kg import candidates_dataset, fixture_config, mentions_dataset
    from reden_ray.pipelines.metrics import ambiguity_report

    fd = _fixture_for(sf_dir)
    cfg = fixture_config(fd)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    report = ambiguity_report(candidates_dataset(mentions_dataset(pages), dict_ref, cfg))

    def _round(t):
        import numpy as np
        import pyarrow as pa

        m = t.column("mean_referents").to_numpy(zero_copy_only=False)
        # half-away at 6 dp (values >= 0): count ratios can land exactly
        # on a 6-dp half; DuckDB ROUND is half-away, np.round half-even
        return t.set_column(
            t.schema.get_field_index("mean_referents"),
            "mean_referents",
            pa.array(np.floor(m * 1e6 + 0.5) / 1e6, pa.float64()),
        )

    return report.map_batches(_round, batch_format="pyarrow", batch_size=None)


def _kg_links_untagged(sf_dir: str):
    from reden_ray.pipelines.kg import links_view, run_untagged_pipeline

    return links_view(run_untagged_pipeline(_fixture_for(sf_dir)))


def _kg_links_dict_tagged(sf_dir: str):
    """Semi-automatic annotation path (SemiAutomaticTEIAnnotation.java
    parity): exact dictionary-alias sweep pre-tags the raw text, then the
    standard NEL pipeline links the tagged mentions."""
    from reden_ray.pipelines.kg import links_view, run_dict_tagged_pipeline

    return links_view(run_dict_tagged_pipeline(_fixture_for(sf_dir)))


def _kg_canonical_triples(sf_dir: str):
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import (
        canonicalize_triples_join,
        connected_components_join_ds,
        equivalence_pairs,
    )
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    fd = _fixture_for(sf_dir)
    adjacency = rd.read_parquet(f"{fd}/adjacency.parquet")
    dictionary = rd.read_parquet(f"{fd}/dictionary.parquet")
    pairs = equivalence_pairs(adjacency, "http://kb.test/sameAs", dictionary)
    # fully driver-free: labels stay a Dataset and the triple rewrite is
    # a pair of left-outer hash joins — nothing entity-sized ever lands
    # on the driver (VERDICT r2 item 1).
    mapping, _ = connected_components_join_ds(
        pairs, max_iters=5, prefer_prefix="http://kb.test/"
    )
    triples = triples_view(run_fixture_pipeline(fd))
    return canonicalize_triples_join(triples, mapping)


def _kg_annotated_pages(sf_dir: str):
    """S7 produceResults parity: pages with ref_auto attributes written
    back into every linked mention's NE tag (golden-tested vs an
    independent HTMLParser oracle in tests/test_annotate.py; also under
    a DuckDB hash gate — _KG_ANNOT_TAIL re-serializes the pages in SQL).
    html decoded to utf-8 for the driver's CSV canon (the sink itself
    stays binary — see stages/annotate.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from reden_ray.pipelines.kg import links_view, run_fixture_pipeline
    from reden_ray.stages.annotate import annotated_pages

    fd = _fixture_for(sf_dir)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    links = links_view(run_fixture_pipeline(fd))
    out = annotated_pages(pages, links)
    return out.map_batches(
        lambda t: pa.table(
            {"url": t.column("url"), "html": pc.cast(t.column("html"), pa.string())}
        ),
        batch_format="pyarrow",
    )


def _kg_run_diff(sf_dir: str):
    """Wired run-diff tool (CompareResults.java analogue): per-mention
    diff of the tagged vs heuristic-NER runs on the same corpus."""
    from reden_ray.pipelines.evaluate import diff_runs
    from reden_ray.pipelines.kg import (
        links_view,
        run_fixture_pipeline,
        run_untagged_pipeline,
    )

    fd = _fixture_for(sf_dir)
    tagged = links_view(run_fixture_pipeline(fd))
    untagged = links_view(run_untagged_pipeline(fd))
    return diff_runs(tagged, untagged)


def _rounded_sig_pairs(sf_dir: str):
    """Significance pairs with scores rounded half-away at 6 dp — the
    reference's own precision (it parses scores back out of PRINTED
    'uri(score)' text, SignificanceTesting.java:81-93), and what makes
    the pair table and the paired-t summary DuckDB-hash-comparable
    (the linker oracle emits ROUND(score, 6))."""
    import numpy as np
    import pyarrow as pa

    from reden_ray.pipelines.evaluate import significance_pairs
    from reden_ray.pipelines.kg import (
        links_view,
        run_fixture_pipeline,
        run_untagged_pipeline,
    )

    fd = _fixture_for(sf_dir)
    tagged = links_view(run_fixture_pipeline(fd))
    untagged = links_view(run_untagged_pipeline(fd))
    pairs = significance_pairs(tagged, untagged)

    def rnd(t: pa.Table) -> pa.Table:
        out = {}
        for c in t.schema.names:
            if c.startswith("score_"):
                v = t.column(c).to_numpy(zero_copy_only=False)
                out[c] = pa.array(np.floor(v * 1e6 + 0.5) / 1e6, pa.float64())
            else:
                out[c] = t.column(c)
        return pa.table(out)

    return pairs.map_batches(rnd, batch_format="pyarrow")


def _kg_significance_pairs(sf_dir: str):
    """Significance-test prep (SignificanceTesting.java analogue):
    paired per-mention scores of the tagged vs heuristic-NER runs,
    hash-gated against the full-outer join of the two linker SQLs."""
    return _rounded_sig_pairs(sf_dir)


def _dict_from_sources(sf_dir: str):
    """Per-source extraction registry (QuerySourceInterface analogue):
    route the entity dump through two registered sources and build the
    dictionary; proven equal to the direct dictbuild path in tests."""
    import pyarrow.compute as pc
    import ray.data as rd

    from reden_ray.sources.registry import build_dictionary_from_sources

    fd = _fixture_for(sf_dir)
    dump = rd.read_parquet(f"{fd}/entity_dump.parquet")
    per = dump.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "PER")), batch_format="pyarrow"
    )
    loc = dump.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "LOC")), batch_format="pyarrow"
    )
    built = build_dictionary_from_sources({"author_bnf": per, "place_bnf": loc})
    # uri_group is a list column: serialize for a hashable driver view
    import pyarrow as pa

    def flat(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "alias_norm": t.column("alias_norm"),
                "alias_raw": t.column("alias_raw"),
                "kind": t.column("kind"),
                "uri_group_str": pa.array(
                    ["\t".join(g) for g in t.column("uri_group").to_pylist()],
                    pa.string(),
                ),
            }
        )

    return built.map_batches(flat, batch_format="pyarrow")


def _kg_pred_frequency(sf_dir: str):
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view
    from reden_ray.pipelines.metrics import pred_frequency

    return pred_frequency(triples_view(run_fixture_pipeline(_fixture_for(sf_dir))))


def _pairs_table(ds, schema, sort_cols):
    """Fixture-sized pair Dataset -> deterministic driver table.

    The library pair finders return streaming Datasets (write_parquet
    at scale); the driver contract wants a small stable-schema result,
    so ONLY here do pairs land on the driver."""
    import pyarrow as pa

    t = pa.Table.from_pylist(ds.take_all(), schema=schema)
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[(c, "ascending") for c in sort_cols]))


def _multimodal_image_features(sf_dir: str):
    """Multimodal image pipeline as a driver query, STRICT mode: a
    deterministic table of REAL 24-bit BMP payloads -> actor-pool
    pure-numpy decode + mean-pool grid features -> per-image feature
    rows.  No stub anywhere on this path (stages/multimodal.decode_bmp)."""
    import ray.data as rd

    from reden_ray.stages.multimodal import ImageFeatures, synth_bmp_table

    media = rd.from_arrow(synth_bmp_table(n=64, seed=7))
    return media.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"strict": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )


def _multimodal_audio_chunks(sf_dir: str):
    """Multimodal audio pipeline as a driver query, STRICT mode: REAL
    16-bit PCM WAV payloads -> actor-pool pure-numpy RIFF decode ->
    per-chunk RMS / zero-crossing features
    (stages/multimodal.decode_wav)."""
    import ray.data as rd

    from reden_ray.stages.multimodal import AudioChunker, synth_wav_table

    audio = rd.from_arrow(synth_wav_table(n=24, seed=8, sample_rate=8000))
    return audio.map_batches(
        AudioChunker,
        fn_constructor_kwargs={"sample_rate": 8000, "chunk_s": 0.5, "strict": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )


def _multimodal_video_frames(sf_dir: str):
    """Multimodal video pipeline as a driver query, STRICT mode: REAL
    YUV4MPEG2 (Y4M, C444) payloads -> actor-pool pure-numpy container
    decode -> evenly-spaced frame sampling -> per-frame luma stats +
    mean-pooled thumbnails (stages/multimodal.decode_y4m).  No stub on
    this path."""
    import ray.data as rd

    from reden_ray.stages.multimodal import VideoFrameFeatures, synth_y4m_table

    video = rd.from_arrow(synth_y4m_table(n=24, seed=9))
    return video.map_batches(
        VideoFrameFeatures,
        fn_constructor_kwargs={"n_sample": 4, "grid": 4, "strict": True},
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )


def _kg_significance_t(sf_dir: str):
    """Paired-t summary over the tagged-vs-NER significance pairs
    (SignificanceTesting.java analogue) as a one-row table — computed
    over the 6-dp-rounded pair scores (the reference's own printed
    precision), outputs rounded half-away-from-zero so the DuckDB
    ROUND comparison can't knife-edge."""
    import math

    import pandas as pd

    from reden_ray.pipelines.evaluate import paired_t_stats

    stats = paired_t_stats(_rounded_sig_pairs(sf_dir))

    def away6(v):
        if isinstance(v, int):
            return v
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5) / 1e6, v)

    return pd.DataFrame([{k: away6(v) for k, v in stats.items()}])


def _dedup_minhash(sf_dir: str):
    import ray.data as rd

    from reden_ray.stages.dedup import _MINHASH_PAIR_SCHEMA, minhash_lsh_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.7)
    return _pairs_table(pairs, _MINHASH_PAIR_SCHEMA, ["doc_a", "doc_b"])


def _dedup_minhash_clusters(sf_dir: str):
    """Near-dup CLUSTERS: minhash pairs -> connected components, each
    doc labeled by its cluster's min id (keep-one dedup view).  Pinned
    by a union-find equality test (tests/test_curation.py); no SQL
    oracle (transitive closure over LSH output)."""
    import ray.data as rd

    from reden_ray.pipelines.curation import near_dup_clusters
    from reden_ray.stages.dedup import minhash_lsh_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = near_dup_clusters(minhash_lsh_pairs(docs, threshold=0.7))
    import pyarrow as pa

    rows = sorted((r["doc_id"], r["cluster"]) for r in out.take_all())
    return pa.table(
        {
            "doc_id": pa.array([a for a, _ in rows], pa.int64()),
            "cluster": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def _dedup_simhash(sf_dir: str):
    import ray.data as rd

    from reden_ray.stages.dedup import _SIMHASH_PAIR_SCHEMA, simhash_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = simhash_pairs(docs, max_hamming=3)
    return _pairs_table(pairs, _SIMHASH_PAIR_SCHEMA, ["doc_a", "doc_b"])


def _dedup_embedding(sf_dir: str):
    import ray.data as rd

    from reden_ray.stages.dedup import _EMB_PAIR_SCHEMA, embedding_dup_pairs

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_dup_pairs(emb, threshold=0.98)
    return _pairs_table(pairs, _EMB_PAIR_SCHEMA, ["vec_a", "vec_b"])


def _mixture_sample(sf_dir: str):
    """Deterministic data-mixture draw (stages/mixture.py): per-source
    600-token budget, md5-rank selection, grouped two-pass running sum
    — nothing corpus-sized on the driver."""
    import ray.data as rd

    from reden_ray.stages.mixture import mixture_sample

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return mixture_sample(docs, budgets=600)


def _pack_concat_chunks(sf_dir: str):
    """GPT-style concat-then-chunk sequence packing (stages/packing.py):
    window assignment as ONE ordered-prefix-sum pass; integer-only."""
    import ray.data as rd

    from reden_ray.stages.packing import pack_concat_chunks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_concat_chunks(docs, capacity=256)


def _pack_next_fit(sf_dir: str):
    """Document-boundary next-fit packing, hash-sharded (8 shards):
    the sequential walk is the per-shard map_groups body only."""
    import ray.data as rd

    from reden_ray.stages.packing import pack_next_fit

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_next_fit(docs, capacity=256, n_shards=8)


def _line_dedup(sf_dir: str):
    """Corpus-frequency line-level boilerplate removal
    (stages/lines.py): pages are built deterministically from the
    fixture (texts joined with newlines per doc_id % 37 group, the
    documents having no embedded newlines), then any line appearing in
    >= 2 distinct pages is deleted from every page."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from reden_ray.stages.lines import line_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__page", pa.array(ids % 37))

    def page(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        return pa.table(
            {
                "page_id": pa.array(
                    [int(g.column("__page")[0].as_py())], pa.int64()
                ),
                "text": pa.array(
                    ["\n".join(x or "" for x in g.column("text").to_pylist())],
                    pa.string(),
                ),
            }
        )

    pages = (
        docs.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("__page")
        .map_groups(page, batch_format="pyarrow")
    )
    return line_dedup(pages, min_docs=2, min_chars=1)


def _train_order(sf_dir: str):
    """Deterministic epoch-1 training shuffle rank (stages/ordering.py):
    a global md5 permutation produced by the grouped two-pass scan —
    no global sort, nothing corpus-sized on the driver."""
    import ray.data as rd

    from reden_ray.stages.ordering import train_order

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return train_order(docs, epoch=1)


def _quality_linear(sf_dir: str):
    """Hashed-bag-of-words linear scorer (stages/scoring.py): broadcast
    integer weights (the fasttext-classifier plumbing), one actor-pool
    pass, all-integer output."""
    import ray.data as rd

    from reden_ray.stages.scoring import quality_linear_score

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return quality_linear_score(docs, dim=1024)


def _quality_threshold(sf_dir: str):
    """Per-source quality-quantile cut (stages/scoring.py): threshold =
    k-th largest integer score with k = ceil(0.25 * n_source), computed
    from a score-domain-sized histogram — the integer-exact CCNet
    perplexity-bucket filter shape."""
    import ray.data as rd

    from reden_ray.stages.scoring import quality_threshold_per_source

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return quality_threshold_per_source(docs, top_frac=0.25)


def _dedup_keep_best(sf_dir: str):
    """Quality-aware exact dedup (stages/scoring.py): identical texts
    keep the best-scoring copy (ties -> smallest doc_id); bodies never
    shuffle — only (hash, id, score) triples."""
    import ray.data as rd

    from reden_ray.stages.scoring import dedup_keep_best

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_keep_best(docs)


def _split_mod3(sf_dir: str):
    """Deterministic base/delta snapshot split of the documents table:
    base = doc_id % 3 != 0; delta = the doc_id % 3 == 0 docs PLUS
    re-crawled copies (same text, doc_id + 100000) of every
    doc_id % 5 == 0 page — so the within-delta dedup AND the
    store anti-join both provably drop rows."""
    import pyarrow as pa
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _mod_filter(t: pa.Table, k: int, want_zero: bool) -> pa.Table:
        m = t.column("doc_id").to_numpy(zero_copy_only=False) % k == 0
        return t.filter(pa.array(m if want_zero else ~m))

    def _recrawl(t: pa.Table) -> pa.Table:
        t = _mod_filter(t, 5, True)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) + 100000
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": t.column("text")}
        )

    base = docs.map_batches(
        lambda t: _mod_filter(t, 3, False), batch_format="pyarrow", batch_size=None
    )
    fresh = docs.map_batches(
        lambda t: _mod_filter(t, 3, True), batch_format="pyarrow", batch_size=None
    )
    recrawl = docs.map_batches(_recrawl, batch_format="pyarrow", batch_size=None)
    return base, fresh.union(recrawl)


def _delta_dedup(sf_dir: str):
    """Incremental snapshot ingestion (stages/incremental.py): base
    corpus -> persisted (fp, doc_id) store; delta snapshot deduped
    within itself (min-id winners) then anti-joined against the store
    by hash partition.  Returns surviving delta doc ids."""
    import tempfile

    from reden_ray.stages.incremental import build_fingerprint_store, delta_dedup

    base, delta = _split_mod3(sf_dir)
    store = tempfile.mkdtemp(prefix="fpstore_")
    build_fingerprint_store(base, store)
    return delta_dedup(delta, store).select_columns(["doc_id"])


def _delta_store(sf_dir: str):
    """Full store lifecycle under one gate: build from base, ingest the
    delta (APPENDS survivor fingerprints as new parquet files), then
    RE-READ the store from the written bytes — the token_shards
    convention: the hash gate verifies the files themselves."""
    import tempfile

    from reden_ray.stages.incremental import (
        build_fingerprint_store,
        ingest_snapshot,
        read_store,
    )

    base, delta = _split_mod3(sf_dir)
    store = tempfile.mkdtemp(prefix="fpstore_")
    build_fingerprint_store(base, store)
    ingest_snapshot(delta, store)
    return read_store(store).select_columns(["doc_id"])


def _corpus_diff(sf_dir: str):
    """Snapshot diff (stages/incremental.py): v1 = doc_id % 7 != 0,
    v2 = doc_id % 5 != 0 with text amended (' v2') when doc_id % 11
    == 0 — so added, removed AND changed all occur.  Bodies reduce to
    (id, fp) streams before the full-outer hash join; unchanged rows
    are dropped in the classify map."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from reden_ray.stages.incremental import corpus_diff

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _v1(t: pa.Table) -> pa.Table:
        m = t.column("doc_id").to_numpy(zero_copy_only=False) % 7 != 0
        return t.filter(pa.array(m))

    def _v2(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 5 != 0))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        amended = pc.binary_join_element_wise(
            t.column("text"), pa.array(["v2"] * t.num_rows), " "
        )
        text = pa.compute.if_else(pa.array(ids % 11 == 0), amended, t.column("text"))
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    v1 = docs.map_batches(_v1, batch_format="pyarrow", batch_size=None)
    v2 = docs.map_batches(_v2, batch_format="pyarrow", batch_size=None)
    return corpus_diff(v1, v2)


def _stratified_split(sf_dir: str):
    """Exact-count per-source train/val/test split (stages/textprep.py):
    md5-rank within source, first ceil(10%) -> val, next ceil(10%) ->
    test; integer-only count arithmetic.  Grouped two-pass scan —
    bounded cell table on the driver, one cell shuffle."""
    import ray.data as rd

    from reden_ray.stages.textprep import stratified_split

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return stratified_split(docs, val_pct=10, test_pct=10)


def _neardup_keep_best(sf_dir: str):
    """Cluster-level keep-best: md5-kernel MinHash-LSH near-dup
    clusters (the SQL-replayable twin) keep their highest
    quality_linear_score member, ties -> min doc_id.  Singletons are
    their own cluster (label coalesced to doc_id after a left join);
    the argmax + kept flag are decided inside one cluster-hash
    shuffle of 24-byte rows (pipelines/curation.keep_best_per_cluster)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from reden_ray.pipelines.curation import keep_best_per_cluster, near_dup_clusters
    from reden_ray.stages.dedup import minhash_lsh_pairs
    from reden_ray.stages.joins import hash_join, staged_nonempty
    from reden_ray.stages.scoring import quality_linear_score

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(
        docs,
        threshold=0.5,
        n_perm=16,
        n_bands=4,
        shingle_k=5,
        max_bucket=1_000_000,
        kernel="md5",
    )
    clusters = near_dup_clusters(pairs)
    scores = quality_linear_score(docs, dim=1024).map_batches(
        lambda t: t.select(["doc_id", "score"]), batch_format="pyarrow"
    )
    staged_clusters = staged_nonempty(clusters)
    if staged_clusters is None:
        labeled = scores.map_batches(
            lambda t: t.append_column("cluster", t.column("doc_id")),
            batch_format="pyarrow",
        )
    else:
        joined = hash_join(scores, staged_clusters, on=["doc_id"], how="left_outer")
        labeled = joined.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("cluster"),
                "cluster",
                pc.coalesce(t.column("cluster"), t.column("doc_id")),
            ),
            batch_format="pyarrow",
        )
    return keep_best_per_cluster(labeled)


def _quality_rank(sf_dir: str):
    """Exact per-source rank normalization of the integer quality score
    (stages/scoring.score_rank_per_source): all-integer (rk, n_src)
    output via the value-keyed grouped two-pass scan — score-domain
    census once, one cell-hash shuffle, no global sort."""
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.stages.scoring import _scored, score_rank_per_source

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    scored = _scored(docs, 1024, "doc_id", "text").map_batches(
        lambda t: t.select(["doc_id", "source", "score"]), batch_format="pyarrow"
    )
    return score_rank_per_source(scored)


def _upsample(sf_dir: str):
    """Deterministic source upsampling (stages/upsample.py): weight =
    0.5 + (source index % 4) * 0.5, fractional copies resolved by an
    md5 draw on 1/1024 ticks — one vectorized expansion pass."""
    import ray.data as rd

    from reden_ray.stages.upsample import upsample_sources

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    weights = {f"src{i}": 0.5 + (i % 4) * 0.5 for i in range(1024)}
    return upsample_sources(docs, weights)


def _curriculum(sf_dir: str):
    """Curriculum serving order (stages/curriculum.py): quality tiers
    first (clipped integer model score), md5-shuffled within tier —
    the tier-widened grouped two-pass rank scan."""
    import ray.data as rd

    from reden_ray.stages.curriculum import curriculum_order

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return curriculum_order(docs, epoch=1, clip=8)


def _truncate_tokens(sf_dir: str):
    """Context-length cap (stages/textprep.py): char-exact prefix after
    the 32nd whitespace token — token/separator factoring on both sides."""
    import ray.data as rd

    from reden_ray.stages.textprep import truncate_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return truncate_tokens(docs, max_tokens=32)


def _hash_split(sf_dir: str):
    """Deterministic train/valid/test hash split (stages/textprep.py):
    md5 draw on 1/1000 ticks — stable under corpus growth."""
    import ray.data as rd

    from reden_ray.stages.textprep import hash_split

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return hash_split(docs)


def _serve_ready(sf_dir: str):
    """Serve-ready composite (pipelines/serve.py): keep-best exact
    dedup -> per-source quality-quantile cut over the SURVIVORS ->
    epoch-1 md5 shuffle rank, one streaming chain, bounded driver
    state (histogram + bucket counts)."""
    import ray.data as rd

    from reden_ray.pipelines.serve import serve_ready_corpus

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return serve_ready_corpus(docs, top_frac=0.25, epoch=1)


def _curation_report(sf_dir: str):
    """Per-source attrition datasheet (pipelines/audit.py): raw docs ->
    unique after keep-best dedup -> kept above the per-source quality
    quantile; only bounded aggregates reach the driver."""
    import ray.data as rd

    from reden_ray.pipelines.audit import curation_report

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return curation_report(docs, top_frac=0.25)


def _length_histogram(sf_dir: str):
    """Token-length distribution (pipelines/audit.py): power-of-two
    buckets, block partials + one tiny groupby."""
    import ray.data as rd

    from reden_ray.pipelines.audit import length_histogram

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return length_histogram(docs)


def _token_shards(sf_dir: str):
    """Megatron-style token shard sink (stages/shards.py): writes
    .bin/.idx pairs under a fresh /tmp dir, returns the manifest parsed
    back FROM THE WRITTEN BYTES (the annotated-page-sink gate pattern:
    the oracle hash-match verifies the files, not in-flight values)."""
    import tempfile

    import ray.data as rd

    from reden_ray.stages.shards import write_token_shards

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = tempfile.mkdtemp(prefix="token_shards_")
    return write_token_shards(docs, out, n_shards=8, vocab_size=32000)


def _emb_pca_power_2it(sf_dir: str):
    """PCA machinery under a SQL hash gate: the production moments pass
    (covariance_and_mean) + projection pass (project), with the
    driver-side eigensolve swapped for a 2-step power-iteration
    recurrence a DuckDB CTE chain can unroll (eigh has no SQL form).
    The to-convergence eigh twin (emb_pca_project) stays rows-only."""
    import ray.data as rd

    from reden_ray.stages.pca import pca_power_project

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return pca_power_project(emb, n_iters=2)


def _bpe_merges_2it(sf_dir: str):
    """Fixed-iteration gate for the distributed BPE trainer: 2 merge
    rounds unrolled in SQL (pair stats -> argmax with the (count DESC,
    left, right) tie-break -> greedy-left replace apply).  The
    to-convergence twin (bpe_merges) stays rows-only + Sennrich-golden."""
    import ray.data as rd

    from reden_ray.stages.bpe import bpe_train_merges

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bpe_train_merges(docs, n_merges=2)


def _bpe_token_counts_2it(sf_dir: str):
    """BPE ENCODE under the SQL gate: tokenize every document with the
    2-merge table (rank-priority apply loop == two sequential
    greedy-left replaces for a 2-row table) and count tokens per doc."""
    import ray.data as rd

    from reden_ray.stages.bpe import bpe_encode_docs, bpe_train_merges

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    merges = bpe_train_merges(docs, n_merges=2)
    return bpe_encode_docs(docs, merges).select_columns(["doc_id", "n_bpe_tokens"])


def _dedup_minhash_md5(sf_dir: str):
    """MinHash+LSH through the PRODUCTION band/bucket/distinct
    machinery with the SQL-replayable md5 kernel (Md5MinHasher) —
    the hash gate for the whole LSH pipeline; the blake2b/fmix twin
    (dedup_minhash_docs) stays rows-only because its kernel is not
    SQL-expressible."""
    import ray.data as rd

    from reden_ray.stages.dedup import _MINHASH_PAIR_SCHEMA, minhash_lsh_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(
        docs,
        threshold=0.5,
        n_perm=16,
        n_bands=4,
        shingle_k=5,
        max_bucket=1_000_000,
        kernel="md5",
    )
    return _pairs_table(pairs, _MINHASH_PAIR_SCHEMA, ["doc_a", "doc_b"])


def _dedup_minhash_md5_clusters(sf_dir: str):
    """Near-dup clusters over the md5-kernel MinHash pairs: the full
    pairs -> connected-components -> min-label chain under a DuckDB
    recursive-CTE CC oracle (the blake2b twin stays rows-only)."""
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.pipelines.curation import near_dup_clusters
    from reden_ray.stages.dedup import minhash_lsh_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(
        docs,
        threshold=0.5,
        n_perm=16,
        n_bands=4,
        shingle_k=5,
        max_bucket=1_000_000,
        kernel="md5",
    )
    out = near_dup_clusters(pairs)
    rows = sorted((r["doc_id"], r["cluster"]) for r in out.take_all())
    return pa.table(
        {
            "doc_id": pa.array([a for a, _ in rows], pa.int64()),
            "cluster": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def _dedup_simhash_md5(sf_dir: str):
    """SimHash LSH (4x16-bit bands + in-bucket Hamming verify) through
    the production machinery with the SQL-replayable md5 word-hash
    kernel (Md5SimHasher)."""
    import ray.data as rd

    from reden_ray.stages.dedup import _SIMHASH_PAIR_SCHEMA, simhash_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = simhash_pairs(docs, max_hamming=3, max_bucket=1_000_000, kernel="md5")
    return _pairs_table(pairs, _SIMHASH_PAIR_SCHEMA, ["doc_a", "doc_b"])


def _dedup_embedding_int(sf_dir: str):
    """Integer-exact hyperplane-LSH near-dup pairs (md5-derived integer
    planes, floor-quantized vectors, cross-multiplied cosine threshold)
    — the hash gate for the embedding bucket-then-verify machinery."""
    import ray.data as rd

    from reden_ray.stages.dedup import _EMB_INT_PAIR_SCHEMA, embedding_dup_pairs_int

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # cos >= 3/8 (9/64 squared): the fixture embeddings carry no true
    # near-dups (max pairwise cosine ~0.42), so the gate threshold sits
    # where the bucket-then-verify path emits real rows at every sf.
    pairs = embedding_dup_pairs_int(
        emb, threshold_num=9, threshold_den=64, n_planes=6, quant=1000,
        max_bucket=1_000_000,
    )
    return _pairs_table(pairs, _EMB_INT_PAIR_SCHEMA, ["vec_a", "vec_b"])


def _kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (rows-only;
    the recurrence is golden-locked against a numpy reference in
    tests/test_kmeans.py): per-cluster sizes of the fitted clustering."""
    import ray.data as rd

    from reden_ray.stages.kmeans import kmeans_assign, kmeans_fit

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents, _ = kmeans_fit(emb, k=8, max_iters=8)
    return (
        kmeans_assign(emb, cents)
        .groupby("cluster")
        .count()
        .rename_columns(["cluster", "n"])
    )


def _kmeans_2it_assign(sf_dir: str):
    """TWO fixed Lloyd iterations of the PRODUCTION kmeans_fit (tol=0
    -> no early stop) + final assignment — SQL-expressible because the
    deterministic init (centroid j = vector of the min vec_id in
    residue class j = vec_id j on this dense 0-based table) and the
    argmin/tie-to-lowest/empty-keeps-centroid rules unroll as CTEs.
    The tol-converged production clustering (kmeans_embeddings) stays
    numpy-golden; this puts the iterative machinery under a hash gate
    with an all-integer output."""
    import ray.data as rd

    from reden_ray.stages.kmeans import kmeans_assign, kmeans_fit

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents, _ = kmeans_fit(emb, k=8, max_iters=2, tol=0.0)
    return kmeans_assign(emb, cents).select_columns(["vec_id", "cluster"])


def _knn_ivf_indexed(sf_dir: str):
    """Disk-backed IVF: centroid-partitioned parquet index built under
    /tmp (content-addressed by sf), searched with partition pruning —
    only the probed inverted lists are read."""
    import hashlib
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from reden_ray.stages.similarity import build_ivf_index, knn_ivf_indexed

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    idx_dir = f"/tmp/reden_ivf_{tag}"
    if not os.path.isdir(os.path.join(idx_dir)) or not os.path.exists(
        os.path.join(idx_dir, "_centroids.parquet")
    ):
        build_ivf_index(emb, idx_dir, n_centroids=8, seed=13)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    out = knn_ivf_indexed(idx_dir, vecs[:3], k=5, nprobe=2)
    return out.drop_columns("cosine")  # rank list is the stable artifact


def _knn_ivf_exact(sf_dir: str):
    """The IVF index searched at nprobe == n_centroids — every inverted
    list probed, so the result is EXACT and DuckDB-oracled (cosine
    ranking in SQL).  Same disk index as knn_ivf_indexed; this entry
    hash-gates the whole build/partition-prune/merge machinery, while
    knn_ivf_indexed (nprobe=2) stays the approximate scale path."""
    import hashlib
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from reden_ray.stages.similarity import build_ivf_index, knn_ivf_indexed

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    idx_dir = f"/tmp/reden_ivf_{tag}"
    if not os.path.exists(os.path.join(idx_dir, "_centroids.parquet")):
        build_ivf_index(emb, idx_dir, n_centroids=8, seed=13)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    out = knn_ivf_indexed(idx_dir, vecs[:3], k=5, nprobe=8)
    return out.drop_columns("cosine")


def _knn_ivf_vs_brute(sf_dir: str):
    """Cross-path equivalence gate: the IVF index searched with EVERY
    list probed must equal the brute-force exact top-k row for row —
    the query runs BOTH distributed paths and counts (query_id, rank,
    vec_id) rows in the symmetric difference.  Oracle: that count is 0
    by construction, asserted as constants in SQL, so a regression in
    either path (index build, partition pruning, top-k merge, ranking
    tie-break) flips the hash."""
    import hashlib
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from reden_ray.stages.similarity import build_ivf_index, knn_brute_force, knn_ivf_indexed

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    idx_dir = f"/tmp/reden_ivf_{tag}"
    if not os.path.exists(os.path.join(idx_dir, "_centroids.parquet")):
        build_ivf_index(emb, idx_dir, n_centroids=8, seed=13)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    ivf = knn_ivf_indexed(idx_dir, vecs[:3], k=5, nprobe=8)
    brute = knn_brute_force(emb, vecs[:3], k=5)
    key = lambda tbl: set(
        zip(
            tbl.column("query_id").to_pylist(),
            tbl.column("rank").to_pylist(),
            tbl.column("vec_id").to_pylist(),
        )
    )
    a, b = key(ivf), key(brute)
    return pd.DataFrame(
        [{"n_queries": 3, "k": 5, "n_mismatch": len(a ^ b)}]
    ).astype("int64")


def _curation(sf_dir: str):
    from reden_ray.pipelines.curation import curate_documents

    return curate_documents(sf_dir, min_quality=0.2, min_tokens=5).select_columns(
        ["doc_id", "lang", "source", "n_tokens_ws", "lang_pred"]
    )


def _curation_ngram(sf_dir: str):
    """The curation composite with EXACT trigram-Jaccard near-dup drop
    instead of MinHash: TokenStats+QualityScore+LangId -> quality/length
    filter -> exact dedup -> ngram near-dup anti-join.  Every stage is
    individually oracled elsewhere; this entry puts the COMPOSED chain
    under one DuckDB hash gate (the MinHash default stays rows-only
    because its signature kernel is not SQL-expressible)."""
    from reden_ray.pipelines.curation import curate_documents

    return curate_documents(
        sf_dir,
        min_quality=0.2,
        min_tokens=5,
        near_dup_method="ngram",
        near_dup_threshold=0.8,
    ).select_columns(["doc_id", "lang", "source", "n_tokens_ws", "lang_pred"])


def _curation_md5_minhash(sf_dir: str):
    """The curation composite with the md5-kernel MinHash LSH near-dup
    drop — the SAME chain curation_pipeline runs (blake2b kernel swapped
    for the SQL-replayable md5 one), so the composite with an
    APPROXIMATE near-dup stage sits under a DuckDB hash gate; threshold
    0.5 matches the shared md5-twin banding config (16 perms, 4 bands)."""
    from reden_ray.pipelines.curation import curate_documents

    return curate_documents(
        sf_dir,
        min_quality=0.2,
        min_tokens=5,
        near_dup_method="minhash_md5",
        near_dup_threshold=0.5,
    ).select_columns(["doc_id", "lang", "source", "n_tokens_ws", "lang_pred"])


def _text_quality(sf_dir: str):
    import ray.data as rd

    from reden_ray.stages.textstats import LangId, QualityScore

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        docs.map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 4))
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
        .select_columns(["doc_id", "lang_pred"])
    )


def _approx_count_min(sf_dir: str):
    """Count-Min sketch point-frequency query (stages/cms.py): exact
    per-part counts plus the sketch's deterministic one-sided flag
    (est >= exact always — Count-Min never undercounts), so the oracle
    is plain SQL with TRUE.  Overestimate tightness is pytest-pinned
    (tests/test_cms.py), mirroring the Misra-Gries precedent."""
    from reden_ray.stages.cms import approx_count_min

    return approx_count_min(sf_dir)


def _bpe_merges(sf_dir: str):
    """Distributed BPE merge training over the documents corpus
    (rows-only; merge sequence, tie-breaks and the greedy-left overlap
    rule are golden-locked against a naive Sennrich reference in
    tests/test_bpe.py)."""
    import ray.data as rd

    from reden_ray.stages.bpe import bpe_train_merges

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_train_merges(docs, n_merges=10)


def _bpe_token_counts(sf_dir: str):
    """Train 10 BPE merges on the corpus, then tokenize the same corpus
    with them (per-word-type memoized apply; golden-locked vs a naive
    encoder in tests/test_bpe.py).  Rows-only."""
    import ray.data as rd

    from reden_ray.stages.bpe import bpe_encode_docs, bpe_train_merges

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    merges = bpe_train_merges(docs.select_columns(["text"]), n_merges=10)
    return bpe_encode_docs(docs, merges).select_columns(["doc_id", "n_bpe_tokens"])


def queries() -> dict[str, Callable[[str], Any]]:
    from reden_ray.pipelines import relational as R

    return {
        # relational operator families (DuckDB-oracled)
        "j1_hash_join": R.j1_hash_join,
        "j2_broadcast_join": R.j2_broadcast_join,
        "j5_semi_join": R.j5_semi_join,
        "j6_anti_join": R.j6_anti_join,
        "j8_multiway_revenue": R.j8_multiway_revenue,
        "a1_collect_groups": R.a1_collect_groups,
        "a3_pred_frequency": R.a3_pred_frequency,
        "a5_aggregate_metrics": R.a5_aggregate_metrics,
        "a7_argmax_per_group": R.a7_argmax_per_group,
        "o1_topk": R.o1_topk,
        "d2_distinct": R.d2_distinct,
        "m1_normalize": R.m1_normalize,
        "m8_date_filter": R.m8_date_filter,
        "window_tumbling": R.window_tumbling,
        "window_distinct_users": R.window_distinct_users,
        "window_hopping": R.window_hopping,
        "a9_rollup": R.a9_rollup,
        "a10_cube": R.a10_cube,
        "a11_median_price": R.a11_median_price,
        "o5_rank_per_group": R.o5_rank_per_group,
        "o6_lag_delta": R.o6_lag_delta,
        "o7_running_total": R.o7_running_total,
        "o13_moving_avg": R.o13_moving_avg,
        "o14_ntile": R.o14_ntile,
        "o15_first_last": R.o15_first_last,
        "a14_string_agg": R.a14_string_agg,
        "a15_percentile_cont": R.a15_percentile_cont,
        "text_tfidf_topk": R.text_tfidf_topk,
        "text_bm25_topk": R.text_bm25_topk,
        "text_unigram_logprob": R.text_unigram_logprob,
        "text_bigram_logprob": R.text_bigram_logprob,
        "split_leakage_report": R.split_leakage_report,
        "j10_full_outer": R.j10_full_outer,
        "f1_vector_norm": R.f1_vector_norm,
        "o16_stratified_sample": R.o16_stratified_sample,
        "o17_weighted_sample": R.o17_weighted_sample,
        "text_top_terms": R.text_top_terms,
        "o18_retention": R.o18_retention,
        "o19_funnel": R.o19_funnel,
        "j11_smart_join": R.j11_smart_join,
        "f2_string_funcs": R.f2_string_funcs,
        "f3_date_parts": R.f3_date_parts,
        "approx_top_terms": R.approx_top_terms,
        "o8_asof_join": R.o8_asof_join,
        "o9_range_count": R.o9_range_count,
        "sessionize": R.sessionize,
        "event_transitions": R.event_transitions,
        "event_bursts": R.event_bursts,
        "dedup_exact_docs": R.dedup_exact_docs,
        "dedup_ngram_pairs": R.dedup_ngram_pairs,
        "doc_fingerprints": R.doc_fingerprints,
        "text_token_stats": R.text_token_stats,
        "knn_dot_topk": R.knn_dot_topk,
        "json_extract_props": R.json_extract_props,
        "o3_regex_scan": R.o3_regex_scan,
        "distinct_count_per_group": R.distinct_count_per_group,
        "approx_distinct_count_per_group": R.approx_distinct_count_per_group,
        "approx_quantile_price": R.approx_quantile_price,
        "rank_sketch_quantile_price": R.rank_sketch_quantile_price,
        "approx_distinct_kmv": R.approx_distinct_kmv,
        # webtext curation (Gopher rules / PII / decontamination)
        "wq_repetition_stats": R.wq_repetition_stats,
        "wq_source_quality": R.wq_source_quality,
        "decontaminate_docs": R.decontaminate_docs,
        "pii_redact_docs": R.pii_redact_docs,
        "gopher_filter_docs": R.gopher_filter_docs,
        "c4_span_dedup": R.c4_span_dedup,
        "webtext_curation": R.webtext_curation,
        "a12_corr": R.a12_corr,
        "j9_bloom_semi_join": R.j9_bloom_semi_join,
        "a13_pivot": R.a13_pivot,
        "o10_sample_hash": R.o10_sample_hash,
        "web_url_dedup": _web_url_dedup,
        "kg_entity_pagerank": _kg_entity_pagerank,
        # KG pipeline (fixture-backed; golden-tested in-repo; rows-only here)
        "kg_links": _kg_links,
        # round 5: the full degree-centrality linker under a SQL hash gate
        "kg_links_degree": _kg_links_degree,
        "kg_links_untagged_degree": _kg_links_untagged_degree,
        "kg_links_dict_tagged_degree": _kg_links_dict_tagged_degree,
        "kg_triples": _kg_triples,
        "kg_candidates": _kg_candidates,
        "kg_eval_metrics": _kg_eval,
        "kg_text_invariant": _kg_text_invariant,
        "kg_canonical_triples": _kg_canonical_triples,
        "kg_entity_pagerank_2it": _kg_entity_pagerank_2it,
        "kg_pred_frequency": _kg_pred_frequency,
        "kg_links_untagged": _kg_links_untagged,
        "kg_links_dict_tagged": _kg_links_dict_tagged,
        "kg_ambiguity_report": _kg_ambiguity_report,
        "kg_annotated_pages": _kg_annotated_pages,
        "kg_run_diff": _kg_run_diff,
        "kg_significance_pairs": _kg_significance_pairs,
        "kg_significance_t": _kg_significance_t,
        "multimodal_image_features": _multimodal_image_features,
        "multimodal_audio_chunks": _multimodal_audio_chunks,
        "dict_from_sources": _dict_from_sources,
        # approximate dedup / scoring (algorithmic, rows-only)
        "dedup_minhash_docs": _dedup_minhash,
        "dedup_minhash_clusters": _dedup_minhash_clusters,
        "dedup_simhash_docs": _dedup_simhash,
        "dedup_embedding_docs": _dedup_embedding,
        # round 5: SQL-replayable kernel twins — the SAME LSH machinery
        # under DuckDB hash gates (md5 / integer-exact kernels)
        "emb_pca_power_2it": _emb_pca_power_2it,
        "pack_concat_chunks": _pack_concat_chunks,
        "pack_next_fit_bins": _pack_next_fit,
        "mixture_sample_600": _mixture_sample,
        "line_dedup_pages": _line_dedup,
        "delta_dedup_docs": _delta_dedup,
        "delta_store_docs": _delta_store,
        "corpus_diff_docs": _corpus_diff,
        "neardup_keep_best": _neardup_keep_best,
        "stratified_split_docs": _stratified_split,
        "quality_rank_per_source": _quality_rank,
        "train_order_epoch1": _train_order,
        "quality_linear_score": _quality_linear,
        "quality_threshold_per_source": _quality_threshold,
        "dedup_keep_best": _dedup_keep_best,
        "serve_ready_corpus": _serve_ready,
        "upsample_sources": _upsample,
        "curriculum_order_epoch1": _curriculum,
        "truncate_tokens_32": _truncate_tokens,
        "hash_split_corpus": _hash_split,
        "curation_report": _curation_report,
        "length_histogram": _length_histogram,
        "token_shards_manifest": _token_shards,
        "bpe_merges_2it": _bpe_merges_2it,
        "bpe_token_counts_2it": _bpe_token_counts_2it,
        "dedup_minhash_md5_pairs": _dedup_minhash_md5,
        "dedup_minhash_md5_clusters": _dedup_minhash_md5_clusters,
        "dedup_simhash_md5_pairs": _dedup_simhash_md5,
        "dedup_embedding_int_pairs": _dedup_embedding_int,
        "text_quality_langid": _text_quality,
        "curation_pipeline": _curation,
        "curation_ngram": _curation_ngram,
        "curation_md5_minhash": _curation_md5_minhash,
        "knn_ivf_indexed": _knn_ivf_indexed,
        "kmeans_embeddings": _kmeans_embeddings,
        "kmeans_2it_assign": _kmeans_2it_assign,
        # round-4 additions (all DuckDB-oracled)
        "knn_ivf_exact": _knn_ivf_exact,
        # round 5: IVF(full probe) == brute force, as a hash-gated count
        "knn_ivf_vs_brute": _knn_ivf_vs_brute,
        "kmeans_fixed_assign": R.kmeans_fixed_assign,
        "text_quality_scores": R.text_quality_scores,
        "a16_covar_stddev": R.a16_covar_stddev,
        "f4_math_funcs": R.f4_math_funcs,
        "o21_dense_percent_rank": R.o21_dense_percent_rank,
        "o22_event_transitions": R.o22_event_transitions,
        "a17_mode_event": R.a17_mode_event,
        "a18_price_histogram": R.a18_price_histogram,
        # round-4 batch 2 (all DuckDB-oracled)
        "j12_range_join": R.j12_range_join,
        "j13_interval_join": R.j13_interval_join,
        "o23_ntile_cume": R.o23_ntile_cume,
        "graph_triangles": R.graph_triangles,
        "fuzzy_match_parts": R.fuzzy_match_parts,
        "chunk_documents": R.chunk_documents,
        "pack_token_budget": R.pack_token_budget,
        "dedup_ed1_pairs": R.dedup_ed1_pairs,
        "a19_salted_counts": R.a19_salted_counts,
        "a20_event_entropy": R.a20_event_entropy,
        "text_bigram_topk": R.text_bigram_topk,
        # round-4 batch 3
        "graph_adamic_adar": R.graph_adamic_adar,
        # round 5: hub-cap path, cap >= max degree -> exact + truncated=False
        "graph_adamic_adar_capped": R.graph_adamic_adar_capped,
        "text_ppl_buckets": R.text_ppl_buckets,
        "approx_count_min": _approx_count_min,
        "a21_regr_by_group": R.a21_regr_by_group,
        "f5_standardize": R.f5_standardize,
        "o24_pareto_front": R.o24_pareto_front,
        "io_jsonl_roundtrip": R.io_jsonl_roundtrip,
        "io_csv_roundtrip": R.io_csv_roundtrip,
        "graph_common_neighbors": R.graph_common_neighbors,
        "graph_jaccard": R.graph_jaccard,
        "profile_lineitem": R.profile_lineitem,
        "f6_dim_means": R.f6_dim_means,
        "a22_mad_quantity": R.a22_mad_quantity,
        "graph_kcore": R.graph_kcore,
        "graph_lpa_2it": R.graph_lpa_2it,
        "graph_hits_2it": R.graph_hits_2it,
        "graph_walks_2step": R.graph_walks_2step,
        "graph_sssp_2it": R.graph_sssp_2it,
        "graph_matching_2it": R.graph_matching_2it,
        "graph_coloring_2it": R.graph_coloring_2it,
        "graph_edge_support": R.graph_edge_support,
        "graph_ppr_2it": R.graph_ppr_2it,
        "graph_assortativity": R.graph_assortativity,
        "graph_clustering_coeff": R.graph_clustering_coeff,
        "f7_label_centroids": R.f7_label_centroids,
        "j14_cross_join": R.j14_cross_join,
        "d3_except_intersect": R.d3_except_intersect,
        "graph_degree_hist": R.graph_degree_hist,
        "o26_throttle_dedup": R.o26_throttle_dedup,
        "a23_group_percentile_cont": R.a23_group_percentile_cont,
        "o27_asof_tolerance": R.o27_asof_tolerance,
        "text_top_terms_by_lang": R.text_top_terms_by_lang,
        "o28_keep_latest_n": R.o28_keep_latest_n,
        "f8_conditional_agg": R.f8_conditional_agg,
        "dq_checks": R.dq_checks,
        "o29_gapfill_daily": R.o29_gapfill_daily,
        "f9_quantile_bucket": R.f9_quantile_bucket,
        "merge_cdc_latest": R.merge_cdc_latest,
        "emb_covariance": R.emb_covariance,
        "emb_fd_sketch": R.emb_fd_sketch,
        "f10_explode_tokens": R.f10_explode_tokens,
        "cohort_matrix": R.cohort_matrix,
        "zorder_layout": R.zorder_layout,
        "multimodal_video_frames": _multimodal_video_frames,
        "pmi_part_pairs": R.pmi_part_pairs,
        "mix_sources_balanced": R.mix_sources_balanced,
        "split_train_val_test": R.split_train_val_test,
        "io_partitioned_write": R.io_partitioned_write,
        "inverted_index_postings": R.inverted_index_postings,
        "index_search_and": R.index_search_and,
        "io_zonemap_prune": R.io_zonemap_prune,
        "search_curated_corpus": R.search_curated_corpus,
        "emb_quantize_error": R.emb_quantize_error,
        "o30_rolling_anomaly": R.o30_rolling_anomaly,
        # round-4 continuation 3 (relational2 module)
        "j15_skew_join": _R2("j15_skew_join"),
        "graph_bfs_hops": _R2("graph_bfs_hops"),
        "semdedup_embeddings": _R2("semdedup_embeddings"),
        "emb_pca_project": _R2("emb_pca_project"),
        "o31_range_frame": _R2("o31_range_frame"),
        "a24_unpivot": _R2("a24_unpivot"),
        "io_compact_small_files": _R2("io_compact_small_files"),
        "j16_overlap_join": _R2("j16_overlap_join"),
        "text_containment_pairs": _R2("text_containment_pairs"),
        "text_cosine_pairs": _R2("text_cosine_pairs"),
        "o20_watermark_late": _R2("o20_watermark_late"),
        # round-4 continuation 4
        "a25_division": _R2("a25_division"),
        "dq_iqr_outliers": _R2("dq_iqr_outliers"),
        "o32_ewma": _R2("o32_ewma"),
        "graph_cc_labels": _R2("graph_cc_labels"),
        "a26_grouping_sets": _R2("a26_grouping_sets"),
        "text_collocations_pmi": _R2("text_collocations_pmi"),
        "fuzzy_jw_parts": _R2("fuzzy_jw_parts"),
        "text_vocab_ids": _R2("text_vocab_ids"),
        "bpe_merges": _bpe_merges,
        "bpe_token_counts": _bpe_token_counts,
        # round-4 continuation 5 (relational3 module)
        "a27_percent_of_total": _R3("a27_percent_of_total"),
        "a28_above_nation_avg": _R3("a28_above_nation_avg"),
        "assoc_rules": _R3("assoc_rules"),
        "wau_rolling": _R3("wau_rolling"),
        "scd2_intervals": _R3("scd2_intervals"),
        "pr2_cooccur": _R3("pr2_cooccur"),
        "o36_gaps_islands": _R3("o36_gaps_islands"),
        "o35_median_gap": _R3("o35_median_gap"),
        "o37_interval_coverage": _R3("o37_interval_coverage"),
        "a30_weighted_median": _R3("a30_weighted_median"),
        "seq_trigrams": _R3("seq_trigrams"),
        "er_clusters": _R3("er_clusters"),
        "er_snm_pairs": _R3("er_snm_pairs"),
        "er_fs_scores": _R3("er_fs_scores"),
        "text_sentence_stats": _R3("text_sentence_stats"),
        "approx_jaccard_users": _R3("approx_jaccard_users"),
        "dq_fk_orphans": _R3("dq_fk_orphans"),
        "o39_twap": _R3("o39_twap"),
        "o40_acf_lag1": _R3("o40_acf_lag1"),
        "o41_mann_kendall": _R3("o41_mann_kendall"),
        "o42_cusum_max": _R3("o42_cusum_max"),
        "type_user_jaccard": _R3("type_user_jaccard"),
    }


def _R2(name: str):
    def run(sf_dir: str):
        from reden_ray.pipelines import relational2

        return getattr(relational2, name)(sf_dir)

    return run


def _R3(name: str):
    def run(sf_dir: str):
        from reden_ray.pipelines import relational3

        return getattr(relational3, name)(sf_dir)

    return run


def _kmeans_fixed_assign_sql() -> str:
    """Render the FIXED centroids (the same literals the Ray query
    uses — reden_ray.pipelines.relational.kmeans_fixed_centroids) into
    a nearest-centroid CASE: argmin ||e-c||^2 == argmax (e.c - |c|^2/2),
    first index wins ties, matching numpy argmin."""
    from reden_ray.pipelines.relational import kmeans_fixed_centroids

    cents = kmeans_fixed_centroids()
    scores = []
    for i, c in enumerate(cents):
        vec = "[" + ", ".join(repr(float(v)) for v in c) + "]"
        half_sq = repr(float((c * c).sum() / 2.0))
        scores.append(
            f"list_dot_product(CAST(embedding AS DOUBLE[]), {vec}) - {half_sq} AS s{i}"
        )
    k = len(cents)
    cases = []
    for i in range(k - 1):
        conds = " AND ".join(f"s{i} >= s{j}" for j in range(i + 1, k))
        cases.append(f"WHEN {conds} THEN {i}")
    case = "CASE " + " ".join(cases) + f" ELSE {k - 1} END"
    return (
        f"WITH s AS (SELECT vec_id, {', '.join(scores)} FROM embeddings) "
        f"SELECT cluster, count(*) AS n FROM "
        f"(SELECT CAST({case} AS BIGINT) AS cluster FROM s) GROUP BY 1"
    )


def _semdedup_sql() -> str:
    """SemDedup oracle: same rendered fixed centroids as
    kmeans_fixed_assign (assignment = argmax of e·c − |c|²/2, first
    index wins), planted clones (vec_id % 5, ×1.001, cosine 1.0), and
    the first-id-wins drop rule as a correlated EXISTS.  τ=0.95 sits
    in a ≥0.34 measured gap — see relational2.semdedup_embeddings."""
    from reden_ray.pipelines.relational import kmeans_fixed_centroids

    cents = kmeans_fixed_centroids()
    scores = []
    for i, c in enumerate(cents):
        vec = "[" + ", ".join(repr(float(v)) for v in c) + "]"
        half_sq = repr(float((c * c).sum() / 2.0))
        scores.append(f"list_dot_product(e, {vec}) - {half_sq} AS s{i}")
    k = len(cents)
    cases = []
    for i in range(k - 1):
        conds = " AND ".join(f"s{i} >= s{j}" for j in range(i + 1, k))
        cases.append(f"WHEN {conds} THEN {i}")
    case = "CASE " + " ".join(cases) + f" ELSE {k - 1} END"
    return (
        "WITH base AS ("
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
        "UNION ALL "
        "SELECT CAST(vec_id + 1000000 AS BIGINT), "
        "list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001) "
        "FROM embeddings WHERE vec_id % 5 = 0), "
        f"s AS (SELECT vec_id, e, {', '.join(scores)} FROM base), "
        f"a AS (SELECT vec_id, e, CAST({case} AS BIGINT) AS cluster FROM s) "
        "SELECT a.vec_id, a.cluster, "
        "EXISTS(SELECT 1 FROM a b WHERE b.cluster = a.cluster "
        "AND b.vec_id < a.vec_id "
        "AND list_cosine_similarity(b.e, a.e) > 0.95) AS dropped FROM a"
    )


def _kcore_sql(rounds: int = 40) -> str:
    """Iterated-h-index k-core as UNROLLED SQL (the fixpoint converges
    in 10/19 rounds at sf0.001/sf0.01 — measured; extra rounds are
    idempotent, so 40 gives wide margin).  Generated programmatically:
    each round is one adjacency join + a per-node descending-rank
    window, h = count of neighbors with value >= rank — exactly the
    vectorized recurrence in stages/kcore.py."""
    head = (
        "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
        "l_partkey AS p FROM lineitem), "
        "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
        "JOIN op b ON a.o = b.o AND a.p < b.p), "
        "adj AS MATERIALIZED (SELECT u, v FROM e "
        "UNION ALL SELECT v, u FROM e), "
        "h0 AS MATERIALIZED (SELECT u AS node, count(*) AS h "
        "FROM adj GROUP BY 1)"
    )
    parts = [head]
    for i in range(1, rounds + 1):
        parts.append(
            f", h{i} AS MATERIALIZED (SELECT t.u AS node, "
            "count(*) FILTER (t.hv >= t.rn) AS h FROM "
            "(SELECT adj.u, p.h AS hv, row_number() OVER "
            "(PARTITION BY adj.u ORDER BY p.h DESC) AS rn "
            f"FROM adj JOIN h{i - 1} p ON p.node = adj.v) t GROUP BY 1)"
        )
    parts.append(
        f" SELECT CAST(node AS BIGINT) AS node, CAST(h AS BIGINT) AS core "
        f"FROM h{rounds}"
    )
    return "".join(parts)


def _text_quality_scores_sql() -> str:
    """Re-derive every QualityScore signal in SQL from the same regex
    classes and the SAME stopword list (imported from
    reden_ray.stages.textstats._STOP — the two can never drift)."""
    from reden_ray.stages.textstats import _STOP

    stoplist = ", ".join(f"'{w}'" for w in sorted(set().union(*_STOP.values())))
    return (
        "WITH w AS (SELECT doc_id, text, "
        "regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS words FROM documents), "
        "sig AS (SELECT doc_id, "
        "CASE WHEN len(words) > 0 THEN "
        "CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) "
        "ELSE 0.0 END AS mwl, "
        "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) "
        "/ greatest(1, length(text)) AS pr, "
        "CASE WHEN len(words) > 0 THEN "
        f"CAST(len(list_filter(words, x -> list_contains([{stoplist}], x))) AS DOUBLE) "
        "/ len(words) ELSE 0.0 END AS sr, "
        "length(text) AS n_chars FROM w) "
        "SELECT doc_id, ROUND(mwl, 6) AS mean_word_len, ROUND(pr, 6) AS punct_ratio, "
        "ROUND(sr, 6) AS stop_ratio, "
        "ROUND(0.25 * ("
        "least(1.0, greatest(0.0, n_chars / 200.0)) + "
        "least(1.0, greatest(0.0, 1 - abs(mwl - 5.0) / 5.0)) + "
        "least(1.0, greatest(0.0, 1 - pr * 4.0)) + "
        "least(1.0, greatest(0.0, sr * 3.0))), 6) AS quality FROM sig"
    )


def _kmeans_2it_sql(k: int = 8, dim: int = 64, iters: int = 2) -> str:
    """kmeans_2it_assign oracle: Lloyd unrolled — per round an
    argmin(-2 x·c + ||c||²) assignment (ties to lowest cluster index)
    and a per-dim mean update (empty clusters keep their centroid),
    then the final assignment with the round-``iters`` centroids."""
    parts = [
        f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings),
c0 AS MATERIALIZED (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k})"""
    ]
    for i in range(iters + 1):
        parts.append(
            f""",
s{i} AS (SELECT e.vec_id, c.cid,
  -2 * list_dot_product(e.v, c.c) + list_dot_product(c.c, c.c) AS sc
  FROM e CROSS JOIN c{i} c),
a{i} AS MATERIALIZED (SELECT vec_id, cid FROM (
  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sc, cid)
    AS rn FROM s{i}) WHERE rn = 1)"""
        )
        if i < iters:
            parts.append(
                f""",
u{i} AS (SELECT a{i}.cid, i.i AS dim, sum(e.v[i.i]) / count(*) AS m
  FROM a{i} JOIN e USING (vec_id), unnest(range(1, {dim + 1})) i(i)
  GROUP BY 1, 2),
c{i + 1} AS MATERIALIZED (SELECT c{i}.cid, coalesce(u.c, c{i}.c) AS c
  FROM c{i} LEFT JOIN (SELECT cid, list(m ORDER BY dim) AS c FROM u{i}
                       GROUP BY cid) u USING (cid))"""
            )
    parts.append(
        f"\nSELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a{iters}"
    )
    return "".join(parts)


def _webtext_curation_sql() -> str:
    """The FULL webtext chain (gopher -> PII -> preserve-text span
    dedup -> 4-gram decontamination -> exact dedup) in one DuckDB
    statement, mirroring run_webtext_curation over the %50 eval split.

    The preserve_text span rewrite is reconstructed exactly: the
    original string factors as sep[1]·tok[1]·sep[2]·…·tok[nt]·sep[nt+1]
    (ASCII-alnum token runs), each non-overlapping 5-token chunk unit
    is sep-before-chunk + (kept ? tokens-with-internal-seps : ''), hot
    chunks are keys seen in >=2 distinct docs, and the result is
    whitespace-collapsed + trimmed — byte-for-byte the engine's
    excision (tests: the hash gate itself).  PII email/IP rules are
    replicated; the phone rule needs lookaround (unsupported in RE2)
    but the fixture corpus is digit-free so all three are provable
    no-ops — a corpus change that introduces digits would surface as a
    hash mismatch, not silently pass."""
    gopher_rules = (
        "WHERE nw BETWEEN 5 AND 1000000 AND dwr >= 0.20 "
        "AND f2 <= 0.20 AND f3 <= 0.18 AND f4 <= 0.16 AND d5 <= 0.30 "
        "AND mwl BETWEEN 2.0 AND 12.0 AND swr <= 0.5"
    )
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
evald AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
gt AS (SELECT doc_id, text, list_filter(
  string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w FROM corpus),
gbase AS (SELECT doc_id, text, w, len(w) AS nw FROM gt),
ggrams AS (SELECT b.doc_id, t.n,
  array_to_string(b.w[i.i : i.i + t.n - 1], ' ') AS gram, count(*) AS c
  FROM gbase b, (VALUES (2),(3),(4),(5)) t(n),
       unnest(range(1, b.nw - t.n + 2)) i(i)
  WHERE b.nw >= t.n GROUP BY 1, 2, 3),
ggm AS (SELECT doc_id, n, max(c) AS cmax,
  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupc FROM ggrams GROUP BY 1, 2),
gm AS (SELECT b.doc_id, b.text, b.nw,
  len(list_distinct(b.w)) * 1.0 / b.nw AS dwr,
  list_aggregate(list_transform(b.w, x -> length(x)), 'sum') * 1.0 / b.nw AS mwl,
  len(regexp_extract_all(b.text, '[#@\\{{}}<>^~|]|\\.\\.\\.')) * 1.0 / b.nw AS swr,
  coalesce(max(CASE WHEN g.n = 2 AND g.cmax > 1 THEN
    least(1.0, g.cmax * 2 * 1.0 / b.nw) END), 0.0) AS f2,
  coalesce(max(CASE WHEN g.n = 3 AND g.cmax > 1 THEN
    least(1.0, g.cmax * 3 * 1.0 / b.nw) END), 0.0) AS f3,
  coalesce(max(CASE WHEN g.n = 4 AND g.cmax > 1 THEN
    least(1.0, g.cmax * 4 * 1.0 / b.nw) END), 0.0) AS f4,
  coalesce(max(CASE WHEN g.n = 5 THEN
    least(1.0, g.dupc * 5 * 1.0 / b.nw) END), 0.0) AS d5
  FROM gbase b LEFT JOIN ggm g ON g.doc_id = b.doc_id
  WHERE b.nw > 0 GROUP BY b.doc_id, b.text, b.nw, b.w),
gsur AS (SELECT doc_id, text FROM gm {gopher_rules}),
pii AS (SELECT doc_id, regexp_replace(regexp_replace(text,
  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
  '\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b', '<IP>', 'g') AS text FROM gsur),
spt AS MATERIALIZED (SELECT doc_id, text,
  regexp_extract_all(text, '[A-Za-z0-9]+') AS tk,
  string_split_regex(text, '[A-Za-z0-9]+') AS sp,
  len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nt FROM pii),
chunks AS MATERIALIZED (SELECT doc_id, i.i AS si,
  array_to_string(list_transform(tk[(i.i * 5 + 1) : least((i.i + 1) * 5, nt)],
                                 x -> lower(x)), ' ') AS key,
  sp[i.i * 5 + 1] AS sep_before,
  array_to_string(list_transform(
    range(i.i * 5 + 1, least((i.i + 1) * 5, nt) + 1),
    j -> tk[j] || if(j < least((i.i + 1) * 5, nt), sp[j + 1], '')), '') AS body
  FROM spt, unnest(range(0, (nt + 4) // 5)) i(i) WHERE nt > 0),
hot AS (SELECT key FROM (SELECT DISTINCT doc_id, key FROM chunks)
        GROUP BY key HAVING count(*) >= 2),
units AS (SELECT doc_id, si,
  sep_before || CASE WHEN key IN (SELECT key FROM hot) THEN '' ELSE body END AS u
  FROM chunks),
rebuilt AS MATERIALIZED (SELECT s.doc_id,
  CASE WHEN s.nt = 0 THEN '' ELSE
    trim(regexp_replace(
      coalesce(string_agg(u.u, '' ORDER BY u.si), '') || s.sp[s.nt + 1],
      '\\s+', ' ', 'g'))
  END AS text
  FROM spt s LEFT JOIN units u USING (doc_id)
  GROUP BY s.doc_id, s.nt, s.sp),
ctoks AS (SELECT doc_id, list_filter(
  string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w FROM rebuilt),
cgrams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS g
  FROM ctoks, unnest(range(1, len(w) - 2)) t(i) WHERE len(w) >= 4),
etoks AS (SELECT doc_id, list_filter(
  string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w FROM evald),
egrams AS (SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS g
  FROM etoks, unnest(range(1, len(w) - 2)) t(i) WHERE len(w) >= 4),
hits AS (SELECT DISTINCT doc_id FROM cgrams WHERE g IN (SELECT g FROM egrams)),
clean AS (SELECT doc_id, text FROM rebuilt
          WHERE doc_id NOT IN (SELECT doc_id FROM hits))
SELECT min(doc_id) AS doc_id FROM clean GROUP BY text
"""


def _curation_head_sql() -> str:
    """Shared head of the curation-composite oracles: quality signals
    (same regexes + stopword list as the engine), ws-token count, the
    keep filter, exact dedup (min doc_id per text) — ends at the
    ``sur`` (dedup survivors) CTE that the near-dup middle consumes."""
    from reden_ray.stages.textstats import _STOP

    stoplist = ", ".join(f"'{w}'" for w in sorted(set().union(*_STOP.values())))
    return (
        "w AS (SELECT doc_id, text, "
        "regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS words FROM documents), "
        "sig AS (SELECT doc_id, "
        "CASE WHEN len(words) > 0 THEN "
        "CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) "
        "ELSE 0.0 END AS mwl, "
        "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) "
        "/ greatest(1, length(text)) AS pr, "
        "CASE WHEN len(words) > 0 THEN "
        f"CAST(len(list_filter(words, x -> list_contains([{stoplist}], x))) AS DOUBLE) "
        "/ len(words) ELSE 0.0 END AS sr, "
        "length(text) AS n_chars FROM w), "
        "q AS (SELECT doc_id, 0.25 * ("
        "least(1.0, greatest(0.0, n_chars / 200.0)) + "
        "least(1.0, greatest(0.0, 1 - abs(mwl - 5.0) / 5.0)) + "
        "least(1.0, greatest(0.0, 1 - pr * 4.0)) + "
        "least(1.0, greatest(0.0, sr * 3.0))) AS quality FROM sig), "
        "tok AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens_ws "
        "FROM documents), "
        "filt AS (SELECT d.doc_id, d.text, d.lang, d.source, tok.n_tokens_ws "
        "FROM documents d JOIN q ON q.doc_id = d.doc_id "
        "JOIN tok ON tok.doc_id = d.doc_id "
        "WHERE q.quality >= 0.2 AND tok.n_tokens_ws >= 5), "
        "ded AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY text), "
        "sur AS (SELECT f.* FROM filt f JOIN ded ON ded.doc_id = f.doc_id)"
    )


def _curation_tail_sql() -> str:
    """Shared tail of the curation-composite oracles: stopword-vote
    langid over the survivors, minus the ``losers`` CTE the near-dup
    middle produced."""
    return (
        "lw AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-zà-ÿ]+')[1:400] AS ws FROM sur), "
        "lu AS (SELECT doc_id, unnest(ws) AS wd FROM lw), "
        "lv AS (SELECT doc_id, "
        "count(*) FILTER (wd IN ('le','la','les','de','des','du','un',"
        "'une','et','est','en','que','qui','dans','pour','sur','pas',"
        "'par','au','ce')) AS vfr, "
        "count(*) FILTER (wd IN ('the','of','and','to','a','in','is',"
        "'it','that','for','on','was','with','as','at','by','be','this'"
        ")) AS ven, "
        "count(*) FILTER (wd IN ('der','die','das','und','ist','in',"
        "'den','von','zu','mit','sich','auf','für','nicht','ein','eine'"
        ")) AS vde "
        "FROM lu GROUP BY 1) "
        "SELECT s.doc_id, s.lang, s.source, CAST(s.n_tokens_ws AS BIGINT) AS n_tokens_ws, "
        "CASE WHEN coalesce(lv.vfr, 0) + coalesce(lv.ven, 0) + coalesce(lv.vde, 0) = 0 "
        "THEN 'other' "
        "WHEN lv.vfr >= lv.ven AND lv.vfr >= lv.vde THEN 'fr' "
        "WHEN lv.ven >= lv.vde THEN 'en' ELSE 'de' END AS lang_pred "
        "FROM sur s LEFT JOIN lv ON s.doc_id = lv.doc_id "
        "WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)"
    )


def _curation_ngram_sql() -> str:
    """The full curation composite in one DuckDB statement with the
    EXACT trigram-Jaccard near-dup middle: pairs among the dedup
    survivors, loser drop (greater id of each >=0.8 pair)."""
    return (
        "WITH " + _curation_head_sql() + ", "
        "toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9]+'), x -> x <> '') AS wd FROM sur), "
        "grams AS (SELECT DISTINCT doc_id, array_to_string(wd[i:i+2], ' ') AS g "
        "FROM toks, unnest(range(1, len(wd)-1)) AS t(i) WHERE len(wd) >= 3), "
        "counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "shr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared "
        "FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2), "
        "losers AS (SELECT DISTINCT doc_b AS doc_id FROM shr "
        "JOIN counts ca ON ca.doc_id = doc_a JOIN counts cb ON cb.doc_id = doc_b "
        "WHERE shared * 1.0 / (ca.n + cb.n - shared) >= 0.8), "
        + _curation_tail_sql()
    )


def _curation_md5_minhash_sql() -> str:
    """The full curation composite with the md5-kernel MinHash LSH
    near-dup middle — the SAME chain curation_pipeline runs (its
    blake2b kernel swapped for the SQL-replayable md5 one), so the
    composite with an LSH (not exact) near-dup stage sits under a
    DuckDB hash gate too."""
    return (
        "WITH " + _curation_head_sql() + ", "
        + _minhash_md5_ctes("sur") + ", "
        "losers AS (SELECT DISTINCT doc_b AS doc_id FROM mpairs), "
        + _curation_tail_sql()
    )


# Shared CTE chain for the 2-merge BPE twins: word-type histogram over
# the shared whitespace-lower tokenizer -> round-1 adjacent-char pair
# stats -> argmax (count DESC, left ASC, right ASC) -> greedy-left merge
# apply via replace() into a chr(1) sentinel (left-to-right
# non-overlapping replace IS Sennrich's greedy-left, incl. "aaa"+(a,a)
# -> ["aa","a"]) -> round-2 pair stats over the token string.  Mirrors
# reden_ray.stages.bpe.bpe_train_merges semantics exactly.
_BPE_2IT_CTES = (
    "toks AS (SELECT unnest(list_filter(string_split_regex(lower(text), "
    "'[ \\t\\n\\r\\f\\v]+'), x -> x <> '')) AS word FROM documents), "
    "types AS (SELECT word, count(*)::BIGINT AS wcount FROM toks GROUP BY word), "
    "p1 AS (SELECT substr(word, j, 1) AS \"left\", substr(word, j + 1, 1) AS \"right\", "
    "sum(wcount)::BIGINT AS n FROM types, range(1, 64) r(j) "
    "WHERE j + 1 <= length(word) GROUP BY 1, 2), "
    "m1 AS (SELECT \"left\", \"right\", n FROM p1 "
    "ORDER BY n DESC, \"left\", \"right\" LIMIT 1), "
    "seg2 AS (SELECT replace(word, (SELECT \"left\" || \"right\" FROM m1), chr(1)) AS w2, "
    "wcount FROM types), "
    "p2 AS (SELECT CASE WHEN substr(w2, j, 1) = chr(1) "
    "THEN (SELECT \"left\" || \"right\" FROM m1) ELSE substr(w2, j, 1) END AS \"left\", "
    "CASE WHEN substr(w2, j + 1, 1) = chr(1) "
    "THEN (SELECT \"left\" || \"right\" FROM m1) ELSE substr(w2, j + 1, 1) END AS \"right\", "
    "sum(wcount)::BIGINT AS n FROM seg2, range(1, 64) r(j) "
    "WHERE j + 1 <= length(w2) GROUP BY 1, 2), "
    "m2 AS (SELECT \"left\", \"right\", n FROM p2 "
    "ORDER BY n DESC, \"left\", \"right\" LIMIT 1)"
)


# Shared CTE chain for the md5-kernel MinHash twins: distinct lowercased
# 5-gram shingles -> 16 md5 permutation minima -> 4 bands of 4 rows ->
# band-key candidates -> exact signature-agreement estimate.  Mirrors
# reden_ray.stages.dedup.Md5MinHasher + _band_rows semantics exactly
# (bands group perms [4b, 4b+4); est = agreeing perms / 16, a dyadic).
# ``src`` is any CTE/table exposing (doc_id, text) — the curation
# composite feeds its dedup-survivor set through the same chain.
def _minhash_md5_ctes(src: str = "documents") -> str:
    return (
        f"d AS (SELECT doc_id, lower(text) AS t FROM {src}), "
    "sh AS (SELECT DISTINCT doc_id, substr(t, j, 5) AS s "
    "FROM d, range(1, 4001) r(j) WHERE j + 4 <= length(t) "
    "UNION ALL SELECT doc_id, t AS s FROM d WHERE length(t) < 5), "
    "mins AS (SELECT doc_id, i, "
    "min(md5_number_upper(i::VARCHAR || chr(1) || s)) AS m "
    "FROM sh, range(0, 16) p(i) GROUP BY doc_id, i), "
    "bands AS (SELECT doc_id, i // 4 AS b, "
    "string_agg(m::VARCHAR, ',' ORDER BY i) AS bkey FROM mins GROUP BY doc_id, i // 4), "
    "cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b "
    "FROM bands x JOIN bands y ON x.b = y.b AND x.bkey = y.bkey "
    "AND x.doc_id < y.doc_id), "
        "mpairs AS (SELECT c.doc_a, c.doc_b, "
        "(count(*) FILTER (WHERE ma.m = mb.m)) / 16.0 AS est_jaccard "
        "FROM cand c JOIN mins ma ON ma.doc_id = c.doc_a "
        "JOIN mins mb ON mb.doc_id = c.doc_b AND mb.i = ma.i "
        "GROUP BY c.doc_a, c.doc_b "
        "HAVING (count(*) FILTER (WHERE ma.m = mb.m)) / 16.0 >= 0.5)"
    )


_MINHASH_MD5_CTES = _minhash_md5_ctes()


def oracle_sql() -> dict[str, str]:
    d = {
        "j1_hash_join": (
            "SELECT l_orderkey, l_quantity, ROUND(l_extendedprice, 2) AS l_extendedprice, "
            "o_orderstatus FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        ),
        "j2_broadcast_join": (
            "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, "
            "c_name, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey"
        ),
        "j5_semi_join": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        ),
        "j6_anti_join": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
        ),
        "j8_multiway_revenue": (
            "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n_name"
        ),
        "a1_collect_groups": (
            "SELECT l_orderkey, "
            "array_to_string(list(DISTINCT l_partkey ORDER BY l_partkey), ',') AS partkeys, "
            "count(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY l_orderkey"
        ),
        "a3_pred_frequency": (
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ),
        "a5_aggregate_metrics": (
            "SELECT l_returnflag, l_linestatus, ROUND(sum(l_quantity), 2) AS sum_qty, "
            "ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue, "
            "ROUND(avg(l_extendedprice), 2) AS avg_price, count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "a7_argmax_per_group": (
            "SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice "
            "FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn FROM orders) "
            "WHERE rn = 1"
        ),
        "o1_topk": (
            "SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10"
        ),
        "d2_distinct": "SELECT DISTINCT user_id, event_type FROM events",
        "m1_normalize": (
            "SELECT c_custkey, c_name, "
            "lower(regexp_replace(c_name, '\\s|''|-', '', 'g')) AS c_name_norm "
            "FROM customer"
        ),
        "m8_date_filter": (
            "SELECT l_orderkey, l_linenumber, l_shipdate, "
            "CAST(year(l_shipdate) AS BIGINT) AS ship_year "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'"
        ),
        "window_distinct_users": (
            "SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            "count(*) AS n_events FROM events GROUP BY 1"
        ),
        "window_tumbling": (
            "SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id, "
            "count(*) AS n_events, ROUND(sum(value), 4) AS sum_value "
            "FROM events GROUP BY user_id, window_id"
        ),
        "window_hopping": (
            "SELECT user_id, CAST(floor(epoch(ts) / 900) AS BIGINT) - k.k AS window_id, "
            "count(*) AS n_events, ROUND(sum(value), 4) AS sum_value "
            "FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) AS k "
            "GROUP BY user_id, window_id"
        ),
        "a9_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "count(l_quantity) AS n_rows, ROUND(sum(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "a10_cube": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "count(l_quantity) AS n_rows, ROUND(sum(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "a11_median_price": (
            "SELECT o_orderpriority, "
            "ROUND(quantile_disc(o_totalprice, 0.5), 2) AS median_price "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "o5_rank_per_group": (
            "SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rank "
            "FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
            "CAST(row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey DESC) AS BIGINT) AS rank "
            "FROM orders) WHERE rank <= 3"
        ),
        "o6_lag_delta": (
            "SELECT user_id, event_id, "
            "ROUND(value - lag(value) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id), 4) AS delta FROM events"
        ),
        "o7_running_total": (
            "SELECT user_id, event_id, "
            "ROUND(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING), 4) AS running_total FROM events"
        ),
        "o13_moving_avg": (
            "SELECT user_id, event_id, "
            "ROUND(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg "
            "FROM events"
        ),
        "o14_ntile": (
            "SELECT user_id, event_id, "
            "CAST(ntile(4) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) AS tile FROM events"
        ),
        "o15_first_last": (
            "SELECT user_id, "
            "ROUND(max(CASE WHEN rf = 1 THEN value END), 4) AS first_value, "
            "ROUND(max(CASE WHEN rl = 1 THEN value END), 4) AS last_value "
            "FROM (SELECT user_id, value, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl "
            "FROM events) GROUP BY user_id"
        ),
        "a14_string_agg": (
            "SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, "
            "string_agg(s_name, ',' ORDER BY s_name) AS names "
            "FROM supplier GROUP BY s_nationkey"
        ),
        "j10_full_outer": (
            "SELECT custkey, c_acctbal, n_big FROM "
            "(SELECT c_custkey AS custkey, ROUND(c_acctbal, 2) AS c_acctbal "
            "FROM customer WHERE c_acctbal > 0) c FULL JOIN "
            "(SELECT o_custkey AS custkey, count(*) AS n_big FROM orders "
            "WHERE o_totalprice > 150000 GROUP BY 1) o USING (custkey)"
        ),
        "f1_vector_norm": (
            "SELECT vec_id, ROUND(sqrt(list_sum(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm "
            "FROM embeddings"
        ),
        "o16_stratified_sample": (
            "SELECT doc_id, source FROM (SELECT doc_id, source, "
            "row_number() OVER (PARTITION BY source "
            "ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn "
            "FROM documents) WHERE rn <= 20"
        ),
        "o17_weighted_sample": (
            "SELECT doc_id, source FROM (SELECT doc_id, source, "
            "row_number() OVER (PARTITION BY source ORDER BY "
            "-LN((((doc_id * 2654435761) % 4294967296) + 0.5) / 4294967296.0)"
            " / n_chars, doc_id) AS rn "
            "FROM documents WHERE n_chars > 0) WHERE rn <= 10"
        ),
        "f2_string_funcs": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, "
            "upper(c_name) AS upper_name, "
            "substr(c_name, 1, 5) AS prefix5, "
            "CAST(length(c_name) AS BIGINT) AS name_len, "
            "reverse(c_name) AS reversed, "
            "'cust' || ':' || c_name AS tagged "
            "FROM customer"
        ),
        "f3_date_parts": (
            "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, "
            "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y, "
            "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m, "
            "CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d, "
            "CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q "
            "FROM orders"
        ),
        "j11_smart_join": (
            "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, "
            "CAST(s_nationkey AS BIGINT) AS nationkey, n_name "
            "FROM supplier JOIN nation ON n_nationkey = s_nationkey"
        ),
        "o19_funnel": (
            "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN v ON v.user_id = e.user_id AND e.ts > v.t1 "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "JOIN c ON c.user_id = e.user_id AND e.ts > c.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT (SELECT count(*) FROM v) AS n_view, "
            "(SELECT count(*) FROM c) AS n_view_click, "
            "(SELECT count(*) FROM p) AS n_full_funnel"
        ),
        "o18_retention": (
            "WITH uw AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events) "
            "SELECT a.wk AS wk, count(*) AS retained FROM uw a "
            "JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 1 "
            "GROUP BY 1"
        ),
        "text_top_terms": (
            "SELECT term, n FROM (SELECT lower(t.term) AS term, "
            "count(*) AS n FROM documents, "
            "UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+')) AS t(term) "
            "WHERE t.term <> '' GROUP BY 1) "
            "ORDER BY n DESC, term LIMIT 20"
        ),
        # The MG sketch itself is not SQL-expressible; the query checks
        # the sketch's lower/upper bound against the exact counts
        # in-query and returns exact counts + bound_ok, so the oracle
        # is the exact top-20 with TRUE — a bound violation hash-fails.
        "approx_top_terms": (
            "SELECT term, n, TRUE AS bound_ok FROM "
            "(SELECT lower(t.term) AS term, count(*) AS n FROM documents, "
            "UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+')) AS t(term) "
            "WHERE t.term <> '' GROUP BY 1) "
            "ORDER BY n DESC, term LIMIT 20"
        ),
        "text_tfidf_topk": (
            "WITH tok AS ("
            "  SELECT doc_id, lower(t.term) AS term"
            "  FROM documents, UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+'))"
            "  AS t(term) WHERE t.term <> ''"
            "), tf AS (SELECT doc_id, term, count(*) AS tfc FROM tok GROUP BY 1, 2),"
            " dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY 1),"
            " df AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM tok GROUP BY 1),"
            " n AS (SELECT count(*) AS n FROM documents),"
            " scored AS (SELECT tf.doc_id, tf.term,"
            "   (tfc::DOUBLE / dlen) * LN(n::DOUBLE / dfc) AS tfidf"
            "   FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n),"
            " ranked AS (SELECT doc_id, term, tfidf, CAST(row_number() OVER ("
            "   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank"
            "   FROM scored) "
            "SELECT doc_id, term, ROUND(tfidf, 4) AS tfidf, rank "
            "FROM ranked WHERE rank <= 3"
        ),
        "split_leakage_report": (
            "WITH k AS (SELECT doc_id, source,"
            " md5_number_upper('strat:' || source || ':' || doc_id::VARCHAR) AS key"
            " FROM documents),"
            " r AS (SELECT doc_id, source,"
            "  row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rk,"
            "  count(*) OVER (PARTITION BY source) AS n FROM k),"
            " sp AS (SELECT doc_id, source,"
            "  CASE WHEN rk <= (n*10 + 99) // 100 THEN 'val'"
            "       WHEN rk <= 2 * ((n*10 + 99) // 100) THEN 'test'"
            "       ELSE 'train' END AS split FROM r),"
            " toks AS (SELECT d.doc_id, sp.split, list_filter(string_split_regex("
            "  lower(d.text), '[^a-z0-9]+'), x -> x <> '') AS w"
            "  FROM documents d JOIN sp USING (doc_id)),"
            " grams AS (SELECT DISTINCT doc_id, split,"
            "  array_to_string(w[i:i+3], ' ') AS g"
            "  FROM toks, unnest(range(1, len(w)-2)) AS t(i) WHERE len(w) >= 4),"
            " tg AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),"
            " leaky AS (SELECT DISTINCT doc_id FROM grams"
            "  WHERE split = 'val' AND g IN (SELECT g FROM tg)) "
            "SELECT sp.source, CAST(sum(CAST(l.doc_id IS NOT NULL AS BIGINT)) AS BIGINT)"
            " AS n_leaky,"
            " count(*) AS n_val FROM sp LEFT JOIN leaky l USING (doc_id)"
            " WHERE sp.split = 'val' GROUP BY 1"
        ),
        "text_bigram_logprob": (
            "WITH toks AS ("
            "  SELECT doc_id, list_filter(string_split_regex(lower(text),"
            "    '[ \t\n\r\f\v]+'), x -> x <> '') AS tk FROM documents"
            "), bg AS ("
            "  SELECT doc_id, z[1] AS w1, z[2] AS w2"
            "  FROM toks, UNNEST(list_zip(tk[:-2], tk[2:])) AS u(z)"
            "  WHERE len(tk) >= 2"
            "), tf AS (SELECT doc_id, w1, w2, count(*) AS tfc FROM bg GROUP BY 1,2,3),"
            " nb AS (SELECT doc_id, count(*) AS nbg FROM bg GROUP BY 1),"
            " bc AS (SELECT w1, w2, sum(tfc) AS cnt FROM tf GROUP BY 1,2),"
            " cx AS (SELECT w1, sum(cnt) AS ctx FROM bc GROUP BY 1),"
            " scored AS (SELECT tf.doc_id, (tfc * LN(cnt / ctx)) / nbg AS c"
            "   FROM tf JOIN nb USING (doc_id) JOIN bc USING (w1, w2)"
            "   JOIN cx USING (w1)) "
            "SELECT doc_id, ROUND(sum(c), 4) AS logprob FROM scored GROUP BY 1"
        ),
        "text_unigram_logprob": (
            "WITH tok AS ("
            "  SELECT doc_id, lower(t.term) AS term"
            "  FROM documents, UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+'))"
            "  AS t(term) WHERE t.term <> ''"
            "), tf AS (SELECT doc_id, term, count(*) AS tfc FROM tok GROUP BY 1, 2),"
            " dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY 1),"
            " vc AS (SELECT term, sum(tfc) AS cnt FROM tf GROUP BY 1),"
            " tot AS (SELECT sum(cnt) AS total FROM vc),"
            " scored AS (SELECT tf.doc_id,"
            "   (tfc * LN(cnt / total)) / dlen AS c"
            "   FROM tf JOIN dl USING (doc_id) JOIN vc USING (term)"
            "   CROSS JOIN tot) "
            "SELECT doc_id, ROUND(sum(c), 4) AS logprob FROM scored GROUP BY 1"
        ),
        "text_bm25_topk": (
            "WITH tok AS ("
            "  SELECT doc_id, lower(t.term) AS term"
            "  FROM documents, UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+'))"
            "  AS t(term) WHERE t.term <> ''"
            "), tf AS (SELECT doc_id, term, count(*) AS tfc FROM tok GROUP BY 1, 2),"
            " dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY 1),"
            " df AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM tok GROUP BY 1),"
            " n AS (SELECT count(*) AS n FROM documents),"
            " ad AS (SELECT sum(dlen)::DOUBLE / count(*) AS avgdl FROM dl),"
            " scored AS (SELECT tf.doc_id, tf.term,"
            "   (LN((n.n - dfc + 0.5) / (dfc + 0.5) + 1) * (tfc * 2.2)) /"
            "   (tfc + 1.2 * (0.25 + 0.75 * dlen / avgdl)) AS bm25"
            "   FROM tf JOIN dl USING (doc_id) JOIN df USING (term)"
            "   CROSS JOIN n CROSS JOIN ad),"
            " ranked AS (SELECT doc_id, term, bm25, CAST(row_number() OVER ("
            "   PARTITION BY doc_id ORDER BY bm25 DESC, term) AS BIGINT) AS rank"
            "   FROM scored) "
            "SELECT doc_id, term, ROUND(bm25, 4) AS bm25, rank "
            "FROM ranked WHERE rank <= 3"
        ),
        "a15_percentile_cont": (
            "SELECT 0.25 AS quantile, ROUND(quantile_cont(l_extendedprice, 0.25), 4)"
            " AS price FROM lineitem UNION ALL "
            "SELECT 0.5, ROUND(quantile_cont(l_extendedprice, 0.5), 4) FROM lineitem"
            " UNION ALL "
            "SELECT 0.75, ROUND(quantile_cont(l_extendedprice, 0.75), 4) FROM lineitem"
        ),
        "o8_asof_join": (
            "SELECT event_id, user_id, click_id, click_ts FROM ("
            "SELECT e.event_id, e.user_id, c.event_id AS click_id, c.ts AS click_ts, "
            "row_number() OVER (PARTITION BY e.event_id "
            "ORDER BY c.ts DESC, c.event_id DESC) AS rn "
            "FROM events e LEFT JOIN "
            "(SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c "
            "ON c.user_id = e.user_id AND c.ts <= e.ts) WHERE rn = 1"
        ),
        "o9_range_count": (
            "SELECT o.o_orderkey, count(l.l_shipdate) AS n_shipped "
            "FROM orders o LEFT JOIN lineitem l "
            "ON l.l_shipdate >= o.o_orderdate "
            "AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY "
            "GROUP BY o.o_orderkey"
        ),
        "event_bursts": (
            "WITH c AS (SELECT event_type, "
            "epoch_us(ts::TIMESTAMP) // 3600000000 AS hour, "
            "count(*)::BIGINT AS n FROM events GROUP BY 1, 2), "
            "w AS (SELECT event_type, hour, n, "
            "count(*) OVER tw AS k, sum(n) OVER tw AS s FROM c "
            "WINDOW tw AS (PARTITION BY event_type ORDER BY hour "
            "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)) "
            "SELECT event_type, hour, n, "
            "CAST(CASE WHEN k = 3 AND 3 * n > 2 * s THEN 1 ELSE 0 END AS BIGINT) "
            "AS burst FROM w"
        ),
        "event_transitions": (
            "WITH o AS (SELECT user_id, event_type, lead(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT event_type AS from_type, nxt AS to_type, count(*) AS n "
            "FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2"
        ),
        "sessionize": (
            "WITH gaps AS (SELECT user_id, event_id, ts, "
            "CASE WHEN epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "sess AS (SELECT user_id, event_id, "
            "CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM gaps) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "min(event_id) AS first_event FROM sess GROUP BY user_id, session_id"
        ),
        "dedup_exact_docs": (
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"
        ),
        "dedup_ngram_pairs": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g "
            "FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3), "
            "counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "shr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared "
            "FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, shared, "
            "ROUND(shared * 1.0 / (ca.n + cb.n - shared), 6) AS jaccard "
            "FROM shr JOIN counts ca ON ca.doc_id = doc_a "
            "JOIN counts cb ON cb.doc_id = doc_b "
            "WHERE shared * 1.0 / (ca.n + cb.n - shared) >= 0.8"
        ),
        "mixture_sample_600": (
            # md5-rank selection under a per-source token budget; the
            # boundary-crossing doc is included (tokens_before < budget)
            "WITH tok AS (SELECT doc_id, source, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n "
            "FROM documents), "
            "k AS (SELECT doc_id, source, n, "
            "md5_number_upper(source || ':' || doc_id::VARCHAR) AS key "
            "FROM tok WHERE n > 0), "
            "cs AS (SELECT doc_id, source, n, coalesce(sum(n) OVER ("
            "PARTITION BY source ORDER BY key, doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb FROM k) "
            "SELECT doc_id, source, n::BIGINT AS n_tokens, tb::BIGINT AS tokens_before "
            "FROM cs WHERE tb < 600"
        ),
        "quality_rank_per_source": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "s0 AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "j AS (SELECT d.doc_id, d.source, coalesce(s0.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN s0 USING (doc_id)) "
            "SELECT doc_id, source, score, "
            "CAST(row_number() OVER (PARTITION BY source "
            "ORDER BY score DESC, doc_id) AS BIGINT) AS rk, "
            "CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src FROM j"
        ),
        "stratified_split_docs": (
            "WITH k AS (SELECT doc_id, source,"
            " md5_number_upper('strat:' || source || ':' || doc_id::VARCHAR) AS key"
            " FROM documents),"
            " r AS (SELECT doc_id, source,"
            "  row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rk,"
            "  count(*) OVER (PARTITION BY source) AS n FROM k) "
            "SELECT doc_id, source,"
            " CASE WHEN rk <= (n*10 + 99) // 100 THEN 'val'"
            "      WHEN rk <= 2 * ((n*10 + 99) // 100) THEN 'test'"
            "      ELSE 'train' END AS split FROM r"
        ),
        "neardup_keep_best": (
            "WITH RECURSIVE " + _MINHASH_MD5_CTES + ", "
            "sym AS (SELECT doc_a AS u, doc_b AS v FROM mpairs "
            "UNION ALL SELECT doc_b AS u, doc_a AS v FROM mpairs), "
            "nodes AS (SELECT DISTINCT u AS node FROM sym), "
            "reach(node, r) AS (SELECT node, node FROM nodes "
            "UNION SELECT sym.v, reach.r FROM reach JOIN sym ON sym.u = reach.node), "
            "clus AS (SELECT node AS doc_id, min(r) AS cluster FROM reach GROUP BY 1), "
            "toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "bkt AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "sc0 AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM bkt GROUP BY 1), "
            "sc AS (SELECT d.doc_id, coalesce(sc0.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sc0 USING (doc_id)), "
            "lab AS (SELECT sc.doc_id, coalesce(c.cluster, sc.doc_id) AS cluster, "
            "sc.score FROM sc LEFT JOIN clus c ON c.doc_id = sc.doc_id), "
            "rk AS (SELECT doc_id, cluster, score, row_number() OVER ("
            "PARTITION BY cluster ORDER BY score DESC, doc_id) AS r FROM lab) "
            "SELECT doc_id, cluster, score, CAST(r = 1 AS BIGINT) AS kept FROM rk"
        ),
        "corpus_diff_docs": (
            "WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),"
            " v2 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' v2'"
            "   ELSE text END AS text FROM documents WHERE doc_id % 5 <> 0) "
            "SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,"
            " CASE WHEN v1.doc_id IS NULL THEN 'added'"
            "      WHEN v2.doc_id IS NULL THEN 'removed'"
            "      ELSE 'changed' END AS status"
            " FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id"
            " WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.text <> v2.text"
        ),
        "delta_dedup_docs": (
            "WITH delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0 UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),"
            " base AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),"
            " dwin AS (SELECT min(doc_id) AS doc_id, text FROM delta GROUP BY text) "
            "SELECT d.doc_id FROM dwin d WHERE NOT EXISTS"
            " (SELECT 1 FROM base b WHERE b.text = d.text)"
        ),
        "delta_store_docs": (
            "WITH delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0 UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),"
            " base AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),"
            " bwin AS (SELECT min(doc_id) AS doc_id, text FROM base GROUP BY text),"
            " dwin AS (SELECT min(doc_id) AS doc_id, text FROM delta GROUP BY text),"
            " surv AS (SELECT d.doc_id FROM dwin d WHERE NOT EXISTS"
            "   (SELECT 1 FROM base b WHERE b.text = d.text)) "
            "SELECT doc_id FROM bwin UNION ALL SELECT doc_id FROM surv"
        ),
        "line_dedup_pages": (
            # pages = texts joined per doc_id % 37; a line (verbatim, no
            # trim) in >= 2 distinct pages is boilerplate everywhere
            "WITH pages AS (SELECT doc_id % 37 AS page_id, "
            "string_agg(text, chr(10) ORDER BY doc_id) AS text "
            "FROM documents GROUP BY 1), "
            "ls AS (SELECT page_id, string_split(text, chr(10)) AS arr FROM pages), "
            "lin AS (SELECT page_id, unnest(arr) AS line, "
            "generate_subscripts(arr, 1) AS pos FROM ls), "
            "hot AS (SELECT line FROM lin WHERE line <> '' "
            "GROUP BY 1 HAVING count(DISTINCT page_id) >= 2) "
            "SELECT l.page_id, coalesce(string_agg(l.line, chr(10) ORDER BY l.pos) "
            "FILTER (WHERE h.line IS NULL), '') AS text, "
            "count(*)::BIGINT AS n_lines, count(h.line)::BIGINT AS n_removed "
            "FROM lin l LEFT JOIN hot h ON l.line = h.line GROUP BY 1"
        ),
        "train_order_epoch1": (
            "SELECT doc_id, row_number() OVER (ORDER BY "
            "md5_number_upper('e1:' || doc_id::VARCHAR), doc_id)::BIGINT "
            "AS train_rank FROM documents"
        ),
        "quality_linear_score": (
            # feature bucket j = md5(tok) % 1024; integer weight
            # w[j] = md5('w:'||j) % 21 - 10; score = sum over tokens
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "s AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1) "
            "SELECT d.doc_id, coalesce(s.score, 0)::BIGINT AS score, "
            "(CASE WHEN coalesce(s.score, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS keep "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "quality_threshold_per_source": (
            # threshold = k-th largest score per source, k = ceil(.25 n)
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "sm AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "sc AS (SELECT d.doc_id, d.source, coalesce(sm.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sm USING (doc_id)), "
            "rk AS (SELECT source, score, row_number() OVER (PARTITION BY source "
            "ORDER BY score DESC, doc_id) AS rn, "
            "count(*) OVER (PARTITION BY source) AS n FROM sc), "
            "thr AS (SELECT source, score AS threshold FROM rk "
            "WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)) "
            "SELECT sc.doc_id, sc.score, sc.source, thr.threshold "
            "FROM sc JOIN thr USING (source) WHERE sc.score >= thr.threshold"
        ),
        "dedup_keep_best": (
            # identical texts keep the best-scoring copy (tie: min id)
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "sm AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "sc AS (SELECT d.doc_id, d.text, coalesce(sm.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sm USING (doc_id)) "
            "SELECT doc_id, score FROM (SELECT doc_id, score, row_number() OVER ("
            "PARTITION BY text ORDER BY score DESC, doc_id) AS rn FROM sc) "
            "WHERE rn = 1"
        ),
        "serve_ready_corpus": (
            # dedup (keep best) -> per-source quantile cut over the
            # survivors -> epoch-1 md5 shuffle rank (stage order is the
            # contract; mirrors pipelines/serve.py verbatim)
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "sm AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "sc AS (SELECT d.doc_id, d.source, d.text, "
            "coalesce(sm.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sm USING (doc_id)), "
            "surv AS (SELECT doc_id, source, score FROM (SELECT doc_id, source, "
            "score, row_number() OVER (PARTITION BY text "
            "ORDER BY score DESC, doc_id) AS rn FROM sc) WHERE rn = 1), "
            "rk AS (SELECT source, score, row_number() OVER (PARTITION BY source "
            "ORDER BY score DESC, doc_id) AS srn, "
            "count(*) OVER (PARTITION BY source) AS n FROM surv), "
            "thr AS (SELECT source, score AS threshold FROM rk "
            "WHERE srn = CAST(ceil(0.25 * n) AS BIGINT)) "
            "SELECT surv.doc_id, surv.source, surv.score, thr.threshold, "
            "row_number() OVER (ORDER BY "
            "md5_number_upper('e1:' || surv.doc_id::VARCHAR), surv.doc_id)::BIGINT "
            "AS train_rank "
            "FROM surv JOIN thr USING (source) WHERE surv.score >= thr.threshold"
        ),
        "upsample_sources": (
            # weight by source index; fractional copy iff md5 draw on
            # 1/1024 ticks; one output row per replica
            "WITH w AS (SELECT doc_id, source, "
            "0.5 + (CAST(regexp_extract(source, '[0-9]+') AS INT) % 4) * 0.5 AS wt "
            "FROM documents), "
            "r AS (SELECT doc_id, source, CAST(floor(wt) AS BIGINT) + "
            "CASE WHEN md5_number_upper('u:' || doc_id::VARCHAR) % 1024 < "
            "CAST((wt - floor(wt)) * 1024 AS BIGINT) THEN 1 ELSE 0 END AS reps "
            "FROM w) "
            "SELECT doc_id, source, unnest(range(0, reps)) AS rep_idx "
            "FROM r WHERE reps > 0"
        ),
        "curriculum_order_epoch1": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "sm AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "sc AS (SELECT d.doc_id, coalesce(sm.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sm USING (doc_id)), "
            "t AS (SELECT doc_id, least(greatest(score, -8), 8)::BIGINT AS tier "
            "FROM sc) "
            "SELECT doc_id, tier, row_number() OVER (ORDER BY tier DESC, "
            "md5_number_upper('c1:' || doc_id::VARCHAR), doc_id)::BIGINT "
            "AS train_rank FROM t"
        ),
        "truncate_tokens_32": (
            # token/separator factoring: prefix ends at the 32nd token's
            # last char; explicit whitespace class (RE2 \\s != python \\s)
            "WITH f AS (SELECT doc_id, text, "
            "regexp_extract_all(text, '[^ \\t\\n\\r\\f]+') AS toks, "
            "string_split_regex(text, '[^ \\t\\n\\r\\f]+') AS seps "
            "FROM documents), "
            "c AS (SELECT doc_id, text, toks, seps, len(toks) AS n FROM f) "
            "SELECT doc_id, CASE WHEN n <= 32 THEN text ELSE left(text, "
            "CAST(list_aggregate(list_transform(range(1, 33), "
            "i -> length(seps[i]) + length(toks[i])), 'sum') AS BIGINT)) END AS text, "
            "n::BIGINT AS n_tokens, "
            "(CASE WHEN n > 32 THEN 1 ELSE 0 END)::BIGINT AS truncated FROM c"
        ),
        "hash_split_corpus": (
            "SELECT doc_id, source, CASE "
            "WHEN md5_number_upper('sp:' || doc_id::VARCHAR) % 1000 < 10 "
            "THEN 'valid' "
            "WHEN md5_number_upper('sp:' || doc_id::VARCHAR) % 1000 < 30 "
            "THEN 'test' ELSE 'train' END AS split FROM documents"
        ),
        "curation_report": (
            # per-source attrition through the serve gates (same CTEs
            # as serve_ready_corpus, aggregated)
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks), "
            "sm AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "sc AS (SELECT d.doc_id, d.source, d.text, "
            "coalesce(sm.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sm USING (doc_id)), "
            "surv AS (SELECT doc_id, source, score FROM (SELECT doc_id, source, "
            "score, row_number() OVER (PARTITION BY text "
            "ORDER BY score DESC, doc_id) AS rn FROM sc) WHERE rn = 1), "
            "rk AS (SELECT source, score, row_number() OVER (PARTITION BY source "
            "ORDER BY score DESC, doc_id) AS srn, "
            "count(*) OVER (PARTITION BY source) AS n FROM surv), "
            "thr AS (SELECT source, score AS threshold FROM rk "
            "WHERE srn = CAST(ceil(0.25 * n) AS BIGINT)), "
            "kept AS (SELECT surv.source FROM surv JOIN thr USING (source) "
            "WHERE surv.score >= thr.threshold), "
            "rawc AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1), "
            "un AS (SELECT source, count(*) AS n_unique FROM surv GROUP BY 1), "
            "kc AS (SELECT source, count(*) AS n_kept FROM kept GROUP BY 1) "
            "SELECT rawc.source, rawc.n_docs::BIGINT AS n_docs, "
            "coalesce(un.n_unique, 0)::BIGINT AS n_unique, "
            "coalesce(kc.n_kept, 0)::BIGINT AS n_kept "
            "FROM rawc LEFT JOIN un USING (source) LEFT JOIN kc USING (source)"
        ),
        "length_histogram": (
            "WITH n AS (SELECT CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n "
            "FROM documents) "
            "SELECT CASE WHEN n = 0 THEN -1 ELSE "
            "CAST(floor(log2(n)) AS BIGINT) END AS bucket, "
            "count(*)::BIGINT AS n_docs FROM n GROUP BY 1"
        ),
        "token_shards_manifest": (
            # shard = doc_id % 8; token id = md5(tok) % 32000; the Ray
            # side re-reads the written .bin/.idx bytes for these sums
            "WITH doc AS (SELECT doc_id, doc_id % 8 AS shard, text FROM documents), "
            "tk AS (SELECT shard, CAST(md5_number_upper(tok) % 32000 AS BIGINT) AS tid "
            "FROM (SELECT shard, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
            "FROM doc)), "
            "agg AS (SELECT shard, count(*) AS n_tokens, sum(tid) AS id_sum "
            "FROM tk GROUP BY 1), "
            "dc AS (SELECT shard, count(*) AS n_docs FROM doc GROUP BY 1) "
            "SELECT dc.shard::BIGINT AS shard, dc.n_docs::BIGINT AS n_docs, "
            "coalesce(agg.n_tokens, 0)::BIGINT AS n_tokens, "
            "coalesce(agg.id_sum, 0)::BIGINT AS id_sum "
            "FROM dc LEFT JOIN agg USING (shard)"
        ),
        "pack_concat_chunks": (
            "WITH tok AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n FROM documents), "
            "t2 AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS cs FROM tok WHERE n > 0) "
            "SELECT doc_id, n::BIGINT AS n_tokens, (cs - n)::BIGINT AS start_offset, "
            "((cs - n) // 256)::BIGINT AS first_chunk, "
            "((cs - 1) // 256)::BIGINT AS last_chunk, "
            "((cs - 1) // 256 - (cs - n) // 256 + 1)::BIGINT AS n_chunks FROM t2"
        ),
        "pack_next_fit_bins": (
            # per-shard next-fit walk as a recursive cursor: one row per
            # shard per round, state = (pack seq, filled tokens)
            "WITH RECURSIVE tok AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n "
            "FROM documents), "
            "ord AS (SELECT doc_id, doc_id % 8 AS shard, n, "
            "row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn "
            "FROM tok WHERE n > 0), "
            "step(shard, rn, doc_id, n, seq, off) AS ("
            "SELECT shard, rn, doc_id, n, 0::BIGINT, 0::BIGINT FROM ord WHERE rn = 1 "
            "UNION ALL "
            "SELECT o.shard, o.rn, o.doc_id, o.n, "
            "CASE WHEN s.off + s.n + o.n > 256 AND s.off + s.n > 0 "
            "THEN s.seq + 1 ELSE s.seq END, "
            "CASE WHEN s.off + s.n + o.n > 256 AND s.off + s.n > 0 "
            "THEN 0::BIGINT ELSE s.off + s.n END "
            "FROM step s JOIN ord o ON o.shard = s.shard AND o.rn = s.rn + 1) "
            "SELECT doc_id, shard, seq AS pack_seq, off AS pack_offset FROM step"
        ),
        "emb_pca_power_2it": (
            # power-iteration PCA unroll: population covariance
            # (sum(xi*xj)/n - mi*mj, mirroring covariance_and_mean's
            # element order), v1 = cov @ 1, v2 = cov @ v1, unit-
            # normalize, centered projection; 4-dp rounding on both
            # sides absorbs partial-sum order ulps.
            "WITH x AS (SELECT vec_id, d, CAST(embedding[d] AS DOUBLE) AS v "
            "FROM embeddings, range(1, 65) r(d)), "
            "nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings), "
            "mean AS (SELECT d, sum(v) / (SELECT n FROM nn) AS m FROM x GROUP BY d), "
            "xx AS (SELECT a.d AS i, b.d AS j, sum(a.v * b.v) AS sxx "
            "FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2), "
            "cov AS (SELECT xx.i, xx.j, xx.sxx / (SELECT n FROM nn) - mi.m * mj.m AS c "
            "FROM xx JOIN mean mi ON mi.d = xx.i JOIN mean mj ON mj.d = xx.j), "
            "v1 AS (SELECT i, sum(c) AS v FROM cov GROUP BY i), "
            "v2 AS (SELECT cov.i, sum(cov.c * v1.v) AS v "
            "FROM cov JOIN v1 ON v1.i = cov.j GROUP BY cov.i), "
            "nrm AS (SELECT sqrt(sum(v * v)) AS s FROM v2), "
            "u AS (SELECT i, CASE WHEN (SELECT s FROM nrm) > 0 "
            "THEN v / (SELECT s FROM nrm) ELSE v END AS v FROM v2) "
            "SELECT x.vec_id, ROUND(sum((x.v - mean.m) * u.v), 4) AS pc0 "
            "FROM x JOIN mean ON mean.d = x.d JOIN u ON u.i = x.d "
            "GROUP BY x.vec_id"
        ),
        "bpe_merges_2it": (
            "WITH " + _BPE_2IT_CTES + " "
            "SELECT 1::BIGINT AS rank, \"left\", \"right\", n AS pair_count FROM m1 "
            "UNION ALL "
            "SELECT 2::BIGINT AS rank, \"left\", \"right\", n AS pair_count FROM m2"
        ),
        "bpe_token_counts_2it": (
            "WITH " + _BPE_2IT_CTES + ", "
            "pats AS (SELECT (SELECT \"left\" || \"right\" FROM m1) AS pat1, "
            "(SELECT CASE WHEN \"left\" = (SELECT \"left\" || \"right\" FROM m1) "
            "THEN chr(1) ELSE \"left\" END || "
            "CASE WHEN \"right\" = (SELECT \"left\" || \"right\" FROM m1) "
            "THEN chr(1) ELSE \"right\" END FROM m2) AS pat2), "
            "docw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), "
            "'[ \\t\\n\\r\\f\\v]+'), x -> x <> '')) AS word FROM documents), "
            "cnt AS (SELECT doc_id, sum(length(replace(replace(word, pat1, chr(1)), "
            "pat2, chr(2))))::BIGINT AS n FROM docw, pats GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(c.n, 0)::BIGINT AS n_bpe_tokens "
            "FROM documents d LEFT JOIN cnt c USING (doc_id)"
        ),
        "dedup_minhash_md5_pairs": (
            "WITH " + _MINHASH_MD5_CTES + " "
            "SELECT doc_a, doc_b, est_jaccard, FALSE AS truncated FROM mpairs"
        ),
        "dedup_minhash_md5_clusters": (
            "WITH RECURSIVE " + _MINHASH_MD5_CTES + ", "
            "sym AS (SELECT doc_a AS u, doc_b AS v FROM mpairs "
            "UNION ALL SELECT doc_b AS u, doc_a AS v FROM mpairs), "
            "nodes AS (SELECT DISTINCT u AS node FROM sym), "
            "reach(node, r) AS (SELECT node, node FROM nodes "
            "UNION SELECT sym.v, reach.r FROM reach JOIN sym ON sym.u = reach.node) "
            "SELECT node AS doc_id, min(r) AS cluster FROM reach GROUP BY 1"
        ),
        "dedup_simhash_md5_pairs": (
            # Md5SimHasher in SQL: word votes over md5 bit j, fingerprint
            # bit j = vote > 0; 4x16-bit band blocking; Hamming verify.
            "WITH toks AS (SELECT doc_id, tok, count(*) AS cnt FROM "
            "(SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS tok "
            "FROM documents) GROUP BY 1, 2), "
            "votes AS (SELECT doc_id, j, sum(cnt * (CASE WHEN "
            "(md5_number_upper(tok) >> j) & 1 = 1 THEN 1 ELSE -1 END)) AS v "
            "FROM toks, range(0, 64) r(j) GROUP BY 1, 2), "
            "fp0 AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN 1::UBIGINT << j "
            "ELSE 0::UBIGINT END)::UBIGINT AS fp FROM votes GROUP BY 1), "
            "fp AS (SELECT d.doc_id, coalesce(f.fp, 0::UBIGINT) AS fp "
            "FROM documents d LEFT JOIN fp0 f USING (doc_id)), "
            "bands AS (SELECT doc_id, b, (fp >> (16 * b)) & 65535::UBIGINT AS key, fp "
            "FROM fp, range(0, 4) r(b)), "
            "cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.fp AS fa, "
            "b.doc_id AS doc_b, b.fp AS fb FROM bands a JOIN bands b "
            "ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, bit_count(xor(fa, fb))::BIGINT AS hamming, "
            "FALSE AS truncated FROM cand WHERE bit_count(xor(fa, fb)) <= 3"
        ),
        "dedup_embedding_int_pairs": (
            # integer-exact hyperplane LSH: floor-quantized vectors,
            # md5-derived integer planes, cross-multiplied cosine gate
            # (cos >= 3/8 <=> dot > 0 AND 64*dot^2 >= 9*|a|^2*|b|^2).
            "WITH q AS (SELECT vec_id, d, "
            "CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv "
            "FROM embeddings, range(1, 65) r(d)), "
            "pl AS (SELECT p, d, CAST(md5_number_upper(p::VARCHAR || ',' || d::VARCHAR) "
            "% 7 AS BIGINT) - 3 AS c FROM range(0, 6) rp(p), range(1, 65) rd(d)), "
            "bits AS (SELECT q.vec_id, pl.p, CASE WHEN sum(q.qv * pl.c) > 0 "
            "THEN 1::BIGINT ELSE 0::BIGINT END AS bit FROM q JOIN pl ON q.d = pl.d "
            "GROUP BY 1, 2), "
            "bucket AS (SELECT vec_id, sum(bit * (1::BIGINT << p))::BIGINT AS bucket "
            "FROM bits GROUP BY 1), "
            "norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY 1), "
            "cand AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM bucket a "
            "JOIN bucket b ON a.bucket = b.bucket AND a.vec_id < b.vec_id), "
            "dots AS (SELECT c.va, c.vb, sum(qa.qv * qb.qv)::BIGINT AS dot "
            "FROM cand c JOIN q qa ON qa.vec_id = c.va "
            "JOIN q qb ON qb.vec_id = c.vb AND qb.d = qa.d GROUP BY 1, 2) "
            "SELECT d.va AS vec_a, d.vb AS vec_b, d.dot AS qdot, FALSE AS truncated "
            "FROM dots d JOIN norms na ON na.vec_id = d.va "
            "JOIN norms nb ON nb.vec_id = d.vb "
            "WHERE d.dot > 0 AND 64 * d.dot * d.dot >= 9 * na.nn * nb.nn"
        ),
        "wq_repetition_stats": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '') AS w FROM documents) "
            "SELECT doc_id, len(w) AS n_words, "
            "CASE WHEN len(w) = 0 THEN 0.0 ELSE "
            "ROUND(len(list_distinct(w)) * 1.0 / len(w), 6) END AS distinct_word_ratio, "
            "CASE WHEN len(w) = 0 THEN 0.0 ELSE "
            "ROUND(list_aggregate(list_transform(w, x -> length(x)), 'sum') * 1.0 "
            "/ len(w), 6) END AS mean_word_len FROM toks"
        ),
        "wq_source_quality": (
            "WITH toks AS (SELECT source, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '') AS w FROM documents) "
            "SELECT source, count(*) AS n_docs, "
            "ROUND(avg(CASE WHEN len(w) = 0 THEN 0.0 ELSE "
            "len(list_distinct(w)) * 1.0 / len(w) END), 6) AS avg_distinct_ratio "
            "FROM toks GROUP BY source"
        ),
        "decontaminate_docs": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS g "
            "FROM toks, unnest(range(1, len(w)-2)) AS t(i) WHERE len(w) >= 4), "
            "eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0), "
            "hits AS (SELECT DISTINCT grams.doc_id AS doc_id FROM grams "
            "JOIN eval_g USING (g) WHERE doc_id % 50 <> 0) "
            "SELECT d.doc_id, CAST(h.doc_id IS NOT NULL AS BIGINT) AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id) WHERE d.doc_id % 50 <> 0"
        ),
        "c4_span_dedup": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "chunks AS (SELECT doc_id, i AS chunk_idx, "
            "array_to_string(w[(i*5+1):(i*5+5)], ' ') AS g "
            "FROM toks, unnest(range(0, (len(w)+4)//5)) AS t(i)), "
            "hot AS (SELECT g FROM chunks GROUP BY g "
            "HAVING count(DISTINCT doc_id) >= 2), "
            "kept AS (SELECT doc_id, chunk_idx, g FROM chunks "
            "WHERE g NOT IN (SELECT g FROM hot)) "
            "SELECT d.doc_id, coalesce(string_agg(k.g, ' ' ORDER BY k.chunk_idx), '') "
            "AS text FROM documents d LEFT JOIN kept k USING (doc_id) GROUP BY d.doc_id"
        ),
        "a12_corr": (
            "SELECT l_returnflag, ROUND(corr(l_extendedprice, l_quantity), 6) "
            "AS corr_price_qty FROM lineitem GROUP BY l_returnflag"
        ),
        "j9_bloom_semi_join": (
            "SELECT l_returnflag, ROUND(SUM(l_extendedprice), 2) AS sum_price, "
            "count(*) AS n_rows FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') "
            "GROUP BY l_returnflag"
        ),
        "a13_pivot": (
            "SELECT l_returnflag, "
            "ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) "
            "AS qty_O, "
            "ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) "
            "AS qty_F FROM lineitem GROUP BY l_returnflag"
        ),
        "o10_sample_hash": (
            "SELECT doc_id, source FROM documents "
            "WHERE (doc_id * 2654435761) % 4294967296 < CAST(0.1 * 4294967296 AS BIGINT)"
        ),
        "doc_fingerprints": (
            "SELECT doc_id, md5(text) AS fp_md5 FROM documents"
        ),
        "text_token_stats": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens_ws, "
            "length(text) AS n_chars_seen FROM documents"
        ),
        "json_extract_props": (
            "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events"
        ),
        "o3_regex_scan": (
            "SELECT p_partkey, p_name FROM part "
            "WHERE regexp_matches(p_name, '(red|blue)')"
        ),
        "distinct_count_per_group": (
            "SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts "
            "FROM lineitem GROUP BY l_suppkey"
        ),
        "knn_dot_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
            "WHERE vec_id < 3), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS dot "
            "FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, vec_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank "
            "FROM scored) "
            "SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 5"
        ),
        # --- round-4 additions -------------------------------------------
        # cross-path gate: full-probe IVF must equal brute force exactly
        "knn_ivf_vs_brute": (
            "SELECT CAST(3 AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k, "
            "CAST(0 AS BIGINT) AS n_mismatch"
        ),
        "knn_ivf_exact": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
            "WHERE vec_id < 3), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) / "
            "(sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))) * "
            "sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos "
            "FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, vec_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) - 1 AS rank "
            "FROM scored) "
            "SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id "
            "FROM ranked WHERE rank < 5"
        ),
        "kmeans_fixed_assign": _kmeans_fixed_assign_sql(),
        "kmeans_2it_assign": _kmeans_2it_sql(),
        "text_quality_scores": _text_quality_scores_sql(),
        "curation_ngram": _curation_ngram_sql(),
        "curation_md5_minhash": _curation_md5_minhash_sql(),
        "webtext_curation": _webtext_curation_sql(),
        "pii_redact_docs": (
            "WITH inj AS (SELECT doc_id, text || ' contact user' || doc_id || "
            "'@example.com from 10.0.' || (doc_id % 200) || '.7 ok' AS t FROM documents), "
            "e AS (SELECT doc_id, "
            "len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, "
            "regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 "
            "FROM inj) "
            "SELECT doc_id, "
            "regexp_replace(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS text, "
            "CAST(n_emails AS BIGINT) AS n_emails, "
            "CAST(len(regexp_extract_all(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ips, "
            "CAST(0 AS BIGINT) AS n_phones FROM e"
        ),
        "approx_distinct_count_per_group": (
            "SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, "
            "TRUE AS hll_ok FROM lineitem GROUP BY l_suppkey"
        ),
        "rank_sketch_quantile_price": (
            "SELECT CAST(0.25 AS DOUBLE) AS quantile, "
            "ROUND(quantile_disc(l_extendedprice, 0.25), 4) AS price, TRUE AS bound_ok FROM lineitem "
            "UNION ALL SELECT CAST(0.5 AS DOUBLE), "
            "ROUND(quantile_disc(l_extendedprice, 0.5), 4), TRUE FROM lineitem "
            "UNION ALL SELECT CAST(0.75 AS DOUBLE), "
            "ROUND(quantile_disc(l_extendedprice, 0.75), 4), TRUE FROM lineitem "
            "UNION ALL SELECT CAST(0.99 AS DOUBLE), "
            "ROUND(quantile_disc(l_extendedprice, 0.99), 4), TRUE FROM lineitem"
        ),
        "approx_quantile_price": (
            "SELECT CAST(0.5 AS DOUBLE) AS quantile, "
            "ROUND(quantile_disc(l_extendedprice, 0.5), 4) AS price, TRUE AS bound_ok FROM lineitem "
            "UNION ALL SELECT CAST(0.9 AS DOUBLE), "
            "ROUND(quantile_disc(l_extendedprice, 0.9), 4), TRUE FROM lineitem "
            "UNION ALL SELECT CAST(0.99 AS DOUBLE), "
            "ROUND(quantile_disc(l_extendedprice, 0.99), 4), TRUE FROM lineitem"
        ),
        "a16_covar_stddev": (
            "SELECT l_returnflag, "
            "ROUND(covar_samp(l_extendedprice, l_quantity), 6) AS covar_pq, "
            "ROUND(stddev_samp(l_extendedprice), 6) AS std_price, "
            "ROUND(stddev_samp(l_quantity), 6) AS std_qty "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "f4_math_funcs": (
            "SELECT l_orderkey, l_linenumber, "
            "ROUND(sqrt(l_quantity), 4) AS sqrt_qty, "
            "ROUND(ln(l_extendedprice), 4) AS ln_price, "
            "ROUND(abs(l_discount - 0.05), 4) AS abs_disc, "
            "ROUND(exp(l_tax), 4) AS exp_tax FROM lineitem"
        ),
        "o21_dense_percent_rank": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(dense_rank() OVER w AS BIGINT) AS dense_rank, "
            "ROUND(percent_rank() OVER w, 6) AS pct_rank FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)"
        ),
        "o22_event_transitions": (
            "WITH nxt AS (SELECT user_id, event_type AS from_type, "
            "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type "
            "FROM events) "
            "SELECT from_type, to_type, count(*) AS n FROM nxt "
            "WHERE to_type IS NOT NULL GROUP BY 1, 2"
        ),
        "a17_mode_event": (
            "SELECT user_id, mode_type, n FROM ("
            "SELECT user_id, event_type AS mode_type, count(*) AS n, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "a18_price_histogram": (
            "SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket, "
            "count(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price "
            "FROM orders GROUP BY 1"
        ),
        # --- round-4 batch 2 ---------------------------------------------
        "j12_range_join": (
            "SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, "
            "CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 'T0' "
            "WHEN o_totalprice < 100000 THEN 'T1' "
            "WHEN o_totalprice < 200000 THEN 'T2' "
            "WHEN o_totalprice < 300000 THEN 'T3' "
            "WHEN o_totalprice < 500000 THEN 'T4' ELSE NULL END AS tier "
            "FROM orders"
        ),
        "j13_interval_join": (
            "WITH gaps AS (SELECT user_id, event_id, ts, "
            "CASE WHEN epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, event_id, "
            "CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM gaps"
        ),
        "o23_ntile_cume": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(ntile(4) OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile, "
            "ROUND(cume_dist() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice), 6) AS cume FROM orders"
        ),
        "graph_triangles": (
            "WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s) "
            "SELECT count(*) AS n_triangles FROM e e1 "
            "JOIN e e2 ON e2.u = e1.v "
            "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v"
        ),
        "fuzzy_match_parts": (
            "WITH probes AS (SELECT p_partkey AS probe_id, p_name AS probe "
            "FROM part ORDER BY p_partkey LIMIT 20), "
            "scored AS (SELECT a.probe_id, a.probe, b.p_name AS best_match, "
            "levenshtein(a.probe, b.p_name) AS distance "
            "FROM probes a JOIN part b ON b.p_name <> a.probe), "
            "ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id "
            "ORDER BY distance, best_match) AS rn FROM scored) "
            "SELECT probe_id, probe, best_match, CAST(distance AS BIGINT) AS distance "
            "FROM ranked WHERE rn = 1"
        ),
        "chunk_documents": (
            "SELECT doc_id, CAST(t.k AS BIGINT) AS chunk_id, "
            "substring(text, CAST(t.k * 150 + 1 AS BIGINT), 200) AS chunk, "
            "CAST(length(substring(text, CAST(t.k * 150 + 1 AS BIGINT), 200)) "
            "AS BIGINT) AS n_chunk_chars "
            "FROM documents, generate_series(0, 255) AS t(k) "
            "WHERE t.k * 150 < length(text)"
            # constant series bound: DuckDB's generate_series takes no
            # lateral/subquery args; 255 covers docs up to 38k chars
            # (fixture max 553) and the WHERE prunes the rest
        ),
        "pack_token_budget": (
            "WITH c AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "s AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER "
            "(ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM c) "
            "SELECT doc_id, n_tokens, "
            "CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS bin FROM s"
        ),
        "dedup_ed1_pairs": (
            "SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, "
            "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance "
            "FROM part a JOIN part b ON a.p_partkey < b.p_partkey "
            "WHERE levenshtein(a.p_name, b.p_name) <= 1"
        ),
        "a19_salted_counts": (
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1"
        ),
        "a20_event_entropy": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "s AS (SELECT user_id, SUM(n) AS tot, SUM(n * ln(n)) AS nln "
            "FROM c GROUP BY 1) "
            "SELECT user_id, CAST(tot AS BIGINT) AS n_events, "
            "ROUND(greatest(ln(tot) - nln / tot, 0.0), 6) AS entropy FROM s"
        ),
        "text_bigram_topk": (
            "WITH f AS (SELECT doc_id, list_filter(list_transform("
            "string_split_regex(text, '[ \t\n\r\f\v]+'), x -> lower(x)), "
            "x -> x <> '') AS t FROM documents), "
            "b AS (SELECT t[i.k] AS w1, t[i.k + 1] AS w2 "
            "FROM f, generate_series(1, 2047) AS i(k) WHERE i.k < len(t)), "
            "c AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY 1, 2), "
            "tot AS (SELECT w1, SUM(n) AS tot FROM c GROUP BY 1), "
            "r AS (SELECT c.w1, c.w2, c.n, c.n / tot.tot AS p, "
            "row_number() OVER (PARTITION BY c.w1 "
            "ORDER BY c.n DESC, c.w2) AS rn FROM c JOIN tot ON c.w1 = tot.w1) "
            "SELECT w1, w2, CAST(n AS BIGINT) AS n, ROUND(p, 6) AS p "
            "FROM r WHERE rn <= 3"
        ),
        # --- round-4 batch 3 ---------------------------------------------
        "graph_adamic_adar": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node), "
            "wed AS (SELECT least(a.nbr, b.nbr) AS u, greatest(a.nbr, b.nbr) AS v, "
            "1.0 / ln(deg.d) AS w FROM adj a JOIN adj b "
            "ON a.node = b.node AND a.nbr < b.nbr JOIN deg ON deg.node = a.node), "
            "sc AS (SELECT u, v, ROUND(sum(w), 4) AS score FROM wed GROUP BY u, v), "
            "ne AS (SELECT sc.u, sc.v, sc.score FROM sc LEFT JOIN e "
            "ON e.u = sc.u AND e.v = sc.v WHERE e.u IS NULL), "
            "ranked AS (SELECT u, v, score, row_number() OVER "
            "(ORDER BY score DESC, u, v) AS rn FROM ne) "
            "SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, score "
            "FROM ranked WHERE rn <= 50"
        ),
        # identical plan to graph_adamic_adar (cap 1024 >= max degree 206 at
        # sf0.01 so no sampling fires) + the all-False truncated flag column
        "graph_adamic_adar_capped": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node), "
            "wed AS (SELECT least(a.nbr, b.nbr) AS u, greatest(a.nbr, b.nbr) AS v, "
            "1.0 / ln(deg.d) AS w FROM adj a JOIN adj b "
            "ON a.node = b.node AND a.nbr < b.nbr JOIN deg ON deg.node = a.node), "
            "sc AS (SELECT u, v, ROUND(sum(w), 4) AS score FROM wed GROUP BY u, v), "
            "ne AS (SELECT sc.u, sc.v, sc.score FROM sc LEFT JOIN e "
            "ON e.u = sc.u AND e.v = sc.v WHERE e.u IS NULL), "
            "ranked AS (SELECT u, v, score, row_number() OVER "
            "(ORDER BY score DESC, u, v) AS rn FROM ne) "
            "SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, score, "
            "FALSE AS truncated FROM ranked WHERE rn <= 50"
        ),
        "text_ppl_buckets": (
            "WITH tok AS ("
            "  SELECT doc_id, lower(t.term) AS term"
            "  FROM documents, UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+'))"
            "  AS t(term) WHERE t.term <> ''"
            "), tf AS (SELECT doc_id, term, count(*) AS tfc FROM tok GROUP BY 1, 2),"
            " dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY 1),"
            " vc AS (SELECT term, sum(tfc) AS cnt FROM tf GROUP BY 1),"
            " tot AS (SELECT sum(cnt) AS total FROM vc),"
            " scored AS (SELECT tf.doc_id,"
            "   (tfc * LN(cnt / total)) / dlen AS c"
            "   FROM tf JOIN dl USING (doc_id) JOIN vc USING (term)"
            "   CROSS JOIN tot),"
            " lp AS (SELECT doc_id, ROUND(sum(c), 4) AS logprob "
            "   FROM scored GROUP BY 1),"
            " p AS (SELECT count(*) AS n, "
            "   CAST(ceil(count(*) / 3.0) AS BIGINT) AS h FROM lp),"
            " ord AS (SELECT logprob, row_number() OVER (ORDER BY logprob) AS rn"
            "   FROM lp),"
            " cuts AS (SELECT"
            "   (SELECT o.logprob FROM ord o, p "
            "    WHERE o.rn = greatest(p.n - p.h, 0) + 1) AS c_head,"
            "   (SELECT o.logprob FROM ord o, p "
            "    WHERE o.rn = greatest(p.n - 2 * p.h, 0) + 1) AS c_mid) "
            "SELECT doc_id, logprob, CASE WHEN logprob >= c_head THEN 'head' "
            "WHEN logprob >= c_mid THEN 'middle' ELSE 'tail' END AS bucket "
            "FROM lp CROSS JOIN cuts"
        ),
        "approx_count_min": (
            "SELECT CAST(l_partkey AS BIGINT) AS l_partkey, "
            "CAST(count(*) AS BIGINT) AS cnt, TRUE AS cms_never_under "
            "FROM lineitem GROUP BY 1"
        ),
        "a21_regr_by_group": (
            "SELECT l_returnflag, "
            "ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope, "
            "ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept, "
            "ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2 "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "f5_standardize": (
            "SELECT event_id, event_type, "
            "ROUND((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6) "
            "AS zvalue FROM events "
            "WINDOW w AS (PARTITION BY event_type)"
        ),
        "o24_pareto_front": (
            "SELECT CAST(p_partkey AS BIGINT) AS p_partkey, "
            "ROUND(p_retailprice, 2) AS p_retailprice, "
            "CAST(p_size AS BIGINT) AS p_size "
            "FROM part a WHERE NOT EXISTS ("
            "SELECT 1 FROM part b "
            "WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size "
            "AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))"
        ),
        "io_jsonl_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang"
        ),
        "io_csv_roundtrip": (
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(o_orderkey) AS BIGINT) AS keysum "
            "FROM orders GROUP BY o_orderstatus"
        ),
        "graph_common_neighbors": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "wed AS (SELECT least(a.nbr, b.nbr) AS u, greatest(a.nbr, b.nbr) AS v "
            "FROM adj a JOIN adj b ON a.node = b.node AND a.nbr < b.nbr), "
            "sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS score FROM wed GROUP BY u, v), "
            "ne AS (SELECT sc.u, sc.v, sc.score FROM sc LEFT JOIN e "
            "ON e.u = sc.u AND e.v = sc.v WHERE e.u IS NULL), "
            "ranked AS (SELECT u, v, score, row_number() OVER "
            "(ORDER BY score DESC, u, v) AS rn FROM ne) "
            "SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, score "
            "FROM ranked WHERE rn <= 50"
        ),
        "graph_jaccard": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node), "
            "wed AS (SELECT least(a.nbr, b.nbr) AS u, greatest(a.nbr, b.nbr) AS v "
            "FROM adj a JOIN adj b ON a.node = b.node AND a.nbr < b.nbr), "
            "c AS (SELECT u, v, count(*) AS c FROM wed GROUP BY u, v), "
            "ne AS (SELECT c.u, c.v, c.c FROM c LEFT JOIN e "
            "ON e.u = c.u AND e.v = c.v WHERE e.u IS NULL), "
            "sc AS (SELECT ne.u, ne.v, ROUND(CAST(ne.c AS DOUBLE) / "
            "(du.d + dv.d - ne.c), 4) AS score FROM ne "
            "JOIN deg du ON du.node = ne.u JOIN deg dv ON dv.node = ne.v), "
            "ranked AS (SELECT u, v, score, row_number() OVER "
            "(ORDER BY score DESC, u, v) AS rn FROM sc) "
            "SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, score "
            "FROM ranked WHERE rn <= 50"
        ),
        "profile_lineitem": " UNION ALL ".join(
            f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
            f"ROUND(CAST(min({c}) AS DOUBLE), 6) AS min_v, "
            f"ROUND(CAST(max({c}) AS DOUBLE), 6) AS max_v, "
            f"ROUND(avg({c}), 4) AS mean_v FROM lineitem"
            for c in [
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            ]
        ),
        "f6_dim_means": (
            "SELECT CAST(i - 1 AS BIGINT) AS dim, "
            "ROUND(avg(embedding[i]), 6) AS mean_v "
            "FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1"
        ),
        "a22_mad_quantity": (
            "SELECT ROUND(median(l_quantity), 6) AS med, "
            "ROUND(mad(l_quantity), 6) AS mad FROM lineitem"
        ),
        "graph_assortativity": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node), "
            "de AS (SELECT du.d AS x, dv.d AS y FROM e "
            "JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v), "
            "sym AS (SELECT x, y FROM de UNION ALL SELECT y, x FROM de) "
            "SELECT ROUND(corr(x, y), 6) AS assortativity FROM sym"
        ),
        "graph_clustering_coeff": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node), "
            "tri AS (SELECT a.node, count(*) AS t FROM adj a "
            "JOIN adj b ON a.node = b.node AND a.nbr < b.nbr "
            "JOIN e ON e.u = a.nbr AND e.v = b.nbr GROUP BY a.node) "
            "SELECT CAST(deg.node AS BIGINT) AS node, CAST(d AS BIGINT) AS d, "
            "ROUND(COALESCE(2.0 * t / (d * (d - 1)), 0), 6) AS cc "
            "FROM deg LEFT JOIN tri ON tri.node = deg.node WHERE d >= 2"
        ),
        "f7_label_centroids": (
            "SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim, "
            "ROUND(avg(embedding[i]), 6) AS mean_v "
            "FROM embeddings, generate_series(1, 64) AS t(i) GROUP BY 1, 2"
        ),
        "j14_cross_join": (
            "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, "
            "CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name, "
            "n_regionkey = r_regionkey AS same_region "
            "FROM nation CROSS JOIN region"
        ),
        "d3_except_intersect": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, 'intersect' AS op "
            "FROM (SELECT c_custkey FROM customer "
            "INTERSECT SELECT o_custkey FROM orders) "
            "UNION ALL "
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, 'except' AS op "
            "FROM (SELECT c_custkey FROM customer "
            "EXCEPT SELECT o_custkey FROM orders)"
        ),
        "graph_degree_hist": (
            "WITH ps AS (SELECT DISTINCT l_orderkey AS p, l_partkey AS s FROM lineitem), "
            "e AS (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "adj AS (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v AS node, u AS nbr FROM e), "
            "deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node) "
            "SELECT CAST(d AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n_nodes "
            "FROM deg GROUP BY d"
        ),
        "o26_throttle_dedup": (
            "WITH lagd AS (SELECT event_id, user_id, event_type, "
            "ts - LAG(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS d FROM events) "
            "SELECT CAST(event_id AS BIGINT) AS event_id, "
            "CAST(user_id AS BIGINT) AS user_id, event_type "
            "FROM lagd WHERE d IS NULL OR d > INTERVAL 48 HOURS"
        ),
        "a23_group_percentile_cont": (
            "SELECT l_returnflag, "
            "ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) "
            "AS p_cont FROM lineitem GROUP BY l_returnflag"
        ),
        "o27_asof_tolerance": (
            "SELECT event_id, user_id, "
            "CASE WHEN ok THEN click_id END AS click_id, "
            "CASE WHEN ok THEN click_ts END AS click_ts FROM ("
            "SELECT event_id, user_id, click_id, click_ts, "
            "click_ts IS NOT NULL AND ts - click_ts <= INTERVAL 24 HOURS AS ok "
            "FROM (SELECT e.event_id, e.user_id, e.ts, c.event_id AS click_id, "
            "c.ts AS click_ts, row_number() OVER (PARTITION BY e.event_id "
            "ORDER BY c.ts DESC, c.event_id DESC) AS rn "
            "FROM events e LEFT JOIN "
            "(SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c "
            "ON c.user_id = e.user_id AND c.ts <= e.ts) WHERE rn = 1)"
        ),
        "text_top_terms_by_lang": (
            "WITH tok AS (SELECT lang, lower(t.term) AS term "
            "FROM documents, UNNEST(string_split_regex(text, '[ \t\n\r\f\v]+')) "
            "AS t(term) WHERE t.term <> ''), "
            "c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n "
            "FROM tok GROUP BY 1, 2), "
            "r AS (SELECT lang, term, n, row_number() OVER "
            "(PARTITION BY lang ORDER BY n DESC, term) AS rn FROM c) "
            "SELECT lang, term, n FROM r WHERE rn <= 5"
        ),
        "o28_keep_latest_n": (
            "SELECT CAST(event_id AS BIGINT) AS event_id, "
            "CAST(user_id AS BIGINT) AS user_id, event_type FROM ("
            "SELECT event_id, user_id, event_type, row_number() OVER "
            "(PARTITION BY user_id, event_type "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "WHERE rn <= 3"
        ),
        "f8_conditional_agg": (
            "SELECT l_returnflag, "
            "ROUND(COALESCE(sum(l_extendedprice * (1 - l_discount)) "
            "FILTER (l_discount > 0.05), 0), 2) AS disc_rev, "
            "CAST(count(*) FILTER (l_quantity >= 30) AS BIGINT) AS n_bigqty, "
            "ROUND(CAST(count(*) FILTER (l_discount > 0.05) AS DOUBLE) "
            "/ count(*), 6) AS disc_share "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "dq_checks": (
            "SELECT 'customer_null_name' AS check_name, "
            "CAST(count(*) FILTER (c_name IS NULL) AS BIGINT) AS violations "
            "FROM customer "
            "UNION ALL SELECT 'events_null_value', "
            "count(*) FILTER (value IS NULL) FROM events "
            "UNION ALL SELECT 'lineitem_orphans', "
            "(SELECT count(*) FROM lineitem l WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) "
            "UNION ALL SELECT 'lineitem_qty_out_of_range', "
            "count(*) FILTER (l_quantity < 1 OR l_quantity > 50) FROM lineitem "
            "UNION ALL SELECT 'orders_dup_keys', "
            "count(*) - count(DISTINCT o_orderkey) FROM orders "
            "UNION ALL SELECT 'orders_nonpositive_price', "
            "count(*) FILTER (o_totalprice <= 0) FROM orders "
            "UNION ALL SELECT 'orders_null_custkey', "
            "count(*) FILTER (o_custkey IS NULL) FROM orders"
        ),
        "o29_gapfill_daily": (
            "WITH RECURSIVE bounds AS (SELECT user_id, "
            "min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi "
            "FROM events GROUP BY user_id), "
            "days(user_id, d, hi) AS ("
            "SELECT user_id, lo, hi FROM bounds "
            "UNION ALL SELECT user_id, d + 1, hi FROM days WHERE d < hi), "
            "counts AS (SELECT user_id, CAST(ts AS DATE) AS d, "
            "count(*) AS n FROM events GROUP BY 1, 2) "
            "SELECT days.user_id, strftime(days.d, '%Y-%m-%d') AS day, "
            "CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_events "
            "FROM days LEFT JOIN counts "
            "ON days.user_id = counts.user_id AND days.d = counts.d"
        ),
        "f9_quantile_bucket": (
            "WITH q AS (SELECT "
            "percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1, "
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS q2, "
            "percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3 "
            "FROM orders), "
            "b AS (SELECT CASE WHEN o_totalprice <= q1 THEN 1 "
            "WHEN o_totalprice <= q2 THEN 2 "
            "WHEN o_totalprice <= q3 THEN 3 ELSE 4 END AS bucket, "
            "o_totalprice FROM orders, q) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "count(*) AS n_orders, "
            "ROUND(min(o_totalprice), 2) AS min_price, "
            "ROUND(max(o_totalprice), 2) AS max_price "
            "FROM b GROUP BY bucket"
        ),
        "merge_cdc_latest": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "event_type AS last_type, "
            "ROUND(value, 2) AS last_value FROM ("
            "SELECT user_id, event_type, value, row_number() OVER "
            "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1 AND event_type <> 'error'"
        ),
        "emb_fd_sketch": (
            "SELECT d AS dim, ROUND(sum(CAST(embedding[d] AS DOUBLE) * "
            "CAST(embedding[d] AS DOUBLE)), 4) AS ss, TRUE AS bound_ok "
            "FROM embeddings, range(1, 65) r(d) GROUP BY d"
        ),
        "emb_covariance": (
            "SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, "
            "ROUND(covar_pop(list_extract(embedding, i + 1), "
            "list_extract(embedding, j + 1)), 6) AS cov "
            "FROM embeddings, range(8) ti(i), range(8) tj(j) "
            "GROUP BY i, j"
        ),
        "f10_explode_tokens": (
            "WITH toks AS (SELECT doc_id, "
            "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') "
            "AS tk FROM documents) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, k AS pos, "
            "tk[k + 1] AS token "
            "FROM toks, range(32) t(k) WHERE k < len(tk)"
        ),
        "cohort_matrix": (
            "WITH w AS (SELECT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events), "
            "c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1) "
            "SELECT c.cohort_wk, w.wk - c.cohort_wk AS wk_offset, "
            "count(DISTINCT w.user_id) AS n_users "
            "FROM w JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "zorder_layout": (
            "WITH z AS (SELECT l_orderkey, l_linenumber, "
            "(SELECT sum((((l_partkey >> b) & 1) << (2 * b)) "
            "+ (((l_suppkey >> b) & 1) << (2 * b + 1))) "
            "FROM range(16) t(b)) AS zkey FROM lineitem) "
            "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, "
            "CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            "CAST(zkey AS BIGINT) AS zkey FROM z "
            "ORDER BY zkey, l_orderkey, l_linenumber LIMIT 20"
        ),
        "pmi_part_pairs": (
            "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "pcnt AS (SELECT l_partkey, count(*) AS c FROM op GROUP BY 1), "
            "tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM op), "
            "pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v, "
            "count(*) AS cuv FROM op a JOIN op b "
            "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
            "GROUP BY 1, 2) "
            "SELECT u, v, cuv, "
            "ROUND(ln(CAST(cuv AS DOUBLE) * tot.n / (cu.c * cv.c)), 6) AS pmi "
            "FROM pairs, tot "
            "JOIN pcnt cu ON cu.l_partkey = u JOIN pcnt cv ON cv.l_partkey = v "
            "WHERE cuv >= 3 "
            "ORDER BY pmi DESC, u, v LIMIT 20"
        ),
        "mix_sources_balanced": (
            "WITH cnt AS (SELECT source, count(*) AS n FROM documents "
            "GROUP BY 1), lam AS (SELECT min(n) AS mn FROM cnt) "
            "SELECT d.doc_id, d.source FROM documents d "
            "JOIN cnt USING (source), lam "
            "WHERE (d.doc_id * 2654435761) % 4294967296 < "
            "CAST(CAST(lam.mn AS DOUBLE) / cnt.n * 4294967296 AS BIGINT)"
        ),
        "split_train_val_test": (
            "SELECT source, CASE "
            "WHEN (doc_id * 2654435761) % 4294967296 < "
            "CAST(0.8 * 4294967296 AS BIGINT) THEN 'train' "
            "WHEN (doc_id * 2654435761) % 4294967296 < "
            "CAST(0.9 * 4294967296 AS BIGINT) THEN 'val' "
            "ELSE 'test' END AS split, count(*) AS n_docs "
            "FROM documents GROUP BY 1, 2"
        ),
        "inverted_index_postings": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf "
            "FROM toks, unnest(w) AS u(t) GROUP BY 1, 2) "
            "SELECT term, CAST(count(*) AS BIGINT) AS df, "
            "CAST(sum(tf) AS BIGINT) AS total_tf, "
            "string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings "
            "FROM tf GROUP BY term"
        ),
        "search_curated_corpus": (
            "WITH toks0 AS (SELECT doc_id, unnest(list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents), "
            "b AS (SELECT doc_id, CAST(md5_number_upper(tok) % 1024 AS BIGINT) AS j "
            "FROM toks0), "
            "sm AS (SELECT doc_id, sum(CAST(md5_number_upper('w:' || j::VARCHAR) "
            "% 21 AS BIGINT) - 10) AS score FROM b GROUP BY 1), "
            "sc AS (SELECT d.doc_id, d.text, coalesce(sm.score, 0)::BIGINT AS score "
            "FROM documents d LEFT JOIN sm USING (doc_id)), "
            "winners AS (SELECT doc_id, text, score FROM ("
            "SELECT doc_id, text, score, row_number() OVER (PARTITION BY text "
            "ORDER BY score DESC, doc_id) AS rn FROM sc) WHERE rn = 1), "
            "surv AS (SELECT doc_id, text FROM winners WHERE score > 0), "
            "tf AS (SELECT s.doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf "
            "FROM surv s, unnest(list_filter(string_split_regex(lower(s.text), "
            "'[^a-z0-9]+'), x -> x <> '')) AS u(t) GROUP BY 1, 2), "
            "hits AS (SELECT doc_id, count(*) AS n, CAST(sum(tf) AS BIGINT) "
            "AS score FROM tf WHERE term IN ('dup', 'data') GROUP BY 1) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, score FROM hits "
            "WHERE n = 2 ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "io_zonemap_prune": (
            "SELECT count(*) AS n_rows, "
            "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders, "
            "ROUND(sum(l_quantity), 2) AS sum_qty FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate <= TIMESTAMP '1997-12-31 23:59:59.999999'"
        ),
        "index_search_and": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf "
            "FROM toks, unnest(w) AS u(t) GROUP BY 1, 2), "
            "hits AS (SELECT doc_id, count(*) AS n, CAST(sum(tf) AS BIGINT) "
            "AS score FROM tf WHERE term IN ('dup', 'data') GROUP BY 1) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, score FROM hits "
            "WHERE n = 2 ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "io_partitioned_write": (
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents WHERE lang = 'en' GROUP BY 1"
        ),
        "emb_quantize_error": (
            "WITH s AS (SELECT i, CASE WHEN "
            "max(abs(list_extract(embedding, i + 1))) > 0 THEN "
            "max(abs(list_extract(embedding, i + 1))) ELSE 1 END AS sc "
            "FROM embeddings, range(64) t(i) GROUP BY i), "
            "e AS (SELECT vec_id, "
            "CAST(list_extract(embedding, i + 1) AS DOUBLE) AS x, sc "
            "FROM embeddings, s), "
            "q AS (SELECT vec_id, "
            "abs(x - GREATEST(-127, LEAST(127, ROUND(x * 127 / sc))) "
            "* sc / 127) AS err FROM e) "
            "SELECT vec_id, ROUND(max(err), 6) AS max_err "
            "FROM q GROUP BY vec_id"
        ),
        "o30_rolling_anomaly": (
            "WITH w AS (SELECT user_id, event_id, value, "
            "avg(value) OVER win AS m, "
            "stddev_samp(value) OVER win AS s, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events "
            "WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(event_id AS BIGINT) AS event_id, "
            "ROUND((value - m) / s, 4) AS z "
            "FROM w WHERE rn >= 6 AND s > 0 AND abs((value - m) / s) > 2"
        ),
        "j15_skew_join": (
            "SELECT CAST(l_suppkey AS BIGINT) AS suppkey, s_name, "
            "count(*) AS n_lines, ROUND(sum(l_quantity), 2) AS sum_qty "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY 1, 2"
        ),
        "graph_bfs_hops": (
            "WITH RECURSIVE e AS ("
            "SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
            "FROM lineitem a JOIN lineitem b "
            "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey), "
            "bfs(node, d) AS ("
            "SELECT CAST(p_partkey AS BIGINT), 0 FROM part WHERE p_partkey <= 5 "
            "UNION "
            "SELECT e.v, bfs.d + 1 FROM bfs JOIN e ON e.u = bfs.node "
            "WHERE bfs.d < 3) "
            "SELECT node, CAST(min(d) AS BIGINT) AS hops FROM bfs GROUP BY 1"
        ),
        "semdedup_embeddings": _semdedup_sql(),
        "graph_lpa_2it": (
            "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p), "
            "adj AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e), "
            "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM adj), "
            "l1 AS MATERIALIZED (SELECT node, label FROM ("
            "SELECT adj.u AS node, p.label AS label, "
            "row_number() OVER (PARTITION BY adj.u "
            "ORDER BY count(*) DESC, p.label) AS rk "
            "FROM adj JOIN l0 p ON p.node = adj.v GROUP BY adj.u, p.label"
            ") WHERE rk = 1), "
            "l2 AS MATERIALIZED (SELECT node, label FROM ("
            "SELECT adj.u AS node, p.label AS label, "
            "row_number() OVER (PARTITION BY adj.u "
            "ORDER BY count(*) DESC, p.label) AS rk "
            "FROM adj JOIN l1 p ON p.node = adj.v GROUP BY adj.u, p.label"
            ") WHERE rk = 1) "
            "SELECT node, label FROM l2"
        ),
        "graph_hits_2it": (
            "WITH e AS MATERIALIZED (SELECT CAST(l_suppkey AS BIGINT) AS src, "
            "CAST(l_partkey + 10000000 AS BIGINT) AS dst FROM lineitem), "
            "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), "
            "a1 AS MATERIALIZED (SELECT dst AS node, CAST(count(*) AS BIGINT) AS a "
            "FROM e GROUP BY 1), "
            "h1 AS MATERIALIZED (SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h "
            "FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1), "
            "a2 AS MATERIALIZED (SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a "
            "FROM e JOIN h1 ON h1.node = e.src GROUP BY 1), "
            "h2 AS MATERIALIZED (SELECT e.src AS node, CAST(sum(a2.a) AS BIGINT) AS h "
            "FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1) "
            "SELECT n.node, CAST(COALESCE(h2.h, 0) AS BIGINT) AS hub, "
            "CAST(COALESCE(a2.a, 0) AS BIGINT) AS auth "
            "FROM nodes n LEFT JOIN h2 ON h2.node = n.node "
            "LEFT JOIN a2 ON a2.node = n.node"
        ),
        "graph_walks_2step": (
            "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p), "
            "adj AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e), "
            "w1 AS MATERIALIZED (SELECT start, s1 FROM ("
            "SELECT adj.u AS start, adj.v AS s1, "
            "row_number() OVER (PARTITION BY adj.u ORDER BY "
            "md5_number_upper(adj.u::VARCHAR || ',1,' || adj.v::VARCHAR), adj.v) AS rk "
            "FROM adj) WHERE rk = 1), "
            "w2 AS MATERIALIZED (SELECT start, s1, s2 FROM ("
            "SELECT w1.start, w1.s1, adj.v AS s2, "
            "row_number() OVER (PARTITION BY w1.start ORDER BY "
            "md5_number_upper(w1.start::VARCHAR || ',2,' || adj.v::VARCHAR), adj.v) AS rk "
            "FROM w1 JOIN adj ON adj.u = w1.s1) WHERE rk = 1) "
            "SELECT CAST(start AS BIGINT) AS start, CAST(s1 AS BIGINT) AS s1, "
            "CAST(s2 AS BIGINT) AS s2 FROM w2"
        ),
        "graph_sssp_2it": (
            "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p), "
            "adj AS MATERIALIZED (SELECT u, v, 1 + (u + v) % 9 AS w FROM "
            "(SELECT u, v FROM e UNION ALL SELECT v, u FROM e)), "
            "d0 AS (SELECT CAST(min(u) AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist "
            "FROM adj), "
            "r1 AS MATERIALIZED (SELECT adj.v AS node, min(d0.dist + adj.w) AS cand "
            "FROM adj JOIN d0 ON adj.u = d0.node GROUP BY 1), "
            "d1 AS MATERIALIZED (SELECT COALESCE(d0.node, r1.node) AS node, "
            "CAST(least(COALESCE(d0.dist, 9223372036854775807), "
            "COALESCE(r1.cand, 9223372036854775807)) AS BIGINT) AS dist "
            "FROM d0 FULL JOIN r1 ON d0.node = r1.node), "
            "r2 AS MATERIALIZED (SELECT adj.v AS node, min(d1.dist + adj.w) AS cand "
            "FROM adj JOIN d1 ON adj.u = d1.node GROUP BY 1), "
            "d2 AS (SELECT COALESCE(d1.node, r2.node) AS node, "
            "CAST(least(COALESCE(d1.dist, 9223372036854775807), "
            "COALESCE(r2.cand, 9223372036854775807)) AS BIGINT) AS dist "
            "FROM d1 FULL JOIN r2 ON d1.node = r2.node) "
            "SELECT node, dist FROM d2"
        ),
        "graph_ppr_2it": (
            "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p), "
            "sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e), "
            "deg AS MATERIALIZED (SELECT u, count(*) AS dg FROM sym GROUP BY 1), "
            "seeds AS MATERIALIZED (SELECT u AS node FROM deg WHERE u % 50 = 0), "
            "ns AS (SELECT count(*) AS m FROM seeds), "
            "p0 AS (SELECT node, 1.0 / m AS r FROM seeds, ns), "
            "g1 AS MATERIALIZED (SELECT s.v AS node, sum(p.r / d.dg) AS c "
            "FROM sym s JOIN p0 p ON p.node = s.u JOIN deg d ON d.u = s.u "
            "GROUP BY 1), "
            "p1 AS MATERIALIZED (SELECT COALESCE(g.node, sd.node) AS node, "
            "0.85 * COALESCE(g.c, 0) + (CASE WHEN sd.node IS NOT NULL "
            "THEN (1.0 - 0.85) / ns.m ELSE 0 END) AS r "
            "FROM g1 g FULL JOIN seeds sd ON sd.node = g.node CROSS JOIN ns), "
            "g2 AS MATERIALIZED (SELECT s.v AS node, sum(p.r / d.dg) AS c "
            "FROM sym s JOIN p1 p ON p.node = s.u JOIN deg d ON d.u = s.u "
            "GROUP BY 1), "
            "p2 AS (SELECT COALESCE(g.node, sd.node) AS node, "
            "0.85 * COALESCE(g.c, 0) + (CASE WHEN sd.node IS NOT NULL "
            "THEN (1.0 - 0.85) / ns.m ELSE 0 END) AS r "
            "FROM g2 g FULL JOIN seeds sd ON sd.node = g.node CROSS JOIN ns) "
            "SELECT CAST(node AS BIGINT) AS node, ROUND(r, 6) AS ppr FROM p2"
        ),
        "graph_edge_support": (
            "WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
            "FROM lineitem), "
            "e AS MATERIALIZED (SELECT DISTINCT a.s AS u, b.s AS v FROM ps a "
            "JOIN ps b ON a.p = b.p AND a.s < b.s), "
            "tri AS MATERIALIZED (SELECT e1.u AS x, e1.v AS y, e2.v AS z "
            "FROM e e1 JOIN e e2 ON e2.u = e1.v "
            "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) "
            "SELECT u, v, count(*) AS support FROM ("
            "SELECT x AS u, y AS v FROM tri "
            "UNION ALL SELECT y, z FROM tri "
            "UNION ALL SELECT x, z FROM tri) GROUP BY 1, 2"
        ),
        "graph_coloring_2it": (
            "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p), "
            "adj AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e "
            "UNION ALL SELECT v, u FROM e), "
            "pr AS MATERIALIZED (SELECT node, "
            "md5_number_upper(node::VARCHAR) AS h FROM "
            "(SELECT DISTINCT node FROM adj)), "
            "nm1 AS MATERIALIZED (SELECT adj.node, max(p.h) AS nh FROM adj "
            "JOIN pr p ON p.node = adj.nbr GROUP BY 1), "
            "w1 AS MATERIALIZED (SELECT pr.node FROM pr "
            "JOIN nm1 ON nm1.node = pr.node WHERE pr.h > nm1.nh), "
            "u1 AS MATERIALIZED (SELECT pr.* FROM pr "
            "WHERE pr.node NOT IN (SELECT node FROM w1)), "
            "nm2 AS MATERIALIZED (SELECT adj.node, max(p.h) AS nh FROM adj "
            "JOIN u1 p ON p.node = adj.nbr GROUP BY 1), "
            "w2 AS MATERIALIZED (SELECT u1.node FROM u1 "
            "LEFT JOIN nm2 ON nm2.node = u1.node "
            "WHERE nm2.nh IS NULL OR u1.h > nm2.nh) "
            "SELECT node, CAST(0 AS BIGINT) AS color, CAST(1 AS BIGINT) "
            "AS round FROM w1 "
            "UNION ALL "
            "SELECT w2.node, CAST(CASE WHEN EXISTS (SELECT 1 FROM adj "
            "JOIN w1 ON w1.node = adj.nbr WHERE adj.node = w2.node) "
            "THEN 1 ELSE 0 END AS BIGINT) AS color, CAST(2 AS BIGINT) "
            "AS round FROM w2"
        ),
        "graph_matching_2it": (
            "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem), "
            "h0 AS MATERIALIZED (SELECT u, v, "
            "md5_number_upper(u::VARCHAR || ',' || v::VARCHAR) AS h FROM "
            "(SELECT DISTINCT a.p AS u, b.p AS v FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p)), "
            "nm1 AS MATERIALIZED (SELECT node, min(h) AS hmin FROM "
            "(SELECT u AS node, h FROM h0 UNION ALL SELECT v, h FROM h0) "
            "GROUP BY 1), "
            "m1 AS MATERIALIZED (SELECT h0.u, h0.v FROM h0 "
            "JOIN nm1 a ON a.node = h0.u AND a.hmin = h0.h "
            "JOIN nm1 b ON b.node = h0.v AND b.hmin = h0.h), "
            "mn1 AS MATERIALIZED (SELECT u AS node FROM m1 "
            "UNION SELECT v FROM m1), "
            "e1 AS MATERIALIZED (SELECT h0.* FROM h0 "
            "WHERE u NOT IN (SELECT node FROM mn1) "
            "AND v NOT IN (SELECT node FROM mn1)), "
            "nm2 AS MATERIALIZED (SELECT node, min(h) AS hmin FROM "
            "(SELECT u AS node, h FROM e1 UNION ALL SELECT v, h FROM e1) "
            "GROUP BY 1), "
            "m2 AS MATERIALIZED (SELECT e1.u, e1.v FROM e1 "
            "JOIN nm2 a ON a.node = e1.u AND a.hmin = e1.h "
            "JOIN nm2 b ON b.node = e1.v AND b.hmin = e1.h) "
            "SELECT u, v, CAST(1 AS BIGINT) AS round FROM m1 "
            "UNION ALL SELECT u, v, CAST(2 AS BIGINT) FROM m2"
        ),
        "approx_distinct_kmv": (
            "WITH vals AS (SELECT DISTINCT l_partkey AS v FROM lineitem), "
            "hs AS (SELECT md5_number_upper(CAST(v AS VARCHAR)) AS h FROM vals), "
            "bot AS (SELECT h FROM hs ORDER BY h LIMIT 64), "
            "agg AS (SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS kth_hash "
            "FROM bot), "
            "ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM vals), "
            "est AS (SELECT agg.k, agg.kth_hash, "
            "CAST((CAST(agg.k - 1 AS HUGEINT) * 18446744073709551616) "
            "// CAST(agg.kth_hash AS HUGEINT) AS BIGINT) AS est_distinct, "
            "ex.exact_distinct FROM agg, ex) "
            "SELECT k, kth_hash, est_distinct, exact_distinct, "
            "((est_distinct - exact_distinct) * (est_distinct - exact_distinct) "
            "* (k - 2) <= 9 * exact_distinct * exact_distinct) AS within_3sigma "
            "FROM est"
        ),
        "graph_kcore": _kcore_sql(),
        "o31_range_frame": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(event_id AS BIGINT) AS event_id, "
            "count(*) OVER win AS n_win, "
            "ROUND(sum(value) OVER win, 4) AS sum_win "
            "FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "a24_unpivot": (
            "WITH a AS (SELECT l_returnflag, "
            "ROUND(sum(l_quantity), 2) AS q, "
            "ROUND(sum(l_extendedprice), 2) AS p, "
            "ROUND(sum(l_discount), 2) AS d FROM lineitem GROUP BY 1) "
            "SELECT l_returnflag, 'sum_qty' AS measure, q AS value FROM a "
            "UNION ALL SELECT l_returnflag, 'sum_price', p FROM a "
            "UNION ALL SELECT l_returnflag, 'sum_disc', d FROM a"
        ),
        "io_compact_small_files": (
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents WHERE lang = 'en' GROUP BY 1"
        ),
        "j16_overlap_join": (
            "WITH iv AS (SELECT l_orderkey, epoch_us(min(l_shipdate)) AS s, "
            "epoch_us(max(l_shipdate)) AS e FROM lineitem GROUP BY 1), "
            "wk AS (SELECT k, epoch_us(TIMESTAMP '1992-01-01') "
            "+ k * 604800000000 AS ws FROM range(400) t(k)), "
            "ov AS (SELECT l_orderkey, k FROM iv JOIN wk "
            "ON iv.s <= wk.ws + 604799999999 AND wk.ws <= iv.e) "
            "SELECT CAST(k AS BIGINT) AS wk, count(*) AS n_orders "
            "FROM ov GROUP BY 1"
        ),
        "text_cosine_pairs": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "tf0 AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf "
            "FROM toks, unnest(w) AS u(t) GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1), "
            "tf AS (SELECT tf0.* FROM tf0 JOIN df USING(term) WHERE df.df <= 100), "
            "nrm AS (SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2 "
            "FROM tf GROUP BY 1), "
            "dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(sum(a.tf*b.tf) AS BIGINT) AS dot FROM tf a "
            "JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, dot, na.n2 AS norm_a, nb.n2 AS norm_b "
            "FROM dots JOIN nrm na ON na.doc_id = doc_a "
            "JOIN nrm nb ON nb.doc_id = doc_b "
            "WHERE dot > 0 AND 5 * dot * dot >= 4 * na.n2 * nb.n2"
        ),
        "text_containment_pairs": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '') AS w FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g "
            "FROM toks, unnest(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3), "
            "counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "shr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared "
            "FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, shared, "
            "ROUND(shared * 1.0 / least(ca.n, cb.n), 6) AS containment "
            "FROM shr JOIN counts ca ON ca.doc_id = doc_a "
            "JOIN counts cb ON cb.doc_id = doc_b "
            "WHERE shared * 1.0 / least(ca.n, cb.n) >= 0.9"
        ),
        "o20_watermark_late": (
            "WITH w AS (SELECT user_id, event_id, ts, "
            "max(ts) OVER (PARTITION BY user_id "
            "ORDER BY (event_id * 2654435761) % 4294967296, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw "
            "FROM events) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(event_id AS BIGINT) AS event_id, "
            "CAST((epoch_us(hw) - epoch_us(ts) - 600000000) // 1000000 AS BIGINT) "
            "AS late_s FROM w "
            "WHERE hw IS NOT NULL AND epoch_us(ts) < epoch_us(hw) - 600000000"
        ),
        "a25_division": (
            "WITH pc AS (SELECT o_custkey, "
            "count(DISTINCT o_orderpriority) AS np, count(*) AS n_orders "
            "FROM orders GROUP BY 1) "
            "SELECT CAST(o_custkey AS BIGINT) AS custkey, n_orders FROM pc "
            "WHERE np = (SELECT count(DISTINCT o_orderpriority) FROM orders)"
        ),
        "dq_iqr_outliers": (
            "WITH q AS (SELECT l_returnflag, "
            "percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1v, "
            "percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3v "
            "FROM lineitem GROUP BY 1) "
            "SELECT q.l_returnflag, ROUND(q1v, 2) AS q1, ROUND(q3v, 2) AS q3, "
            "CAST(count(*) FILTER (l.l_quantity < q1v - 0.25 * (q3v - q1v) "
            "OR l.l_quantity > q3v + 0.25 * (q3v - q1v)) AS BIGINT) AS n_out, "
            "count(*) AS n_total "
            "FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag "
            "GROUP BY 1, 2, 3"
        ),
        "o32_ewma": (
            "WITH r AS (SELECT user_id, value, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn, "
            "count(*) OVER (PARTITION BY user_id) AS n FROM events), "
            "t AS (SELECT user_id, value, rn, least(n, 20) AS k "
            "FROM r WHERE rn <= 20) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "ROUND(sum(CASE WHEN rn = k THEN pow(0.7, k - 1) * value "
            "ELSE 0.3 * pow(0.7, rn - 1) * value END), 4) AS ewma "
            "FROM t GROUP BY 1"
        ),
        "text_quality_langid": (
            "WITH w AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-zà-ÿ]+')[1:400] AS ws "
            "FROM documents), "
            "u AS (SELECT doc_id, unnest(ws) AS wd FROM w), "
            "v AS (SELECT doc_id, "
            "count(*) FILTER (wd IN ('le','la','les','de','des','du','un',"
            "'une','et','est','en','que','qui','dans','pour','sur','pas',"
            "'par','au','ce')) AS vfr, "
            "count(*) FILTER (wd IN ('the','of','and','to','a','in','is',"
            "'it','that','for','on','was','with','as','at','by','be','this'"
            ")) AS ven, "
            "count(*) FILTER (wd IN ('der','die','das','und','ist','in',"
            "'den','von','zu','mit','sich','auf','für','nicht','ein','eine'"
            ")) AS vde "
            "FROM u GROUP BY 1) "
            "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
            "CASE WHEN coalesce(vfr, 0) + coalesce(ven, 0) + coalesce(vde, 0) = 0 "
            "THEN 'other' "
            "WHEN vfr >= ven AND vfr >= vde THEN 'fr' "
            "WHEN ven >= vde THEN 'en' ELSE 'de' END AS lang_pred "
            "FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id"
        ),
        "graph_cc_labels": (
            "WITH RECURSIVE "
            "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
            "pc AS (SELECT a.p AS u, b.p AS v, count(*) AS n FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2), "
            "e AS (SELECT u, v FROM pc WHERE n >= 2), "
            "sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e), "
            "nodes AS (SELECT DISTINCT u AS node FROM sym), "
            "reach(node, r) AS ("
            "SELECT node, node FROM nodes "
            "UNION "
            "SELECT sym.v, reach.r FROM reach JOIN sym ON sym.u = reach.node) "
            "SELECT CAST(node AS BIGINT) AS node, "
            "CAST(min(r) AS BIGINT) AS label FROM reach GROUP BY 1"
        ),
        "a26_grouping_sets": (
            "SELECT 'priority' AS grp, o_orderpriority AS k, count(*) AS n, "
            "ROUND(sum(o_totalprice), 2) AS sum_price FROM orders GROUP BY 2 "
            "UNION ALL "
            "SELECT 'status', o_orderstatus, count(*), "
            "ROUND(sum(o_totalprice), 2) FROM orders GROUP BY 2 "
            "UNION ALL "
            "SELECT 'all', NULL, count(*), ROUND(sum(o_totalprice), 2) FROM orders"
        ),
        "text_collocations_pmi": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[ \\t\\n\\r\\f\\v]+'), x -> x <> '') AS w "
            "FROM documents), "
            "uni AS (SELECT unnest(w) AS t FROM toks), "
            "uc AS (SELECT t, count(*) AS c FROM uni GROUP BY 1), "
            "big AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM toks, "
            "unnest(range(1, len(w))) AS r(i)), "
            "bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2), "
            "tot AS (SELECT (SELECT count(*) FROM uni) AS ntok, "
            "(SELECT count(*) FROM big) AS nbig) "
            "SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, "
            "ROUND(ln((c12 * 1.0 * ntok * ntok) / (nbig * 1.0 * c1.c * c2.c)), 4) "
            "AS pmi "
            "FROM bc, tot "
            "JOIN uc c1 ON c1.t = bc.w1 JOIN uc c2 ON c2.t = bc.w2 "
            "WHERE c12 >= 5"
        ),
        "fuzzy_jw_parts": (
            "WITH probes AS (SELECT p_partkey AS probe_id, p_name AS probe "
            "FROM part ORDER BY p_partkey LIMIT 20), "
            "scored AS (SELECT a.probe_id, a.probe, b.p_name AS best_match, "
            "jaro_winkler_similarity(a.probe, b.p_name) AS s "
            "FROM probes a JOIN part b ON b.p_name <> a.probe), "
            "ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id "
            "ORDER BY s DESC, best_match) AS rn FROM scored) "
            "SELECT probe_id, probe, best_match, ROUND(s, 4) AS similarity "
            "FROM ranked WHERE rn = 1"
        ),
        "text_vocab_ids": (
            "WITH toks AS (SELECT list_filter(string_split_regex(lower(text), "
            "'[ \\t\\n\\r\\f\\v]+'), x -> x <> '') AS w FROM documents), "
            "uni AS (SELECT unnest(w) AS t FROM toks), "
            "uc AS (SELECT t AS term, count(*) AS n FROM uni GROUP BY 1) "
            "SELECT term, CAST(n AS BIGINT) AS n, "
            "CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS vocab_id "
            "FROM uc WHERE n >= 10"
        ),
        "a27_percent_of_total": (
            "WITH g AS (SELECT l_returnflag, sum(l_extendedprice) AS rev "
            "FROM lineitem GROUP BY 1) "
            "SELECT l_returnflag, ROUND(rev, 2) AS revenue, "
            "ROUND(rev / (SELECT sum(rev) FROM g), 6) AS share FROM g"
        ),
        "a28_above_nation_avg": (
            "WITH co AS (SELECT c_custkey, c_nationkey, "
            "sum(o_totalprice) AS s, count(*) AS n "
            "FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY 1, 2), "
            "na AS (SELECT c_nationkey, sum(s) AS st, sum(n) AS nt "
            "FROM co GROUP BY 1) "
            "SELECT CAST(c_custkey AS BIGINT) AS custkey, "
            "CAST(co.c_nationkey AS BIGINT) AS nationkey, "
            "CAST(n AS BIGINT) AS n_orders, ROUND(s, 2) AS sum_price "
            "FROM co JOIN na USING (c_nationkey) "
            "WHERE co.s * na.nt > na.st * co.n"
        ),
        "assoc_rules": (
            "WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "cn AS (SELECT count(DISTINCT o) AS norders FROM op), "
            "ic AS (SELECT p, count(*) AS c FROM op GROUP BY 1), "
            "pc AS (SELECT a.p AS u, b.p AS v, count(*) AS c12 FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2), "
            "sym AS (SELECT u AS ante, v AS cons, c12 FROM pc WHERE c12 >= 3 "
            "UNION ALL SELECT v, u, c12 FROM pc WHERE c12 >= 3) "
            "SELECT CAST(ante AS BIGINT) AS ante, CAST(cons AS BIGINT) AS cons, "
            "CAST(c12 AS BIGINT) AS support, "
            "ROUND(c12 * 1.0 / ca.c, 6) AS confidence, "
            "ROUND((c12 * 1.0 * cn.norders) / (ca.c * 1.0 * cb.c), 6) AS lift "
            "FROM sym, cn JOIN ic ca ON ca.p = ante JOIN ic cb ON cb.p = cons"
        ),
        "wau_rolling": (
            "WITH du AS (SELECT DISTINCT "
            "CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id "
            "FROM events), "
            "days AS (SELECT DISTINCT day FROM du) "
            "SELECT d.day, count(DISTINCT u.user_id) AS wau "
            "FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day "
            "GROUP BY 1"
        ),
        "scd2_intervals": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(event_id AS BIGINT) AS event_id, event_type, "
            "epoch_us(ts) AS valid_from_us, "
            "epoch_us(lead(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) AS valid_to_us "
            "FROM events"
        ),
        "pr2_cooccur": (
            "WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "pc0 AS (SELECT a.p AS u, b.p AS v, count(*) AS c FROM op a "
            "JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2), "
            "e AS (SELECT u, v FROM pc0 WHERE c >= 2), "
            "sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e), "
            "deg AS (SELECT u, count(*) AS dg FROM sym GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM deg), "
            "pr0 AS (SELECT u AS node, 1.0 / n AS r FROM deg, nn), "
            "pr1 AS (SELECT s.v AS node, "
            "0.15 / any_value(n) + 0.85 * sum(p.r / d.dg) AS r "
            "FROM sym s JOIN pr0 p ON p.node = s.u "
            "JOIN deg d ON d.u = s.u, nn GROUP BY s.v), "
            "pr2 AS (SELECT s.v AS node, "
            "0.15 / any_value(n) + 0.85 * sum(p.r / d.dg) AS r "
            "FROM sym s JOIN pr1 p ON p.node = s.u "
            "JOIN deg d ON d.u = s.u, nn GROUP BY s.v) "
            "SELECT CAST(node AS BIGINT) AS node, ROUND(r, 6) AS pr FROM pr2"
        ),
        "o36_gaps_islands": (
            "WITH du AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events), "
            "t AS (SELECT user_id, day, day - row_number() OVER ("
            "PARTITION BY user_id ORDER BY day) AS grp FROM du) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "min(day) AS start_day, max(day) AS end_day, count(*) AS n_days "
            "FROM t GROUP BY user_id, grp"
        ),
        "o35_median_gap": (
            "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap "
            "FROM events) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "median(gap) AS median_gap_us FROM g "
            "WHERE gap IS NOT NULL GROUP BY 1"
        ),
        "o37_interval_coverage": (
            "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
            "epoch_us(ts) + 300000000 AS e FROM events), "
            "m AS (SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prev_max FROM iv), "
            "g AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max "
            "THEN 1 ELSE 0 END AS newgrp FROM m), "
            "gg AS (SELECT *, sum(newgrp) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp FROM g), "
            "isl AS (SELECT user_id, grp, min(s) AS st, max(e) AS en "
            "FROM gg GROUP BY 1, 2) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(sum(en - st) AS BIGINT) AS covered_us, "
            "count(*) AS n_intervals FROM isl GROUP BY 1"
        ),
        "a30_weighted_median": (
            "WITH h AS (SELECT l_returnflag AS f, l_quantity AS q, "
            "sum(l_extendedprice) AS w FROM lineitem GROUP BY 1, 2), "
            "c AS (SELECT f, q, sum(w) OVER (PARTITION BY f ORDER BY q) AS cum, "
            "sum(w) OVER (PARTITION BY f) AS tot FROM h) "
            "SELECT f AS l_returnflag, CAST(min(q) AS BIGINT) AS wmedian "
            "FROM c WHERE cum >= tot / 2 GROUP BY 1"
        ),
        "seq_trigrams": (
            "WITH s AS (SELECT user_id, event_type AS e1, "
            "lead(event_type) OVER w AS e2, "
            "lead(event_type, 2) OVER w AS e3, "
            "lead(user_id, 2) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS u3 "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)) "
            "SELECT e1, e2, e3, count(*) AS n FROM s "
            "WHERE e3 IS NOT NULL GROUP BY 1, 2, 3"
        ),
        "dq_fk_orphans": (
            "SELECT fk, n_rows, n_orphans FROM ("
            "SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_rows, "
            "count(*) FILTER (l_orderkey NOT IN (SELECT o_orderkey FROM orders)) "
            "AS n_orphans FROM lineitem "
            "UNION ALL SELECT 'lineitem.l_partkey->part', count(*), "
            "count(*) FILTER (l_partkey NOT IN (SELECT p_partkey FROM part)) "
            "FROM lineitem "
            "UNION ALL SELECT 'lineitem.l_suppkey->supplier', count(*), "
            "count(*) FILTER (l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) "
            "FROM lineitem "
            "UNION ALL SELECT 'orders.o_custkey->customer', count(*), "
            "count(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM customer)) "
            "FROM orders "
            "UNION ALL SELECT 'customer.c_nationkey->nation', count(*), "
            "count(*) FILTER (c_nationkey NOT IN (SELECT n_nationkey FROM nation)) "
            "FROM customer "
            "UNION ALL SELECT 'supplier.s_nationkey->nation', count(*), "
            "count(*) FILTER (s_nationkey NOT IN (SELECT n_nationkey FROM nation)) "
            "FROM supplier "
            "UNION ALL SELECT 'nation.n_regionkey->region', count(*), "
            "count(*) FILTER (n_regionkey NOT IN (SELECT r_regionkey FROM region)) "
            "FROM nation)"
        ),
        "o41_mann_kendall": (
            "WITH o AS (SELECT user_id, value, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
            "s AS (SELECT a.user_id, SUM(CASE WHEN b.value > a.value THEN 1 "
            "WHEN b.value < a.value THEN -1 ELSE 0 END) AS s_stat "
            "FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn > a.rn "
            "GROUP BY 1), "
            "n AS (SELECT user_id, count(*) AS n_events FROM events "
            "GROUP BY 1 HAVING count(*) >= 2) "
            "SELECT CAST(n.user_id AS BIGINT) AS user_id, "
            "CAST(n.n_events AS BIGINT) AS n_events, "
            "CAST(s.s_stat AS BIGINT) AS s_stat "
            "FROM n JOIN s ON s.user_id = n.user_id"
        ),
        "o42_cusum_max": (
            "WITH w AS (SELECT user_id, ts, event_id, "
            "CAST(round(value * 100) AS BIGINT) - 12000 AS d FROM events), "
            "p AS (SELECT user_id, ts, event_id, sum(d) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS pf FROM w), "
            "c AS (SELECT user_id, pf - least(min(pf) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING), 0) AS cu FROM p) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(max(cu) AS BIGINT) AS max_cusum FROM c GROUP BY 1"
        ),
        "o40_acf_lag1": (
            "WITH w AS (SELECT user_id, value, lead(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "ROUND(corr(value, nxt), 6) AS acf1 FROM w WHERE nxt IS NOT NULL "
            "GROUP BY 1 HAVING corr(value, nxt) IS NOT NULL"
        ),
        "o39_twap": (
            "WITH w AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS t, "
            "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(sum(nxt - t) AS BIGINT) AS held_us, "
            "CAST(sum(cents * (nxt - t)) AS BIGINT) AS weighted_cents_us "
            "FROM w WHERE nxt IS NOT NULL GROUP BY 1"
        ),
        "approx_jaccard_users": (
            "WITH ca AS (SELECT user_id FROM events WHERE event_type = 'click' "
            "GROUP BY 1 HAVING count(*) >= 14), "
            "cb AS (SELECT user_id FROM events WHERE event_type = 'error' "
            "GROUP BY 1 HAVING count(*) >= 14), "
            "u AS (SELECT user_id FROM ca UNION SELECT user_id FROM cb), "
            "bot AS (SELECT user_id FROM u "
            "ORDER BY md5_number_upper(CAST(user_id AS VARCHAR)) LIMIT 32), "
            "k AS (SELECT CAST(count(*) AS BIGINT) AS k_used FROM bot), "
            "m AS (SELECT CAST(count(*) AS BIGINT) AS matches FROM bot "
            "WHERE user_id IN (SELECT user_id FROM ca) "
            "AND user_id IN (SELECT user_id FROM cb)), "
            "i AS (SELECT CAST(count(*) AS BIGINT) AS inter_exact FROM ca "
            "WHERE user_id IN (SELECT user_id FROM cb)), "
            "uu AS (SELECT CAST(count(*) AS BIGINT) AS union_exact FROM u) "
            "SELECT k_used, matches, inter_exact, union_exact FROM k, m, i, uu"
        ),
        "text_sentence_stats": (
            "WITH base AS (SELECT doc_id, list_filter(list_transform("
            "string_split_regex(text, '[.!?]+'), "
            "s -> len(list_filter(string_split_regex(lower(s), '[^a-z0-9]+'), "
            "x -> x <> ''))), w -> w > 0) AS wl FROM documents) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(len(wl) AS BIGINT) AS n_sentences, "
            "CAST(COALESCE(list_max(wl), 0) AS BIGINT) AS max_words, "
            "CAST(COALESCE(wl[1], 0) AS BIGINT) AS first_words FROM base"
        ),
        "er_fs_scores": (
            "WITH r AS (SELECT p_partkey AS id, p_name AS k, p_brand, p_type, "
            "p_size, row_number() OVER (ORDER BY p_name, p_partkey) - 1 AS rk "
            "FROM part), "
            "c AS (SELECT a.id AS id_a, b.id AS id_b, "
            "jaro_winkler_similarity(a.k, b.k) AS jw, "
            "a.p_brand = b.p_brand AS be, a.p_type = b.p_type AS te, "
            "a.p_size = b.p_size AS se FROM r a "
            "JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 4), "
            "s AS (SELECT id_a, id_b, "
            "(CASE WHEN jw >= 0.95 THEN 6 ELSE -2 END "
            "+ CASE WHEN be THEN 3 ELSE -1 END "
            "+ CASE WHEN te THEN 2 ELSE -1 END "
            "+ CASE WHEN se THEN 2 ELSE -1 END) AS score FROM c) "
            "SELECT id_a, id_b, CAST(score AS BIGINT) AS score, "
            "CASE WHEN score >= 8 THEN 'match' WHEN score >= 4 THEN 'possible' "
            "ELSE 'non_match' END AS decision FROM s"
        ),
        "er_snm_pairs": (
            "WITH r AS (SELECT p_partkey AS id, p_name AS k, "
            "row_number() OVER (ORDER BY p_name, p_partkey) - 1 AS rk FROM part) "
            "SELECT a.id AS id_a, b.id AS id_b, a.rk AS rank_a, b.rk AS rank_b, "
            "ROUND(jaro_winkler_similarity(a.k, b.k), 4) AS jw "
            "FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 4 "
            "WHERE jaro_winkler_similarity(a.k, b.k) >= 0.9"
        ),
        "er_clusters": (
            "WITH RECURSIVE "
            "e AS (SELECT a.p_partkey AS u, b.p_partkey AS v "
            "FROM part a JOIN part b ON a.p_partkey < b.p_partkey "
            "WHERE levenshtein(a.p_name, b.p_name) <= 1), "
            "sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e), "
            "nodes AS (SELECT DISTINCT u AS node FROM sym), "
            "reach(node, r) AS ("
            "SELECT node, node FROM nodes "
            "UNION "
            "SELECT sym.v, reach.r FROM reach JOIN sym ON sym.u = reach.node) "
            "SELECT CAST(node AS BIGINT) AS node, "
            "CAST(min(r) AS BIGINT) AS label FROM reach GROUP BY 1"
        ),
        "type_user_jaccard": (
            "WITH du AS (SELECT DISTINCT event_type AS t, user_id AS u "
            "FROM events), "
            "c AS (SELECT t, count(*) AS n FROM du GROUP BY 1), "
            "i AS (SELECT a.t AS ta, b.t AS tb, count(*) AS inter "
            "FROM du a JOIN du b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2) "
            "SELECT ta AS type_a, tb AS type_b, "
            "CAST(inter AS BIGINT) AS n_common, "
            "ROUND(inter * 1.0 / (ca.n + cb.n - inter), 6) AS jaccard "
            "FROM i JOIN c ca ON ca.t = i.ta JOIN c cb ON cb.t = i.tb"
        ),
        # full Gopher keep-rule replicated in SQL (n-gram fractions via
        # lateral gram expansion; float comparisons use the IDENTICAL
        # int-mult-then-divide expression as the Python stage, so
        # threshold equality cases land on the same double)
        "gopher_filter_docs": (
            "WITH toks AS (SELECT doc_id, text, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') "
            "AS w FROM documents), "
            "base AS (SELECT doc_id, text, w, len(w) AS nw FROM toks), "
            "grams AS (SELECT b.doc_id, t.n, "
            "array_to_string(b.w[i.i : i.i + t.n - 1], ' ') AS gram, "
            "count(*) AS c FROM base b, (VALUES (2),(3),(4),(5)) t(n), "
            "unnest(range(1, b.nw - t.n + 2)) i(i) "
            "WHERE b.nw >= t.n GROUP BY 1, 2, 3), "
            "gm AS (SELECT doc_id, n, max(c) AS cmax, "
            "sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupc "
            "FROM grams GROUP BY 1, 2), "
            "m AS (SELECT b.doc_id, b.text, b.nw, "
            "len(list_distinct(b.w)) * 1.0 / b.nw AS dwr, "
            "list_aggregate(list_transform(b.w, x -> length(x)), 'sum') "
            "* 1.0 / b.nw AS mwl, "
            "len(regexp_extract_all(b.text, '[#@\\{}<>^~|]|\\.\\.\\.')) "
            "* 1.0 / b.nw AS swr, "
            "coalesce(max(CASE WHEN g.n = 2 AND g.cmax > 1 THEN "
            "least(1.0, g.cmax * 2 * 1.0 / b.nw) END), 0.0) AS f2, "
            "coalesce(max(CASE WHEN g.n = 3 AND g.cmax > 1 THEN "
            "least(1.0, g.cmax * 3 * 1.0 / b.nw) END), 0.0) AS f3, "
            "coalesce(max(CASE WHEN g.n = 4 AND g.cmax > 1 THEN "
            "least(1.0, g.cmax * 4 * 1.0 / b.nw) END), 0.0) AS f4, "
            "coalesce(max(CASE WHEN g.n = 5 THEN "
            "least(1.0, g.dupc * 5 * 1.0 / b.nw) END), 0.0) AS d5 "
            "FROM base b LEFT JOIN gm g ON g.doc_id = b.doc_id "
            "WHERE b.nw > 0 GROUP BY b.doc_id, b.text, b.nw, b.w) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM m "
            "WHERE nw BETWEEN 5 AND 1000000 AND dwr >= 0.20 "
            "AND f2 <= 0.20 AND f3 <= 0.18 AND f4 <= 0.16 AND d5 <= 0.30 "
            "AND mwl BETWEEN 2.0 AND 12.0 AND swr <= 0.5"
        ),
    }
    d.update(_kg_oracle_entries())
    return d
