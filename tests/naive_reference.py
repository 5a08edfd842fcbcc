"""An INDEPENDENT, sequential implementation of the reference algorithm.

Deliberately written as a direct transcription of the reference's control
flow (MainNELApp context loop -> DicoProcessingNEL lookup ->
GraphHandlerNEL sameAs + fusion -> CentralityHandler prune/score/choose,
all under /root/reference/src/fr/lip6/reden/), structured differently
from ``reden_ray`` (single process, plain dict/loops, its own inline
normalizer and graph) so the golden comparison actually cross-checks the
distributed engine's plumbing AND core math.

Canonical orderings (mention first-appearance order, dictionary row
order, group position order) match the engine's documented choices —
the reference itself leaves these unspecified (Java HashMap iteration).
"""

from __future__ import annotations

import re
from urllib.parse import unquote

import pyarrow.parquet as pq

NE_TYPES = ("PER", "LOC")
BASE = "http://kb.test/"
SAME_AS = "http://kb.test/sameAs"


def _norm(s):
    return re.sub(r"[\s''-]", "", s).lower()


def _dec(u):
    return unquote(u.replace("+", " ")) if u.startswith("http:") else u


def _naive_centrality(vertices, edges, measure):
    """Independent centrality implementations, structured DIFFERENTLY
    from reden_ray.core.centrality (pair-counting betweenness instead of
    Brandes' dependency accumulation; Floyd-Warshall closeness — the
    jar's own algorithm — instead of per-source Dijkstra)."""
    verts = list(vertices)
    n = len(verts)
    if measure == "DegreeCentrality":
        deg = dict.fromkeys(verts, 0.0)
        for (a, b), (_p, w) in edges.items():
            deg[a] += w
            deg[b] += w
        return {v: (deg[v] / (n - 1) if n > 1 else 0.0) for v in verts}

    out_adj = {}
    for (a, b) in edges:
        out_adj.setdefault(a, []).append(b)

    if measure == "BrandesBetweennessCentrality":
        # directed UNWEIGHTED shortest-path counting per source (BFS),
        # then the raw pair formula: paths s->t through v =
        # sigma_s[v] * sigma_v[t] iff d_s[v] + d_v[t] == d_s[t]
        dist, sigma = {}, {}
        from collections import deque

        for s in verts:
            d = {s: 0}
            sg = {s: 1.0}
            q = deque([s])
            while q:
                v = q.popleft()
                for w_ in out_adj.get(v, ()):
                    if w_ not in d:
                        d[w_] = d[v] + 1
                        sg[w_] = 0.0
                        q.append(w_)
                    if d[w_] == d[v] + 1:
                        sg[w_] += sg[v]
            dist[s], sigma[s] = d, sg
        bc = dict.fromkeys(verts, 0.0)
        for s in verts:
            for t in verts:
                if t == s or t not in dist[s]:
                    continue
                for v in verts:
                    if v in (s, t) or v not in dist[s] or t not in dist[v]:
                        continue
                    if dist[s][v] + dist[v][t] == dist[s][t]:
                        bc[v] += sigma[s][v] * sigma[v][t] / sigma[s][t]
        return bc

    if measure == "FreemanClosenessCentrality":
        # WEIGHTED directed Floyd-Warshall (the jar's algorithm);
        # unreachable target -> sum inf -> 0.0; zero sum -> +inf
        INF = float("inf")
        idx = {v: i for i, v in enumerate(verts)}
        dmat = [[INF] * n for _ in range(n)]
        for i in range(n):
            dmat[i][i] = 0.0
        for (a, b), (_p, w) in edges.items():
            i, j = idx[a], idx[b]
            if w < dmat[i][j]:
                dmat[i][j] = w
        for k in range(n):
            dk = dmat[k]
            for i in range(n):
                dik = dmat[i][k]
                if dik == INF:
                    continue
                di = dmat[i]
                for j in range(n):
                    nd = dik + dk[j]
                    if nd < di[j]:
                        di[j] = nd
        out = {}
        for v in verts:
            row = dmat[idx[v]]
            total = 0.0
            for x in row:
                total += x
            if total == INF:
                out[v] = 0.0
            elif total > 0:
                out[v] = 1.0 / total
            else:
                out[v] = INF
        return out

    if measure == "EigenvectorCentrality":
        # dense numpy power iteration on (A_sym + I) — matrix-structured,
        # vs the engine's adjacency-list scatter loops.  Same start
        # (uniform 1/n), norm (L2), convergence (max-abs < 1e-10, <=100
        # iters) semantics; the jar's RANDOM start is documented in
        # core/centrality.py, so this locks OUR deterministic variant.
        import numpy as np

        idx = {v: i for i, v in enumerate(verts)}
        mat = np.zeros((n, n))
        for (a, b) in edges:
            mat[idx[a], idx[b]] += 1.0
            mat[idx[b], idx[a]] += 1.0
        x = np.full(n, 1.0 / n)
        for _ in range(100):
            nxt = x + mat @ x
            norm = float(np.sqrt((nxt * nxt).sum()))
            if norm == 0:
                return dict.fromkeys(verts, 0.0)
            nxt = nxt / norm
            if float(np.max(np.abs(nxt - x))) < 1e-10:
                x = nxt
                break
            x = nxt
        # same 1e-8 quantization as the engine (see core/centrality.py:
        # ulp-level ties must resolve by the canonical tie-break, not by
        # each implementation's summation order)
        return {v: round(s, 8) for v, s in zip(verts, x.tolist())}

    raise ValueError(measure)


def run_oracle(fixture_dir: str, preferred_uri: str = "ALL", measure: str = "DegreeCentrality"):
    """Returns (links, triples): links[(url, ctx, mid)] = (surfaces,
    chosen list, method); triples = set of (url, ctx, subj, pred, obj, weight)."""
    pages = pq.read_table(f"{fixture_dir}/pages.parquet").to_pylist()
    dico_rows = pq.read_table(f"{fixture_dir}/dictionary.parquet").to_pylist()
    adj_rows = pq.read_table(f"{fixture_dir}/adjacency.parquet").to_pylist()
    rels_rows = pq.read_table(f"{fixture_dir}/rels.parquet").to_pylist()

    rels = {r["pred"].lower(): r["weight"] for r in rels_rows}
    dico = {}  # (kind, norm) -> [group...] in row order
    for r in dico_rows:
        dico.setdefault((r["kind"], r["alias_norm"]), []).append(list(r["uri_group"]))
    adj = {}  # subj -> [(pred, obj)]
    for r in adj_rows:
        adj.setdefault(r["subj"], []).append((r["pred"], r["obj"]))

    links = {}
    triples = set()

    for page in pages:
        html = page["html"].decode("utf-8")
        paras = re.findall(r"<p(?:\s[^>]*)?>(.*?)</p>", html, re.S)
        for cid, para in enumerate(paras):
            # mentions in document order
            raw = re.findall(r'<span class="ne" data-type="([^"]+)">(.*?)</span>', para, re.S)
            mentions = [(mid, surf, typ) for mid, (typ, surf) in enumerate(raw)]
            if not mentions:
                continue
            # per-type lookup, last type wins on merge
            cand = {}
            for t in NE_TYPES:
                per = {}
                for mid, surf, typ in mentions:
                    if typ != t or surf in per:
                        continue
                    groups, seen = [], set()
                    for g in dico.get((t, _norm(surf)), [])[:100]:
                        key = "\t".join(g)
                        if key not in seen:
                            seen.add(key)
                            groups.append(g)
                    if groups:
                        per[surf] = groups
                cand.update(per)
            # route
            if not mentions:
                continue
            ambiguous = any(len(cand.get(s, [])) > 1 for _, s, _ in mentions)
            if not ambiguous:
                for mid, surf, typ in mentions:
                    gs = cand.get(surf)
                    if gs:
                        links[(page["url"], cid, mid)] = (surf, list(gs[0]), "unambiguous")
                    else:
                        links[(page["url"], cid, mid)] = (surf, [], "nil")
                continue

            surf_order = []
            for _, s, _ in mentions:
                if s in cand and s not in surf_order:
                    surf_order.append(s)

            # sameAs expansion with context-global already-processed dedup
            already, equiv = set(), {}
            for s in surf_order:
                for g in cand[s]:
                    same, base_uri = {}, ""
                    for uri in g:
                        if BASE in uri:
                            base_uri = uri
                            for p, o in adj.get(uri, []):
                                if p == SAME_AS and _dec(o) in adj and o not in already:
                                    same[_dec(o)] = None
                                    already.add(o)
                        elif _dec(uri) in adj and uri not in already:
                            same[_dec(uri)] = None
                            already.add(uri)
                    equiv.setdefault(base_uri, {}).update(same)

            # fuse: hub = decoded base; edges from equivalents' statements
            vertices, edges = {}, {}
            base_list = [u for s in surf_order for g in cand[s] for u in g if BASE in u]
            for uri in base_list:
                v1 = _dec(uri)
                vertices.setdefault(v1, None)
                for alias in equiv.get(uri, {}):
                    if alias.lower() == uri.lower():
                        continue
                    for p, o in adj.get(alias, []):
                        if p == SAME_AS:
                            continue
                        v2 = _dec(o)
                        if v1.lower() == v2.lower():
                            continue
                        vertices.setdefault(v2, None)
                        edges.setdefault((v1, v2), (p, rels.get(p.lower(), 1.0)))

            colored = set()
            for s in surf_order:
                for g in cand[s]:
                    for u in g:
                        if BASE in u:
                            colored.add(u)
                            colored.add(_dec(u))
            inv = {}
            for s in surf_order:
                for g in cand[s]:
                    for u in g:
                        inv[u] = s
            # prune
            dead = []
            for v in vertices:
                if v in colored:
                    continue
                touch = set()
                for (a, b) in edges:
                    if a == v and b != v and b in colored:
                        touch.add(inv.get(b))
                    if b == v and a != v and a in colored:
                        touch.add(inv.get(a))
                if len(touch) < 2:
                    dead.append(v)
            for v in dead:
                vertices.pop(v, None)
            edges = {e: lw for e, lw in edges.items() if e[0] in vertices and e[1] in vertices}

            # centrality per configured measure (jgrapht-sna semantics,
            # verified from the jar's bytecode; see _naive_centrality)
            cent = _naive_centrality(vertices, edges, measure)

            chosen = {}
            for s in surf_order:
                results = {}
                for g in cand[s]:
                    for u in g:
                        if _dec(u) in colored:
                            results[_dec(u)] = cent.get(_dec(u), 0.0)
                if not results:
                    continue
                pairs = sorted(results.items(), key=lambda kv: kv[1])
                win = pairs[-1][0]
                owner = inv.get(win)
                sel = ""
                if owner is None or owner not in cand:
                    sel = win
                else:
                    for g in cand[owner]:
                        if win in g:
                            found = False
                            for u in g:
                                if preferred_uri == "ALL":
                                    sel += u + " "
                                    found = True
                                elif preferred_uri in u:
                                    sel = u
                                    found = True
                            if not found:
                                sel = win
                chosen[s] = sel.strip()

            for mid, surf, typ in mentions:
                if chosen.get(surf):
                    links[(page["url"], cid, mid)] = (
                        surf, chosen[surf].split(" "), "centrality"
                    )
                else:
                    links[(page["url"], cid, mid)] = (surf, [], "nil")
            for (a, b), (p, w) in edges.items():
                triples.add((page["url"], cid, a, p, b, w))

    return links, triples
