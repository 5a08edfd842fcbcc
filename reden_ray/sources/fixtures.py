"""Deterministic synthetic corpus + KB fixtures (FIXTURES.md).

Generates the six tables the golden tests and benchmarks run on — all
seeded, no external data:

- ``pages``       (url, warc_ts, html, text, lang)  — BASELINE.json input_hint
- ``dictionary``  (alias_norm, alias_raw, name_std, uri_group)
- ``adjacency``   (subj, pred, obj, weight)
- ``rels``        (pred, weight)
- ``gold``        (url, context_id, mention_id, surface, gold_uri)
- entity metadata (for debugging)

Construction mirrors the reference's data shapes (TEI + gold XML, alias
TSVs per QueryAuthorBNF.java:254-266, the ``.n3`` neighborhood cache per
GraphHandlerNEL.java:78-103, rels.txt per GraphHandlerNEL.java:236-249)
with these properties baked in:

- >=30% of aliases are homonyms shared by 2-4 entities, including one
  cross-NE-type homonym ("France" PER vs LOC) to exercise the
  last-type-wins merge (MainNELApp.java:255-256);
- entities belong to topic clusters; co-mentioned (same-topic) entities
  share neighbor objects so the correct homonym wins degree centrality,
  wrong homonyms have disjoint neighborhoods;
- edges only ever come from statements about EQUIVALENT URIs
  (GraphHandlerNEL.java:251-343), so every entity gets >=1 equivalent
  URI carrying its neighborhood; base URIs carry sameAs statements plus
  decoy literal statements that must NOT become edges;
- one hot entity with ~100x median degree (skew handling fixture);
- contexts with 0 mentions and with a single unambiguous mention hit the
  NoMentionsAnnotated / NoAmbiguity routes (MainNELApp.java:418-442);
- a few non-dictionary surfaces with null gold URIs exercise NIL P/R.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ..core.aliases import make_aliases, normalized_name
from ..core.normalize import normalize_mention
from ..core.textextract import extract_text

SAME_AS = "http://kb.test/sameAs"
BASE_PREFIX = "http://kb.test/"

_LAST_NAMES = [
    "Hugo", "Renan", "d'Arc", "Gau-tier", "Éluard", "Baudelaire", "Colette",
    "Verne", "Sand", "Zola", "Nerval", "Chénier", "Musset", "Staël", "Loti",
    "Daudet", "Mérimée", "Vigny", "Leconte", "Hérédia",
]
_FIRST_NAMES = [
    "Victor", "Ernest", "Jeanne", "Théophile", "Paul", "Charles", "Sidonie",
    "Jules", "George", "Émile", "Gérard", "André", "Alfred", "Germaine",
    "Pierre", "Alphonse", "Prosper", "-",
]
_PLACE_NAMES = [
    "Paris", "Lyon", "Marseille", "Rouen", "Orléans", "Tou-louse", "Nîmes",
    "Saint-Malo", "Aix", "Chambéry", "Brest", "Nancy", "Reims", "Dijon",
]
_FILLER = [
    "Dans ce chapitre l'auteur évoque", "On retrouve ici", "Le récit mentionne",
    "Une lettre adressée à", "Le voyage passe par", "L'étude &amp; la critique de",
    "Quelques pages sur", "Le salon réunissait",
]


def _entity_pool(n_entities: int, rng: random.Random) -> list[dict]:
    """Entities with homonym clusters: consecutive pairs/triples share a
    last name (PER) or place name (LOC) => shared aliases by construction."""
    entities = []
    k = 0
    # small name pools force cross-entity alias collisions (homonyms)
    n_last = max(4, min(n_entities // 5, len(_LAST_NAMES)))
    n_place = max(3, min(n_entities // 8, len(_PLACE_NAMES)))
    n_first = max(3, min(n_entities // 7, len(_FIRST_NAMES)))
    while k < n_entities:
        is_per = (k % 3) != 2  # ~2/3 persons
        cluster = rng.choice([1, 2, 2, 3]) if rng.random() < 0.8 else 1
        if is_per:
            last = _LAST_NAMES[(k // 2) % n_last]
            for c in range(cluster):
                if k >= n_entities:
                    break
                first = _FIRST_NAMES[(k * 7 + c * 3) % n_first]
                gender = "female" if (k + c) % 4 == 0 else "male"
                entities.append(
                    {"eid": k, "kind": "PER", "first": first, "last": last, "gender": gender}
                )
                k += 1
        else:
            name = _PLACE_NAMES[(k // 2) % n_place]
            for c in range(cluster):
                if k >= n_entities:
                    break
                entities.append({"eid": k, "kind": "LOC", "first": "", "last": name, "gender": "-"})
                k += 1
    # one cross-type homonym pair: PER "France" and LOC "France"
    if len(entities) >= 2:
        entities[-2].update({"kind": "PER", "first": "Anatole", "last": "France", "gender": "male"})
        entities[-1].update({"kind": "LOC", "first": "", "last": "France", "gender": "-"})
    # the hot (skew) entity gets a UNIQUE name: its 100x neighborhood
    # exercises skew handling without polluting homonym disambiguation
    entities[0].update(
        {"kind": "PER", "first": "Napoléon", "last": "Bonaparte", "gender": "male"}
    )
    return entities


def generate_fixtures(
    n_docs: int = 200,
    n_entities: int = 60,
    n_topics: int = 8,
    seed: int = 42,
    contexts_per_doc: tuple[int, int] = (1, 8),
    mentions_per_context: tuple[int, int] = (0, 10),
) -> dict[str, pa.Table]:
    rng = random.Random(seed)
    entities = _entity_pool(n_entities, rng)

    # --- URIs, equivalents, dictionary -----------------------------------
    # homonym-cluster members must live in DIFFERENT topics, else the
    # fixture is intrinsically ambiguous (two same-name entities with the
    # same co-occurrence neighborhood): spread topics within each
    # (kind, lastname) group
    group_base: dict[tuple[str, str], int] = {}
    group_seen: dict[tuple[str, str], int] = {}
    for e in entities:
        gkey = (e["kind"], e["last"])
        if gkey not in group_base:
            group_base[gkey] = rng.randrange(n_topics)
            group_seen[gkey] = 0
        e["topic"] = (group_base[gkey] + group_seen[gkey]) % n_topics
        group_seen[gkey] += 1

    dict_rows: list[dict] = []
    for e in entities:
        k = e["eid"]
        e["base"] = f"http://kb.test/ent/{k}"
        # eid 1 stays equivalent-less on purpose: an isolated vertex that
        # can only ever score 0 (a real reference failure mode)
        n_equiv = rng.choice([1, 1, 2, 2, 3]) if k != 1 else 0
        e["equivs"] = [f"http://alt.test/ent/{k}/{j}" for j in range(n_equiv)]
        # which equivalents are visible where: dictionary group vs sameAs stmt
        e["dict_equivs"] = [u for u in e["equivs"] if rng.random() < 0.7]
        e["sameas_equivs"] = [u for u in e["equivs"] if rng.random() < 0.7] or e["equivs"][:1]
        if e["kind"] == "PER":
            e["aliases"] = make_aliases(e["first"], e["last"], e["gender"])
            e["display"] = normalized_name(e["first"], e["last"], "1800", "1870")
            e["canonical_surface"] = (
                f"{e['first']} {e['last']}" if e["first"] not in ("-", "") else e["last"]
            )
        else:
            nm = e["last"]
            e["aliases"] = sorted({nm, nm.replace("-", " ")})
            e["display"] = nm
            e["canonical_surface"] = nm
        group = [e["base"], *e["dict_equivs"]]
        for alias in e["aliases"]:
            dict_rows.append(
                {
                    "alias_norm": normalize_mention(alias),
                    "alias_raw": alias,
                    "name_std": e["display"],
                    "kind": e["kind"],
                    "uri_group": group,
                }
            )

    # --- adjacency --------------------------------------------------------
    adj_rows: list[dict] = []

    def stmt(subj: str, pred: str, obj: str, weight: float = 1.0) -> None:
        adj_rows.append({"subj": subj, "pred": pred, "obj": obj, "weight": weight})

    by_topic_pool: dict[int, list[dict]] = {}
    for e in entities:
        by_topic_pool.setdefault(e["topic"], []).append(e)

    hot_eid = entities[0]["eid"]
    for e in entities:
        k, t = e["eid"], e["topic"]
        for u in e["sameas_equivs"]:
            stmt(e["base"], SAME_AS, u)
        # decoy: base's own non-sameAs statements must never become edges
        stmt(e["base"], "http://kb.test/p/label", f"label of entity {k}")
        n_shared = rng.randint(4, 8) if k != hot_eid else 60
        n_priv = rng.randint(1, 3) if k != hot_eid else 200
        carriers = e["equivs"] or []
        if carriers:
            # entity-to-entity links among topic mates: THE centrality
            # signal — a candidate co-mentioned with its real associates
            # gains colored-to-colored edges rivals can't have
            mates = [m for m in by_topic_pool[t] if m["eid"] != k][:8]
            for i, m in enumerate(mates):
                stmt(carriers[i % len(carriers)], "http://kb.test/p/knows", m["base"])
            for i in range(n_shared):
                obj = f"http://obj.test/topic/{t}/{i}"
                stmt(carriers[i % len(carriers)], f"http://kb.test/p/rel{i % 3}", obj)
            for i in range(n_priv):
                obj = f"http://obj.test/priv/{k}/{i}"
                stmt(carriers[i % len(carriers)], "http://kb.test/p/other", obj)

    rels_rows = [
        {"pred": "http://kb.test/p/rel0", "weight": 2.0},
        {"pred": "http://kb.test/p/other", "weight": 0.5},
    ]

    # --- pages + gold -----------------------------------------------------
    by_topic: dict[int, list[dict]] = {}
    for e in entities:
        by_topic.setdefault(e["topic"], []).append(e)

    page_rows: list[dict] = []
    gold_rows: list[dict] = []
    base_ts = 1_600_000_000_000_000  # us
    nil_surfaces = ["Atlantide", "Ys", "Camelot"]

    for i in range(n_docs):
        url = f"https://example.org/doc/{i:08d}"
        n_ctx = rng.randint(*contexts_per_doc)
        paras: list[str] = []
        for ctx_id in range(n_ctx):
            t = rng.randrange(n_topics)
            pool = by_topic.get(t) or entities
            roll = rng.random()
            if roll < 0.08:
                n_m = 0
            elif roll < 0.2:
                n_m = 1
            else:
                n_m = rng.randint(2, mentions_per_context[1])
            parts: list[str] = []
            mention_id = 0
            # one referent AND one surface per homonym cluster per context
            # (a paragraph uses one "Hugo"); prevents rival candidates
            # surviving pruning via multi-surface support
            cluster_pick: dict[tuple[str, str], tuple[dict, str]] = {}
            for _ in range(n_m):
                parts.append(rng.choice(_FILLER) + " ")
                if rng.random() < 0.05:  # NIL mention: not in dictionary
                    surface, ne_type, gold_uri = rng.choice(nil_surfaces), "LOC", None
                else:
                    ent = rng.choice(pool)
                    ckey = (ent["kind"], normalize_mention(ent["last"]))
                    if ckey in cluster_pick:
                        ent, surface = cluster_pick[ckey]
                    else:
                        # bias toward ambiguous aliases so centrality decides
                        if rng.random() < 0.45:
                            surface = ent["last"]  # homonym-prone
                        else:
                            surface = rng.choice(ent["aliases"])
                        cluster_pick[ckey] = (ent, surface)
                    ne_type, gold_uri = ent["kind"], ent["base"]
                parts.append(
                    f'<span class="ne" data-type="{ne_type}">{surface}</span>'
                )
                gold_rows.append(
                    {
                        "url": url,
                        "context_id": ctx_id,
                        "mention_id": mention_id,
                        "surface": surface,
                        "gold_uri": gold_uri,
                    }
                )
                mention_id += 1
                parts.append(". ")
            paras.append("<p>" + "".join(parts) + "</p>")
        html = ("<html><body>" + "".join(paras) + "</body></html>").encode("utf-8")
        lang = "en" if i % 17 == 0 else "fr"
        page_rows.append(
            {
                "url": url,
                "warc_ts": base_ts + i * 1_000_000,
                "html": html,
                "text": extract_text(html),
                "lang": lang,
            }
        )

    pages = pa.table(
        {
            "url": pa.array([r["url"] for r in page_rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in page_rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in page_rows], pa.binary()),
            "text": pa.array([r["text"] for r in page_rows], pa.string()),
            "lang": pa.array([r["lang"] for r in page_rows], pa.string()),
        }
    )
    dictionary = pa.table(
        {
            "alias_norm": pa.array([r["alias_norm"] for r in dict_rows], pa.string()),
            "alias_raw": pa.array([r["alias_raw"] for r in dict_rows], pa.string()),
            "name_std": pa.array([r["name_std"] for r in dict_rows], pa.string()),
            "kind": pa.array([r["kind"] for r in dict_rows], pa.string()),
            "uri_group": pa.array([r["uri_group"] for r in dict_rows], pa.list_(pa.string())),
        }
    )
    adjacency = pa.table(
        {
            "subj": pa.array([r["subj"] for r in adj_rows], pa.string()),
            "pred": pa.array([r["pred"] for r in adj_rows], pa.string()),
            "obj": pa.array([r["obj"] for r in adj_rows], pa.string()),
            "weight": pa.array([r["weight"] for r in adj_rows], pa.float64()),
        }
    )
    rels = pa.table(
        {
            "pred": pa.array([r["pred"] for r in rels_rows], pa.string()),
            "weight": pa.array([r["weight"] for r in rels_rows], pa.float64()),
        }
    )
    gold = pa.table(
        {
            "url": pa.array([r["url"] for r in gold_rows], pa.string()),
            "context_id": pa.array([r["context_id"] for r in gold_rows], pa.int32()),
            "mention_id": pa.array([r["mention_id"] for r in gold_rows], pa.int32()),
            "surface": pa.array([r["surface"] for r in gold_rows], pa.string()),
            "gold_uri": pa.array([r["gold_uri"] for r in gold_rows], pa.string()),
        }
    )
    # raw entity dump — the dictionary-BUILD pipeline's input (the
    # SPARQL-result / geonames-dump analogue, SURVEY.md §3.2); the
    # dictionary table above is exactly what building from this dump
    # must reproduce (tested)
    entity_dump = pa.table(
        {
            "uri": pa.array([e["base"] for e in entities], pa.string()),
            "kind": pa.array([e["kind"] for e in entities], pa.string()),
            "firstname": pa.array([e["first"] for e in entities], pa.string()),
            "lastname": pa.array([e["last"] for e in entities], pa.string()),
            "gender": pa.array([e["gender"] for e in entities], pa.string()),
            "birth": pa.array(
                ["1800" if e["kind"] == "PER" else None for e in entities], pa.string()
            ),
            "death": pa.array(
                ["1870" if e["kind"] == "PER" else None for e in entities], pa.string()
            ),
            "equivalents": pa.array(
                [e["dict_equivs"] for e in entities], pa.list_(pa.string())
            ),
        }
    )
    return {
        "pages": pages,
        "dictionary": dictionary,
        "adjacency": adjacency,
        "rels": rels,
        "gold": gold,
        "entity_dump": entity_dump,
    }


def fixture_dir(
    n_docs: int = 200, n_entities: int = 60, n_topics: int = 8, seed: int = 42,
    root: str = "/tmp/reden_fixtures",
) -> str:
    """Write (or reuse) the fixture tables as parquet; returns the dir.

    Content-addressed by the generation parameters so tests, the driver's
    ``queries()`` callables and ``bench.py`` share one copy per shape.
    """
    key = json.dumps([n_docs, n_entities, n_topics, seed, 9])  # bump last int on format change
    tag = hashlib.sha1(key.encode()).hexdigest()[:12]
    out = os.path.join(root, f"fx_{tag}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tables = generate_fixtures(n_docs=n_docs, n_entities=n_entities, n_topics=n_topics, seed=seed)
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(tmp)
    for name, table in tables.items():
        if name == "pages":
            # pages ship as a SHARDED directory (real corpora are many
            # files; a single file means a single read task, which
            # serializes the whole streaming pipeline behind one
            # producer — measured)
            n_shards = min(64, max(4, n_docs // 250))
            shard_dir = os.path.join(tmp, "pages.parquet")
            os.makedirs(shard_dir)
            rows = table.num_rows
            per = (rows + n_shards - 1) // n_shards
            for s_i in range(n_shards):
                chunk = table.slice(s_i * per, per)
                if chunk.num_rows:
                    pq.write_table(chunk, os.path.join(shard_dir, f"part-{s_i:04d}.parquet"))
        else:
            pq.write_table(table, os.path.join(tmp, f"{name}.parquet"))
    os.replace(tmp, out)
    with open(done, "w") as f:
        f.write(key)
    return out
