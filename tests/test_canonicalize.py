import pyarrow as pa
import pytest


def test_components_chain_and_convergence(ray_session):
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import connected_components

    # chain a-b-c-d plus isolated pair x-y (symmetric pairs)
    edges = [("b", "a"), ("c", "b"), ("d", "c"), ("y", "x")]
    us = [e[0] for e in edges] + [e[1] for e in edges]
    vs = [e[1] for e in edges] + [e[0] for e in edges]
    pairs = rd.from_arrow(pa.table({"u": us, "v": vs}))
    mapping, converged = connected_components(pairs, max_iters=5)
    m = dict(zip(mapping["uri"].to_pylist(), mapping["canonical"].to_pylist()))
    assert converged
    assert m["a"] == m["b"] == m["c"] == m["d"] == "a"
    assert m["x"] == m["y"] == "x"


def test_bounded_iterations_reported(ray_session):
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import connected_components

    # a chain longer than max_iters cannot converge: reported, not silent
    chain = [(chr(ord("a") + i + 1), chr(ord("a") + i)) for i in range(8)]
    us = [e[0] for e in chain] + [e[1] for e in chain]
    vs = [e[1] for e in chain] + [e[0] for e in chain]
    pairs = rd.from_arrow(pa.table({"u": us, "v": vs}))
    _, converged = connected_components(pairs, max_iters=2)
    assert not converged


def test_canonicalize_fixture_triples(ray_session, small_fixture_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import (
        canonicalize_triples,
        connected_components,
        equivalence_pairs,
    )
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    fd = small_fixture_dir
    adjacency = rd.read_parquet(f"{fd}/adjacency.parquet")
    dictionary = rd.read_parquet(f"{fd}/dictionary.parquet")
    pairs = equivalence_pairs(adjacency, "http://kb.test/sameAs", dictionary)
    mapping, converged = connected_components(
        pairs, max_iters=5, prefer_prefix="http://kb.test/"
    )
    assert converged
    m = dict(zip(mapping["uri"].to_pylist(), mapping["canonical"].to_pylist()))
    # every alt.test equivalent maps to its entity's canonical label,
    # which must be shared with the base URI
    base_of = {}
    for uri, canon in m.items():
        if uri.startswith("http://alt.test/ent/"):
            k = uri.split("/")[4]
            base = f"http://kb.test/ent/{k}"
            assert m.get(base, base) == canon, (uri, base, canon)

    triples = triples_view(run_fixture_pipeline(fd)).materialize()
    canon_triples = canonicalize_triples(triples, mapping).take_all()
    # after canonicalization, no alt.test URIs remain in subj
    assert all(not t["subj"].startswith("http://alt.test/") for t in canon_triples)


def test_join_variant_equals_broadcast(ray_session, small_fixture_dir):
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import (
        connected_components,
        connected_components_join,
        equivalence_pairs,
    )

    fd = small_fixture_dir
    adjacency = rd.read_parquet(f"{fd}/adjacency.parquet")
    dictionary = rd.read_parquet(f"{fd}/dictionary.parquet")
    pairs = equivalence_pairs(adjacency, "http://kb.test/sameAs", dictionary)
    m1, c1 = connected_components(pairs, max_iters=5, prefer_prefix="http://kb.test/")
    m2, c2 = connected_components_join(
        pairs, max_iters=5, prefer_prefix="http://kb.test/", num_partitions=4
    )
    assert c1 and c2
    assert m1.to_pylist() == m2.to_pylist()


def test_driver_free_path_equals_broadcast(ray_session, small_fixture_dir):
    """The fully driver-free query path (labels Dataset -> join rewrite,
    __ray_entry__._kg_canonical_triples shape) must produce exactly the
    triples of the broadcast path — no labels.take_all() anywhere."""
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import (
        canonicalize_triples,
        canonicalize_triples_join,
        connected_components,
        connected_components_join_ds,
        equivalence_pairs,
    )
    from reden_ray.pipelines.kg import run_fixture_pipeline, triples_view

    fd = small_fixture_dir
    adjacency = rd.read_parquet(f"{fd}/adjacency.parquet")
    dictionary = rd.read_parquet(f"{fd}/dictionary.parquet")
    pairs = equivalence_pairs(adjacency, "http://kb.test/sameAs", dictionary)
    triples = triples_view(run_fixture_pipeline(fd)).materialize()

    map_tbl, c1 = connected_components(pairs, max_iters=5, prefer_prefix="http://kb.test/")
    map_ds, c2 = connected_components_join_ds(
        pairs, max_iters=5, prefer_prefix="http://kb.test/", num_partitions=4
    )
    assert c1 and c2
    want = sorted(
        tuple(sorted(r.items())) for r in canonicalize_triples(triples, map_tbl).take_all()
    )
    got = sorted(
        tuple(sorted(r.items()))
        for r in canonicalize_triples_join(triples, map_ds).take_all()
    )
    assert got == want


def test_canonicalize_triples_join_equals_broadcast(ray_session):
    """The KB-scale join rewrite must equal the broadcast rewrite."""
    import pyarrow as pa
    import ray.data as rd

    from reden_ray.pipelines.canonicalize import (
        canonicalize_triples,
        canonicalize_triples_join,
    )

    triples = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["u"] * 4, pa.string()),
                "subj": pa.array(["a", "b", "c", "x"], pa.string()),
                "pred": pa.array(["p"] * 4, pa.string()),
                "obj": pa.array(["b", "x", "a", "c"], pa.string()),
            }
        )
    )
    mapping = pa.table(
        {
            "uri": pa.array(["a", "b"], pa.string()),
            "canonical": pa.array(["A", "A"], pa.string()),
        }
    )
    want = sorted(
        tuple(sorted(r.items()))
        for r in canonicalize_triples(triples, mapping).take_all()
    )
    got = sorted(
        tuple(sorted(r.items()))
        for r in canonicalize_triples_join(triples, rd.from_arrow(mapping)).take_all()
    )
    assert got == want
    # empty mapping: triples pass through untouched
    empty = rd.from_arrow(mapping.slice(0, 0))
    passthrough = sorted(
        tuple(sorted(r.items()))
        for r in canonicalize_triples_join(triples, empty).take_all()
    )
    assert passthrough == sorted(tuple(sorted(r.items())) for r in triples.take_all())
