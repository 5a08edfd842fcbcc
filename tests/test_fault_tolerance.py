"""Fault tolerance (SURVEY §4): SYSTEM failures — a worker process dying
mid-task (OOM kill, preemption) — are retried by Ray's task lineage;
our stages are idempotent so the retried task reproduces the block
exactly.  (USER exceptions, by contrast, fail fast by design in Ray
Data — bugs should not be silently retried.)"""

import os
import tempfile

import pyarrow as pa


def _killer_once(marker: str):
    """UDF that kills ITS OWN WORKER PROCESS the first time any task
    runs (marker file = the one-shot), then behaves as identity."""

    def fn(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)  # simulate SIGKILL'd worker
        return batch

    return fn


def test_worker_death_is_retried(ray_session):
    import ray.data as rd

    marker = tempfile.mktemp(prefix="reden_kill_once_")
    out = (
        rd.range(1000, override_num_blocks=8)
        .map_batches(_killer_once(marker), batch_format="pyarrow")
        .take_all()
    )
    assert sorted(r["id"] for r in out) == list(range(1000))
    os.unlink(marker)


def test_pipeline_survives_worker_death(ray_session, small_fixture_dir):
    """Kill a worker inside the flagship pipeline (between candidates and
    fusion); links must equal a clean run — lineage re-executes the lost
    block through the same deterministic stages."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from reden_ray.pipelines.kg import (
        candidates_dataset,
        fixture_config,
        linked_dataset,
        links_view,
        mentions_dataset,
    )

    fd = small_fixture_dir
    cfg = fixture_config(fd)
    pages = rd.read_parquet(f"{fd}/pages.parquet", columns=["url", "html"])
    dict_ref = ray.put(pq.read_table(f"{fd}/dictionary.parquet"))
    adj_ref = ray.put(pq.read_table(f"{fd}/adjacency.parquet"))
    cands = candidates_dataset(mentions_dataset(pages), dict_ref, cfg).materialize()

    clean = links_view(linked_dataset(cands, adj_ref, cfg)).take_all()
    marker = tempfile.mktemp(prefix="reden_kill_once_")
    flaky_cands = cands.map_batches(_killer_once(marker), batch_format="pyarrow")
    flaky = links_view(linked_dataset(flaky_cands, adj_ref, cfg)).take_all()
    os.unlink(marker)

    def canon(rows):
        return sorted(
            (r["url"], r["context_id"], r["mention_id"], tuple(r["chosen_uris"] or []))
            for r in rows
        )

    assert canon(clean) == canon(flaky)
