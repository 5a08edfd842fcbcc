"""Frequent Directions (stages/fd.py): the two-sided Gram certificate
must hold under merging and on adversarial inputs.  The query gate is
covered by the oracle harness (emb_fd_sketch)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from reden_ray.stages.fd import _sketch_rows, frequent_directions


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _check(A, B, delta_sum):
    G = A.T @ A - (B.T @ B if B.size else np.zeros((A.shape[1], A.shape[1])))
    ev = np.linalg.eigvalsh(G)
    tol = 1e-8 * float(np.trace(A.T @ A)) + 1e-9
    assert ev[0] >= -tol, ev[0]
    assert ev[-1] <= delta_sum + tol, (ev[-1], delta_sum)


@pytest.mark.parametrize(
    "A",
    [
        np.random.RandomState(0).randn(4000, 32),
        np.random.RandomState(1).randn(4000, 32) * np.linspace(5, 0.01, 32),
        np.tile(np.ones(32), (4000, 1)),                      # rank 1
        np.vstack([np.eye(32)] * 120),                        # identical batches
    ],
    ids=["isotropic", "anisotropic", "rank1", "repeated-eye"],
)
def test_certificate_and_merge(A):
    b1, d1 = _sketch_rows(A[:1500], 8)
    b2, d2 = _sketch_rows(A[1500:], 8)
    B, d3 = _sketch_rows(np.vstack([b1, b2]), 8)
    assert B.shape[0] <= 16
    _check(A, B, d1 + d2 + d3)


def test_ray_build_certifies():
    rng = np.random.RandomState(7)
    A = rng.randn(3000, 16) * np.linspace(4, 0.1, 16)
    ds = rd.from_arrow(
        pa.table({"embedding": pa.array(list(A), pa.list_(pa.float64()))})
    ).repartition(11)
    B, delta_sum = frequent_directions(ds, "embedding", ell=8)
    _check(A, B, delta_sum)
    # the sketch is actually compressive: far fewer rows than data
    assert B.shape[0] <= 16
