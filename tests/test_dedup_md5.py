"""SQL-replayable dedup kernel twins: the md5 MinHash/SimHash kernels
and the integer hyperplane family must equal their definitional
(brute-force / DuckDB) forms exactly — these kernels exist so the full
LSH machinery can sit under DuckDB hash gates, so any drift here
silently breaks the end-to-end oracles (the oracle harness in
tests/test_relational_oracle.py covers the pipeline level)."""

import hashlib

import duckdb
import numpy as np

from reden_ray.stages.dedup import Md5MinHasher, Md5SimHasher, _int_planes

TEXTS = [
    "the fast key order sort table scan merge",
    "ab",
    "",
    "hash JOIN merge sort hash join HASH",
    "x" * 7,
]


def _le64(b: bytes) -> int:
    return int.from_bytes(b[:8], "little")


def test_md5_minhash_matches_bruteforce():
    mh = Md5MinHasher(n_perm=16, shingle_k=5)
    for text in TEXTS:
        t = text.lower()
        if len(t) < 5:
            grams = {t}
        else:
            grams = {t[j : j + 5] for j in range(len(t) - 4)}
        want = [
            min(_le64(hashlib.md5(f"{i}\x01{g}".encode()).digest()) for g in grams)
            for i in range(16)
        ]
        got = mh.signature(text)
        assert got.tolist() == want, text


def test_md5_minhash_matches_duckdb():
    mh = Md5MinHasher(n_perm=16, shingle_k=5)
    con = duckdb.connect()
    for text in TEXTS:
        rows = con.execute(
            "WITH d AS (SELECT lower(?) AS t), "
            "sh AS (SELECT DISTINCT substr(t, j, 5) AS s FROM d, range(1, 101) r(j) "
            "WHERE j + 4 <= length(t) "
            "UNION ALL SELECT t AS s FROM d WHERE length(t) < 5) "
            "SELECT i, min(md5_number_upper(i::VARCHAR || chr(1) || s)) "
            "FROM sh, range(0, 16) p(i) GROUP BY i ORDER BY i",
            [text],
        ).fetchall()
        assert mh.signature(text).tolist() == [int(r[1]) for r in rows], text


def test_md5_simhash_bit_convention():
    sh = Md5SimHasher()
    for text in TEXTS:
        fp = sh.simhash(text)
        # definitional form: bit j set iff count-weighted vote over
        # (LE64(md5(word)) >> j) & 1 is positive
        from collections import Counter

        counts = Counter(sh.word.findall(text.lower()))
        want = 0
        for j in range(64):
            vote = sum(
                cnt * (1 if (_le64(hashlib.md5(w.encode()).digest()) >> j) & 1 else -1)
                for w, cnt in counts.items()
            )
            if vote > 0:
                want |= 1 << j
        assert fp == want, text


def test_int_planes_match_duckdb_and_bounds():
    pl = _int_planes(8, 4)
    assert pl.min() >= -3 and pl.max() <= 3
    rows = duckdb.sql(
        "SELECT p, d, CAST(md5_number_upper(p::VARCHAR || ',' || d::VARCHAR) % 7 "
        "AS BIGINT) - 3 FROM range(0, 4) rp(p), range(1, 9) rd(d)"
    ).fetchall()
    for p, d, c in rows:
        assert pl[d - 1, p] == c


def test_quantization_is_engine_exact():
    # floor(x*1000 + 0.5) must agree between numpy float64 and DuckDB
    # DOUBLE, including negative values and exact halves
    xs = np.array([-0.5252062, 0.4583735, -0.0005, 0.0005, 0.0, -1e-9], dtype=np.float64)
    got = np.floor(xs * 1000 + 0.5).astype(np.int64)
    rows = duckdb.execute(
        "SELECT CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "FROM (SELECT unnest(?) AS x)",
        [xs.tolist()],
    ).fetchall()
    assert got.tolist() == [r[0] for r in rows]
