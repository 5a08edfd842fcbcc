"""Property tests for the coarse-partition reduce plumbing."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from reden_ray.stages.partition import part_column, sorted_segments


@st.composite
def key_tables(draw):
    n = draw(st.integers(0, 200))
    ints = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    strs = draw(
        st.lists(st.sampled_from(["a", "b", "c", "é", ""]), min_size=n, max_size=n)
    )
    vals = draw(st.lists(st.integers(0, 100), min_size=n, max_size=n))
    return pa.table(
        {
            "k": pa.array(ints, pa.int64()),
            "s": pa.array(strs, pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )


@given(key_tables(), st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_part_column_consistent_and_in_range(t, n_parts):
    """Same key -> same partition, always within [0, n_parts)."""
    for cols in (["k"], ["s"], ["k", "s"]):
        parts = part_column(t, cols, n_parts).to_pylist()
        assert all(0 <= p < n_parts for p in parts)
        seen = {}
        for row, p in zip(t.select(cols).to_pylist(), parts):
            key = tuple(row.values())
            assert seen.setdefault(key, p) == p


@given(key_tables())
@settings(max_examples=60, deadline=None)
def test_sorted_segments_partition_rows_exactly(t):
    """Segments tile the table: every row appears once, each segment is
    key-homogeneous, and distinct segment keys == distinct table keys."""
    st_t, starts, ends = sorted_segments(t, ["k", "s"])
    assert st_t.num_rows == t.num_rows
    ks = st_t.column("k").to_pylist()
    ss = st_t.column("s").to_pylist()
    seg_keys = []
    covered = 0
    for s, e in zip(starts, ends):
        assert e > s
        keys = {(ks[i], ss[i]) for i in range(s, e)}
        assert len(keys) == 1
        seg_keys.append(keys.pop())
        covered += e - s
    assert covered == t.num_rows
    assert sorted(set(seg_keys)) == sorted(
        {(k, s) for k, s in zip(t.column("k").to_pylist(), t.column("s").to_pylist())}
    )
    # rows are preserved as a multiset
    assert sorted(map(tuple, (r.values() for r in st_t.to_pylist()))) == sorted(
        map(tuple, (r.values() for r in t.to_pylist()))
    )


@given(
    st.lists(
        st.tuples(st.sampled_from(["Anna", "Bo", "Carl Marx", "Da Li"]), st.sampled_from(["PER", "LOC"])),
        min_size=0,
        max_size=8,
    ),
    st.text(alphabet="AnaBo Crl Mx.,!", max_size=80),
)
@settings(max_examples=60, deadline=None)
def test_tag_text_spans_valid_and_nonoverlapping(aliases, text):
    from reden_ray.stages.dicttag import build_alias_trie, tag_text

    trie = build_alias_trie(
        pa.table(
            {
                "alias_raw": [a for a, _ in aliases],
                "kind": [k for _, k in aliases],
            }
        )
    )
    got = tag_text(text, trie)
    prev_end = -1
    for surface, start, end, _ in got:
        assert text[start:end] == surface
        assert start >= prev_end  # non-overlapping, left to right
        prev_end = end


def test_part_column_null_keys():
    """Null keys co-partition and never crash (ints go through fill,
    strings through the sentinel index slot)."""
    t = pa.table(
        {
            "k": pa.array([1, None, 2, None], pa.int64()),
            "s": pa.array(["a", None, None, "b"], pa.string()),
        }
    )
    for cols in (["k"], ["s"], ["k", "s"]):
        parts = part_column(t, cols, 5).to_pylist()
        assert all(0 <= p < 5 for p in parts)
    sp = part_column(t, ["s"], 5).to_pylist()
    assert sp[1] == sp[2]  # both null strings -> same partition
