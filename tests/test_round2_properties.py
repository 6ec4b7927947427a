"""Property tests for round-2 primitives (hypothesis).

- ``round_half_away`` must match DuckDB's ``round()`` bit-for-bit — the
  invariant every oracle float comparison rests on.
- ``top_by_score_then_id`` must equal the full (score DESC, id ASC) sort
  prefix — the oracle tie-break invariant for every ANN local cut.
- ``salt_hot_blocks`` must place every member pair of a salted block in at
  least one common sub-block (zero recall loss) with bounded fan-out.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from neuroner_ray.functions.rounding import round_half_away, top_by_score_then_id
from neuroner_ray.stages.linker import SALT_GROUPS_MAX, salt_hot_blocks


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
)
def test_round_half_away_matches_duckdb(x):
    want = duckdb.execute("SELECT round(?::DOUBLE, 4)", [x]).fetchone()[0]
    got = float(round_half_away(x))
    assert got == want, (x, got, want)


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_top_by_score_then_id_equals_sorted_prefix(data):
    n = data.draw(st.integers(min_value=1, max_value=60))
    k = data.draw(st.integers(min_value=1, max_value=60))
    # few distinct scores → many ties (the hard case argpartition gets wrong)
    scores = np.array(
        data.draw(
            st.lists(
                st.sampled_from([0.1, 0.2, 0.3]), min_size=n, max_size=n
            )
        )
    )
    ids = np.random.RandomState(data.draw(st.integers(0, 999))).permutation(n)
    take = top_by_score_then_id(scores, ids, k)
    got = sorted(zip(-scores[take], ids[take]))
    want = sorted(zip(-scores, ids))[: min(k, n)]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=2, max_value=120),
    st.integers(min_value=2, max_value=20),
)
def test_salt_hot_blocks_covers_every_pair(n_members, threshold):
    nodes = [f"n{i:03d}" for i in range(n_members)]
    blocked = pa.table(
        {
            "block": pa.array(["B"] * n_members, pa.string()),
            "node": pa.array(nodes, pa.string()),
            "norm": pa.array(nodes, pa.string()),
        }
    )
    out = salt_hot_blocks(blocked, {"B": n_members}, threshold)
    membership: dict[str, set[str]] = {}
    for blk, node in zip(out["block"].to_pylist(), out["node"].to_pylist()):
        membership.setdefault(node, set()).add(blk)
    if n_members <= threshold:
        assert all(m == {"B"} for m in membership.values())
        return
    g = min(-(-n_members // threshold), SALT_GROUPS_MAX)
    for node, blocks in membership.items():
        assert len(blocks) == g  # bounded fan-out: g rows per member
    for i in range(n_members):
        for j in range(i + 1, n_members):
            assert membership[nodes[i]] & membership[nodes[j]], (i, j)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=50),
    st.integers(1, 10**9),
)
def test_tbucket_floor_matches_python_floordiv(micros, width):
    """tbucket_of is TRUE floor division (Python // semantics), including
    negative (pre-epoch) timestamps where int64 pc.divide truncates."""
    from neuroner_ray.runtime.timeutil import tbucket_of

    got = tbucket_of(pa.array(micros, pa.int64()), width).to_pylist()
    assert got == [m // width for m in micros]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=0, max_size=60))
def test_movavg3_matches_naive_loop(vals):
    """The vectorized shift-sum trailing mean equals the naive per-row
    frame walk (same left-to-right association)."""
    from neuroner_ray.pipelines.queries import _movavg3_of

    v = np.asarray(vals, dtype=np.float64)
    got = _movavg3_of(v)
    for i in range(len(v)):
        frame = v[max(0, i - 2) : i + 1]
        want = frame[0]
        for x in frame[1:]:
            want = want + x
        want /= len(frame)
        assert got[i] == want, (i, got[i], want)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_mg_merge_deficit_bounds_undercount(data):
    """Misra-Gries invariant after any merge chain: every item's summary
    count underestimates its true count by AT MOST the carried deficit D,
    and at most `capacity` counters stay positive."""
    import pyarrow.compute as pc

    from neuroner_ray.pipelines.queries import _mg_merge

    cap = data.draw(st.integers(2, 12))
    stream = data.draw(
        st.lists(st.integers(0, 25), min_size=0, max_size=400)
    )
    # random batch splits, merged pairwise like the tree would
    n_batches = data.draw(st.integers(1, 6))
    from collections import Counter

    batches = [stream[i::n_batches] for i in range(n_batches)]
    summary = None
    for b in batches:
        c = Counter(f"t{x}" for x in b)
        t = pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )
        part = _mg_merge(t, cap)
        summary = part if summary is None else _mg_merge(
            pa.concat_tables([summary, part]), cap
        )
    true = Counter(f"t{x}" for x in stream)
    isnull = pc.is_null(summary["token"])
    D = pc.sum(pc.filter(summary["n"], isnull)).as_py() or 0
    kept = {
        t: n
        for t, n in zip(
            summary["token"].to_pylist(), summary["n"].to_pylist()
        )
        if t is not None
    }
    assert len(kept) <= cap
    for tok, cnt in true.items():
        est = kept.get(tok, 0)
        assert est <= cnt, (tok, est, cnt)
        assert cnt - est <= D, (tok, est, cnt, D)
