"""Regression guard for the driver-graded sample window.

The driver grades the FIRST 50 registered queries, so registration order is
load-bearing: an accidental import reorder or a rotation bug would silently
swap the graded set. These tests pin the contract:

- the window is exactly ``priority_window(...)`` (anchors + rotation);
- every anchor (one per coarse SURVEY.md §2 family) is in the window;
- the rotation actually advances coverage — at least 35 window names were
  never graded in any committed ``CORRECTNESS_r*.json``, until the corpus
  is exhausted, after which slots refill least-recently-graded first.
"""

from __future__ import annotations

import json
from pathlib import Path

from airflow_postgres_csv_spark.queries import (
    _ANCHORS,
    _WINDOW_SIZE,
    _correctness_history,
    priority_window,
    registry,
)

ROOT = Path(__file__).resolve().parents[1]


def test_first_50_is_priority_window():
    reg = registry()
    names = list(reg)
    assert names[:_WINDOW_SIZE] == priority_window(names)


def test_anchors_registered_and_in_window():
    names = list(registry())
    window = set(names[:_WINDOW_SIZE])
    assert set(_ANCHORS) <= window
    assert len(set(_ANCHORS)) == len(_ANCHORS)


def test_rotation_prefers_never_graded():
    names = list(registry())
    window = names[:_WINDOW_SIZE]
    history = _correctness_history()
    never = [n for n in names if n not in history and n not in _ANCHORS]
    rotated = [n for n in window if n not in _ANCHORS]
    want = min(len(rotated), len(never))
    got = sum(1 for n in rotated if n not in history)
    assert got == want, f"rotation should take never-graded first: {got} != {want}"


def test_window_names_all_registered_and_unique():
    reg = registry()
    window = list(reg)[:_WINDOW_SIZE]
    assert len(window) == len(set(window)) == _WINDOW_SIZE
    assert all(n in reg for n in window)


def test_history_parses_committed_artifacts():
    # At round >= 4 the repo carries CORRECTNESS_r01..r03; the parser must
    # see them (guards against a path-resolution regression after a move).
    files = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    if not files:  # fresh checkout — rotation degrades to alphabetical head
        return
    history = _correctness_history()
    union = set()
    for f in files:
        union |= set(json.loads(f.read_text()))
    assert set(history) == union


def test_bench_headline_names_are_registered():
    """A typo'd HEADLINE entry silently drops a query from the per-round
    bench (bench.py filters to registered names) — pin full membership."""
    import bench

    from airflow_postgres_csv_spark.queries import registry

    reg = set(registry())
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert missing == [], f"HEADLINE names not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate HEADLINE"


def test_growth_never_starves_new_or_old_names():
    """Growth + priority case (VERDICT r7 item 1): every name — including
    ones registered THIS round with no VERIFY_LOCAL seniority record yet —
    must drain through the window in bounded rounds. Simulate the rotation
    forward from the committed history with the SAME sort key the real
    window uses: each simulated round grades its window, and every
    registered name must be graded within ceil(backlog / rotation_slots)
    + 1 rounds. Also pin the queue discipline: within the never-graded
    pool, a flagship-subsystem name (lower priority rank) must never wait
    outside the window while a lower-priority name occupies a slot."""
    import math

    from airflow_postgres_csv_spark.queries import (
        _first_verified_round,
        _priority_rank,
        _rotation_sort_key,
    )

    names = list(registry())
    history = dict(_correctness_history())
    seniority = _first_verified_round()
    slots = _WINDOW_SIZE - len(_ANCHORS)
    backlog = [n for n in names if n not in history and n not in _ANCHORS]
    max_rounds = math.ceil(len(backlog) / slots) + 1 if backlog else 1

    # queue discipline on the CURRENT window ordering: flagship-first —
    # but ONLY among names that hold a VERIFY_LOCAL seniority record. A
    # name registered this session (no record yet) must wait behind the
    # whole named backlog regardless of its subsystem rank: the backlog
    # is finite and promised, new registrations are unbounded.
    window = priority_window(names)
    rotated = [n for n in window if n not in _ANCHORS]
    never_in_window = [
        n for n in rotated if n not in history and n in seniority
    ]
    never_waiting = [
        n for n in backlog if n not in window and n in seniority
    ]
    if never_in_window and never_waiting:
        worst_in = max(_priority_rank(n) for n in never_in_window)
        best_out = min(_priority_rank(n) for n in never_waiting)
        assert best_out >= worst_in, (
            f"a rank-{best_out} flagship name waits outside the window "
            f"while a rank-{worst_in} name holds a slot"
        )
    # and no record-less name may hold a slot while a recorded name waits
    recordless_in = [n for n in rotated if n not in seniority]
    recorded_waiting = [
        n for n in backlog if n not in window and n in seniority
    ]
    assert not (recordless_in and recorded_waiting), (
        f"recordless {recordless_in[:3]} jumped the recorded backlog"
    )

    # forward simulation: no name may starve
    sim_hist = dict(history)
    latest = max(sim_hist.values(), default=0)
    graded_round: dict[str, int] = {}

    def sim_window(rnd):
        pool = [n for n in names if n not in _ANCHORS]
        pool.sort(key=_rotation_sort_key(sim_hist, seniority))
        return list(_ANCHORS) + pool[:slots]

    for rnd in range(latest + 1, latest + 1 + max_rounds):
        for n in sim_window(rnd):
            sim_hist[n] = rnd
            graded_round.setdefault(n, rnd)
    missing = [n for n in names if n not in graded_round and n not in sim_hist]
    assert missing == [], (
        f"{len(missing)} names never graded within {max_rounds} rounds: "
        f"{missing[:5]}"
    )


def test_rotation_window_dominated_by_flagship_subsystems():
    """VERDICT r7 done-criterion: >=25 of the 35 rotation slots go to the
    flagship backlog (snapshot/catalog/ANN/text-index/cluster/search/
    sample families) while any of those names remain never-graded."""
    names = list(registry())
    history = _correctness_history()
    window = priority_window(names)
    rotated = [n for n in window if n not in _ANCHORS]
    flagship_prefixes = (
        "snapshot_",
        "pipeline_snapshot_",
        "pipeline_expectations_",
        "streaming_snapshot_",
        "streaming_merge_",
        "streaming_catalog_",
        "similarity_ann_",
        "text_index_",
        "search_",
        "cluster_",
        "sample_",
    )
    flagship_backlog = [
        n
        for n in names
        if n not in history
        and n not in _ANCHORS
        and n.startswith(flagship_prefixes)
    ]
    if len(flagship_backlog) >= 25:
        got = sum(1 for n in rotated if n.startswith(flagship_prefixes))
        assert got >= 25, f"only {got}/35 rotation slots are flagship names"
