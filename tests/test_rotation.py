"""Gate-rotation invariants for the r5 driver CORRECTNESS window.

The driver gate checks the FIRST 50 entries of ``queries()``. SURVEY.md's
rotation plan requires each round's front-50 to be disjoint from every
prior round's gate set so driver-grade evidence accumulates across rounds
(r3: 50, r4: +50 disjoint, r5: +50 disjoint again -> 150/258 driver-verified).
"""

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402


def _gate_set(correctness_file):
    path = REPO / correctness_file
    if not path.exists():
        return set()
    return set(json.loads(path.read_text()).keys())


def test_front_50_matches_rotation_plan():
    q = entry.queries()
    front = list(q.keys())[:50]
    assert front == entry._R5_GATE_FRONT
    assert len(set(front)) == 50


def test_front_50_disjoint_from_prior_gates():
    front = set(list(entry.queries().keys())[:50])
    r3 = _gate_set("CORRECTNESS_r03.json")
    r4 = _gate_set("CORRECTNESS_r04.json")
    assert not (front & r3), f"overlap with r3 gate: {front & r3}"
    assert not (front & r4), f"overlap with r4 gate: {front & r4}"


def test_front_50_all_value_exact_capable():
    # Every driver slot must carry a DuckDB oracle twin (value-exact check),
    # per VERDICT r4 item 7: no rows-only queries in the gate window.
    oracles = entry.oracle_sql()
    front = list(entry.queries().keys())[:50]
    missing = [k for k in front if k not in oracles]
    assert not missing, f"front-50 queries without oracle SQL: {missing}"


def test_reorder_preserves_registry():
    q = entry.queries()
    reg = entry._registry()
    assert set(q.keys()) == set(reg.keys())
    assert len(q) == len(reg)
    for k in q:
        assert q[k] is reg[k]


def test_float_oracle_lint():
    """r4 verdict item 9: the check_oracle float-emission lint flags
    both violation classes on planted SQL, skips declared-safe columns,
    and is clean over every shipped oracle twin."""
    sys.path.insert(0, str(REPO / "tools"))
    from check_oracle import FLOAT_LINT_ALLOW, lint_oracle_sql

    # planted violation 1: rounded single divide
    w = lint_oracle_sql("SELECT k, round(a / b, 8) AS frac FROM t")
    assert len(w) == 1 and "single divide" in w[0]

    # planted violation 2: un-rounded transcendental chain
    w = lint_oracle_sql("SELECT k, sqrt(a) * b + ln(c) AS score FROM t")
    assert len(w) == 1 and "un-rounded float chain" in w[0]

    # safe forms: raw single divide; rounded multi-op; integer count
    assert not lint_oracle_sql("SELECT k, a / b AS frac FROM t")
    assert not lint_oracle_sql(
        "SELECT k, round(sqrt(a) * b + ln(c), 8) AS score FROM t"
    )
    assert not lint_oracle_sql(
        "SELECT k, CAST(sum(CASE WHEN x > sqrt(y) * 2 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_hits FROM t"
    )
    # CTE-heavy SQL: lint sees only the final select
    assert not lint_oracle_sql(
        "WITH a AS (SELECT round(x / y, 8) AS bad FROM t)"
        " SELECT k, bad FROM a"
    )

    # every shipped twin is clean modulo the declared-safe columns
    for name, sql in entry.oracle_sql().items():
        warns = [
            w
            for w in lint_oracle_sql(sql)
            if not any(
                f"col {c}:" in w for c in FLOAT_LINT_ALLOW.get(name, {})
            )
        ]
        assert not warns, (name, warns)
