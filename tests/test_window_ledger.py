"""Machine-checked driver-window rotation ledger (WINDOW.md policy).

The driver records CORRECTNESS rows for only the first 50 entries of
``queries_map()``; the registry holds over twice that many queries
(``len(load_all())`` is the live count), so the window must rotate so
every query keeps a reasonably fresh green row.  These tests parse the
``CORRECTNESS_r*.json`` history in the repo root (the ground truth the
judge reads) instead of a hand-maintained table, and fail the build when
the rotation plan would leave a query unverified too long.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from hadoop_sync_spark.queries import load_all, queries_map

REPO = Path(__file__).resolve().parent.parent
WINDOW_SIZE = 50

QUERIES = load_all()


def _history() -> dict[int, dict]:
    out = {}
    for f in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f.name)
        if m:
            out[int(m.group(1))] = json.loads(f.read_text())
    return out


def _is_green(row: dict, name: str) -> bool:
    ok = (
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and row.get("err") is None
    )
    if not ok:
        return False
    # a 0-row "match" validates nothing unless the query is declared
    # expected_empty (the q55 lesson)
    q = QUERIES.get(name)
    if row.get("spark_rows") == 0 and not (q and q.expected_empty):
        return False
    return True


def _last_green(history: dict[int, dict], name: str) -> int | None:
    rounds = [
        r for r, rows in history.items()
        if name in rows and _is_green(rows[name], name)
    ]
    return max(rounds) if rounds else None


def test_window_is_exactly_window_size():
    names = list(queries_map())
    assert len(names) >= WINDOW_SIZE
    # _DRIVER_ORDER should fill the window exactly: a shorter explicit
    # head silently windows whatever registration order appends next
    from hadoop_sync_spark.queries import _DRIVER_ORDER

    in_registry = [n for n in _DRIVER_ORDER if n in QUERIES]
    assert len(in_registry) == WINDOW_SIZE, (
        f"_DRIVER_ORDER pins {len(in_registry)} registered queries; the "
        f"driver checks exactly {WINDOW_SIZE} — pin the window explicitly"
    )
    assert len(set(_DRIVER_ORDER)) == len(_DRIVER_ORDER), "duplicate entries"


def test_never_checked_queries_are_windowed():
    history = _history()
    window = set(list(queries_map())[:WINDOW_SIZE])
    never = [
        n for n in QUERIES if _last_green(history, n) is None
    ]
    missing = sorted(set(never) - window)
    assert not missing, (
        f"queries with no green driver row ever must be in the current "
        f"window: {missing}"
    )


def test_no_query_goes_stale():
    """No registered query's last green row may be >2 rounds behind the
    latest recorded round unless the current window re-checks it.

    Recovery mode: the driver can skip recording a round entirely (round 4
    produced no CORRECTNESS_r4.json), which ages every query by an extra
    round at once — the stale backlog can then exceed the 50-slot window
    and the invariant above is mathematically unsatisfiable.  In that case
    the enforceable requirement becomes *drain oldest-first at full
    capacity*: every window slot must be spent on the backlog (a stale or
    never-checked query — zero slots on fresh re-checks), and no query
    left outside the window may be strictly STALER than any query inside
    it.  That guarantees the leftover is exactly the least-stale tail,
    which the next round's window must then absorb (this test reverts to
    the strict branch as soon as the backlog fits)."""
    history = _history()
    if not history:
        return
    current_round = max(history) + 1  # the round this window targets
    window = set(list(queries_map())[:WINDOW_SIZE])

    def staleness(name: str) -> float:
        lg = _last_green(history, name)
        return float("inf") if lg is None else current_round - lg

    backlog = {n for n in QUERIES if staleness(n) > 2}
    if len(backlog) <= WINDOW_SIZE:
        stale = sorted(backlog - window)
        assert not stale, (
            f"stale queries (last green row >2 rounds ago, not in window): "
            f"{stale}"
        )
    else:
        wasted = sorted(window - backlog)
        assert not wasted, (
            f"backlog ({len(backlog)}) exceeds the window; every slot must "
            f"drain it, but these windowed queries are not stale: {wasted}"
        )
        left_out = backlog - window
        worst_left_out = max(staleness(n) for n in left_out)
        best_windowed = min(staleness(n) for n in window)
        assert worst_left_out <= best_windowed, (
            f"backlog must drain oldest-first: a left-out query is "
            f"{worst_left_out} rounds stale while a windowed one is only "
            f"{best_windowed}"
        )
