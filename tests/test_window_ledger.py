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
    latest recorded round unless the current window re-checks it."""
    history = _history()
    if not history:
        return
    current_round = max(history) + 1  # the round this window targets
    window = set(list(queries_map())[:WINDOW_SIZE])
    stale = sorted(
        n
        for n in QUERIES
        if n not in window
        and (lg := _last_green(history, n)) is not None
        and current_round - lg > 2
    )
    assert not stale, (
        f"stale queries (last green row >2 rounds ago, not in window): "
        f"{stale}"
    )
