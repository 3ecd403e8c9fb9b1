"""Pin the driver-window contract: the driver's correctness harness checks
the FIRST 50 registered queries, and `load_all()` reorders the registry so
that window is exactly `CHECK_PRIORITY`. A silent break here (a renamed
query, a priority entry that no longer exists, an oracle dropped from a
windowed query) would burn driver slots on the wrong queries — the round's
single most expensive class of bookkeeping bug, so it gets a CI pin.
"""

from __future__ import annotations

from mapreducefw_spark.queries import (
    CHECK_PRIORITY,
    ORACLES,
    QUERIES,
    WINDOW_ROWS_ONLY,
    load_all,
)

load_all()


def test_priority_is_exactly_the_checked_window():
    assert len(CHECK_PRIORITY) == 50
    assert len(set(CHECK_PRIORITY)) == 50
    assert list(QUERIES)[:50] == list(CHECK_PRIORITY)


def test_every_windowed_query_is_oracle_paired():
    # a rows-only query in the window spends a slot on the weaker check —
    # allowed ONLY for the explicit allowlist (r11: the 12 r2/r3-vintage
    # rows-only refreshes the r10 verdict ordered); any other rows-only
    # name in the window is a drifted slot
    missing = [
        n for n in CHECK_PRIORITY if n not in ORACLES and n not in WINDOW_ROWS_ONLY
    ]
    assert not missing, missing
    # and the allowlist itself must be window-resident rows-only names
    assert WINDOW_ROWS_ONLY <= set(CHECK_PRIORITY)
    assert not (WINDOW_ROWS_ONLY & set(ORACLES))


def test_registry_counts_match_docs():
    # the README/SURVEY/COVERAGE counts are synced by hand each round;
    # this pin makes a drift loud at commit time instead of judge time
    assert len(QUERIES) == 349, len(QUERIES)
    assert len(ORACLES) == 322, len(ORACLES)
