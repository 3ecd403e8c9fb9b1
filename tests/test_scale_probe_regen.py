"""Pin tools/scale_probe.py's regen tail-preservation: a regen must carry
every '## Round' notes section of the EXISTING SCALING.md through, and fall
back to the embedded literal only when there is nothing to preserve."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from scale_probe import notes_tail  # noqa: E402

FALLBACK = "\n## Round 1 notes: embedded fallback\n\nbody\n"


def test_existing_notes_win_over_fallback():
    existing = (
        "# SCALING — table\n\n| shape | 1x |\n\n"
        "## Round 12 notes: probe rows\n\nolder body\n\n"
        "## Round 13 notes: appended between regens\n\nnewer body\n"
    )
    tail = notes_tail(existing, FALLBACK)
    assert tail.startswith("## Round 12 notes")
    # the between-regen appended section survives — the clobber this guards
    assert "## Round 13 notes: appended between regens" in tail
    assert "embedded fallback" not in tail


def test_fallback_when_no_file():
    assert notes_tail(None, FALLBACK) == FALLBACK


def test_fallback_when_no_notes_sections():
    assert notes_tail("# SCALING — table only, no notes\n", FALLBACK) == FALLBACK


def test_table_prefix_is_dropped():
    existing = "# header\ntable rows mentioning Round inline\n\n## Round 9 notes: x\nbody\n"
    tail = notes_tail(existing, FALLBACK)
    assert tail == "## Round 9 notes: x\nbody\n"
