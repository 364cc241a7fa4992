"""Unit test of bench.py's headline promotion rule (VERDICT r3 weak #2).

The contract with the driver is ONE honest number per round; the rule
must pick the fastest honest mode, not privilege aggregate modes.  The r3
artifact reported 6.075 fps (batched) while the engine's best honest
number was 7.73 (single) — this gate pins the fix.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import better_headline  # noqa: E402


def pick(records):
    """Replay bench.main()'s promotion loop over (mode, rec, profile)."""
    cur = None
    for mode, rec, profile in records:
        if better_headline(cur, mode, rec, profile):
            cur = (mode, rec["fps"], profile)
    return cur


def test_fastest_mode_wins_regardless_of_class():
    # the exact r3 situation: single 7.73 fps, batched aggregate 6.075
    cur = pick([
        ("single", {"fps": 7.73}, "hdl64"),
        ("batched", {"fps": 6.075}, "hdl64"),
    ])
    assert cur == ("single", 7.73, "hdl64")


def test_aggregate_wins_when_actually_faster():
    cur = pick([
        ("single", {"fps": 7.73}, "hdl64"),
        ("batched", {"fps": 25.0}, "hdl64"),
        ("bchunk", {"fps": 31.0}, "hdl64"),
    ])
    assert cur == ("bchunk", 31.0, "hdl64")


def test_flagship_profile_outranks_fallback():
    cur = pick([
        ("single_small", {"fps": 100.0}, "hdl64-small"),
        ("single", {"fps": 7.0}, "hdl64"),
    ])
    assert cur == ("single", 7.0, "hdl64")
    # and a later fallback record never displaces a flagship one
    cur = pick([
        ("single", {"fps": 7.0}, "hdl64"),
        ("single_small", {"fps": 100.0}, "hdl64-small"),
    ])
    assert cur == ("single", 7.0, "hdl64")


def test_fallback_beats_nothing():
    cur = pick([("single_small", {"fps": 42.0}, "hdl64-small")])
    assert cur == ("single_small", 42.0, "hdl64-small")


def test_none_record_ignored():
    cur = pick([
        ("single", None, "hdl64"),
        ("fused", {"fps": 5.0}, "hdl64"),
    ])
    assert cur == ("fused", 5.0, "hdl64")
