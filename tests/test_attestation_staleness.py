"""Codify the re-attestation cadence as a suite invariant (VERDICT r13
item 5): the 6-round rotation used to live in registry prose and
slipped two rows in round 13 unnoticed by any check. These tests
recompute attestation staleness straight from the CORRECTNESS_r*.json
artifacts and fail any DRIVER_PRIORITY window that misses its debt.

Round anchoring: staleness is evaluated against
test_registry_order.WINDOW_ROUND (the round the current window
encodes), consulting only artifacts from STRICTLY EARLIER rounds —
the same self-destruct guard as the window tests: when the driver
drops this window's own CORRECTNESS file at the round boundary, the
evaluation is unchanged. A window left stale for a FOLLOWING round
fails via the freshness assertion (artifacts more than one round
ahead of WINDOW_ROUND force a recomposition, mirroring the ledger's
one-round grace).

Slips: a due row may be displaced for exactly one round ONLY by a
registry.DOCUMENTED_SLIPS entry naming it and the round; the entry
expires with the round (an overdue row must be in the next window
unconditionally — that is what makes the r13-style trade governed
instead of lore).
"""

from __future__ import annotations

import json
import pathlib
import re

from sas_etl_spark import registry
from tests.test_registry_order import WINDOW, WINDOW_ROUND

REPO = pathlib.Path(__file__).resolve().parent.parent


def _newest_attestation_before(round_n: int) -> tuple[dict[str, int], int]:
    """name -> newest fully-green round among artifacts < round_n,
    plus the max artifact round seen overall (any round)."""
    registry._load_all()
    newest: dict[str, int] = {}
    max_seen = 0
    for f in REPO.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        max_seen = max(max_seen, rnd)
        if rnd >= round_n:
            continue
        for name, rec in json.loads(f.read_text()).items():
            if name not in registry.QUERIES:
                continue
            need_hash = registry.QUERIES[name].oracle is not None
            green = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and (rec.get("hash_match") or not need_hash)
                and not rec.get("err")
            )
            if green and rnd >= newest.get(name, 0):
                newest[name] = rnd
    return newest, max_seen


def test_window_round_is_fresh() -> None:
    """One-round grace, then force recomposition: artifacts may reach
    WINDOW_ROUND (the driver drops this window's own results at the
    round boundary) but never beyond it."""
    _, max_seen = _newest_attestation_before(0)
    assert WINDOW_ROUND >= max_seen, (
        f"DRIVER_PRIORITY still encodes round {WINDOW_ROUND} but "
        f"CORRECTNESS artifacts reach r{max_seen} — recompose the window "
        "and bump test_registry_order.WINDOW_ROUND"
    )


def test_window_covers_attestation_debt() -> None:
    newest, _ = _newest_attestation_before(WINDOW_ROUND)
    window = set(list(registry.queries_map())[:WINDOW])
    cadence = registry.ATTEST_CADENCE

    never = [n for n in registry.QUERIES if n not in newest]
    overdue = [
        n for n, rnd in newest.items() if WINDOW_ROUND - rnd > cadence
    ]
    due = [n for n, rnd in newest.items() if WINDOW_ROUND - rnd == cadence]

    stranded_never = sorted(set(never) - window)
    assert not stranded_never, (
        f"never-attested queries outside the window: {stranded_never}"
    )
    # Overdue rows (already slipped once) tolerate NO further slip.
    stranded_overdue = sorted(set(overdue) - window)
    assert not stranded_overdue, (
        f"overdue (> {cadence} rounds stale) queries outside the window: "
        f"{stranded_overdue}"
    )
    stranded_due = sorted(
        n
        for n in due
        if n not in window and (n, WINDOW_ROUND) not in registry.DOCUMENTED_SLIPS
    )
    assert not stranded_due, (
        f"due ({cadence} rounds stale) queries neither windowed nor in "
        f"DOCUMENTED_SLIPS for round {WINDOW_ROUND}: {stranded_due}"
    )


def test_documented_slips_are_current_and_real() -> None:
    """Slip entries must name registered queries and must not outlive
    the round they excuse — a stale entry cannot silently keep
    excusing the same row."""
    registry._load_all()
    for name, rnd in registry.DOCUMENTED_SLIPS:
        assert name in registry.QUERIES, f"slip names unknown query {name}"
        assert rnd >= WINDOW_ROUND, (
            f"DOCUMENTED_SLIPS entry ({name}, r{rnd}) has expired — the row "
            f"is overdue in round {WINDOW_ROUND}'s window; remove the entry "
            "and window the query"
        )


def test_changed_rows_are_windowed() -> None:
    """Shipped-code == attested-code, enforced: every query the
    git-derived ledger computation flags changed/moved must hold a
    slot in the current window (the r13 crack — 7 changed rows were
    rationalized instead of re-attested). Skips without git history;
    skips when artifacts already reach WINDOW_ROUND (the flags then
    compare against post-attestation base commits and the NEXT
    window's recomposition owns the debt)."""
    import pytest

    from sas_etl_spark.plans import ledger

    if not ledger.git_available():
        pytest.skip("no usable git history in this checkout")
    rows, through = ledger.compute_rows()
    if through >= WINDOW_ROUND:
        pytest.skip(
            f"artifacts reach r{through}; changed-flags re-anchor after "
            "window recomposition"
        )
    window = set(list(registry.queries_map())[:WINDOW])
    changed = sorted(
        r["name"]
        for r in rows
        if r["code_since"] not in (None, "clean") and r["name"] not in window
    )
    assert not changed, (
        f"queries changed since their attestation but not in the window: "
        f"{changed}"
    )
