"""Pins every hand-written registry headline count to the registry.

Rounds 7 and 8 both shipped docs whose "N registered queries" headline
lagged the tree (SCALE.md said 209 while 216 were registered; the
project memory copied the stale number). One source of truth =
``len(queries_map())``; any doc that states a count must state THAT
count. The docs reference the number with the literal marker
``<N> queries, ALL <N> oracle-paired`` (README) / ``**<N> registered
queries, <N>/<N> oracle-paired**`` (SCALE.md newest closing section),
so registering a query without bumping the docs fails here, in the
same suite run the registration rule already requires.
"""

from __future__ import annotations

import pathlib
import re

from sas_etl_spark import registry

REPO = pathlib.Path(__file__).resolve().parent.parent


def _registry_count() -> int:
    registry._load_all()
    return len(registry.QUERIES)


def test_readme_headline_count_matches_registry() -> None:
    n = _registry_count()
    text = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) queries, ALL (\d+)\s+oracle-paired", text)
    assert m, "README.md lost its queries-count headline marker"
    assert m.group(1) == m.group(2) == str(n), (
        f"README.md says {m.group(1)}/{m.group(2)} but registry has {n}"
    )


def test_scale_md_newest_closing_count_matches_registry() -> None:
    """Only the NEWEST closing-state section must track the registry;
    older sections are historical records of their own rounds."""
    n = _registry_count()
    text = (REPO / "SCALE.md").read_text()
    counts = re.findall(
        r"\*\*(\d+) registered queries, (\d+)/(\d+) oracle-paired",
        text,
    )
    assert counts, "SCALE.md lost its registered-queries headline marker"
    # Sections appear newest-round-last is not guaranteed; the newest
    # claim is the LARGEST (the registry only grows).
    newest = max(int(a) for a, _, _ in counts)
    assert newest == n, f"SCALE.md newest headline says {newest}, registry has {n}"


def test_operators_ledger_count_matches_registry() -> None:
    n = _registry_count()
    text = (REPO / "OPERATORS.md").read_text()
    rows = len(re.findall(r"^\| `q_", text, flags=re.M))
    assert rows == n, f"OPERATORS.md has {rows} query rows, registry has {n}"
