"""The attestation ledger must see THROUGH query functions into their
helpers (VERDICT r8 item 3): round 8 edited the shared streaming source
builder ``streaming/builders.stream_events`` and the function-only
ledger diff left all dependent ``q_stream_*`` rows reading "clean"
while their green rows attested code that no longer runs. The closure
walker in plans/deps.py closes that hole; these tests pin it.
"""

from __future__ import annotations

import pathlib

from sas_etl_spark import registry
from sas_etl_spark.plans.deps import callee_closure, closure_sites

registry._load_all()
REPO = pathlib.Path(__file__).resolve().parent.parent


def _sites(qname: str) -> set[tuple[str, str]]:
    return closure_sites(registry.QUERIES[qname].fn)


def test_stream_queries_depend_on_shared_source_builder() -> None:
    """The exact round-8 blind spot: every stream query that sources
    through the shared builder must list it in its closure, so a
    builders.py edit flags those rows for re-attestation."""
    dependents = [
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
        "q_stream_dedup", "q_stream_join", "q_stream_stateful_totals",
        "q_stream_exactly_once_sink",
    ]
    for q in dependents:
        assert ("sas_etl_spark/streaming/builders.py", "stream_events") in _sites(
            q
        ), f"{q} closure misses stream_events"


def test_closure_reaches_function_local_imports() -> None:
    """Helpers imported INSIDE the query body (the repo's common
    style) must resolve too."""
    assert (
        "sas_etl_spark/operators/quantiles.py",
        "exact_percentiles_hist",
    ) in _sites("q_percentiles")
    assert ("sas_etl_spark/operators/sampling.py", "hash_bucket") in _sites(
        "q_temperature_mixture"
    )


def test_closure_reaches_universal_reader() -> None:
    """catalog.load_table is the one helper nearly every query executes
    — the round-6 timestamp reader change lived there and forced 11
    re-attests; the ledger must flag that class of edit everywhere."""
    assert ("sas_etl_spark/catalog.py", "load_table") in _sites(
        "q_pricing_summary"
    )


def test_synthetic_helper_edit_flags_dependents() -> None:
    """End-to-end on the ledger's own compare (importable from
    plans/ledger.py since the round-14 extraction): take the real
    builders.py source, apply a one-token edit inside stream_events,
    and assert the segment comparison the ledger uses reports a
    change for exactly that helper."""
    from sas_etl_spark.plans import ledger as gen

    src = (REPO / "sas_etl_spark" / "streaming" / "builders.py").read_text()
    before = gen.function_segments(src)
    assert "stream_events" in before

    # a one-token body edit inside stream_events (keeps the file
    # parseable; the segment is whitespace-normalized so only real
    # token changes count). '"events"' appears only in stream_events'
    # body — the shared machinery lives in stream_table since round 9.
    edited = src.replace('"events"', '"eventsX"', 1)
    after = gen.function_segments(edited)
    assert after["stream_events"] != before["stream_events"]
    # and an untouched sibling stays clean
    untouched = [k for k in before if k != "stream_events"]
    for k in untouched:
        assert after.get(k) == before[k]

    # the dependents the window rule would then re-attest:
    flagged = [
        q
        for q in registry.QUERIES
        if ("sas_etl_spark/streaming/builders.py", "stream_events")
        in closure_sites(registry.QUERIES[q].fn)
    ]
    assert set(flagged) >= {
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
        "q_stream_dedup", "q_stream_join", "q_stream_exactly_once_sink",
    }


def _plain_import_style_fn():
    # Deliberately uses `import pkg.sub.mod` + full dotted chains — the
    # style the repo avoids but the closure walker must still resolve.
    import sas_etl_spark.operators.quantiles

    return sas_etl_spark.operators.quantiles.exact_percentiles_hist


def test_closure_resolves_plain_dotted_imports() -> None:
    """ADVICE r9: ``import a.b.c`` binds the ROOT package name in real
    Python; binding the leaf module under the root name made chains
    like ``a.b.c.helper`` resolve against the wrong namespace and
    silently drop the callee — the exact silent-staleness class this
    module exists to close."""
    sites = closure_sites(_plain_import_style_fn)
    assert (
        "sas_etl_spark/operators/quantiles.py",
        "exact_percentiles_hist",
    ) in sites


def test_closure_excludes_self_and_externals() -> None:
    fn = registry.QUERIES["q_pricing_summary"].fn
    clo = callee_closure(fn)
    assert all(mod.startswith("sas_etl_spark") for mod, _ in clo)
    assert (fn.__module__, fn.__name__) not in clo
