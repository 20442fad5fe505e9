"""Generate OPERATORS.md — registry cross-reference + attestation ledger.

VERDICT r6 item 5: the driver-window bookkeeping used to live in
hand-maintained registry comments (round 2 burned an attestation slot
to exactly that drift). This generator derives it from ground truth;
since round 14 the computation lives in sas_etl_spark/plans/ledger.py
so tests/test_operators_ledger.py recomputes the "code since" column
from git at test time instead of trusting this file's output (the
round-13 lesson: a regeneration run from a pre-edit tree state left
q_ppl_buckets flagged "clean" after its oracle changed, and nothing
re-checked the committed column).

Run: python scratch/gen_operators_md.py  (from anywhere; writes
/root/repo/OPERATORS.md). Regenerate after every driver round AND
after any commit that edits registered query code.
"""
import sys

sys.path.insert(0, "/root/repo")

from sas_etl_spark.registry import DRIVER_PRIORITY, QUERIES, queries_map

queries_map()

from sas_etl_spark.plans import ledger  # noqa: E402  (needs registry loaded)

#: Driver attestation cap (tests/test_registry_order.py WINDOW).
_WINDOW = 50


def main() -> None:
    rows, max_round = ledger.compute_rows()
    window = set(DRIVER_PRIORITY[:_WINDOW])
    lines = [
        "# OPERATORS — registry cross-reference + attestation ledger",
        "",
        "Generated from `sas_etl_spark.registry` and the driver's",
        "`CORRECTNESS_r*.json` artifacts by scratch/gen_operators_md.py —",
        "REGENERATE after every driver round and after any commit touching",
        "registered query code (tests/test_operators_ledger.py fails on",
        "either kind of drift).",
        "",
        f"Ledger generated through round {max_round}.",
        "",
        "Verification: **oracle** = hash-compared against DuckDB SQL at",
        "sf0.01 by the driver AND tests/test_oracle_parity.py; **rows-only**",
        "= driver records rowcount/schema, semantics pinned by unit tests.",
        "Last attested: newest driver round with a fully green row (never =",
        "locally parity-proven, awaiting a driver window slot). Code since:",
        "function-level diff of the decorated source (incl. oracle SQL)",
        "AND of every transitive repo-local callee (plans/deps.py; added",
        "after a round-8 helper edit slipped past the function-only diff)",
        "between the attestation commit and HEAD — changed/moved rows",
        "belong in the next driver window.",
        "",
        "| query | verification | last attested | code since | tags | what it proves |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    n_touched = 0
    for r in rows:
        rnd = r["attested_round"]
        # Round-boundary race tolerance (VERDICT r15 item 4): a query
        # registered this round has no artifact yet by construction —
        # when it holds a slot in the CURRENT window plan, say so
        # instead of printing a bare "never" that reads as forgotten.
        if rnd is None and r["name"] in window:
            attested = f"pending r{max_round + 1} (windowed)"
        else:
            attested = "never" if rnd is None else f"r{rnd}"
        since = r["code_since"] or "—"
        n_touched += since not in ("clean", "—")
        lines.append(
            f"| `{r['name']}` | {r['verification']} | {attested} | {since} | "
            f"{', '.join(r['tags'])} | {r['doc_first']} |"
        )
    # Totals deliberately cover only registry-derived counts: attested /
    # never-windowed counts go stale by construction the moment the next
    # driver round lands (the recurring r12/r13 structural race, VERDICT
    # r13 item 6) — attestation state is authoritative per-row only.
    lines += [
        "",
        f"Totals: {sum(1 for s in QUERIES.values() if s.oracle)} oracle-paired, "
        f"{sum(1 for s in QUERIES.values() if not s.oracle)} rows-only; "
        f"{n_touched} changed/moved since their attestation. Per-row",
        "attestation rounds above are authoritative as of the generation",
        "round in the header; aggregate attested/never counts are omitted",
        "because they stale the moment a new driver round lands.",
        "",
    ]
    ledger.REPO.joinpath("OPERATORS.md").write_text("\n".join(lines))
    print(
        f"wrote {len(rows)} entries, {n_touched} changed/moved, "
        f"through r{max_round}"
    )


if __name__ == "__main__":
    main()
