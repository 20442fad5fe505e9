"""Generate OPERATORS.md — registry cross-reference + attestation ledger.

VERDICT r6 item 5: the driver-window bookkeeping used to live in
hand-maintained registry comments (round 2 burned an attestation slot
to exactly that drift). This generator derives it from ground truth
instead:

- "last attested": newest round whose CORRECTNESS_r0N.json records the
  query fully green (rows+schema, +hash when oracle-paired). Recomputed
  by tests/test_operators_ledger.py straight from the JSON files — the
  committed OPERATORS.md must match, so a new driver round forces a
  regeneration instead of silent drift (one-round grace, see test).
- "code since": FUNCTION-level comparison — the query's decorated
  source segment (decorator incl. oracle SQL + function body) at the
  commit that added that round's CORRECTNESS file vs HEAD,
  whitespace-normalized. "clean" = the attested code is the shipped
  code; "changed" = the query (or its oracle) was edited since ->
  must re-attest; "moved" = the function wasn't in its current file
  at the attestation commit (file-level fallback).

Run: python scratch/gen_operators_md.py  (from anywhere; writes
/root/repo/OPERATORS.md).
"""
import json
import pathlib
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import inspect

from sas_etl_spark.plans.deps import closure_sites
from sas_etl_spark.registry import QUERIES, queries_map

REPO = pathlib.Path("/root/repo")
queries_map()


def load_attestations():
    """name -> newest fully-green round; also returns the max round seen."""
    newest: dict[str, int] = {}
    max_round = 0
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        max_round = max(max_round, rnd)
        data = json.loads(f.read_text())
        for name, rec in data.items():
            if name not in QUERIES:
                continue  # renamed/retired queries keep no ledger row
            need_hash = QUERIES[name].oracle is not None
            green = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and (rec.get("hash_match") or not need_hash)
                and not rec.get("err")
            )
            if green and rnd >= newest.get(name, 0):
                newest[name] = rnd
    return newest, max_round


def git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args], capture_output=True, text=True
    ).stdout.strip()


def adding_commit(path: str) -> str | None:
    """Newest commit that ADDED exactly this path. No --follow: rename
    detection would chain CORRECTNESS_r0N.json back to r0(N-1) (the
    files are similar small JSON) and date the attestation a whole
    round early."""
    out = git("log", "--diff-filter=A", "--format=%H", "--", path)
    return out.splitlines()[0] if out else None


def defining_file(spec) -> str:
    src = inspect.getsourcefile(spec.fn)
    return str(pathlib.Path(src).relative_to(REPO)) if src else "?"


def function_segments(source: str) -> dict[str, str]:
    """name -> whitespace-normalized source of each top-level function
    OR class, INCLUDING decorators (the @query(...) call carries the
    oracle SQL, so an oracle edit counts as a code change; classes are
    whole-body so helper dataclasses/operators diff too)."""
    import ast

    out: dict[str, str] = {}
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return out
    lines = source.splitlines()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            start = min(
                [node.lineno] + [d.lineno for d in node.decorator_list]
            )
            seg = "\n".join(lines[start - 1 : node.end_lineno])
            out[node.name] = " ".join(seg.split())
    return out


_SEGMENT_CACHE: dict[tuple[str, str], dict[str, str]] = {}


def segments_at(commit: str, path: str) -> dict[str, str]:
    key = (commit, path)
    if key not in _SEGMENT_CACHE:
        _SEGMENT_CACHE[key] = function_segments(git("show", f"{commit}:{path}"))
    return _SEGMENT_CACHE[key]


def main() -> None:
    newest, max_round = load_attestations()
    round_commit = {
        rnd: adding_commit(f"CORRECTNESS_r{rnd:02d}.json")
        for rnd in sorted({r for r in newest.values()})
    }
    lines = [
        "# OPERATORS — registry cross-reference + attestation ledger",
        "",
        "Generated from `sas_etl_spark.registry` and the driver's",
        "`CORRECTNESS_r*.json` artifacts by scratch/gen_operators_md.py —",
        "REGENERATE after every driver round (tests/test_operators_ledger.py",
        "fails on drift).",
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
    n_green = n_never = n_touched = 0
    for name, spec in sorted(QUERIES.items()):
        first = (spec.doc or "").split("\n")[0].strip().rstrip(".")
        ver = "oracle" if spec.oracle else "rows-only"
        rnd = newest.get(name)
        if rnd is None:
            attested, since = "never", "—"
            n_never += 1
        else:
            attested = f"r{rnd}"
            base = round_commit.get(rnd)
            f = defining_file(spec)
            fname = spec.fn.__name__
            if base is None:
                since = "moved"
            else:
                then = segments_at(base, f).get(fname)
                now = segments_at("HEAD", f).get(fname)
                if then is None or now is None:
                    since = "moved"
                elif then != now:
                    since = "changed"
                else:
                    # The query's own segment is clean — diff its
                    # transitive repo-local callees too (VERDICT r8
                    # item 3: the r8 stream_events helper edit slipped
                    # past the function-only diff, silently staling 8
                    # q_stream_* attestations).
                    since = "clean"
                    for dep_f, dep_name in sorted(closure_sites(spec.fn)):
                        d_then = segments_at(base, dep_f).get(dep_name)
                        d_now = segments_at("HEAD", dep_f).get(dep_name)
                        if d_now is None:
                            continue  # nested/dynamic def; not diffable
                        if d_then != d_now:
                            since = f"changed (helper {dep_name})"
                            break
            n_green += 1
            n_touched += since != "clean"
        lines.append(
            f"| `{name}` | {ver} | {attested} | {since} | "
            f"{', '.join(spec.tags)} | {first} |"
        )
    lines += [
        "",
        f"Totals: {sum(1 for s in QUERIES.values() if s.oracle)} oracle-paired, "
        f"{sum(1 for s in QUERIES.values() if not s.oracle)} rows-only; "
        f"{n_green} driver-attested ({n_touched} changed/moved since their "
        f"attestation), {n_never} never driver-windowed.",
        "",
    ]
    (REPO / "OPERATORS.md").write_text("\n".join(lines))
    print(
        f"wrote {len(QUERIES)} entries: {n_green} attested, "
        f"{n_never} never, {n_touched} changed/moved, through r{max_round}"
    )


if __name__ == "__main__":
    main()
