"""Attestation-ledger computation (OPERATORS.md ground truth).

Extracted from scratch/gen_operators_md.py in round 14 so that the
test suite can recompute the ledger's "code since" column instead of
trusting the committed file. The round-13 miss this closes: the
committed OPERATORS.md flagged q_ppl_buckets "clean" because the
generator had been run from a tree state BEFORE commit f46c537 edited
the query — the generator itself was correct, but nothing re-checked
the committed column against the settled tree. With the computation
importable, tests/test_operators_ledger.py::test_code_since_flags_match_tree
recomputes every flag from git at test time (skipping only in
checkouts without history) and fails on any drift.

Definitions (unchanged from the generator's original contract):

- "last attested": newest round whose CORRECTNESS_r0N.json records the
  query fully green (rows+schema, +hash when oracle-paired).
- "code since": FUNCTION-level comparison — the query's decorated
  source segment (decorator incl. oracle SQL + function body) at the
  commit that added that round's CORRECTNESS file vs HEAD, whitespace-
  normalized, PLUS every transitive repo-local callee (plans/deps.py).
  "clean" = attested code is shipped code; "changed" = must re-attest;
  "moved" = function not in its current file at the attestation commit.
"""

from __future__ import annotations

import ast
import inspect
import json
import pathlib
import subprocess

from sas_etl_spark.plans.deps import closure_sites
from sas_etl_spark.registry import QUERIES

REPO = pathlib.Path(__file__).resolve().parent.parent.parent


def load_attestations() -> tuple[dict[str, int], int]:
    """name -> newest fully-green round; also the max round seen."""
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


def git_available() -> bool:
    """True when the checkout carries usable history (the code-since
    column is git-derived; tests gate on this instead of failing in a
    history-less export)."""
    try:
        return bool(git("rev-parse", "HEAD"))
    except (OSError, FileNotFoundError):
        return False


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
    out: dict[str, str] = {}
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return out
    lines = source.splitlines()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            start = min([node.lineno] + [d.lineno for d in node.decorator_list])
            seg = "\n".join(lines[start - 1 : node.end_lineno])
            out[node.name] = " ".join(seg.split())
    return out


_SEGMENT_CACHE: dict[tuple[str, str], dict[str, str]] = {}


def segments_at(commit: str, path: str) -> dict[str, str]:
    key = (commit, path)
    if key not in _SEGMENT_CACHE:
        _SEGMENT_CACHE[key] = function_segments(git("show", f"{commit}:{path}"))
    return _SEGMENT_CACHE[key]


def code_since(spec, base_commit: str | None, head: str = "HEAD") -> str:
    """'clean' / 'changed' / 'changed (helper X)' / 'moved' for one
    query spec relative to its attestation commit."""
    if base_commit is None:
        return "moved"
    f = defining_file(spec)
    fname = spec.fn.__name__
    then = segments_at(base_commit, f).get(fname)
    now = segments_at(head, f).get(fname)
    if then is None or now is None:
        return "moved"
    if then != now:
        return "changed"
    # The query's own segment is clean — diff its transitive repo-local
    # callees too (VERDICT r8 item 3: a helper edit slipped past the
    # function-only diff, silently staling 8 q_stream_* attestations).
    for dep_f, dep_name in sorted(closure_sites(spec.fn)):
        d_then = segments_at(base_commit, dep_f).get(dep_name)
        d_now = segments_at(head, dep_f).get(dep_name)
        if d_now is None:
            continue  # nested/dynamic def; not diffable
        if d_then != d_now:
            return f"changed (helper {dep_name})"
    return "clean"


def compute_rows() -> tuple[list[dict], int]:
    """One dict per registered query (sorted by name):
    {name, verification, attested_round (int|None), code_since (str|None)}.
    Requires git history for the code_since field; callers in
    history-less checkouts should gate on git_available()."""
    newest, max_round = load_attestations()
    round_commit = {
        rnd: adding_commit(f"CORRECTNESS_r{rnd:02d}.json")
        for rnd in sorted(set(newest.values()))
    }
    rows: list[dict] = []
    for name, spec in sorted(QUERIES.items()):
        rnd = newest.get(name)
        rows.append(
            {
                "name": name,
                "verification": "oracle" if spec.oracle else "rows-only",
                "attested_round": rnd,
                "code_since": None
                if rnd is None
                else code_since(spec, round_commit.get(rnd)),
                "tags": spec.tags,
                "doc_first": (spec.doc or "").split("\n")[0].strip().rstrip("."),
            }
        )
    return rows, max_round
