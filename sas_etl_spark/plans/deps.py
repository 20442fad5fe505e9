"""Static repo-local callee closure for the attestation ledger.

Round 8 exposed a blind spot: the OPERATORS.md "code since" column
diffed only the decorated query function (+ its oracle SQL) between
the attestation commit and HEAD, so an edit to a SHARED HELPER — the
round-8 directory-layout fix to ``streaming/builders.stream_events`` —
left all 8 dependent ``q_stream_*`` rows reading "clean" while their
green rows attested code that no longer runs. This module computes,
for any query function, the transitive closure of repo-local functions
and classes it references, so the ledger can diff the helpers too.

Resolution is runtime-assisted static analysis: parse the function's
source, collect every referenced name / dotted attribute chain /
function-local import, resolve each against the live module namespace,
and keep objects whose ``__module__`` is inside ``sas_etl_spark``.
That catches module-top imports, ``from x import y`` inside function
bodies, helpers passed as callbacks (bare-name references count, not
just call sites), and ``module.attr`` chains. Out of scope (by
design, documented): module-level CONSTANTS — every registered oracle
bakes constants into its SQL f-string, so a constant edit already
flips the query's own segment.
"""

from __future__ import annotations

import ast
import importlib
import inspect
import sys
import textwrap

_PKG = "sas_etl_spark"


def _source_tree(obj) -> ast.AST | None:
    try:
        src = textwrap.dedent(inspect.getsource(obj))
        return ast.parse(src)
    except (OSError, TypeError, SyntaxError, IndentationError):
        return None


def _referenced_names(tree: ast.AST) -> tuple[set[str], set[tuple[str, ...]], list]:
    """All bare names, dotted attribute chains rooted at a name, and
    import statements appearing anywhere in the function body."""
    names: set[str] = set()
    chains: set[tuple[str, ...]] = set()
    imports: list = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            chain: list[str] = []
            cur: ast.expr = node
            while isinstance(cur, ast.Attribute):
                chain.append(cur.attr)
                cur = cur.value
            if isinstance(cur, ast.Name):
                chain.append(cur.id)
                chains.add(tuple(reversed(chain)))
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(node)
    return names, chains, imports


def _local_import_bindings(imports: list) -> dict[str, object]:
    """Resolve ``import x``/``from x import y`` found INSIDE a function
    body (module-top imports are already in the module namespace)."""
    bound: dict[str, object] = {}
    for node in imports:
        try:
            if isinstance(node, ast.ImportFrom) and node.module:
                if not node.module.startswith(_PKG):
                    continue
                mod = importlib.import_module(node.module)
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    obj = getattr(mod, alias.name, None)
                    if obj is not None:
                        bound[alias.asname or alias.name] = obj
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if not alias.name.startswith(_PKG):
                        continue
                    leaf = importlib.import_module(alias.name)
                    if alias.asname:
                        # ``import a.b.c as m`` binds m to the LEAF module.
                        bound[alias.asname] = leaf
                    else:
                        # ``import a.b.c`` binds only the ROOT package name
                        # (Python semantics). Binding the leaf under the
                        # root name would make ``a.b.c.helper`` chains
                        # resolve attributes against the wrong module and
                        # silently drop the callee from the closure.
                        root = alias.name.split(".")[0]
                        bound[root] = sys.modules[root]
        except ImportError:
            continue
    return bound


def _is_repo_def(obj) -> bool:
    obj = inspect.unwrap(obj) if callable(obj) else obj
    mod = getattr(obj, "__module__", "") or ""
    return (inspect.isfunction(obj) or inspect.isclass(obj)) and mod.startswith(
        _PKG
    )


def _site(obj) -> tuple[str, str] | None:
    """(defining module name, object name) — the ledger's diff key."""
    obj = inspect.unwrap(obj)
    mod = getattr(obj, "__module__", None)
    name = getattr(obj, "__name__", None)
    if not mod or not name:
        return None
    return (mod, name)


def callee_closure(fn) -> dict[tuple[str, str], object]:
    """Transitive repo-local functions/classes reachable from ``fn``'s
    source by name. Keys are (module, name); values the live objects.
    ``fn`` itself is excluded."""
    out: dict[tuple[str, str], object] = {}
    stack = [fn]
    seen: set[tuple[str, str]] = set()
    root = _site(fn)
    if root:
        seen.add(root)
    while stack:
        cur = stack.pop()
        tree = _source_tree(inspect.unwrap(cur))
        if tree is None:
            continue
        names, chains, imports = _referenced_names(tree)
        ns: dict[str, object] = {}
        mod = sys.modules.get(getattr(inspect.unwrap(cur), "__module__", ""), None)
        if mod is not None:
            ns.update(vars(mod))
        ns.update(_local_import_bindings(imports))

        candidates: list[object] = []
        for n in names:
            if n in ns:
                candidates.append(ns[n])
        for chain in chains:
            obj = ns.get(chain[0])
            for attr in chain[1:]:
                if obj is None:
                    break
                obj = getattr(obj, attr, None)
            if obj is not None:
                candidates.append(obj)

        for obj in candidates:
            if not callable(obj) and not inspect.isclass(obj):
                continue
            if not _is_repo_def(obj):
                continue
            site = _site(obj)
            if site is None or site in seen:
                continue
            seen.add(site)
            out[site] = inspect.unwrap(obj)
            stack.append(obj)
    return out


def closure_sites(fn) -> set[tuple[str, str]]:
    """(repo-relative posix path, object name) for each closure member
    — the unit the ledger generator diffs between commits."""
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[2]
    sites: set[tuple[str, str]] = set()
    for (modname, name), obj in callee_closure(fn).items():
        try:
            f = inspect.getsourcefile(obj)
        except TypeError:
            f = None
        if not f:
            continue
        try:
            rel = pathlib.Path(f).resolve().relative_to(repo).as_posix()
        except ValueError:
            continue
        sites.add((rel, name))
    return sites
