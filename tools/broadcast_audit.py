"""Forced-broadcast discipline audit (r12 VERDICT item 1).

Every `F.broadcast(...)` hint in upflow_spark/ is a claim that the hinted
relation is BOUNDED — a 1-row/constant aggregate, a candidate- or semi-join-
scoped set, a fixed vocab/cell/probe table — never a relation whose row count
grows with an unbounded base table (the r12 weak item: per-document totals,
one row per corpus document, force-broadcast onto the verify join).

This module AST-scans every broadcast call site and keys it as
``(file, enclosing function, arg-name-or-kind)``. The checked-in snapshot
``tools/broadcast_allowlist.json`` is the reviewed set;
``tests/test_plans.py::test_broadcast_hints_match_reviewed_allowlist`` fails
on ANY new, moved, or removed forced broadcast until the snapshot is
regenerated — which is the review gate: before running

    python tools/broadcast_audit.py --write

convince yourself the new hint's relation is bounded, and say how in the
docstring of the function that adds it. Hard denies (corpus-sized relations
that must NEVER be hinted again) are enforced separately in the same test.
"""

from __future__ import annotations

import ast
import json
import os
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "upflow_spark")
ALLOWLIST = os.path.join(ROOT, "tools", "broadcast_allowlist.json")


def broadcast_sites() -> dict[str, int]:
    """All F.broadcast call sites, keyed file::function::arg@h8, -> count.

    The arg component is the bare variable name when the hint wraps a
    name (the reviewable case), else the AST node kind (Call/Tuple/...,
    i.e. inline expressions — overwhelmingly 1-row ``.agg(...)`` builds).
    Keys deliberately exclude line numbers so unrelated edits don't churn
    the snapshot; a count change in the same function still trips it.

    ADVICE r13: a bare (file, function, name) key lets someone re-point an
    EXISTING hinted name at a different — possibly corpus-sized — relation
    without tripping the gate. The key therefore also carries ``@h8``, an
    8-hex sha256 of the unparsed RHS of every assignment to that name
    inside the same function (in source order): re-targeting a hinted
    variable changes the hash and invalidates the snapshot, forcing the
    --write review. Inline expressions hash their own unparsed source.
    """
    import hashlib

    sites: Counter[str] = Counter()
    for dirpath, _dirs, files in os.walk(SRC):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            tree = ast.parse(open(path).read())
            # map each node to its enclosing function name
            parents: dict[ast.AST, str] = {}

            def walk(node: ast.AST, fname: str) -> None:
                for child in ast.iter_child_nodes(node):
                    nf = fname
                    if isinstance(
                        child, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        nf = child.name
                    parents[child] = nf
                    walk(child, nf)

            walk(tree, "<module>")

            # (function, var-name) -> unparsed RHS sources of every
            # assignment to that name in that function, in source order —
            # the identity the @h8 suffix pins (ADVICE r13)
            assigns: dict[tuple[str, str], list[str]] = {}
            for node in ast.walk(tree):
                fname = parents.get(node, "<module>")
                targets: list[ast.expr] = []
                value: ast.expr | None = None
                if isinstance(node, ast.Assign):
                    targets, value = node.targets, node.value
                elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                    targets, value = [node.target], node.value
                elif isinstance(node, ast.NamedExpr):
                    targets, value = [node.target], node.value
                if value is None:
                    continue
                for t in targets:
                    for leaf in ast.walk(t):
                        if isinstance(leaf, ast.Name):
                            assigns.setdefault(
                                (fname, leaf.id), []
                            ).append(ast.unparse(value))

            def h8(src: str) -> str:
                return hashlib.sha256(src.encode()).hexdigest()[:8]

            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                ):
                    arg = node.args[0] if node.args else None
                    fname = parents.get(node, "<module>")
                    if isinstance(arg, ast.Name):
                        name = arg.id
                        srcs = assigns.get((fname, name), [])
                        tag = h8("\n".join(srcs)) if srcs else "param"
                    else:
                        name = type(arg).__name__
                        tag = h8(ast.unparse(arg) if arg is not None else "")
                    sites[f"{rel}::{fname}::{name}@{tag}"] += 1
    return dict(sorted(sites.items()))


def main() -> None:
    sites = broadcast_sites()
    if "--write" in sys.argv:
        with open(ALLOWLIST, "w") as f:
            json.dump(sites, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(sites)} reviewed sites to {ALLOWLIST}")
        return
    want = json.load(open(ALLOWLIST))
    new = {k: v for k, v in sites.items() if want.get(k) != v}
    gone = {k: v for k, v in want.items() if k not in sites}
    if new or gone:
        print("DRIFT vs allowlist")
        for k, v in new.items():
            print(f"  new/changed: {k} x{v}")
        for k, v in gone.items():
            print(f"  removed: {k} x{v}")
        sys.exit(1)
    print(f"ok: {len(sites)} forced-broadcast sites match the allowlist")


if __name__ == "__main__":
    main()
