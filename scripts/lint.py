"""Minimal AST lint gate — the CI lint-leg analog (VERDICT r4: "no lint gate").

No third-party linter exists in this environment, so this checks the small
set of defect classes that have actually bitten this codebase, with zero
false-positive tolerance (a lint that cries wolf gets deleted from check.sh):

  * unused imports (dead seams left behind by refactors)
  * bare `except:` (swallows KeyboardInterrupt/SystemExit; every intentional
    broad handler here spells `except Exception`)
  * `== None` / `!= None` comparisons (want `is`)
  * mutable default arguments (list/dict/set literals)

Exit 1 with file:line diagnostics on any hit.  Scope: the package + the live
entry points; tests and one-off scripts are exempt (they legitimately import
for side effects and re-import under different configs).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCOPE = [REPO / "bulletproofs_plus_tpu", REPO / "bench.py", REPO / "__graft_entry__.py"]

# Imports whose *side effects* are the point (re-export wiring, plugin hooks).
SIDE_EFFECT_OK = {"__init__.py"}


def _names_loaded(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # collect the root name of dotted uses: jax.numpy -> jax
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    # names referenced inside string annotations / docstring doctests are rare
    # here; __all__ strings count as uses (re-export)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                            used.add(elt.value)
    return used


def lint_file(path: Path) -> list:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:  # byte-compile step catches these too
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]
    problems = []
    used = _names_loaded(tree)

    if path.name not in SIDE_EFFECT_OK:
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    name = alias.asname or alias.name.split(".")[0]
                    if name not in used:
                        problems.append(f"{path}:{node.lineno}: unused import '{name}'")
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    name = alias.asname or alias.name
                    if name not in used:
                        problems.append(f"{path}:{node.lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")
        if isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                    isinstance(comp, ast.Constant) and comp.value is None
                ):
                    problems.append(f"{path}:{node.lineno}: '== None' (use 'is')")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{node.lineno}: mutable default argument in '{node.name}'"
                    )
    return problems


def main() -> int:
    files = []
    for root in SCOPE:
        if root.is_file():
            files.append(root)
        else:
            files.extend(sorted(root.rglob("*.py")))
    all_problems = []
    for f in files:
        all_problems.extend(lint_file(f))
    for p in all_problems:
        print(p)
    print(f"lint: {len(files)} files, {len(all_problems)} problems")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
