"""Static hygiene enforced in-repo (the reference's CI runs `ty check` +
`ruff check`; this environment is offline, so the pyflakes-critical subset is
checked here with ast — CI runs the real tools, configured in pyproject.toml).
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SOURCE_DIRS = ["multimodal_timesfm_tpu", "examples", "scripts"]
EXTRA_FILES = ["bench.py", "__graft_entry__.py"]


def _source_files() -> list[Path]:
    files = [REPO / f for f in EXTRA_FILES]
    for d in SOURCE_DIRS:
        files.extend(sorted((REPO / d).rglob("*.py")))
    return [f for f in files if f.exists()]


def test_py_typed_marker_ships():
    """PEP 561 marker, matching the reference's src/tsfmx/py.typed."""
    assert (REPO / "multimodal_timesfm_tpu" / "py.typed").exists()


def _names_used(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the root name of dotted access (handled via ast.Name too,
            # but keep attribute roots for `import a.b` usage as `a.b.c`)
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    # names referenced in string annotations / __all__ exports
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)
    return used


def _unused_imports(path: Path) -> list[str]:
    tree = ast.parse(path.read_text(), filename=str(path))
    used = _names_used(tree)
    problems = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = alias.asname or alias.name.split(".")[0]
                if name not in used:
                    problems.append(f"{path.relative_to(REPO)}:{node.lineno} unused import {name}")
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = alias.asname or alias.name
                if name not in used:
                    problems.append(f"{path.relative_to(REPO)}:{node.lineno} unused import {name}")
    return problems


def test_no_unused_imports():
    """Pyflakes F401 equivalent over all source trees.

    ``__init__.py`` re-exports are exempt (they exist to be imported from).
    """
    problems = []
    for f in _source_files():
        if f.name == "__init__.py":
            continue
        problems.extend(_unused_imports(f))
    assert not problems, "\n".join(problems)


def test_no_trailing_whitespace_or_tabs():
    """Ruff W291/W293/W191 equivalent."""
    problems = []
    for f in _source_files():
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if line != line.rstrip():
                problems.append(f"{f.relative_to(REPO)}:{i} trailing whitespace")
            if "\t" in line:
                problems.append(f"{f.relative_to(REPO)}:{i} tab indentation")
    assert not problems, "\n".join(problems)


def test_package_annotation_coverage():
    """Every top-level function/method in the package is fully annotated.

    Keeps the package at the annotation coverage `ty check` (blocking in CI,
    matching the reference's everything-is-an-error posture —
    /root/reference/pyproject.toml:87-88) needs; nested closures are exempt
    (ty infers those). Offline proxy only — CI runs the real checker.
    """

    def walk_top(tree: ast.AST):
        def rec(node: ast.AST, inside: bool):
            for child in ast.iter_child_nodes(node):
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    yield child, inside
                    yield from rec(child, True)
                else:
                    yield from rec(child, inside)

        yield from rec(tree, False)

    problems = []
    for f in sorted((REPO / "multimodal_timesfm_tpu").rglob("*.py")):
        tree = ast.parse(f.read_text(), filename=str(f))
        for node, nested in walk_top(tree):
            if nested:
                continue
            args = node.args
            allargs = args.posonlyargs + args.args + args.kwonlyargs
            missing = [
                a.arg
                for a in allargs
                if a.annotation is None and a.arg not in ("self", "cls")
            ]
            if args.vararg is not None and args.vararg.annotation is None:
                missing.append("*" + args.vararg.arg)
            if args.kwarg is not None and args.kwarg.annotation is None:
                missing.append("**" + args.kwarg.arg)
            if node.returns is None:
                missing.append("<return>")
            if missing:
                problems.append(
                    f"{f.relative_to(REPO)}:{node.lineno} {node.name}: {', '.join(missing)}"
                )
    assert not problems, "unannotated:\n" + "\n".join(problems)


def test_sources_compile_with_no_syntax_warnings():
    """Ruff E9/W605 equivalent: every source file parses and compiles clean."""
    import warnings

    for f in _source_files():
        with warnings.catch_warnings():
            warnings.simplefilter("error", SyntaxWarning)
            compile(f.read_text(), str(f), "exec")
