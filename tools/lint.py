"""Zero-dependency format gate (the always-runnable subset of
.pre-commit-config.yaml, which needs network access to install hook repos).

Checks every tracked .py file for:
  - syntax validity (check-ast)
  - leftover debug statements (debug-statements: breakpoint/pdb)
  - trailing whitespace (trailing-whitespace)
  - missing/extra newline at EOF (end-of-file-fixer)
  - tab indentation

Run: python tools/lint.py   (exit 0 = clean). Enforced by tests/test_lint.py.
"""
from __future__ import annotations

import ast
import os
import sys

SKIP_DIRS = {".git", "__pycache__", ".claude", "results", "assets", "notebooks"}
DEBUG_CALLS = ("breakpoint" "(", "pdb.set_trace" "(", "ipdb.set_trace" "(")


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def python_files(root: str) -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        # skip hidden dirs too (scratch worktrees, editor/cache dirs)
        dirnames[:] = [
            d for d in dirnames if d not in SKIP_DIRS and not d.startswith(".")
        ]
        out.extend(
            os.path.join(dirpath, f) for f in filenames if f.endswith(".py")
        )
    return sorted(out)


def check_file(path: str) -> list[str]:
    problems = []
    with open(path, "rb") as f:
        raw = f.read()
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError as e:
        return [f"not utf-8: {e}"]
    try:
        ast.parse(text, filename=path)
    except SyntaxError as e:
        problems.append(f"syntax error: line {e.lineno}: {e.msg}")
    lines = text.split("\n")
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            problems.append(f"line {i}: trailing whitespace")
        stripped = line.strip()
        # statement-position only (like the AST-based pre-commit hook): a
        # substring match would flag string literals / comments that merely
        # mention the calls
        if any(stripped.startswith(c) for c in DEBUG_CALLS) or stripped in (
            "import pdb", "import ipdb"
        ):
            problems.append(f"line {i}: debug statement")
        if line.startswith("\t"):
            problems.append(f"line {i}: tab indentation")
    if raw and not raw.endswith(b"\n"):
        problems.append("no newline at end of file")
    if raw.endswith(b"\n\n"):
        problems.append("multiple trailing newlines")
    return problems


def main() -> int:
    root = repo_root()
    failed = False
    for path in python_files(root):
        rel = os.path.relpath(path, root)
        for p in check_file(path):
            print(f"{rel}: {p}")
            failed = True
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
