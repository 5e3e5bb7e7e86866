"""Format gate (reference parity: .pre-commit-config.yaml; see tools/lint.py
for why the enforcement is a stdlib script in this environment)."""
import subprocess
import sys
import os


def test_tree_is_lint_clean():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "lint.py")],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, f"lint failures:\n{res.stdout}{res.stderr}"
