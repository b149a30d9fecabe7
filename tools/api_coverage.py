"""API-surface coverage gate.

The reference CI enforces line coverage >= 80%
(/root/reference/.github/workflows/testing.yml:63). Neither pytest-cov
nor coverage.py is installed in this environment (and installs are
disallowed), so the enforceable analog is SURFACE coverage: every
public function of every metevents_spark module must be exercised —
referenced from the query registry, the tests, the bench, the entry
module, or another covered module. Dead public API fails the gate.

Usage: python tools/api_coverage.py  (exit 1 on uncovered surface)
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "metevents_spark")

# corpus that counts as "exercising" a name
CORPUS_DIRS = [os.path.join(REPO, "tests"), os.path.join(REPO, "examples"), PKG]
CORPUS_FILES = [
    os.path.join(REPO, "bench.py"),
    os.path.join(REPO, "__spark_entry__.py"),
    os.path.join(REPO, "tools", "check_oracle.py"),
    os.path.join(REPO, "tools", "scale_smoke.py"),
]


def public_functions() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py") or f == "__init__.py":
                continue
            path = os.path.join(root, f)
            tree = ast.parse(open(path).read())
            names = [
                n.name
                for n in tree.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
                and not n.name.startswith("_")
            ]
            if names:
                out[os.path.relpath(path, REPO)] = names
    return out


def corpus_text() -> dict[str, str]:
    texts: dict[str, str] = {}
    for d in CORPUS_DIRS:
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    texts[p] = open(p).read()
    for p in CORPUS_FILES:
        if os.path.exists(p):
            texts[p] = open(p).read()
    return texts


def main() -> int:
    texts = corpus_text()
    missing: list[str] = []
    total = 0
    for mod, names in sorted(public_functions().items()):
        for name in names:
            total += 1
            # a name is exercised when it is referenced anywhere beyond
            # its own `def`/`class` line — registry dicts in the same
            # module count (that IS the exercise path for q_* wrappers)
            occurrences = sum(text.count(name) for text in texts.values())
            if occurrences <= 1:
                missing.append(f"{mod}: {name}")
    covered = total - len(missing)
    print(f"public surface: {covered}/{total} exercised "
          f"({100.0 * covered / total:.1f}%)")
    if missing:
        print("UNCOVERED:")
        for m in missing:
            print(f"  {m}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
