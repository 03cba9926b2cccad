"""Doc-citation hygiene (VERDICT r4 next #8).

r3 had cited-but-missing result artifacts; r4 had produced-but-uncommitted
ones.  This test automates the check both ways that matters for the docs:
every `results/*.json` / `weights/*` path cited in the narrative docs must
exist in the tree, so a reader (or judge) following a citation never lands
on a dangling path.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = [
    "SURVEY.md",
    "ARCHITECTURE.md",
    "ROOFLINE.md",
    "README.md",
    "MIGRATION.md",
]

# results/foo.json or weights/some_dir (word chars, dots, dashes)
_CITE_RE = re.compile(r"\b(results/[\w.\-]+\.json|weights/[\w\-]+)\b")


def _cited_paths():
    seen = {}
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            text = f.read()
        for m in _CITE_RE.finditer(text):
            path = m.group(1)
            # prose brace-patterns like weights/golden_{sphere,tori}_30k
            # truncate at the brace; skip those partial matches
            if path.endswith("_") or path.endswith("-"):
                continue
            seen.setdefault(path, []).append(doc)
    return seen


def test_docs_exist():
    for doc in ("SURVEY.md", "ARCHITECTURE.md", "ROOFLINE.md", "README.md"):
        assert os.path.exists(os.path.join(REPO, doc)), doc


def test_cited_result_artifacts_exist():
    cited = _cited_paths()
    assert cited, "expected at least one results/ citation in the docs"
    missing = {
        path: docs
        for path, docs in cited.items()
        if not os.path.exists(os.path.join(REPO, path))
    }
    assert not missing, (
        f"docs cite artifacts that do not exist in the tree: {missing}"
    )


def test_cited_result_artifacts_tracked_by_git():
    """Existing on disk is not enough — an untracked artifact vanishes with
    the workspace (the r4 failure mode).  Skip when git is unavailable."""
    import subprocess

    try:
        tracked = subprocess.run(
            ["git", "ls-files", "results", "weights"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        pytest.skip("git unavailable")
    if tracked.returncode != 0:
        pytest.skip("not a git checkout")
    tracked_set = set(tracked.stdout.split())
    tracked_dirs = {os.path.dirname(p) for p in tracked_set}
    untracked = {}
    for path, docs in _cited_paths().items():
        if not os.path.exists(os.path.join(REPO, path)):
            continue  # covered by test_cited_result_artifacts_exist
        if path not in tracked_set and path not in tracked_dirs:
            untracked[path] = docs
    assert not untracked, (
        f"docs cite artifacts that exist but are not git-tracked "
        f"(they vanish with the workspace): {untracked}"
    )
