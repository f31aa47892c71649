"""Certification-staleness checker: which registry entries' code changed
AFTER their last green driver row?

The driver contract is per-round: CORRECTNESS_r{N}.json records green
rows for the first 50 registry entries.  A green row certifies the
entry's code AS OF that round — later edits silently invalidate it.
Rounds 6-7 caught two such cases by hand (the l2c re-spec, the
MATCH_RECOGNIZE vectorization); this tool automates the diff:

For every entry it finds the last round with a green row, resolves the
git commit that recorded that round's CORRECTNESS file, extracts the
entry's implementing function source AT that commit (git show +
ast-based def extraction), and compares against the working tree:

- **strong-stale**: the entry's own function source changed (or the
  entry has never been driver-certified) → its green row no longer
  covers the shipped code; it must re-enter the graded window.
- **dialect-stale**: the function routes through ``translate()`` /
  ``execute_query()`` and ``trino_compat.py`` changed since the
  entry's certification — the translator is shared, so representative
  dialect entries must re-enter (re-certifying all ~40 would flood
  the 50-slot window).
- **module-stale** (informational): the entry's own function is
  unchanged but its module file changed — shared helpers it calls may
  have (the r7 MATCH_RECOGNIZE vectorization invalidated t10/t9b this
  way).  Too broad to force into the window wholesale; the rotation
  draws representatives per changed module, and ``make check-proven``
  covers the rest locally.

Usage:
    python tools/check_changed.py            # report staleness
    python tools/check_changed.py --gate     # + run the strict local
                                             #   gate on stale entries
                                             #   (sf0.001)

tests/test_registry_window.py imports ``staleness_report`` to assert
every strong-stale oracle-backed entry sits in the graded window.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys
from typing import Dict, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, check=False
    ).stdout


def _green_rounds() -> Dict[str, int]:
    """entry → last round with a green driver row (hash-green, or a
    rows-only row per the no-oracle contract)."""
    last: Dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _cert_commit(rnd: int) -> Optional[str]:
    """Commit that ADDED the round's CORRECTNESS file — the snapshot the
    driver graded (the record lands in the round-close commit).

    End-of-round special case (VERDICT r12 #1): the driver writes
    CORRECTNESS_r{N}.json AFTER the builder's last commit, so at the
    end-of-round snapshot the newest record is UNTRACKED and every entry
    it certifies would read "never"/"stale" — a vacuous red (rounds
    8-12).  The driver contract guarantees the grade ran against HEAD,
    so when (a) the record is untracked, (b) its round is newer than any
    committed record, and (c) the tracked working tree is clean, the
    certification snapshot IS the current HEAD.
    """
    rel = f"CORRECTNESS_r{rnd:02d}.json"
    out = _git("log", "--diff-filter=A", "--format=%H", "--", rel).strip()
    if out:
        return out.splitlines()[0]
    if not os.path.exists(os.path.join(REPO, rel)):
        return None
    committed = _git("ls-files", "--", "CORRECTNESS_r*.json")
    committed_rounds = [
        int(m.group(1))
        for line in committed.splitlines()
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", line))
    ]
    if committed_rounds and rnd <= max(committed_rounds):
        return None
    dirty = _git("status", "--porcelain", "--untracked-files=no").strip()
    if dirty:
        return None
    return _git("rev-parse", "HEAD").strip() or None


def untracked_head_certification() -> Optional[int]:
    """Round number of the end-of-round judged snapshot, else None.

    The state (VERDICT r13 #1): the newest CORRECTNESS record on disk is
    UNTRACKED, newer than every committed record, and the tracked tree is
    clean — exactly the snapshot ``_cert_commit`` resolves to HEAD.  In
    that state the current graded window has just been certified green,
    so entries re-staled by post-rotation commits belong to the NEXT
    window (tools/rotate_window.py computes it); asserting their
    re-entry against the CURRENT window is structurally unsatisfiable
    and produced six consecutive red rounds.
    """
    rounds = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    )
    if not rounds:
        return None
    newest = rounds[-1]
    if _git("ls-files", "--", f"CORRECTNESS_r{newest:02d}.json").strip():
        return None  # newest record is committed — mid-round state
    if _cert_commit(newest) is None:
        return None  # dirty tracked tree: no HEAD guarantee
    return newest


def _fn_source(text: str, fn_name: str) -> Optional[str]:
    """Canonical form of the named function: ast.dump with the
    docstring stripped — comment/docstring edits don't invalidate a
    certification, but ANY code or decorator change does (the
    @register decorator embeds the oracle SQL, so oracle edits flag
    too)."""
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and (
            node.name == fn_name
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body = body[1:]
            node.body = body or [ast.Pass()]
            return ast.dump(node, include_attributes=False)
    return None


def _blob_at(commit: str, relpath: str, _cache: dict = {}) -> Optional[str]:
    key = (commit, relpath)
    if key not in _cache:
        out = subprocess.run(
            ["git", "-C", REPO, "show", f"{commit}:{relpath}"],
            capture_output=True,
            text=True,
            check=False,
        )
        _cache[key] = out.stdout if out.returncode == 0 else None
    return _cache[key]


def staleness_report() -> Dict[str, dict]:
    """entry → {status: fresh|strong|dialect|never, round, module}."""
    from mcp_trino_spark import registry

    qs = registry.queries()
    last_green = _green_rounds()
    commits = {r: _cert_commit(r) for r in set(last_green.values())}
    compat_rel = "mcp_trino_spark/trino_compat.py"
    with open(os.path.join(REPO, compat_rel)) as fh:
        compat_now = fh.read()

    report: Dict[str, dict] = {}
    for name, fn in qs.items():
        mod = sys.modules[fn.__module__].__file__
        rel = os.path.relpath(mod, REPO)
        rnd = last_green.get(name)
        if rnd is None or commits.get(rnd) is None:
            report[name] = {"status": "never", "round": None, "module": rel}
            continue
        commit = commits[rnd]
        with open(mod) as fh:
            cur_text = fh.read()
        cur_src = _fn_source(cur_text, fn.__name__)
        old_text = _blob_at(commit, rel)
        old_src = _fn_source(old_text, fn.__name__) if old_text else None
        if old_src is None or old_src != cur_src:
            report[name] = {"status": "strong", "round": rnd, "module": rel}
            continue
        uses_dialect = cur_src is not None and re.search(
            r"'(?:translate|execute_query)'", cur_src
        )
        if uses_dialect and _blob_at(commit, compat_rel) != compat_now:
            report[name] = {"status": "dialect", "round": rnd, "module": rel}
            continue
        # the entry's own function is unchanged, but its MODULE changed
        # — shared helpers it calls may have (the r7 MATCH_RECOGNIZE
        # vectorization invalidated t10/t9b this way).  Informational
        # tier: too broad to force into the 50-slot window wholesale,
        # but the rotation should draw representatives from it.
        if old_text != cur_text:
            report[name] = {"status": "module", "round": rnd, "module": rel}
            continue
        report[name] = {"status": "fresh", "round": rnd, "module": rel}
    return report


def main() -> None:
    gate = "--gate" in sys.argv
    report = staleness_report()
    by_status: Dict[str, list] = {}
    for name, info in report.items():
        by_status.setdefault(info["status"], []).append(name)
    for status in ("never", "strong", "dialect", "module"):
        for name in by_status.get(status, []):
            info = report[name]
            print(f"{status:8s} {name}  (last green r{info['round']}, {info['module']})")
    fresh = len(by_status.get("fresh", []))
    print(
        f"\n{fresh} fresh, {len(by_status.get('module', []))} module-stale "
        f"(helpers may have changed), "
        f"{len(by_status.get('dialect', []))} dialect-stale, "
        f"{len(by_status.get('strong', []))} strong-stale, "
        f"{len(by_status.get('never', []))} never certified"
    )
    stale = by_status.get("strong", []) + by_status.get("never", [])
    if gate and stale:
        from mcp_trino_spark import registry

        oracle_backed = [n for n in stale if n in registry.oracle_sql()]
        print(f"\nrunning strict gate on {len(oracle_backed)} stale entries ...")
        rc = subprocess.call(
            [
                sys.executable,
                os.path.join(REPO, "tools", "check_correctness.py"),
                "--sf",
                "/root/testdata/sf0.001",
                *oracle_backed,
            ]
        )
        sys.exit(rc)


if __name__ == "__main__":
    main()
