"""Mechanical graded-window rotation (VERDICT r10 item #1).

The standing rule — "any commit that re-stales certifications re-rotates
the graded window in the same commit" — shipped the freshness guard
(tests/test_registry_window.py::test_stale_certifications_reenter_window)
red in rounds 8, 9 and 10 because it relied on the builder REMEMBERING.
This tool makes it structural: the window head is DERIVED from
tools/check_changed.py output and written into the source files, and a
pre-commit hook (tools/install_hooks.sh) blocks any commit that touches
engine code while the derived invariants don't hold.

Selection policy (one slot list, deterministic):

1. **never/strong** — entries with no green driver row for their current
   code.  Mandatory: the freshness guard hard-fails on any omission.
2. **dialect-stale, oldest green first** — the shared translator changed
   since these entries' certification.  All entries whose green row is
   ≥2 rounds old enter; newer ones only top up to the guard's minimum
   of 3 representatives (re-certifying all ~40 dialect-routed entries
   every round would flood the 50-slot window).
3. **module-stale drain, oldest green first** — shared helpers in the
   entry's module changed; fill the remaining slots so every entry's
   green row ages out of the queue within a couple of rounds.
4. **family representatives** — the window must span the p/a/w/o/x/t/s/f/l
   families (tests/test_engine.py); missing families displace the newest
   drain picks with proven-set spot-checks.

Constraints enforced (same ones the pytest guards pin): exactly 50
slots, ≥48 oracle-backed, rows-only entries ⊆ registry.ROWS_ONLY_OK,
every never/strong entry present, ≥3 dialect-stale entries present
when any exist, every family present.

Usage:
    python tools/rotate_window.py --write   # rewrite the generated blocks
    python tools/rotate_window.py --check   # verify invariants, exit 1 if
                                            # a rotation is needed (hook)
    python tools/rotate_window.py           # dry-run: print the window
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50
MIN_ORACLE = 48
MIN_DIALECT = 3
FAMILIES = ("p", "a", "w", "o", "x", "t", "s", "f", "l")

BEGIN = "# --- BEGIN GENERATED WINDOW (tools/rotate_window.py; make rotate-window) ---"
END = "# --- END GENERATED WINDOW ---"


def _uncommitted_correctness_files() -> List[str]:
    """CORRECTNESS files on disk that no commit has recorded yet.

    The r11 deadlock (VERDICT r11 #1): the driver writes
    CORRECTNESS_r{N}.json AFTER the builder's last commit, so at the next
    round's HEAD every freshly-graded entry reads "never" (check_changed
    resolves green rows only from COMMITTED files), the mandatory tier
    saturates all 50 slots, and the ≥MIN_DIALECT requirement becomes
    jointly unsatisfiable — for the tool AND the pytest guard alike.  The
    only escape is committing the file; this helper names it.
    """
    import subprocess

    out = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain", "--", "CORRECTNESS_r*.json"],
        capture_output=True,
        text=True,
        check=False,
    ).stdout
    return [line[3:].strip() for line in out.splitlines() if line.strip()]


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) if rounds else 0) + 1


def _family(name: str) -> str:
    return name[0]


def build_window() -> Dict[str, List[str]]:
    """Compute {'head': [...], 'tail': [...]} — head is churn-driven,
    tail is fresh proven-set family representatives."""
    from mcp_trino_spark import registry
    from tools.check_changed import staleness_report

    report = staleness_report()
    oracles = set(registry.oracle_sql())
    rows_only_ok = set(registry.ROWS_ONLY_OK)
    proven = (
        set(registry._PROVEN_R03)
        | set(registry._PROVEN_R45)
        | set(registry._PROVEN_R06)
    )
    cur = _current_round()

    def by_round(names):
        return sorted(names, key=lambda n: (report[n]["round"] or 0, names.index(n)))

    order = list(report)  # registry iteration order — stable tiebreak
    never = [n for n in order if report[n]["status"] == "never"]
    strong = [n for n in order if report[n]["status"] == "strong"]
    dialect = by_round([n for n in order if report[n]["status"] == "dialect"])
    module = by_round([n for n in order if report[n]["status"] == "module"])

    bad = [n for n in never + strong if n not in oracles and n not in rows_only_ok]
    if bad:
        raise SystemExit(
            f"entries lacking both an oracle and a ROWS_ONLY_OK contract: {bad}"
        )

    # Unsatisfiable-state pre-check (the r11 deadlock, VERDICT r11 #1):
    # mandatory never/strong entries must all sit in the window, and when
    # the translator changed, ≥MIN_DIALECT dialect entries must too.  If
    # the mandatory tier alone crowds out the dialect floor, NO window can
    # satisfy the guard — don't assert-crash, explain the escape.
    need_dialect = min(MIN_DIALECT, len(dialect)) if dialect else 0
    if len(never) + len(strong) > WINDOW - need_dialect:
        uncommitted = _uncommitted_correctness_files()
        hint = (
            f"\n  Likely cause: uncommitted correctness record(s) "
            f"{uncommitted} make freshly-graded entries read 'never'.\n"
            f"  Escape: git add {' '.join(uncommitted)} && git commit, "
            f"then re-run make rotate-window."
            if uncommitted
            else "\n  Stagger the churn: land fewer new/changed entries per "
            "round, or re-certify dialect entries in an earlier round."
        )
        raise SystemExit(
            f"window unsatisfiable: {len(never) + len(strong)} mandatory "
            f"never/strong entries + {need_dialect} required dialect "
            f"re-entries exceed the {WINDOW}-slot window.{hint}"
        )

    head: List[str] = []
    ro_budget = WINDOW - MIN_ORACLE

    def rows_only(n):
        return n not in oracles

    # 1. mandatory never/strong
    for n in never + strong:
        head.append(n)
    if sum(rows_only(n) for n in head) > ro_budget:
        raise SystemExit(
            "more mandatory rows-only entries than the oracle floor allows; "
            "stagger the churn across rounds"
        )

    # 2. dialect: all genuinely old, topped up to the guard minimum
    old_dialect = [n for n in dialect if (report[n]["round"] or 0) <= cur - 2]
    for n in old_dialect:
        if n not in head and len(head) < WINDOW:
            head.append(n)
    n_dialect = len([n for n in head if report[n]["status"] == "dialect"])
    for n in dialect:
        if n_dialect >= MIN_DIALECT:
            break
        if n not in head and len(head) < WINDOW:
            head.append(n)
            n_dialect += 1

    # 3. module-stale drain
    for n in module:
        if len(head) >= WINDOW:
            break
        if n in head:
            continue
        if rows_only(n) and sum(rows_only(h) for h in head) >= ro_budget:
            continue
        head.append(n)

    # 4. family coverage: displace newest drain picks with proven reps
    mandatory = set(never) | set(strong)
    tail: List[str] = []

    def covered(fam):
        return any(_family(n) == fam for n in head + tail)

    def pick_rep(fam):
        cands = [
            n
            for n in order
            if _family(n) == fam
            and n in proven
            and n in oracles
            and n not in head
            and n not in tail
        ]
        # oldest green first — the spot-check doubles as staleness drain
        cands.sort(key=lambda n: (report[n]["round"] or 0, order.index(n)))
        if not cands:
            raise SystemExit(f"no proven oracle-backed representative for family {fam!r}")
        return cands[0]

    for fam in FAMILIES:
        if covered(fam):
            continue
        tail.append(pick_rep(fam))
        while len(head) + len(tail) > WINDOW:
            n_dialect = sum(
                1 for m in head if report[m]["status"] == "dialect"
            )
            for i in range(len(head) - 1, -1, -1):
                n = head[i]
                if n in mandatory:
                    continue
                # dialect-stale entries are evictable DOWN TO the
                # guard's minimum of 3 (r15): a round that re-stales
                # many modules can push mandatory+dialect past 50,
                # and keeping every old-green dialect entry is
                # best-effort, not an invariant — newest green first
                # is the fairest displacement (oldest keep priority).
                if report[n]["status"] == "dialect" and n_dialect <= MIN_DIALECT:
                    continue
                fam_n = _family(n)
                if sum(1 for m in head + tail if _family(m) == fam_n) > 1 or not any(
                    _family(t) == fam_n for t in (head + tail)
                ):
                    if sum(1 for m in head + tail if _family(m) == fam_n) > 1:
                        head.pop(i)
                        break
            else:
                raise SystemExit("cannot free a slot for a family representative")

    # top up if mandatory+dialect+module didn't reach 50 (quiet rounds):
    # spot-check proven entries oldest-green-first
    spares = sorted(
        [n for n in order if n in proven and n in oracles and n not in head and n not in tail],
        key=lambda n: (report[n]["round"] or 0, order.index(n)),
    )
    for n in spares:
        if len(head) + len(tail) >= WINDOW:
            break
        tail.append(n)

    window = head + tail
    _validate(window, report, oracles, rows_only_ok, proven, len(head))
    return {"head": head, "tail": tail}


def _validate(window, report, oracles, rows_only_ok, proven, head_len) -> None:
    assert len(window) == WINDOW, f"window has {len(window)} slots"
    assert len(set(window)) == WINDOW, "duplicate window entries"
    assert len([n for n in window if n in oracles]) >= MIN_ORACLE
    stray_ro = [n for n in window if n not in oracles and n not in rows_only_ok]
    assert not stray_ro, f"rows-only entries outside the contract: {stray_ro}"
    missing = [
        n
        for n, i in report.items()
        if i["status"] in ("never", "strong") and n not in window
    ]
    assert not missing, f"never/strong entries outside the window: {missing}"
    dialect = [n for n, i in report.items() if i["status"] == "dialect"]
    if dialect:
        assert len([n for n in dialect if n in window]) >= min(MIN_DIALECT, len(dialect))
    for fam in FAMILIES:
        assert any(n.startswith(fam) for n in window), f"family {fam} missing"
    strays = [n for n in window[head_len:] if n not in proven]
    assert not strays, f"tail entries not in a proven set: {strays}"


def _render_block(head: List[str], tail: List[str]) -> str:
    cur = _current_round()
    lines = [
        BEGIN,
        f"# Derived for round {cur} from tools/check_changed.py: never/strong",
        "# leads, dialect-stale (oldest green first), module-stale drain,",
        "# then proven-set family representatives.  Do not edit by hand —",
        "# run `make rotate-window` after any engine change.",
        "_WINDOW_HEAD = [",
        *[f'    "{n}",' for n in head],
        "]",
        "_WINDOW_TAIL = [",
        *[f'    "{n}",' for n in tail],
        "]",
        END,
    ]
    return "\n".join(lines)


def _rewrite(path: str, block: str) -> None:
    with open(path) as fh:
        text = fh.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pat.search(text):
        raise SystemExit(f"generated-window markers not found in {path}")
    with open(path, "w") as fh:
        fh.write(pat.sub(block, text))


_EOR_UNSET = object()


def freshness_problems(report=None, eor=_EOR_UNSET) -> List[str]:
    """The freshness-guard invariants, state-aware (VERDICT r13 #1).

    Mid-round (every CORRECTNESS record committed): the CURRENT window
    must contain every never/strong entry and ≥MIN_DIALECT dialect-stale
    re-entries — the pre-commit hook blocks engine commits otherwise.

    End-of-round (the newest record is untracked and certifies HEAD —
    the snapshot the judge grades): the current window was JUST graded
    green, so the record freshens its entries while post-rotation
    translator commits re-stale the out-of-window dialect tier.  Those
    re-staled entries are by construction the NEXT window's head;
    asserting their re-entry against the current window is structurally
    unsatisfiable (red in rounds 8–13).  In that state the invariant is:
    the PENDING rotation (build_window) must exist and satisfy every
    constraint — _validate inside it asserts never/strong containment,
    the dialect floor, the oracle floor, and family coverage.

    Shared by ``check()`` (pre-commit hook) and the pytest guard
    (tests/test_registry_window.py) so the two can never disagree.

    Tests that fabricate a state must inject BOTH coordinates
    (VERDICT r14 #1): ``report`` pins the staleness census and ``eor``
    pins which round (if any) is the end-of-round judged snapshot —
    otherwise the REAL repo state leaks into the simulation and the
    test result depends on when in the round it runs.
    """
    from mcp_trino_spark import registry
    from tools.check_changed import staleness_report, untracked_head_certification

    if eor is _EOR_UNSET:
        eor = untracked_head_certification()
    if eor is not None:
        try:
            build_window()
        except (SystemExit, AssertionError) as exc:
            return [
                f"end-of-round snapshot (untracked CORRECTNESS_r{eor:02d} "
                f"certifies HEAD) but the pending rotation fails: {exc}"
            ]
        return []

    if report is None:
        report = staleness_report()
    window = set(list(registry.queries())[:WINDOW])
    problems = []
    missing = [
        n
        for n, i in report.items()
        if i["status"] in ("never", "strong") and n not in window
    ]
    if missing:
        problems.append(f"never/strong entries outside the graded window: {missing}")
    dialect = [n for n, i in report.items() if i["status"] == "dialect"]
    in_w = [n for n in dialect if n in window]
    if dialect and len(in_w) < min(MIN_DIALECT, len(dialect)):
        problems.append(
            f"translator changed but only {in_w} dialect entries re-enter the window"
        )
    oracles = set(registry.oracle_sql())
    if len([n for n in window if n in oracles]) < MIN_ORACLE:
        problems.append("fewer than 48 oracle-backed window entries")
    for fam in FAMILIES:
        if not any(n.startswith(fam) for n in window):
            problems.append(f"family {fam} missing from window")
    return problems


def check() -> int:
    """Fast invariant check for the pre-commit hook: does the CURRENT
    committed window satisfy the freshness guard's requirements?  (Exact
    list equality with a fresh build is NOT required — any window that
    meets the guard invariants ships green.)"""
    problems = freshness_problems()
    if problems:
        uncommitted = _uncommitted_correctness_files()
        if uncommitted:
            print(
                "WINDOW ROTATION NEEDED — but COMMIT THE GRADED ARTIFACTS FIRST "
                f"(git add {' '.join(uncommitted)} && git commit); rotating before "
                "the commit would discard the very window those records certify. "
                "Then run `make rotate-window` and commit the result:"
            )
        else:
            print(
                "WINDOW ROTATION NEEDED (run `make rotate-window`, commit the result):"
            )
        for p in problems:
            print(f"  - {p}")
        return 1
    print("window invariants hold — no rotation needed")
    return 0


def _write_runway(win: Dict[str, List[str]]) -> None:
    """Emit RUNWAY.md at rotation time (VERDICT r13 #8): the committed
    record of WHAT the tool selected and what the NEXT rotation's head
    will be, so SURVEY's prose runway can't drift from the actual
    order."""
    from tools.check_changed import staleness_report

    report = staleness_report()
    cur = _current_round()
    by = {}
    for n, i in report.items():
        by.setdefault(i["status"], []).append(n)
    in_window = set(win["head"]) | set(win["tail"])
    # next head: everything stale that did NOT make this window,
    # oldest green first — plus this window's own entries once graded
    leftover = sorted(
        [
            n
            for n in report
            if report[n]["status"] in ("never", "strong", "dialect", "module")
            and n not in in_window
        ],
        key=lambda n: (report[n]["round"] or 0),
    )
    lines = [
        f"# RUNWAY — graded-window rotation record (round {cur})",
        "",
        "Generated by `make rotate-window` (tools/rotate_window.py); do",
        "not edit by hand.  SURVEY's runway prose quotes this file.",
        "",
        f"Staleness census at rotation: "
        f"{len(by.get('fresh', []))} fresh, "
        f"{len(by.get('module', []))} module-stale, "
        f"{len(by.get('dialect', []))} dialect-stale, "
        f"{len(by.get('strong', []))} strong-stale, "
        f"{len(by.get('never', []))} never certified.",
        "",
        f"## Round-{cur} graded window ({len(win['head'])} head + "
        f"{len(win['tail'])} tail)",
        "",
        "Head (churn-driven, in grading order):",
        "",
    ]
    for n in win["head"]:
        info = report[n]
        lines.append(f"- {n}  ({info['status']}, last green r{info['round']})")
    lines += ["", "Tail (proven-set family representatives):", ""]
    lines += [f"- {n}" for n in win["tail"]]
    lines += [
        "",
        f"## Round-{cur + 1} runway",
        "",
        "Stale entries NOT in this window (oldest green first) lead the",
        "next rotation, after whatever new churn re-stales:",
        "",
    ]
    lines += [
        f"- {n}  ({report[n]['status']}, last green r{report[n]['round']})"
        for n in leftover
    ] or ["- (none — every stale entry is in the current window)"]
    lines.append("")
    with open(os.path.join(REPO, "RUNWAY.md"), "w") as fh:
        fh.write("\n".join(lines))


def main() -> None:
    if "--check" in sys.argv:
        sys.exit(check())
    win = build_window()
    if "--write" in sys.argv:
        block = _render_block(win["head"], win["tail"])
        _rewrite(os.path.join(REPO, "mcp_trino_spark", "registry.py"), block)
        _write_runway(win)
        print(
            f"wrote {len(win['head'])}-entry head + {len(win['tail'])}-entry tail "
            "to mcp_trino_spark/registry.py (+ RUNWAY.md)"
        )
    else:
        print(json.dumps(win, indent=2))


if __name__ == "__main__":
    main()
