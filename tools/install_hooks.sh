#!/bin/sh
# Install the window-freshness pre-commit hook (run once per clone).
# The hook is the structural half of the rotation rule: any commit that
# touches engine code while the graded window violates the freshness
# invariants (never/strong entries outside it, <3 dialect re-entries
# after a translator change, oracle floor, family span) is BLOCKED
# until `make rotate-window` is run and its output staged.
set -e
REPO_ROOT=$(git rev-parse --show-toplevel)
HOOK="$REPO_ROOT/.git/hooks/pre-commit"
cat > "$HOOK" <<'EOF'
#!/bin/sh
# Window-freshness gate (tools/install_hooks.sh). Engine code staged →
# the graded window must satisfy the certification-freshness invariants
# WITH the staged edits applied; otherwise the commit ships a red
# tests/test_registry_window.py (the r8-r10 failure mode).
if git diff --cached --name-only | grep -q '^mcp_trino_spark/'; then
    python tools/rotate_window.py --check || {
        echo "pre-commit: graded window is stale -- run 'make rotate-window'," >&2
        echo "stage mcp_trino_spark/registry.py, and retry the commit." >&2
        echo "(bypass ONLY for work-in-progress: git commit --no-verify)" >&2
        exit 1
    }
fi
exit 0
EOF
chmod +x "$HOOK"
echo "installed $HOOK"
