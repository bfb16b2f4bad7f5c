"""Bitrot guard for the tools/ directory: every tool must parse ``--help``
and exit 0 without touching a device or dataset. Catches broken imports,
argparse regressions, and (the real footgun this pins) tools that IGNORE
unknown argv and launch a long device benchmark when someone asks for help.
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = sorted(glob.glob(os.path.join(REPO, "tools", "*.py")))


@pytest.mark.parametrize("tool", TOOLS, ids=[os.path.basename(t) for t in TOOLS])
def test_tool_help_exits_cleanly(tool):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, tool, "--help"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=120,
    )
    assert r.returncode == 0, f"{tool} --help rc={r.returncode}\n{r.stderr[-800:]}"
    assert "usage" in (r.stdout + r.stderr).lower(), f"{tool} printed no usage"
