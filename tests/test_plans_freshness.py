"""PLANS.md must match what tools/gen_plans.py regenerates (VERDICT r2 #7).

The document pairs scale claims with live ``explain("formatted")`` output;
if an operator's physical plan drifts (a new Exchange, a lost broadcast, a
dropped pushdown) the committed evidence goes stale silently.  Regenerate
in a SUBPROCESS with a fresh SparkSession — isolation from the PYTEST
session's unrelated cached relations (persisted ratings/shingles from
earlier tests), which would otherwise leak extra InMemoryTableScans into
the plans.  Note the generator's own memo-persisted relations (e.g.
q_pack_blocks' shared tokenize scan) DO legitimately appear as
InMemoryTableScans in the committed plans — those are part of the plan
under document, not cache leakage.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_md_is_fresh():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_plans.py"), "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        # Pin the knobs that print into plan text (hashpartitioning(..., N))
        # so the check is insensitive to the invoking environment.
        env={
            **os.environ,
            "ENGINE_DRIVER_MEMORY": "4g",
            "ENGINE_SHUFFLE_PARTITIONS": "32",
            "SPARK_GRAFT_CPUS": "32",
        },
    )
    assert proc.returncode == 0, (
        f"PLANS.md drifted from regeneration:\n{proc.stdout[-8000:]}\n{proc.stderr[-2000:]}"
    )
