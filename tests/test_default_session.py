"""Session-portability gate (VERDICT r7 item 3): every registry query
must run under a builder-DEFAULT SparkSession.

The r7 ``pyds_read`` red row was caused by a query depending on a conf
``session.py`` sets at build time (``spark.sql.python.filterPushdown.
enabled``) that the driver's vanilla session lacks. Builder configs
land in the shared SparkConf, so an in-process ``newSession()`` still
inherits them — the probe must be a FRESH process whose session sets
nothing but ``master``. This wrapper shells out to
``scripts/default_session_sweep.py`` over the full registry at
sf0.001 and fails with the per-query error list if anything breaks.

Would have caught pyds_read: verified by reverting the register() conf
fix — the sweep reports the exact DATA_SOURCE_PUSHDOWN_DISABLED error
the r7 driver hit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parents[1])
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_registry_runs_under_default_conf_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "scripts", "default_session_sweep.py"),
            SF_DIR,
        ],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        timeout=3600,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"sweep produced no JSON: {proc.stderr[-2000:]}"
    results = json.loads(lines[-1])
    # the sweep covers the WHOLE registry, no silent subset
    import __spark_entry__ as entry_mod

    assert set(results) == set(entry_mod.queries())
    failures = {
        k: v.splitlines()[-1] for k, v in results.items() if v is not None
    }
    assert not failures, (
        f"{len(failures)} queries depend on session.py customizations: "
        f"{failures}"
    )
    assert proc.returncode == 0
