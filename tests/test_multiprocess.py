"""Two-process jax.distributed collectives (CPU/Gloo over localhost)."""

import os
import subprocess
import sys


def test_multiprocess_smoke():
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "multiprocess_smoke.py",
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [sys.executable, tool],
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "multiprocess smoke: OK" in proc.stdout
