"""Supervisor behavior (scripts/supervise_train.sh) with a mocked train.py.

The supervisor is load-bearing ops infrastructure (wedged-tunnel recovery),
so its restart/backoff/resume logic is tested at the shell level: a stub
train.py records its argv and exits with scripted codes.
"""

import os
import stat
import subprocess
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SUPERVISOR = os.path.join(_REPO, "scripts", "supervise_train.sh")


def _run_supervisor(tmp_path, train_body: str, max_restarts: int = 3,
                    timeout: int = 60):
    """Run the supervisor against a stub scripts/train.py; returns
    (returncode, stdout, calls_file_lines)."""
    scripts = tmp_path / "scripts"
    scripts.mkdir()
    sup = scripts / "supervise_train.sh"
    sup.write_text(open(_SUPERVISOR).read())
    sup.chmod(sup.stat().st_mode | stat.S_IEXEC)
    calls = tmp_path / "calls.txt"
    (scripts / "train.py").write_text(textwrap.dedent(train_body).format(
        calls=str(calls)
    ))
    logdir = tmp_path / "run"
    env = dict(os.environ, MAX_RESTARTS=str(max_restarts))
    p = subprocess.run(
        ["bash", str(sup), str(logdir)],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=str(tmp_path),
    )
    lines = calls.read_text().splitlines() if calls.exists() else []
    return p.returncode, p.stdout, lines, logdir


def test_success_exits_zero(tmp_path):
    code, out, calls, _ = _run_supervisor(tmp_path, """
        import sys
        open({calls!r}, "a").write(" ".join(sys.argv[1:]) + "\\n")
        sys.exit(0)
    """)
    assert code == 0
    assert "training completed" in out
    assert len(calls) == 1


def test_gives_up_after_max_restarts_with_backoff(tmp_path):
    # always fail: 1 initial + MAX_RESTARTS runs, backoff 10s/20s/40s would
    # stall the test, so patch the sleeps down via a bash function? Instead
    # run with MAX_RESTARTS=1: one retry after a 10s backoff.
    code, out, calls, _ = _run_supervisor(tmp_path, """
        import sys
        open({calls!r}, "a").write(" ".join(sys.argv[1:]) + "\\n")
        sys.exit(1)
    """, max_restarts=1, timeout=120)
    assert code == 1
    assert "giving up" in out
    assert len(calls) == 2
    assert "restart 1/1 in 10s" in out


def test_resumes_from_checkpoint_and_resets_budget(tmp_path):
    # run 1: fails BEFORE saving -> restart 1 (no resume flag)
    # run 2: saves a checkpoint, then fails -> budget resets to restart 1
    # run 3: sees the checkpoint -> launched with args.checkpoint=...; exits 0
    code, out, calls, logdir = _run_supervisor(tmp_path, """
        import os, sys
        calls = {calls!r}
        n = sum(1 for _ in open(calls)) if os.path.exists(calls) else 0
        open(calls, "a").write(" ".join(sys.argv[1:]) + "\\n")
        logdir = sys.argv[1].split("=", 1)[1]
        if n == 0:
            sys.exit(1)
        if n == 1:
            os.makedirs(os.path.join(logdir, "stamp2", "nn", "last"))
            sys.exit(1)
        sys.exit(0)
    """, max_restarts=5, timeout=120)
    assert code == 0, out
    assert len(calls) == 3
    assert "args.checkpoint=" not in calls[0]
    assert "args.checkpoint=" not in calls[1]
    assert "stamp2/nn/last" in calls[2]
    # the second failure produced a NEW checkpoint -> budget reset to 1
    assert out.count("restart 1/5") == 2
