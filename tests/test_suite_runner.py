"""Regression tests for scripts/run_full_suite.sh's failure semantics.

Round-4's close blew the suite artifact when a chunk timed out under
concurrent bench load; round 5 added retry-once-on-timeout.  These tests
drive the REAL runner script with a stubbed pytest command and a tiny
timeout cap (SUITE_PYTEST_CMD / SUITE_CHUNK_TIMEOUT) to demonstrate,
deterministically:

  1. a chunk that times out once and passes on the standalone retry leaves
     the suite GREEN (FULL_SUITE_DONE, exit 0);
  2. a chunk that times out twice fails the suite;
  3. a deterministic test failure is NEVER retried and fails the suite.

The stub ignores the chunk's file arguments (the runner's completeness
check still runs against the real tests/ tree), so the whole 15-chunk run
completes in seconds.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "run_full_suite.sh")


def _run(tmp_path, stub_body, cap="3"):
    stub = tmp_path / "stub_pytest.sh"
    stub.write_text("#!/bin/bash\n" + stub_body)
    stub.chmod(0o755)
    env = dict(os.environ)
    env["SUITE_PYTEST_CMD"] = f"bash {stub}"
    env["SUITE_CHUNK_TIMEOUT"] = cap
    env["SUITE_LOG_DIR"] = str(tmp_path)  # keep real /tmp artifacts intact
    env["STATE_DIR"] = str(tmp_path)
    return subprocess.run(
        ["bash", RUNNER], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )


@pytest.mark.skipif(os.name != "posix", reason="bash runner")
def test_timeout_then_retry_is_green(tmp_path):
    # First invocation for the sharding chunk sleeps past the cap; the
    # standalone retry (and every other chunk) passes instantly.
    body = """
if [[ "$*" == *"test_sharding"* && ! -e "$STATE_DIR/slept" ]]; then
  touch "$STATE_DIR/slept"
  sleep 30
fi
echo "1 passed in 0.01s"
"""
    r = _run(tmp_path, body)
    assert "TIMED OUT after 3s — retrying once" in r.stdout, r.stdout
    assert "FULL_SUITE_DONE" in r.stdout, r.stdout
    assert "FULL_SUITE_FAILED" not in r.stdout
    assert r.returncode == 0


@pytest.mark.skipif(os.name != "posix", reason="bash runner")
def test_double_timeout_fails(tmp_path):
    body = """
if [[ "$*" == *"test_sharding"* ]]; then sleep 30; fi
echo "1 passed in 0.01s"
"""
    r = _run(tmp_path, body)
    assert "TIMED OUT TWICE" in r.stdout, r.stdout
    assert "FULL_SUITE_FAILED" in r.stdout
    assert r.returncode == 1


@pytest.mark.skipif(os.name != "posix", reason="bash runner")
def test_deterministic_failure_not_retried(tmp_path):
    # A red chunk must fail the suite on the FIRST attempt (timeouts are
    # load artifacts; failures are real — retrying them would mask flakes).
    body = """
if [[ "$*" == *"test_sharding"* ]]; then
  touch "$STATE_DIR/attempt_$RANDOM"
  echo "FAILED tests/test_sharding.py::test_x - boom"
  exit 1
fi
echo "1 passed in 0.01s"
"""
    r = _run(tmp_path, body)
    assert "FULL_SUITE_FAILED" in r.stdout
    assert "retrying once" not in r.stdout
    assert "FAILED tests/test_sharding.py::test_x" in r.stdout
    assert r.returncode == 1
