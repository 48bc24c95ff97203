"""bench.py launcher resilience (VERDICT r3 #1): the driver capture died on
a transient backend failure with rc=1 and NO parseable JSON.  The launcher
must always print exactly one well-formed JSON line — a real result when
the child succeeds, an "error" record when everything fails — and exit 0.

These tests drive the launcher machinery without touching any accelerator
(BENCH_ATTEMPTS=0 short-circuits before the health check)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def test_extract_json_line():
    sys.path.insert(0, REPO)
    import bench

    out = ('WARNING: noise\n{"metric": "x", "value": 1}\n'
           '{"metric": "avsd_generation_throughput", "value": 2.5}\ntail')
    got = bench._extract_json_line(out)
    assert got == {"metric": "avsd_generation_throughput", "value": 2.5}
    assert bench._extract_json_line("no json here") is None
    assert bench._extract_json_line("{broken \"metric\"") is None


def test_launcher_failure_prints_error_json():
    env = dict(os.environ)
    env.update(BENCH_ATTEMPTS="0", BENCH_DEADLINE="5")
    r = subprocess.run([sys.executable, BENCH], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "avsd_generation_throughput"
    assert parsed["value"] == 0.0
    assert "error" in parsed


def test_plan_attempt_tiers():
    """Attempt planner (VERDICT r4 #1): full first iff the window affords
    full + a reserved quick slot; quick otherwise; stop near the deadline."""
    sys.path.insert(0, REPO)
    import bench

    # plenty of time: attempt 1 is full, capped at the full timeout
    tier, budget = bench._plan_attempt(1, 1470, 700, 420)
    assert tier == "full" and budget == 700
    # attempt 1 but only ~enough for quick + margin: go straight to quick
    tier, budget = bench._plan_attempt(1, 900, 700, 420)
    assert tier == "quick" and budget == 420
    # later attempts are always quick even in a huge window
    tier, budget = bench._plan_attempt(2, 5000, 700, 420)
    assert tier == "quick"
    # a shrinking window clips the budget below the tier timeout
    tier, budget = bench._plan_attempt(2, 300, 700, 420)
    assert tier == "quick" and budget == 300 - 90
    # almost no time left: stop (the launcher emits its error JSON instead)
    tier, budget = bench._plan_attempt(3, 120, 700, 420)
    assert tier is None
    # forced tier (BENCH_TIER) overrides the policy
    tier, _ = bench._plan_attempt(1, 5000, 700, 420, forced_tier="quick")
    assert tier == "quick"
    tier, _ = bench._plan_attempt(2, 5000, 700, 420, forced_tier="full")
    assert tier == "full"


CHILD_SNIPPET = (
    "import sys, json\n"
    "tier = sys.argv[1]\n"
    "if tier == 'full':\n"
    "    sys.exit(7)    # full protocol fails this window\n"
    "print(json.dumps({'metric': 'avsd_generation_throughput',\n"
    "                  'value': 123.0, 'unit': 'responses/sec/chip (QUICK "
    "TIER fallback)', 'vs_baseline': 61.5, 'tier': tier}))\n"
)


def test_launcher_falls_back_to_quick_tier():
    """Full attempt fails → the launcher retries with --quick and emits the
    quick-tier JSON with rc=0 (the round-5 capture contract).  The child is
    substituted via the test-only BENCH_TEST_CHILD hook (argv[1] = tier)."""
    env = dict(os.environ)
    env.update(BENCH_ATTEMPTS="3", BENCH_DEADLINE="3000",
               BENCH_SKIP_HEALTH="1", BENCH_RETRY_SLEEP="0",
               BENCH_TEST_CHILD=CHILD_SNIPPET)
    r = subprocess.run([sys.executable, BENCH], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    parsed = json.loads(lines[0])
    assert parsed["value"] == 123.0
    assert parsed["tier"] == "quick"
    # the launcher really tried full first (attempt log on stderr)
    assert "tier=full" in r.stderr and "tier=quick" in r.stderr


def test_launcher_sigterm_still_prints_json():
    """If the capture harness times the launcher out (SIGTERM), the error
    JSON must still land on stdout (round 3 failed with a raw traceback).
    Waits for the launcher's stderr readiness marker before killing — a
    fixed sleep raced python startup under load (suite-wide flake)."""
    import signal
    import time

    env = dict(os.environ)
    env.update(BENCH_ATTEMPTS="1", BENCH_DEADLINE="600")
    p = subprocess.Popen([sys.executable, BENCH], cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    deadline = time.time() + 120
    ready = False
    while time.time() < deadline:
        ln = p.stderr.readline()       # launcher always prints the marker
        if "launcher ready" in ln:
            ready = True
            break
        if ln == "" and p.poll() is not None:
            break
    assert ready, "launcher never printed its readiness marker"
    time.sleep(1)                      # inside the health check / backoff
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=60)   # drains both pipes
    assert p.returncode == 0
    lines = [l for l in out.splitlines() if l.strip()]
    parsed = json.loads(lines[-1])
    assert parsed["metric"] == "avsd_generation_throughput"
    assert "error" in parsed
