#!/usr/bin/env bash
# CI definition for tfep_tpu — the committed counterpart of the reference's
# GitHub Actions workflow (/root/reference/.github/workflows/CI.yaml:24,69-79:
# full pytest suite incl. doctests under a time envelope).
#
# Pins the "all green under N minutes" envelope so suite-health regressions
# surface as CI failures instead of needing a human to re-derive the budget:
#
#   1. full test suite (incl. doctests via tests/test_doctests.py and the
#      executed tutorial notebook via tests/test_notebook.py), 4 workers
#   2. bench smoke: one tiny throughput stage must produce valid JSON
#   3. multichip gate: dryrun_multichip on an 8-device virtual CPU mesh
#
# Usage: tools/ci.sh [pytest-args...]
# Env:   CI_TIME_BUDGET_S  wall-clock budget for the suite (default 2400 s;
#                          the reference allows 60 min on 2-core runners —
#                          this repo's suite runs in ~10 min on 4 cores).
#        CI_JOBS           xdist workers (default 4).

set -euo pipefail
cd "$(dirname "$0")/.."

BUDGET="${CI_TIME_BUDGET_S:-2400}"
JOBS="${CI_JOBS:-4}"

echo "== tfep_tpu CI: suite (budget ${BUDGET}s, ${JOBS} workers) =="
start=$(date +%s)
timeout "${BUDGET}" python -m pytest tests/ -q -n "${JOBS}" "$@"
elapsed=$(( $(date +%s) - start ))
echo "== suite green in ${elapsed}s (budget ${BUDGET}s) =="

echo "== bench smoke =="
python - <<'EOF'
import json
import os
import subprocess
import sys

# The spline stage with a tiny budget: validates the bench harness +
# JSON contract without the full measurement protocol.
env = dict(os.environ, JAX_PLATFORMS='cpu', TFEP_BENCH_SMOKE='1')
out = subprocess.run([sys.executable, 'bench.py', '--smoke'],
                     capture_output=True, text=True, env=env, timeout=600)
if out.returncode != 0:
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    raise SystemExit('bench smoke failed')
line = out.stdout.strip().splitlines()[-1]
record = json.loads(line)
assert 'metric' in record and 'value' in record and 'unit' in record, record
assert record['value'] > 0, record
print('bench smoke OK:', line[:120], '...')
EOF

echo "== multichip gate (8 virtual devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== CI green =="
