"""The BASELINE config-5 artifact runs end-to-end at reduced size.

examples/distributed_tfep.py is the full production topology at toy scale:
2-process jax.distributed, per-host frame shards + engine evaluation with
engine-overlap double buffering, per-host TFEP loggers, cross-host multimap
estimate with bootstrap CI. The example asserts its own correctness
(identical replicated losses, estimate vs analytic); this test just drives
it with small sizes so the whole path stays green in-suite.
"""

import os
import subprocess
import sys


def test_distributed_tfep_example(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    script = os.path.join(repo_root, 'examples', 'distributed_tfep.py')

    env = dict(os.environ, PYTHONPATH=repo_root,
               DIST_TFEP_FRAMES='256', DIST_TFEP_BATCH='32',
               DIST_TFEP_EPOCHS='6')
    env.pop('XLA_FLAGS', None)

    out = subprocess.run(
        [sys.executable, script], env=env, cwd=repo_root,
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert 'DISTRIBUTED TFEP OK' in out.stdout
