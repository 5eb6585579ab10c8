"""Driver entry-point tests."""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """dryrun_multichip(8) must build the 2-D mesh and complete one sharded
    train step in a clean process."""
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "8"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=__file__.rsplit("/tests/", 1)[0],
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout


@pytest.mark.slow
def test_entry_returns_jittable():
    """entry() must return (fn, args) where fn traces under jit.

    Uses eval_shape (trace-only) so the full-size flagship model doesn't
    need to actually compile/run on the CPU test host.
    """
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 5)
