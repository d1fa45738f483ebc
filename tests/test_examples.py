"""Smoke-run every example script (the reference compiles its `examples/`
tree as integration tests; see SURVEY.md §4)."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    p.name for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    root = pathlib.Path(__file__).parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The dev image's sitecustomize eagerly claims a TPU session through the
    # tunnel when this var is set; example subprocesses run on CPU and would
    # otherwise block (minutes) on the chip grant held by this pytest process.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["SIMILARI_EXAMPLE_FAST"] = "1"
    env["PYTHONPATH"] = str(root) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(root / "examples" / name)],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
        cwd=str(root),
    )
    assert proc.returncode == 0, (
        f"{name} failed:\nstdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
