"""Smoke tests: the shipped examples must actually run.

Each example is executed as a subprocess (fresh interpreter — they set
their own platform config), on CPU, at the small sizes they ship with.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(name, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name), *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )


@pytest.mark.parametrize(
    "name,args",
    [
        ("01_quickstart.py", ("--cpu",)),
        ("02_batch_and_mesh.py", ()),
        ("03_plan_cache.py", ()),
        ("04_native_backend.py", ()),
        ("06_deep_formats.py", ("--cpu",)),
    ],
)
def test_example_runs(name, args):
    r = _run(name, *args)
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout or "skipping" in r.stdout


def test_cli_script_parses():
    # The shell recipes reference real flags; verify each line's flags
    # exist in the parser so the doc can't rot.
    from transform360_tpu.cli import build_parser

    known = set()
    for action in build_parser()._actions:
        known.update(action.option_strings)
    known |= {"--t360-batch", "--t360-prefetch", "--t360-stats"}  # ffmpeg.py
    script = open(os.path.join(EXAMPLES, "05_video_cli.sh")).read()
    for tok in script.split():
        if tok.startswith("--") and tok not in ("--",):
            flag = tok.split("=")[0]
            assert flag in known, f"unknown CLI flag in example: {flag}"
