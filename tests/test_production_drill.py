"""The full production input path as ONE pipeline (VERDICT r2 task 5 /
SURVEY §4.5): JPEG folder -> pack (native decode) -> train from packed
shards -> eval -> sample -> export, all through the public CLI.

Runs the drill script tiny; the script asserts every phase's artifacts
itself (checkpoints, finite losses, sample PNG, export files)."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_production_drill_end_to_end(tmp_path):
    proc = subprocess.run(
        [sys.executable, "scripts/production_drill.py", "--cpu",
         "--res", "32", "--images", "96", "--steps", "4", "--batch", "8",
         "--channels", "32", "--root", str(tmp_path / "drill")],
        capture_output=True, text=True, timeout=900, cwd=".",
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    phases = [json.loads(l) for l in proc.stdout.splitlines()
              if l.startswith("{\"phase\"")]
    names = [p["phase"] for p in phases]
    assert names == ["write_jpegs", "pack", "train", "eval", "sample",
                     "export", "summary"]
    assert phases[-1]["ok"] is True
    # the pack phase must report whether the native C++ decoder served it
    assert "native_loader" in phases[1]
