"""Scratch-dir hygiene: session-created tmp dirs must vanish at process
exit and stale orphans from dead sessions must get swept — the
"no unbounded growth after 10 repeated runs" contract."""

from __future__ import annotations

import os
import subprocess
import sys

from flink_gmall_spark import scratch


def test_scratch_dirs_removed_at_interpreter_exit(tmp_path):
    code = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["TMPDIR"] = {tmp!r}
import tempfile; tempfile.tempdir = None  # re-read TMPDIR
from flink_gmall_spark import scratch
d1 = scratch.scratch_dir("wh", "t1")
d2 = scratch.scratch_dir("dim_sink", "t2")
open(os.path.join(d1, "x.parquet"), "w").write("data")
print(d1); print(d2)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), tmp=str(tmp_path))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    d1, d2 = out.stdout.strip().splitlines()
    assert not os.path.exists(d1) and not os.path.exists(d2)


def test_stale_orphans_swept_fresh_kept(tmp_path, monkeypatch):
    monkeypatch.setattr(scratch, "ROOT", str(tmp_path / "fgs_scratch"))
    monkeypatch.setattr(scratch, "_swept", False)
    stale = tmp_path / "fgs_scratch" / "wh" / "deadbeef"
    stale.mkdir(parents=True)
    old = 1_000_000.0  # epoch 1970 — ancient
    os.utime(stale, (old, old))
    fresh = tmp_path / "fgs_scratch" / "wh" / "alive"
    fresh.mkdir()
    got = scratch.scratch_dir("bucketed", "now")
    assert os.path.isdir(got)
    assert not stale.exists()  # orphan reaped
    assert fresh.exists()  # concurrent session untouched


def test_same_tag_reuses_path(monkeypatch, tmp_path):
    monkeypatch.setattr(scratch, "ROOT", str(tmp_path / "r"))
    a = scratch.scratch_dir("wh", "k")
    b = scratch.scratch_dir("wh", "k")
    assert a == b and os.path.isdir(a)
