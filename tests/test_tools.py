"""CLI tools smoke tests (hermetic, CPU)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "MSC_PLATFORM": "cpu", "MSC_USE_MOCK": "1",
       "JAX_PLATFORMS": "cpu"}


def _run(args, timeout=600):
    return subprocess.run([sys.executable, "-m", *args], cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=timeout)


def test_mock_test_cli():
    r = _run(["msc_tpu.tools.mock_test", "--modality", "cams"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"scene_summary"' in r.stdout
    assert "Question:" in r.stdout


def test_export_sample_cli(tmp_path):
    r = _run(["msc_tpu.tools.export_sample", "0", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    names = os.listdir(tmp_path)
    assert "bev_semantic.png" in names
    assert "annotations.csv" in names
    assert any(n.startswith("CAM_") for n in names)


def test_detailed_logs_cli(tmp_path):
    r = _run(["msc_tpu.tools.detailed_logs", "1", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    names = os.listdir(tmp_path)
    assert "SUMMARY.txt" in names
    logs = [n for n in names if n.endswith(".log")]
    assert logs
    text = open(tmp_path / logs[0]).read()
    assert "LAYER 1" in text and "LAYER 4" in text


def test_prefetch_loader():
    from msc_tpu.data.nuscenes import MockNuScenesLoader
    from msc_tpu.data.prefetch import PrefetchLoader

    base = MockNuScenesLoader()
    pre = PrefetchLoader(base, num_workers=2, depth=2)
    tokens = [f"mock_sample_000_{i:03d}" for i in range(4)]
    samples = list(pre.iter_samples(tokens))
    assert [s["sample_token"] for s in samples] == tokens
    # un-scheduled access still works
    s = pre.load_sample("mock_sample_001_000")
    assert s["sample_token"] == "mock_sample_001_000"
    # passthrough attribute
    assert pre.get_scene_list()
    pre.close()


def test_training_cli():
    r = _run(["msc_tpu.training.run", "--steps", "3", "--scenes", "2",
              "--preset", "msc-vlm-tiny"])
    assert r.returncode == 0, r.stderr[-1500:]
    assert "loss" in r.stdout


def test_watchdog_forwards_sigterm(tmp_path):
    """`timeout N watchdog ...` must not orphan the child (it runs in its
    own session): the watchdog forwards SIGTERM to the child's group."""
    import signal
    import time

    log = tmp_path / "wd.log"
    pidfile = tmp_path / "child.pid"
    child = ("import os, time, sys\n"
             f"open({str(pidfile)!r}, 'w').write(str(os.getpid()))\n"
             "sys.stdout.write('up\\n'); sys.stdout.flush()\n"
             "time.sleep(600)\n")
    proc = subprocess.Popen(
        [sys.executable, "-m", "msc_tpu.tools.watchdog", "--log", str(log),
         "--stall-minutes", "99", "--", sys.executable, "-c", child],
        cwd=REPO, env=ENV, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not pidfile.exists():
            time.sleep(0.2)
        assert pidfile.exists(), "child never started"
        child_pid = int(pidfile.read_text())
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        # child group must be gone shortly after the watchdog exits
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                os.kill(child_pid, 0)
            except ProcessLookupError:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("child survived the watchdog's SIGTERM")
    finally:
        if proc.poll() is None:
            proc.kill()
