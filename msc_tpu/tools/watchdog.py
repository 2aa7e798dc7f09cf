"""Stall watchdog for long TPU runs (training, evals, sweeps).

The axon TPU tunnel can silently wedge a host process mid-run: the
process keeps existing but stops making progress (no new log output, no
CPU).  Round 3 lost two training runs to this (vlm-s at step 15000/26000,
vlm-m at ~700) and recovered only via an ad-hoc /tmp script; this tool
commits that mitigation as repo code (round-3 VERDICT item 5).

Mechanism: run the command with stdout/stderr appended to --log, poll
the log's size; if it hasn't grown for --stall-minutes, SIGTERM the
child's process group (graceful; escalate to SIGKILL after --grace
seconds), then relaunch the SAME command.  The command must therefore be
resumable — ``msc_tpu.training.distill --save ... --save-every N
--resume`` restores params+optimizer+step from its last periodic save, so
a kill costs at most N steps.  A child that exits 0 ends the loop; a
nonzero exit (tunnel teardown crash) relaunches too.

Kills go to the child's own process group ONLY (it is started in a new
session) — never by name/pattern matching, which can hit unrelated
processes.

Usage:
    python -m msc_tpu.tools.watchdog --log /tmp/r12.log \
        [--stall-minutes 15] [--max-restarts 10] -- \
        python -m msc_tpu.training.distill --steps 26000 \
            --save ckpt/distill_r12 --save-every 1000 --resume

Greenfield subsystem: the reference has no long-running local jobs (its
model calls are stateless Azure HTTPS requests, `src/agents/
base_agent.py:36-58` retries each one individually), so it never needed
run-level failure recovery.  SURVEY.md section 5 "failure detection".
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _log_size(path: str) -> int:
    try:
        return os.stat(path).st_size
    except OSError:
        return -1


def _terminate(proc: subprocess.Popen, grace: float) -> None:
    """SIGTERM the child's process group, escalate to SIGKILL."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, wait_s in ((signal.SIGTERM, grace), (signal.SIGKILL, 30.0)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        deadline = time.time() + wait_s
        while time.time() < deadline:
            if proc.poll() is not None:
                return
            time.sleep(1.0)


def run_with_watchdog(cmd: list[str], log_path: str, stall_minutes: float,
                      max_restarts: int, grace: float = 60.0,
                      poll_s: float = 20.0) -> int:
    """Run ``cmd`` under stall supervision.  Returns the final exit code
    (0 on a clean child exit; 1 when restarts are exhausted)."""
    stall_s = stall_minutes * 60.0
    attempt = 0

    # Forward our own termination to the child's process group: the child
    # runs in its OWN session (so stall kills never hit the watchdog), which
    # also means a SIGTERM to the watchdog (e.g. `timeout N watchdog ...`)
    # would otherwise ORPHAN a trainer that keeps holding the TPU.
    current: list = [None]

    def _forward(signum, frame):
        proc = current[0]
        if proc is not None:
            _terminate(proc, grace)
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)

    while True:
        attempt += 1
        with open(log_path, "ab", buffering=0) as logf:
            logf.write(
                f"\n=== watchdog: launch #{attempt}: "
                f"{' '.join(cmd)} ===\n".encode())
            proc = subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                    start_new_session=True)
            current[0] = proc
            print(f"watchdog: attempt {attempt} pid={proc.pid} "
                  f"log={log_path} stall={stall_minutes:g}min", flush=True)
            last_size = _log_size(log_path)
            last_growth = time.time()
            stalled = False
            while proc.poll() is None:
                time.sleep(poll_s)
                size = _log_size(log_path)
                if size != last_size:
                    last_size = size
                    last_growth = time.time()
                elif time.time() - last_growth > stall_s:
                    print(f"watchdog: no log growth for "
                          f"{stall_minutes:g}min — killing pid {proc.pid}",
                          flush=True)
                    logf.write(b"\n=== watchdog: STALL KILL ===\n")
                    _terminate(proc, grace)
                    stalled = True
                    break
        rc = proc.returncode
        if rc == 0 and not stalled:
            print("watchdog: clean exit", flush=True)
            return 0
        print(f"watchdog: child ended rc={rc} stalled={stalled} "
              f"(attempt {attempt}/{max_restarts + 1})", flush=True)
        if attempt > max_restarts:
            print("watchdog: restart budget exhausted", flush=True)
            return 1
        time.sleep(5.0)  # let the tunnel teardown settle before relaunch


def main() -> None:
    ap = argparse.ArgumentParser(
        description="run a resumable command under a log-stall watchdog")
    ap.add_argument("--log", required=True,
                    help="file to append the child's stdout+stderr to "
                         "(growth of this file is the liveness signal)")
    ap.add_argument("--stall-minutes", type=float, default=15.0)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--grace", type=float, default=60.0,
                    help="seconds between SIGTERM and SIGKILL")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to run (prefix with --)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (append: -- <cmd> <args...>)")
    sys.exit(run_with_watchdog(cmd, args.log, args.stall_minutes,
                               args.max_restarts, args.grace))


if __name__ == "__main__":
    main()
