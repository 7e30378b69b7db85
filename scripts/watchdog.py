#!/usr/bin/env python3
"""Wedge watchdog: run a long chip command, auto-kill + relaunch on stall.

The axon runtime occasionally wedges a client mid-run (futex wait, 0% CPU,
no error — three long runs died this way in round 3, see
artifacts/walker_walk_sgsac_flag_r3b/README.md). The framework already has
true resume (train/loop.py + core/checkpoint.py, proven bit-identical in
tests/test_train.py::test_resume_identical_metrics); this wrapper closes
the tooling gap: it watches the run's work dir for forward progress and,
when the files stop moving while the process is still alive, kills the
child's whole process group (which clears the device queue — measured in
round 3: killing the wedged client un-wedges the chip) and relaunches the
SAME command so the loop resumes from the latest resume checkpoint.

Never kills by pattern — only the child process group it spawned.

Usage:
    python scripts/watchdog.py --watch <workdir> [--stall-sec 420]
        [--grace-sec 1800] [--max-restarts 6] [--log <file>] -- cmd args...

Progress = any mtime advance under --watch (train.log rows, checkpoint
writes). Two timers:
  * grace-sec: allowed silence after a (re)launch before first progress —
    covers cold compiles (~13 min for walker-class chunks) and the
    >10-min orbax-restore stall a killed-mid-write checkpoint can cause
    (CLAUDE.md hard-won facts).
  * stall-sec: allowed silence once the run has made progress — training
    writes JSONL every episode chunk (seconds apart), so minutes of
    silence means a wedge (or an eval/compile pause; keep >= ~7 min).

Exit code: the child's rc once it exits 0, or the last rc / 98 when the
restart budget is exhausted.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def newest_mtime(root: str) -> float:
    latest = 0.0
    if not os.path.isdir(root):
        return latest
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            try:
                latest = max(latest, os.path.getmtime(os.path.join(dirpath, f)))
            except OSError:
                pass
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", required=True, help="work dir to watch")
    ap.add_argument("--stall-sec", type=float, default=420.0)
    ap.add_argument("--grace-sec", type=float, default=1800.0)
    ap.add_argument("--max-restarts", type=int, default=6)
    ap.add_argument("--poll-sec", type=float, default=20.0)
    ap.add_argument("--log", default=None, help="append watchdog events here")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- then the command to run")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (pass it after --)")

    logf = open(args.log, "a", buffering=1) if args.log else sys.stderr

    def note(msg: str):
        line = f"[watchdog {time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        if logf is not sys.stderr:
            logf.write(line + "\n")

    # SIGTERM/SIGINT (e.g. an outer `timeout`) must take the child's whole
    # process group down with the watchdog — the round-4 dryrun leak
    # (VERDICT weak #4) was exactly a parent dying while its re-exec'd
    # child ran on for hours; same hazard here without this.
    child = None

    def _on_signal(signum, frame):
        if child is not None:
            try:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        os._exit(124)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    rc = 98
    for attempt in range(args.max_restarts + 1):
        note(f"launch attempt {attempt + 1}/{args.max_restarts + 1}: "
             f"{' '.join(cmd)}")
        child = subprocess.Popen(cmd, start_new_session=True)
        launched = time.time()
        base = newest_mtime(args.watch)
        last_progress = None  # None until the first mtime advance
        killed = False
        while True:
            try:
                child.wait(timeout=args.poll_sec)
                break  # child exited on its own
            except subprocess.TimeoutExpired:
                pass
            m = newest_mtime(args.watch)
            now = time.time()
            if m > base:
                base = m
                last_progress = now
            silence = now - (last_progress if last_progress is not None
                             else launched)
            budget = (args.stall_sec if last_progress is not None
                      else args.grace_sec)
            if silence > budget:
                note(f"STALL: {silence:.0f}s with no file progress under "
                     f"{args.watch} (budget {budget:.0f}s) — killing pgid "
                     f"{child.pid}")
                try:
                    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
                child.wait()
                killed = True
                break
        rc = child.returncode
        if not killed and rc == 0:
            note("child completed cleanly")
            return 0
        note(f"child ended rc={rc} killed={killed}; "
             + ("restarting (resume picks up)" if attempt < args.max_restarts
                else "restart budget exhausted"))
        time.sleep(5)
    return rc if rc != 0 else 98


if __name__ == "__main__":
    sys.exit(main())
