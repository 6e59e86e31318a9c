"""TPU job runner with stall watchdog + retry.

The axon tunnel sporadically wedges a session's first eager device
readback (futex-wait forever, ~50% of sessions). Mitigation: kill the
process group on output stall, cool down, retry.

Usage: python scripts/tpu_run.py LOGFILE -- CMD ARGS...
Env: STALL_S (default 300), TRIES (default 4), COOLDOWN_S (default 180),
PRE_S (default 300): stall window used UNTIL the log contains "device ok"
(printed by jobs right after their first tiny device readback — the op
the wedge freezes). Once seen, STALL_S applies (long Mosaic compiles are
legitimately silent for many minutes).
"""
import os
import signal
import subprocess
import sys
import time

log_path = sys.argv[1]
assert sys.argv[2] == "--"
cmd = sys.argv[3:]
stall_s = int(os.environ.get("STALL_S", "300"))
pre_s = int(os.environ.get("PRE_S", "300"))
tries = int(os.environ.get("TRIES", "4"))
cooldown = int(os.environ.get("COOLDOWN_S", "180"))


def _probed(path):
    try:
        with open(path, "rb") as f:
            return b"device ok" in f.read()
    except OSError:
        return False


# fast nonzero exits with these markers are the tunnel's OTHER failure
# mode (backend init dies instead of wedging) — retryable just like a
# stall (this is what killed round-2's BENCH record)
_INIT_FAIL_MARKERS = (b"Unable to initialize backend",
                      b"UNAVAILABLE: TPU backend setup",
                      b"DEADLINE_EXCEEDED")


def _init_failed(path):
    """True only for failures BEFORE the first successful device op: a
    marker appearing after "device ok" is a real job error (e.g. a
    deadline inside the workload) and must not be retried."""
    try:
        with open(path, "rb") as f:
            data = f.read()
        if b"device ok" in data:
            return False
        return any(m in data for m in _INIT_FAIL_MARKERS)
    except OSError:
        return False

for attempt in range(1, tries + 1):
    with open(log_path, "w") as log:
        log.write(f"[tpu_run] attempt {attempt}: {' '.join(cmd)}\n")
        log.flush()
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        p = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                             start_new_session=True, env=env)
        stalled = False
        while True:
            try:
                rc = p.wait(timeout=20)
                break
            except subprocess.TimeoutExpired:
                pass
            window = stall_s if _probed(log_path) else pre_s
            if time.time() - os.path.getmtime(log_path) > window:
                stalled = True
                log.write(f"\n[tpu_run] attempt {attempt} stalled "
                          f"({window}s no output); killing\n")
                log.flush()
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except OSError:
                    p.kill()
                rc = p.wait()
                break
    if not stalled:
        if rc != 0 and _init_failed(log_path):
            with open(log_path, "a") as log:
                log.write(f"\n[tpu_run] attempt {attempt} rc={rc}: backend "
                          f"init failure; retrying\n")
        else:
            with open(log_path, "a") as log:
                log.write(f"\n[tpu_run] attempt {attempt} rc={rc}\n")
            sys.exit(rc)
    time.sleep(cooldown)

with open(log_path, "a") as log:
    log.write(f"\n[tpu_run] giving up after {tries} attempts\n")
sys.exit(1)
