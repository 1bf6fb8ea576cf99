"""Cross-process serialization lock for real-TPU client launches.

Operational hardening for the remote (axon-tunneled) TPU terminal: the
terminal serializes remote compiles server-side, a killed client's compile
keeps running there, and enough orphaned compiles wedge the chip claim
itself — after which `jax.devices()` blocks in make_c_api_client for every
new process for 45+ minutes (this cost round 3 its endgame; CLAUDE.md
"Environment traps" #6). Every durf_tpu entrypoint that will create a
real-TPU client therefore takes ONE exclusive flock for the lifetime of the
process, so TPU jobs on this box strictly serialize instead of racing.

The reference has no analogue (it assumes dedicated local GPUs,
train_boxpose.py:56-60 pmap setup); this guards a shared remote accelerator.

Usage: call `acquire_tpu_lock()` at the top of main(), BEFORE the first jax
device/compile call. No-ops when the process is pinned to CPU (tests, the
multichip dryrun) or when DURF_TPU_NO_LOCK=1.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time

LOCK_PATH = "/tmp/durf_tpu.tpu.lock"

_lock_fd: int | None = None  # module-global: held until process exit


def _cpu_only() -> bool:
    """True when this process will never open a real-TPU client."""
    try:
        import jax

        platforms = jax.config.jax_platforms or ""
    except Exception:  # pragma: no cover - jax always importable here
        platforms = os.environ.get("JAX_PLATFORMS", "")
    return platforms.split(",")[0].strip() == "cpu"


def acquire_tpu_lock(poll_note_secs: float = 60.0) -> bool:
    """Take the exclusive TPU-launch lock for this process (blocking).

    Returns True if the lock was taken, False if skipped (CPU-only process,
    DURF_TPU_NO_LOCK=1, or already held by this process). Blocks until the
    current holder exits, printing a note every `poll_note_secs` so a human
    watching the log sees WHY nothing is happening — silent queueing is how
    round 3 ended up with three watchers racing one chip.
    """
    global _lock_fd
    if _lock_fd is not None or os.environ.get("DURF_TPU_NO_LOCK") == "1":
        return False
    if _cpu_only():
        return False
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.time()
    last_note = t0 - poll_note_secs  # first blocked iteration notes at once
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except BlockingIOError:
            now = time.time()
            if now - last_note >= poll_note_secs:
                print(
                    f"# waiting for TPU lock ({LOCK_PATH}) held by another "
                    f"durf_tpu process — {now - t0:.0f}s",
                    file=sys.stderr,
                    flush=True,
                )
                last_note = now
            time.sleep(1.0)  # 1 s slices keep Ctrl-C responsive
    os.ftruncate(fd, 0)
    os.write(fd, f"pid={os.getpid()} argv={' '.join(sys.argv[:4])}\n".encode())
    _lock_fd = fd  # held (and flock auto-released) until process exit
    return True
