#!/usr/bin/env python
"""Persistent TPU experiment worker.

The axon relay charges ~1-8 MINUTES for a process's first device fetch
(docs/axon_runtime_notes.md), which makes one-script-per-measurement
workflows unusable.  This worker pays the flip once, then executes job
files dropped into its spool directory inside one long-lived process and
namespace (compiled programs, scenes, and mid-render states persist
between jobs).

Usage:
    python bench/worker.py [spool_dir]     # default /tmp/tpu_jobs
    # submit: write foo.py into the spool; output appears at foo.out
    # (stdout+stderr+traceback); the job file is renamed foo.done.
    # Jobs run in filename sort order.  A job named quit.py stops the
    # worker after running.
"""

import faulthandler
import io
import signal

# `kill -USR1 <pid>` dumps all thread stacks to stderr (worker.log) —
# the relay occasionally wedges a device RPC and this is the only way to
# see where.
faulthandler.register(signal.SIGUSR1)
import os
import sys
import time
import traceback

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

SPOOL = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(SPOOL, exist_ok=True)

def _relay_port():
    """The axon relay's loopback listener, or None.  A device op issued
    while the listener is gone burns ~50 min per compile inside the C++
    retry loop (docs/axon_runtime_notes.md #20a) — never touch the
    device without this returning a port."""
    from relay_probe import relay_port_up
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return -1  # direct-TPU / CPU environments: no relay to wait for
    return relay_port_up()


while _relay_port() is None:
    print("relay listener absent; waiting before first device op",
          flush=True)
    time.sleep(45)

import numpy as np
import jax
import jax.numpy as jnp

# The axon sitecustomize preimports jax before this file runs, so the
# JAX_COMPILATION_CACHE_DIR setdefault above was read-too-late and the
# disk cache silently stayed OFF; the shared helper's config.update
# works after preimport.
from win32_raytracer_tpu._cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])

t0 = time.perf_counter()
np.asarray(jnp.ones((8,)) + 1)
print(f"sync flip: {time.perf_counter() - t0:.1f}s", flush=True)


class RetryLater(Exception):
    """A job raises this to put itself back at the head of the queue
    (file NOT consumed); the worker sleeps and retries.  Use for
    relay-down guards so an outage pauses the queue instead of
    burning every queued A/B on failed asserts."""


NS = {"np": np, "jax": jax, "jnp": jnp, "time": time,
      "RetryLater": RetryLater, "_relay_port": _relay_port}
print(f"worker ready, spool={SPOOL}", flush=True)

while True:
    jobs = sorted(f for f in os.listdir(SPOOL)
                  if f.endswith(".py") and not f.endswith(".done.py"))
    if not jobs:
        time.sleep(1.0)
        continue
    name = jobs[0]
    path = os.path.join(SPOOL, name)
    out_path = os.path.join(SPOOL, name[:-3] + ".out")
    with open(path) as f:
        src = f.read()
    buf = io.StringIO()
    orig_out, orig_err = sys.stdout, sys.stderr
    t0 = time.perf_counter()
    try:
        sys.stdout = sys.stderr = buf
        exec(compile(src, path, "exec"), NS)
        status = "ok"
    except RetryLater as e:
        status = f"retry ({e})"
    except BaseException:
        traceback.print_exc(file=buf)
        status = "error"
    finally:
        sys.stdout, sys.stderr = orig_out, orig_err
    dt = time.perf_counter() - t0
    if status == "error" and _relay_port() is None:
        # The job died WHILE the relay was absent (it flapped mid-job):
        # the failure is the outage's, not the job's.  Keep the job
        # queued instead of burning a queued A/B per ~50 min C++ retry
        # cycle on a flapping relay.
        status = "retry (relay vanished mid-job)"
    if status.startswith("retry"):
        print(f"{name}: {status}; sleeping 60s (file kept)", flush=True)
        time.sleep(60.0)
        continue
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
        f.write(f"\n# [{status}] {dt:.1f}s\n")
    os.rename(path, path[:-3] + ".done.py")
    print(f"ran {name}: {status} in {dt:.1f}s", flush=True)
    if name == "quit.py":
        break
