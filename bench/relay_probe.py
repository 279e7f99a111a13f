"""Axon relay liveness probe, shared by bench.py and bench/worker.py.

The axon TPU tunnel exposes a loopback listener somewhere in 8080-8220;
when it is absent, the FIRST device op retries inside the C++ client for
~50 min per compile (docs/axon_runtime_notes.md #20a), so callers must
gate device work on this probe instead of discovering the outage the
slow way.  Keeping the scan in one module stops the port range /
timeout from drifting between the two callers.
"""

import socket

PORT_RANGE = range(8080, 8221)


def relay_port_up(timeout: float = 0.4):
    """Return the first listening relay port, or None when the relay is
    absent.  Truthy/falsy, so existing ``if up():`` callers just work."""
    for p in PORT_RANGE:
        s = socket.socket()
        s.settimeout(timeout)
        try:
            s.connect(("127.0.0.1", p))
            return p
        except OSError:
            pass
        finally:
            s.close()
    return None
