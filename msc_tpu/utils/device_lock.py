"""Global device-dispatch lock.

The axon tunnel degrades badly when multiple host threads issue device
work concurrently (measured 0.13 vs 0.48 scenes/sec).  Concurrent scene
pipelines therefore serialize their DEVICE work through this lock while
their host work (prompt building, parsing, IO) still overlaps; combined
with the ContinuousBatcher the device sees few, large, orderly calls.

On direct-attached TPUs this lock is uncontended overhead-free (RLock
acquire ~100 ns) and can stay on.
"""

from __future__ import annotations

import threading

DEVICE_LOCK = threading.RLock()
