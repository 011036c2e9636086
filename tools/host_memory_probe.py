"""Host memory-path probe: measure first-touch (fresh-page) allocation
throughput vs warm in-place copy throughput.

Motivation (round-15 finding, SCALING.md "the chronic variance
mechanism, measured"): three rounds of bench drift flags were all
plan-fp-same with rotating membership — classic box noise, but with no
visible mechanism: load average clean at launch, CPU steal ~0.09%
under a full 32-core user-mode burn, zero memory/io pressure inside
the VM. This probe found it: FIRST-TOUCH of fresh anonymous memory
(the hypervisor page-supply path — EPT faults + host page allocation)
runs at 0.1-0.5 GB/s in the degraded phases and fluctuates 4x between
runs seconds apart, while warm memcpy holds ~5-6 GB/s. A Spark session
faults in tens of GB of fresh JVM heap and shuffle buffers, so a
degraded page-supply path inflates every query uniformly at identical
plan fingerprints — exactly the observed flag signature, and invisible
to load/steal/pressure metrics.

Usage: python tools/host_memory_probe.py  (no Spark; ~30 s)
Prints one JSON line: first-touch GB/s per rep, warm-copy GB/s per
rep, and min/max. Record alongside any bench control point whose
flags need attribution; first_touch_min >= ~2 GB/s is a healthy box,
<= ~0.5 GB/s is the degraded phase where no bench number is a
code signal.
"""

from __future__ import annotations

import json
import time

import numpy as np

REPS = 4
FRESH_BYTES = 2**29  # 512 MiB per first-touch rep
WARM_BYTES = 2**28  # 256 MiB warm-copy buffer


def main() -> None:
    first_touch = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        a = np.ones(FRESH_BYTES // 8, dtype=np.float64)
        dt = time.perf_counter() - t0
        first_touch.append(round(FRESH_BYTES / 2**30 / dt, 3))
        del a
        time.sleep(1)

    warm_src = np.ones(WARM_BYTES // 8, dtype=np.float64)
    warm_dst = np.empty_like(warm_src)  # fault both in once
    warm_dst[:] = warm_src
    warm = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        warm_dst[:] = warm_src
        dt = time.perf_counter() - t0
        warm.append(round(WARM_BYTES / 2**30 / dt, 3))

    print(
        json.dumps(
            {
                "first_touch_gbps": first_touch,
                "first_touch_min": min(first_touch),
                "warm_copy_gbps": warm,
                "warm_copy_min": min(warm),
                "degraded": min(first_touch) < 0.5,
            }
        )
    )


if __name__ == "__main__":
    main()
