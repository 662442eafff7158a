"""Measure the chip's actually-usable HBM by incremental allocation.

The axon PJRT plugin reports no memory stats (`memory_stats()` is
None), and rungs sized to the nominal 16 GB of a v5e have OOM'd well
under it (the 12 GB-static 1M-hybrid serve rung; 8 GB-static 128-slot
decode) — so measure: allocate 256 MB device buffers until
RESOURCE_EXHAUSTED, forcing materialization of each with a 1-element
fetch (the lazy tunnel executes nothing otherwise). The failed
allocation wedges the device for the rest of THIS process (known axon
behavior, memory/axon-hbm-failure-modes), which is fine: print and
exit. Run it as its own queue task, never inside another bench.

Usage: python tools/probe_hbm.py  ->  one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    chunk_mb = int(os.environ.get("PROBE_CHUNK_MB", 256))
    shape = (chunk_mb, 1024, 1024)  # uint8 -> chunk_mb MB
    held = []
    err = ""
    while True:
        try:
            buf = jnp.zeros(shape, jnp.uint8)
            int(buf[0, 0, 0])  # force materialization through the tunnel
            held.append(buf)
        except Exception as e:  # noqa: BLE001 — any backend error ends it
            err = type(e).__name__
            break
        if len(held) * chunk_mb > 64 * 1024:  # safety: something's wrong
            err = "no-limit-hit"
            break
    total_gb = len(held) * chunk_mb / 1024
    print(json.dumps({
        "metric": "usable HBM by incremental allocation",
        "backend": jax.default_backend(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "chunk_mb": chunk_mb,
        "usable_gb": round(total_gb, 2),
        "stopped_by": err,
        "elapsed_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
