"""Measure host->device transfer for the flagship input payload.

parallel.latency.broadcast_ms models the per-frame input broadcast with
HOST_INJECT_GBPS (host->device injection) and ICI_GBPS (on-slice
replication).  The ICI term cannot be measured with one chip; the host
term CAN be anchored: this probe times device_put of the flagship uint8
YUV420 payload (3840x2160 + 2x 1920x1080 = 12.4 MB) to the default
device, repeated, and backs out an effective injection rate.

On the development tunnel this measures the HTTP transport (~MB/s), not
a production PCIe/DMA path — the number is published as the measured
floor OF THIS DEPLOYMENT, and the production default stays a modeled
figure with that caveat attached (docs/perf.md).

    python tools/probe_h2d.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

IN_W, IN_H = 3840, 2160


def main():
    from transform360_tpu import chroma_dims
    from transform360_tpu.utils.backend import ensure_device

    ensure_device()
    import jax

    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    nbytes = IN_W * IN_H + 2 * cw * ch
    dev = jax.devices()[0]

    # warm the path once (plugin setup, any lazy handshakes)
    jax.block_until_ready(
        jax.device_put(rng.integers(0, 256, (64, 64), np.uint8), dev)
    )

    times = []
    for rep in range(5):
        # fresh arrays each rep so no caching/dedup of identical buffers
        y = rng.integers(0, 256, (IN_H, IN_W), dtype=np.uint8)
        u = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        v = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        t0 = time.perf_counter()
        jax.block_until_ready(
            [jax.device_put(p, dev) for p in (y, u, v)]
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "payload_mbytes": round(nbytes / 1e6, 2),
                "best_s": round(best, 3),
                "all_s": [round(t, 3) for t in times],
                "effective_gbps": round(nbytes / best / 1e9, 4),
                "backend": jax.default_backend(),
                "note": "dev-tunnel H2D when backend=axon; production "
                "PCIe is not reachable from this harness",
            }
        )
    )


if __name__ == "__main__":
    main()
