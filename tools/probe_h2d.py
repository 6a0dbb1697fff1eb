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

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    nbytes = IN_W * IN_H + 2 * cw * ch
    dev = jax.devices()[0]

    # block_until_ready on a device_put does NOT fence the tunneled
    # transfer (NOTES.md "Measurement discipline") — every rep is fenced
    # by a host read of a scalar computed FROM the transferred bytes.
    @jax.jit
    def digest(y, u, v):
        return (
            jnp.sum(y, dtype=jnp.int32)
            + jnp.sum(u, dtype=jnp.int32)
            + jnp.sum(v, dtype=jnp.int32)
        )

    def put_and_fence(y, u, v):
        t0 = time.perf_counter()
        yd, ud, vd = (jax.device_put(p, dev) for p in (y, u, v))
        s = int(digest(yd, ud, vd))
        return time.perf_counter() - t0, s

    y = rng.integers(0, 256, (IN_H, IN_W), dtype=np.uint8)
    u = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    put_and_fence(y, u, v)  # warm: compile digest, open the path

    # resident baseline: the same fenced digest on arrays already on
    # device — subtracting it isolates the transfer itself
    yd, ud, vd = (jax.device_put(p, dev) for p in (y, u, v))
    int(digest(yd, ud, vd))
    t0 = time.perf_counter()
    for _ in range(3):
        int(digest(yd, ud, vd))
    resident = (time.perf_counter() - t0) / 3

    times = []
    for rep in range(5):
        # fresh random arrays each rep so no caching/dedup of buffers
        y = rng.integers(0, 256, (IN_H, IN_W), dtype=np.uint8)
        u = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        v = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        dt, _ = put_and_fence(y, u, v)
        times.append(dt)
    best = max(min(times) - resident, 1e-9)
    print(
        json.dumps(
            {
                "payload_mbytes": round(nbytes / 1e6, 2),
                "best_fenced_s": round(min(times), 3),
                "resident_digest_s": round(resident, 3),
                "transfer_s": round(best, 3),
                "all_fenced_s": [round(t, 3) for t in times],
                "effective_gbps": round(nbytes / best / 1e9, 4),
                "backend": jax.default_backend(),
                "note": "dev-tunnel H2D when backend=axon; production "
                "PCIe is not reachable from this harness",
            }
        )
    )


if __name__ == "__main__":
    main()
