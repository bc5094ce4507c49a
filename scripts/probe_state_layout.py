"""Measure at-rest HBM cost of (n, 3, 3) vs (n, 9) particle-matrix leaves.

The round-4 flat particle state (sim/state.py) rests on the claim that a
(n, d, d) program input/output buffer pays the TPU's (8, 128) minor-dim
tile padding (~42-57x) while (n, d*d) lays out ~1.1x. This probes the
live per-device memory stats around committed allocations of both shapes.

Usage: python scripts/probe_state_layout.py [--n 1000000]
"""

from __future__ import annotations

import argparse
import json


def device_bytes(dev):
    stats = dev.memory_stats()
    return stats.get("bytes_in_use", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    n = args.n
    out = {"device": dev.device_kind, "n": n}

    base = device_bytes(dev)
    a_mat = jax.device_put(jnp.ones((n, 3, 3), jnp.float32), dev)
    a_mat.block_until_ready()
    out["mat_bytes"] = device_bytes(dev) - base
    del a_mat

    base = device_bytes(dev)
    a_flat = jax.device_put(jnp.ones((n, 9), jnp.float32), dev)
    a_flat.block_until_ready()
    out["flat_bytes"] = device_bytes(dev) - base
    del a_flat

    out["unpadded_bytes"] = n * 9 * 4
    if out["flat_bytes"]:
        out["mat_over_flat"] = round(out["mat_bytes"] / max(out["flat_bytes"], 1), 1)
    out["mat_expansion"] = round(out["mat_bytes"] / out["unpadded_bytes"], 1)
    out["flat_expansion"] = round(out["flat_bytes"] / out["unpadded_bytes"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
