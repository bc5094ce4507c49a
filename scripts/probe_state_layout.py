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


def buffer_bytes(shape):
    """Total argument+output bytes of an identity-ish jitted fn on `shape`
    from the compiled executable's memory analysis (device.memory_stats()
    is unavailable through the axon tunnel — returns None)."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x * 2.0)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    ma = fn.lower(spec).compile().memory_analysis()
    return int(ma.argument_size_in_bytes + ma.output_size_in_bytes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    n = args.n
    out = {"device": dev.device_kind, "n": n}
    out["mat_bytes"] = buffer_bytes((n, 3, 3)) // 2      # per buffer
    out["flat_bytes"] = buffer_bytes((n, 9)) // 2
    out["unpadded_bytes"] = n * 9 * 4
    out["mat_over_flat"] = round(out["mat_bytes"] / max(out["flat_bytes"], 1), 1)
    out["mat_expansion"] = round(out["mat_bytes"] / out["unpadded_bytes"], 1)
    out["flat_expansion"] = round(out["flat_bytes"] / out["unpadded_bytes"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
