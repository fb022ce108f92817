"""Index-build stage profile: where does build wall time go?

Runs build_index over a synthetic genome with the BUILD_PROF accumulators
on (index/build.py), printing per-stage walls:

  stage    — host staging of diet-code rows into the dispatch buffer
  dispatch — jnp.asarray H2D + sketch_emit_build dispatch (async)
  fetch    — blocking np.asarray of the fused (xy, cnt) device tensors
  collect  — ownership filter + key extraction on host
  sort     — the C LSD radix over (keys, ys)
  csr      — unique boundaries + CSR assembly

Usage: python eval/profile_build.py [genome_mb] [pattern]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(mb: int = 100, pattern: str = "10"):
    import gdiet_tpu.index.build as ib
    from gdiet_tpu.config import options_for

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, mb * 1_000_000).astype(np.uint8)
    io_, _ = options_for("sr", pattern=pattern, k=21, w=11)

    # warm the sketch compile so the profile is steady-state
    ib.build_index([("warm", codes[:2_000_000])], io_)

    ib.BUILD_PROF = prof = {
        "stage": 0.0, "dispatch": 0.0, "fetch": 0.0, "collect": 0.0,
        "overflows": 0,
    }
    t0 = time.perf_counter()
    mi = ib.build_index([("chr1", codes)], io_)
    wall = time.perf_counter() - t0
    ib.BUILD_PROF = None
    accounted = sum(v for k, v in prof.items() if k != "overflows")
    print(f"genome: {mb} Mbp pattern {pattern}; build wall {wall:.1f}s "
          f"({mb * 1e6 / wall / 1e6:.1f} Mbp/s)")
    for k, v in prof.items():
        if k == "overflows":
            print(f"  {k:9s} {v}")
        else:
            print(f"  {k:9s} {v:7.2f}s ({100 * v / wall:4.1f}%)")
    print(f"  unaccounted (sort+csr+misc) {wall - accounted:7.2f}s "
          f"({100 * (wall - accounted) / wall:4.1f}%)")
    print(f"  minimizers: {len(mi.positions)}")


if __name__ == "__main__":
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    pat = sys.argv[2] if len(sys.argv) > 2 else "10"
    main(mb, pat)
