"""Single-core Gorilla codec microbench: encode/decode points/s of the
CURRENT codec vs the pre-vectorization bit-at-a-time writer (recovered
from git as a spec reference inside gorilla.py itself: _encode_*_loop).

Prints one JSON line with pts/s for timestamps and values, old vs new,
plus the speedup — the BASELINE.md before/after record for the round-4
"vectorize the Gorilla bit emission" item.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_correction_project_updated_ray.state import gorilla as G

N = 2_000_000
REPS = 3


def timed(fn, *args) -> float:
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    rng = np.random.default_rng(7)
    # realistic series: near-regular timestamps, smooth values
    t = np.cumsum(rng.integers(55, 66, N)).astype(np.int64)
    v = np.round(np.cumsum(rng.normal(0, 0.05, N)) + 20.0, 3)

    new_ts = timed(G.encode_timestamps, t)
    new_val = timed(G.encode_values, v)
    old_ts = timed(G._encode_timestamps_loop, t)
    old_val = timed(G._encode_values_loop, v)

    # identical bitstreams (the loop writers are the spec)
    assert G.encode_timestamps(t) == G._encode_timestamps_loop(t)
    assert G.encode_values(v) == G._encode_values_loop(v)

    ts_enc, val_enc = G.encode_timestamps(t), G.encode_values(v)
    dec_ts = timed(G.decode_timestamps, ts_enc)
    dec_val = timed(G.decode_values, val_enc)
    dec_ts_old = timed(G._decode_timestamps_loop, ts_enc)
    dec_val_old = timed(G._decode_values_loop, val_enc)

    print(json.dumps({
        "n_points": N,
        "ts_encode_pts_per_s": {"old_loop": round(N / old_ts, 0),
                                "vectorized": round(N / new_ts, 0),
                                "speedup": round(old_ts / new_ts, 2)},
        "val_encode_pts_per_s": {"old_loop": round(N / old_val, 0),
                                 "vectorized": round(N / new_val, 0),
                                 "speedup": round(old_val / new_val, 2)},
        "ts_decode_pts_per_s": {"old_loop": round(N / dec_ts_old, 0),
                                "vectorized": round(N / dec_ts, 0),
                                "speedup": round(dec_ts_old / dec_ts, 2)},
        "val_decode_pts_per_s": {"old_loop": round(N / dec_val_old, 0),
                                 "vectorized": round(N / dec_val, 0),
                                 "speedup": round(dec_val_old / dec_val, 2)},
    }))


if __name__ == "__main__":
    main()
