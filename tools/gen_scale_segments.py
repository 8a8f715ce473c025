#!/usr/bin/env python3
"""Generate a LARGE synthetic segments file for FSM throughput benchmarking
(not committed as a fixture; correctness at this scale is covered by the
small golden fixtures + oracle).

Usage: python3 tools/gen_scale_segments.py <n_taxis> <out_path>
Each taxi gets ~8 trips of ~8 points (~130 segment rows), so n_taxis=8000
yields ~1M rows (~100 MB).
"""
import math
import random
import sys

SFO = (37.62131, -122.37896)


def main():
    n_taxis = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/segments_big.txt"
    rng = random.Random(11)
    with open(out, "w") as f:
        for taxi in range(1, n_taxis + 1):
            t = 1211702400 + rng.randint(0, 86400 * 3)
            lat = rng.uniform(37.55, 37.80)
            lon = rng.uniform(-122.45, -122.38)
            prev = None
            for _ in range(rng.randint(6, 10)):  # trips
                for phase, npts in (("E", rng.randint(2, 4)), ("M", rng.randint(5, 12))):
                    if phase == "M" and rng.random() < 0.5:
                        lat, lon = SFO[0] + rng.uniform(-0.006, 0.006), SFO[1] + rng.uniform(-0.006, 0.006)
                    for _ in range(npts):
                        cur = (t, lat, lon, phase)
                        if prev is not None:
                            f.write(seg_line(taxi, prev, cur))
                        prev = cur
                        t += rng.randint(40, 90)
                        lat += rng.uniform(-0.005, 0.005)
                        lon += rng.uniform(-0.005, 0.005)
            # keep coordinates in the valid box
                lat = min(max(lat, 37.0), 39.5)
                lon = min(max(lon, -123.5), -119.5)
    print(out)


def ts_str(epoch):
    from datetime import datetime, timezone
    return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def seg_line(taxi, a, b):
    return (f"{taxi},'{ts_str(a[0])}',{a[1]:.5f},{a[2]:.5f},'{a[3]}',"
            f"'{ts_str(b[0])}',{b[1]:.5f},{b[2]:.5f},'{b[3]}'\n")


if __name__ == "__main__":
    main()
