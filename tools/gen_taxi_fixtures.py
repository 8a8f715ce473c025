#!/usr/bin/env python3
"""Deterministic taxi-format fixture generator + independent golden oracle.

Generates the committed test fixtures (FIXTURES.md §A) under
src/test/resources/taxi/:

  trips.txt           - Q1 input (space-separated 11-field trips format)
  segments.txt        - Q2 input (9-field quoted CSV segments format)
  golden_q1.txt       - expected Q1 histogram (bin\tcount, bin-sorted)
  golden_q2_trips.txt - expected Q2 formatted airport-trip lines (sorted)
  golden_q2_daily.txt - expected date\tdaily_revenue lines
  golden_q2_total.txt - expected grand total

The golden outputs are computed by an INDEPENDENT Python re-implementation
of the reference semantics (spec: SURVEY.md §2.2; constants from
/root/reference/src/AirportTripsRevenue.java:23-38) — not by the Scala
engine under test. Python floats are IEEE doubles and the arithmetic below
uses the same operation order as the engine, so values agree bit-for-bit
(formatting boundaries aside, which the fixtures avoid).

Run: python3 tools/gen_taxi_fixtures.py   (idempotent, seed-pinned)
"""
import math
import os
import random
from collections import defaultdict
from decimal import Decimal

R = 6371.009
SFO = (37.62131, -122.37896)
BBOX = (36.50, 39.80, -123.80, -119.10)  # min_lat, max_lat, min_long, max_long
COAST_A, COAST_B = -1.3388206045302447, -126.75838718367324
FARE_BASE, FARE_KM = 3.5, 1.71
MAX_SPEED, MAX_GAP, MIN_TRIP = 180.0, 210.0, 0.100

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "taxi")


def dist(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat1 - lat2)
    dlon = math.radians(lon1 - lon2)
    mean = math.radians((lat1 + lat2) / 2.0)
    return R * math.sqrt(dlat * dlat + math.pow(math.cos(mean) * dlon, 2))


def valid(lat, lon):
    return (lat >= COAST_A * lon + COAST_B and BBOX[0] <= lat <= BBOX[1]
            and BBOX[2] <= lon <= BBOX[3])


def near_sfo(lat, lon):
    return dist(lat, lon, *SFO) <= 1.0


def fmt_coord(x):
    return f"{x:.5f}"


def ts_str(epoch):
    from datetime import datetime, timezone
    return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


# ---------------------------------------------------------------- trips.txt

def gen_trips(rng):
    rows = []
    base = 1211700000
    for i in range(2000):
        taxi = rng.choice([101, 202, 303, 404, 505, 660, 777, 888])
        slat = rng.uniform(37.3, 38.2)
        slon = rng.uniform(-122.8, -121.9)
        # distance mixture: mostly short, tail past the 80 km overflow bin
        r = rng.random()
        if r < 0.70:
            d = rng.uniform(0.05, 12.0)
        elif r < 0.92:
            d = rng.uniform(12.0, 78.0)
        else:
            d = rng.uniform(78.0, 120.0)
        theta = rng.uniform(0, 2 * math.pi)
        dlat = (d / R) * math.degrees(1) * math.cos(theta)
        dlon = (d / R) * math.degrees(1) * math.sin(theta) / math.cos(math.radians(slat))
        elat, elon = slat + dlat, slon + dlon
        t0 = base + i * 97
        t1 = t0 + int(60 * d / rng.uniform(20, 60) * 60)
        actual = dist(slat, slon, elat, elon)
        rev = FARE_BASE + FARE_KM * actual
        rows.append(f"{taxi} {t0}.0 {fmt_coord(slat)} {fmt_coord(slon)} {t1}.0 "
                    f"{fmt_coord(elat)} {fmt_coord(elon)} true {actual:.3f} {rev:.2f} 2008-05-25")
    return rows


def golden_q1(trip_rows):
    hist = defaultdict(int)
    for line in trip_rows:
        f = line.split()
        d = dist(float(f[2]), float(f[3]), float(f[5]), float(f[6]))
        bin_ = ">=80" if d >= 80 else "%02d" % int(math.floor(d / 2) * 2)
        hist[bin_] += 1
    return [f"{b}\t{hist[b]}" for b in sorted(hist)]


# -------------------------------------------------------------- segments.txt

def gen_segments(rng):
    """Simulate per-taxi GPS streams with all the dirty cases, then emit
    consecutive-position segment rows."""
    segments = []  # raw text lines
    taxis = [450, 512, 1203, 87, 2048, 3301, 9, 5555, 7070, 10001]
    for ti, taxi in enumerate(taxis):
        # spread taxis over 3 days so the daily aggregation is non-trivial
        t = 1211702400 + (ti % 3) * 86400 + rng.randint(0, 600)
        lat, lon = rng.uniform(37.55, 37.80), rng.uniform(-122.45, -122.38)
        stream = []  # (ts, lat, lon, status)
        for trip_i in range(rng.randint(4, 8)):
            # empty cruising phase
            for _ in range(rng.randint(2, 4)):
                stream.append((t, lat, lon, "E"))
                t += rng.randint(40, 90)
                lat += rng.uniform(-0.004, 0.004)
                lon += rng.uniform(-0.004, 0.004)
            # busy trip phase; some trips start/end near SFO
            via_sfo = rng.random() < 0.5
            if via_sfo and rng.random() < 0.5:
                lat, lon = SFO[0] + rng.uniform(-0.005, 0.005), SFO[1] + rng.uniform(-0.005, 0.005)
            n_pts = rng.randint(4, 10)
            for j in range(n_pts):
                stream.append((t, lat, lon, "M"))
                t += rng.randint(40, 90)
                lat += rng.uniform(-0.006, 0.006)
                lon += rng.uniform(-0.006, 0.006)
                if via_sfo and j == n_pts // 2 and rng.random() < 0.7:
                    lat, lon = SFO[0] + rng.uniform(-0.004, 0.004), SFO[1] + rng.uniform(-0.004, 0.004)
                if rng.random() < 0.08:
                    t += int(MAX_GAP) + rng.randint(30, 300)  # gap split mid-trip
            stream.append((t, lat, lon, "E"))
            t += rng.randint(40, 90)
        # inject a speed outlier (teleport) inside some M run
        if rng.random() < 0.8:
            idx = next((i for i in range(1, len(stream) - 1)
                        if stream[i][3] == "M" and stream[i - 1][3] == "M"), None)
            if idx:
                ts_, la, lo, st = stream[idx]
                stream[idx] = (ts_, la + 1.5, lo, st)  # ~167km jump in <90s -> skipped
        # taxi 3301 ends with an open M run (flush-at-end case)
        if taxi == 3301:
            while stream and stream[-1][3] == "E":
                stream.pop()
        # taxi 9: all positions forced E (never opens a trip)
        if taxi == 9:
            stream = [(ts_, la, lo, "E") for (ts_, la, lo, _st) in stream]
        # taxi 5555: reduced to a single M point (opens, flushes, dist 0)
        if taxi == 5555:
            first_m = next((p for p in stream if p[3] == "M"), None)
            stream = [first_m] if first_m else []
        # taxi 7070: inject same-timestamp/different-coordinate ties mid-M
        # (exercises the lexicographic lat/long tie-break + Inf-speed skip)
        if taxi == 7070:
            idx = next((i for i in range(1, len(stream))
                        if stream[i][3] == "M" and stream[i - 1][3] == "M"), None)
            if idx:
                ts_, la, lo, st = stream[idx]
                stream.insert(idx + 1, (ts_, la + 0.002, lo + 0.001, st))
                stream.insert(idx + 2, (ts_, la - 0.001, lo + 0.002, st))
        # build segment rows from consecutive positions
        for i in range(len(stream) - 1):
            a, b = stream[i], stream[i + 1]
            segments.append(seg_line(taxi, a, b))
        if len(stream) == 1:  # single-point taxi: one segment with a NULL half
            a = stream[0]
            segments.append(f"{taxi},'{ts_str(a[0])}',{fmt_coord(a[1])},{fmt_coord(a[2])},'{a[3]}',"
                            f"'NULL',NULL,NULL,'NULL'")
    rng.shuffle(segments)

    # dirty rows: wrong arity, NULL halves, out-of-bbox, ocean, bad status, dups
    segments.append("999,'2008-05-25 10:00:00',37.7,-122.4,'M'")  # arity 5 -> dropped
    segments.append("998,'2008-05-25 10:00:00',37.7,-122.4,'M','2008-05-25 10:01:00',37.7,-122.41,'M',extra")  # arity 10
    segments.append("450,'NULL',NULL,NULL,'NULL','2008-05-25 10:05:00',37.70000,-122.40000,'E'")  # NULL half
    segments.append("512,'2008-05-25 10:06:00',35.00000,-122.40000,'M','2008-05-25 10:07:00',37.50000,-123.50000,'M'")  # bbox + ocean
    segments.append("87,'2008-05-25 10:08:00',37.70000,-122.40000,'X','2008-05-25 10:09:00',37.70100,-122.40100,'Q'")  # bad status -> E,E -> dropped
    if segments:
        segments.append(segments[0])  # exact duplicate row (dedup)
    return segments


def seg_line(taxi, a, b):
    return (f"{taxi},'{ts_str(a[0])}',{fmt_coord(a[1])},{fmt_coord(a[2])},'{a[3]}',"
            f"'{ts_str(b[0])}',{fmt_coord(b[1])},{fmt_coord(b[2])},'{b[3]}'")


# ---------------------------------------- independent reference FSM (oracle)

def parse_positions(seg_lines):
    """Mapper+combiner semantics: parse, arity filter, status normalize,
    E-E drop, explode, NULL/GPS filters, exact dedup."""
    positions = set()  # (taxi:int, tsS, latS, lonS, status)
    for line in seg_lines:
        f = line.replace("'", "").split(",")
        if len(f) != 9:
            continue
        s1 = "M" if f[4] == "M" else "E"
        s2 = "M" if f[8] == "M" else "E"
        if s1 == "E" and s2 == "E":
            continue
        for (tsS, latS, lonS, st) in ((f[1], f[2], f[3], s1), (f[5], f[6], f[7], s2)):
            if tsS == "NULL":
                continue
            if not valid(float(latS), float(lonS)):
                continue
            positions.add((int(f[0]), tsS, latS, lonS, st))
    return positions


def epoch(tsS):
    from datetime import datetime, timezone
    return float(datetime.strptime(tsS, "%Y-%m-%d %H:%M:%S")
                 .replace(tzinfo=timezone.utc).timestamp())


def run_fsm(positions):
    """Reference reducer FSM, per-taxi with end-of-group flush
    (SURVEY.md §2.2 J1-11 + delta 1)."""
    by_taxi = defaultdict(list)
    for p in positions:
        by_taxi[p[0]].append(p)
    trips = []
    for taxi in sorted(by_taxi):
        pts = sorted(by_taxi[taxi], key=lambda p: (p[1], p[2], p[3], p[4]))
        prev = None
        open_ = False
        st_t = st_la = st_lo = sp_t = sp_la = sp_lo = date = None
        airport = False
        cum = 0.0

        def close():
            nonlocal open_
            open_ = False
            if cum >= MIN_TRIP and airport:
                rev = FARE_BASE + FARE_KM * cum
                trips.append((taxi, st_t, st_la, st_lo, sp_t, sp_la, sp_lo, cum, rev, date))

        for p in pts:
            _, tsS, latS, lonS, st = p
            ts = epoch(tsS)
            la, lo = float(latS), float(lonS)
            if not open_:
                if st == "M":
                    open_ = True
                    st_t, st_la, st_lo = ts, latS, lonS
                    sp_t, sp_la, sp_lo = ts, latS, lonS
                    airport = near_sfo(la, lo)
                    cum = 0.0
                    date = tsS[:10]
                prev = p
            elif st == "M":
                pts_prev = epoch(prev[1])
                if ts - pts_prev <= MAX_GAP:
                    d = dist(float(prev[2]), float(prev[3]), la, lo)
                    speed = d / ((ts - pts_prev) / 3600.0) if ts != pts_prev else float("inf") if d > 0 else float("nan")
                    if speed > MAX_SPEED:
                        continue  # skip point entirely; prev NOT updated
                    cum += d
                    sp_t, sp_la, sp_lo = ts, latS, lonS
                    airport = airport or near_sfo(la, lo)
                    prev = p
                else:
                    close()
                    open_ = True
                    st_t, st_la, st_lo = ts, latS, lonS
                    sp_t, sp_la, sp_lo = ts, latS, lonS
                    airport = near_sfo(la, lo)
                    cum = 0.0
                    date = tsS[:10]
                    prev = p
            else:  # M -> E
                close()
                prev = p
        if open_:
            close()  # end-of-group flush
    return trips


def fmt_trip(t):
    taxi, st_t, st_la, st_lo, sp_t, sp_la, sp_lo, cum, rev, date = t
    return f"{taxi} {st_t:.1f} {st_la} {st_lo} {sp_t:.1f} {sp_la} {sp_lo} true {cum:.3f} {rev:.2f} {date}"


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(7)
    trips_rows = gen_trips(rng)
    seg_rows = gen_segments(rng)

    write("trips.txt", trips_rows)
    write("segments.txt", seg_rows)
    write("golden_q1.txt", golden_q1(trips_rows))

    fsm_trips = run_fsm(parse_positions(seg_rows))
    write("golden_q2_trips.txt", sorted(fmt_trip(t) for t in fsm_trips))
    daily = defaultdict(Decimal)
    for t in fsm_trips:
        daily[t[9]] += Decimal(f"{t[8]:.2f}")  # 2-dp-rounded revenue, exact sum
    write("golden_q2_daily.txt", [f"{d}\t{daily[d]}" for d in sorted(daily)])
    total = sum(daily.values(), Decimal(0))
    write("golden_q2_total.txt", [str(total)])
    print(f"trips={len(trips_rows)} segments={len(seg_rows)} "
          f"fsm_trips={len(fsm_trips)} days={len(daily)} total={total}")


def write(name, lines):
    with open(os.path.join(OUT, name), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
