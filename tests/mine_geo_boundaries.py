"""Mine event_ids whose md5-derived geo coordinates (the b166 _coord
convention: int(md5(f"{id}{salt}").hexdigest()[:8],16) % 50_000_000 for
salt in lat/lon) hit exact integer boundaries:

  - pairs at dist^2 == r^2 EXACTLY (r = 100_000 micro-deg) and within
    +/-25 of it (strict-vs-inclusive differential material)
  - points on cell edges (lat % 1e5 == 0 / lon % 1e5 == 0) and coarser
    tile edges (% 1e6, % 1e7)
  - points with a coordinate exactly at a geofence zone bound
    (20e6 / 25e6 / 30e6)

Writes /tmp/geo_mine.json.  One-off tool; the resulting ids are
hardcoded (with re-derivation asserts) in tests/test_edge_guards.py.
"""
import hashlib, json, math, time
import numpy as np

SPAN = 50_000_000
R = 100_000
R2 = R * R
N = 20_000_000

t0 = time.time()
lat = np.empty(N, dtype=np.int64)
lon = np.empty(N, dtype=np.int64)
md5 = hashlib.md5
for i in range(N):
    s = str(i).encode()
    lat[i] = int(md5(s + b"lat").hexdigest()[:8], 16) % SPAN
    lon[i] = int(md5(s + b"lon").hexdigest()[:8], 16) % SPAN
print(f"hashed {N} ids in {time.time()-t0:.0f}s", flush=True)

key = lat * SPAN + lon
order = np.argsort(key)
ks = key[order]

# ---- offsets with norm^2 == R2 exactly, plus near-boundary norms
offsets = []
for target in range(R2 - 25, R2 + 26):
    for dx in range(0, int(math.isqrt(target)) + 1):
        rem = target - dx * dx
        dy = math.isqrt(rem)
        if dy * dy == rem:
            for sy in ((1,) if dy == 0 else (1, -1)):
                if dx == 0 and sy < 0:
                    continue
                offsets.append((dx, dy * sy, target))
print(f"{len(offsets)} candidate offsets", flush=True)

pairs = []
t1 = time.time()
for dx, dy, target in offsets:
    cand = ks + (dx * SPAN + dy)
    idx = np.searchsorted(ks, cand)
    idx[idx >= N] = N - 1
    hit = ks[idx] == cand
    for h in np.nonzero(hit)[0]:
        ia = order[h]                       # point at (lat,lon)
        ib = order[idx[h]]                  # point at (lat+dx, lon+dy)
        # reject lon wraparound artifacts of the packed key
        if 0 <= lon[ia] + dy < SPAN and 0 <= lat[ia] + dx < SPAN:
            d2 = int((lat[ia]-lat[ib])**2 + (lon[ia]-lon[ib])**2)
            assert d2 == target, (ia, ib, d2, target)
            pairs.append(dict(id_a=int(ia), id_b=int(ib), dx=dx, dy=dy,
                              dist2=d2, rel=d2 - R2))
print(f"offset search {time.time()-t1:.0f}s, {len(pairs)} pairs", flush=True)

# ---- mod-boundary and zone-boundary points (first few of each)
out = {"pairs": pairs, "span": SPAN, "r": R, "n": N}
for label, arr in (("lat", lat), ("lon", lon)):
    for mod in (100_000, 1_000_000, 10_000_000):
        ids = np.nonzero(arr % mod == 0)[0][:5]
        out[f"{label}_mod_{mod}"] = [
            dict(id=int(i), lat=int(lat[i]), lon=int(lon[i])) for i in ids]
    for bound in (20_000_000, 25_000_000, 30_000_000):
        ids = np.nonzero(arr == bound)[0][:5]
        out[f"{label}_eq_{bound}"] = [
            dict(id=int(i), lat=int(lat[i]), lon=int(lon[i])) for i in ids]

# ---- in-radius neighbors of each exact pair's endpoints (for DBSCAN
#      core-threshold composition): vectorized 3x3-window scan
def neighbors(i, limit=6):
    m = (np.abs(lat - lat[i]) <= R) & (np.abs(lon - lon[i]) <= R)
    m[i] = False
    cand = np.nonzero(m)[0]
    d2 = (lat[cand]-lat[i])**2 + (lon[cand]-lon[i])**2
    sel = cand[d2 <= R2]
    return [dict(id=int(j), lat=int(lat[j]), lon=int(lon[j]),
                 dist2=int((lat[j]-lat[i])**2 + (lon[j]-lon[i])**2))
            for j in sel[:limit]]

for p in pairs:
    if p["rel"] == 0:
        p["nbrs_a"] = neighbors(p["id_a"])
        p["nbrs_b"] = neighbors(p["id_b"])

json.dump(out, open("/tmp/geo_mine.json", "w"), indent=1)
print("done", time.time()-t0, flush=True)
