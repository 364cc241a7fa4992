"""Microbenchmark of the primitive ops the engine's hot loops lean on.

Motivation (VERDICT r3): the 127 ms frame is ~99% full-store argsorts and
scatter-heavy voxel dedup, with sub-ms of matmul work.  Before redesigning
the map store / compaction paths, measure what each primitive actually
costs on THIS device at the engine's real sizes, D2H-synced (the only
honest barrier on the axon platform — see bench.py d2h_sync).

Run:  timeout 900 python bench_micro.py [out.json]
Prints one JSON line per primitive as it lands (partial results survive a
timeout kill) and writes the full table to MEASUREMENTS payloads.
"""

import json
import os
import sys
import time

os.environ.setdefault("LLT_MATMUL_PRECISION", "high")

import numpy as np
import jax

from light_loam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def d2h_sync(x):
    return np.asarray(x)


def timeit(name, fn, *args, reps=20):
    """Compile, warm, then time `reps` calls ending in one small D2H read.

    Each fn must return a SMALL array (the sync read must not dominate).
    """
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    d2h_sync(out)
    compile_s = time.perf_counter() - t0
    # warm pass
    for _ in range(3):
        out = f(*args)
    d2h_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    d2h_sync(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    rec = {"name": name, "ms": round(ms, 4), "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    results = []

    def bank(rec):
        results.append(rec)

    # ---- engine-shaped inputs ----
    keys131 = jnp.asarray(rng.integers(0, 1 << 30, 131072, dtype=np.int32))
    keys147 = jnp.asarray(rng.integers(0, 1 << 30, 147456, dtype=np.int32))
    keys262 = jnp.asarray(rng.integers(0, 1 << 30, 262144, dtype=np.int32))
    keys270 = jnp.asarray(rng.integers(0, 1 << 30, 270336, dtype=np.int32))
    minor270 = jnp.asarray(rng.integers(0, 1 << 30, 270336, dtype=np.int32))
    xyz262 = jnp.asarray(rng.normal(size=(262144, 3)).astype(np.float32))
    ring131 = jnp.asarray(rng.integers(0, 64, 131072, dtype=np.int32))
    mask524 = jnp.asarray(rng.random(524288) < 0.4)
    ridx = jnp.asarray(rng.integers(0, 262144, 262144, dtype=np.int32))

    # 1. the full-store stable argsorts the engine runs today
    bank(timeit("argsort_131k", lambda k: jnp.argsort(k, stable=True)[:8], keys131))
    bank(timeit("argsort_147k", lambda k: jnp.argsort(k, stable=True)[:8], keys147))
    bank(timeit("argsort_262k", lambda k: jnp.argsort(k, stable=True)[:8], keys262))

    # 2. the 2-key variadic sort of voxel_downsample (merge pattern, 270k)
    def vsort(maj, mnr):
        iota = jnp.arange(maj.shape[0], dtype=jnp.int32)
        _, _, order = lax.sort((maj, mnr, iota), num_keys=2, is_stable=True)
        return order[:8]

    bank(timeit("varsort2_270k", vsort, keys270, minor270))

    # 3. top_k at the _compact_selected capacities (selected count << N)
    for k in (768, 1536, 7680):
        bank(timeit(f"topk_{k}_147k",
                    lambda ks, k=k: lax.top_k(-ks, k)[1][:8], keys147))

    # 4. cumsum (compaction backbone)
    bank(timeit("cumsum_524k", lambda m: jnp.cumsum(m.astype(jnp.int32))[-1:],
                mask524))

    # 5. rank-in-ring via one-hot cumsum (range-image candidate, 131k x 64)
    def rank_onehot(ring):
        oh = (ring[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :])
        c = jnp.cumsum(oh.astype(jnp.float32), axis=0)
        rank = jnp.take_along_axis(c, ring[:, None].astype(jnp.int32),
                                   axis=1)[:, 0] - 1.0
        return rank[:8]

    bank(timeit("rank_onehot_131kx64", rank_onehot, ring131))

    # 6. scatter-set of 131k rows into a 147k grid (range-image store)
    def scat_set(x, idx):
        return jnp.zeros((147457, 3), jnp.float32).at[idx].set(x)[:2, 0]

    idx131 = jnp.asarray(rng.permutation(147456)[:131072].astype(np.int32))
    x131 = jnp.asarray(rng.normal(size=(131072, 3)).astype(np.float32))
    bank(timeit("scatter_set_131k_rows", scat_set, x131, idx131))

    # 7. scatter-add 270k values into 262k slots (voxel centroid pattern)
    def scat_add(x, seg):
        return jnp.zeros((262145, 3), jnp.float32).at[seg].add(x)[:2, 0]

    seg270 = jnp.asarray(rng.integers(0, 262144, 270336, dtype=np.int32))
    x270 = jnp.asarray(rng.normal(size=(270336, 3)).astype(np.float32))
    bank(timeit("scatter_add_270k_rows", scat_add, x270, seg270))

    # 8. searchsorted compaction (cumsum + binary search, gather-only)
    def compact_ss(m):
        c = jnp.cumsum(m.astype(jnp.int32))
        tgt = jnp.arange(1, 65537, dtype=jnp.int32)
        src = jnp.searchsorted(c, tgt)
        return src[:8]

    bank(timeit("searchsorted_compact_524k_to_64k", compact_ss, mask524))

    # 9. plain big gather (262k rows)
    bank(timeit("gather_262k_rows", lambda x, i: x[i][:2, 0], xyz262, ridx))

    # 9b. mask-compaction variants at the _gather_local shape
    # (262k store rows -> 65k buffer): decides ops/voxel.compact_rows'
    # implementation.  All four produce identical live prefixes.
    mask262 = jnp.asarray(rng.random(262144) < 0.04)  # ~10.5k live

    def comp_argsort(x, m):
        order = jnp.argsort(jnp.where(m, 0, 1), stable=True)[:65536]
        return x[order][:2, 0]

    def comp_rowscatter(x, m):
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        tgt = jnp.where(m & (pos < 65536), pos, 65536)
        return jnp.zeros((65537, 3), jnp.float32).at[tgt].set(x)[:2, 0]

    def comp_idxscatter(x, m):
        n = m.shape[0]
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        tgt = jnp.where(m & (pos < 65536), pos, 65536)
        src = jnp.zeros((65537,), jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32))[:65536]
        return x[src][:2, 0]

    def comp_searchsorted(x, m):
        c = jnp.cumsum(m.astype(jnp.int32))
        src = jnp.searchsorted(c, jnp.arange(1, 65537, dtype=jnp.int32))
        return x[jnp.minimum(src, m.shape[0] - 1)][:2, 0]

    bank(timeit("compact262_argsort", comp_argsort, xyz262, mask262))
    bank(timeit("compact262_rowscatter", comp_rowscatter, xyz262, mask262))
    bank(timeit("compact262_idxscatter", comp_idxscatter, xyz262, mask262))
    bank(timeit("compact262_searchsorted", comp_searchsorted, xyz262, mask262))

    # 9c. layout shootout for the engine's dominant memory pattern:
    # gather/scatter of point rows.  (N,3) row ops vs channel-major
    # (3,N) 1-D ops vs flat interleaved — decides whether hot paths
    # should carry clouds channel-major.
    xyz262_T = jnp.asarray(np.ascontiguousarray(
        np.asarray(xyz262).T))                      # (3, 262144)
    idx36 = jnp.asarray(rng.integers(0, 147456, 36864, dtype=np.int32))
    xyz147 = jnp.asarray(rng.normal(size=(147456, 3)).astype(np.float32))
    xyz147_T = jnp.asarray(np.ascontiguousarray(np.asarray(xyz147).T))

    bank(timeit("gather36k_rows_from147k",
                lambda x, i: x[i][:2, 0], xyz147, idx36))
    bank(timeit("gather36k_chanmajor_from147k",
                lambda x, i: x[:, i][:, :2].sum(axis=0), xyz147_T, idx36))

    def gather_flat3(x, i):
        flat = x.reshape(-1)
        i3 = (i[:, None] * 3 + jnp.arange(3, dtype=np.int32)[None, :])
        return flat[i3.reshape(-1)][:2]

    bank(timeit("gather36k_flat3_from147k", gather_flat3, xyz147, idx36))

    bank(timeit("scatter_set_131k_rows_chanmajor",
                lambda x, i: jnp.zeros((3, 147457), jnp.float32)
                .at[:, i].set(x.T)[0, :2], x131, idx131))

    # 10. the per-ring batched sort of voxel_downsample_rings (64 x 2304)
    keysrg = jnp.asarray(
        rng.integers(0, 1 << 30, (64, 2304), dtype=np.int32))
    bank(timeit("batched_sort_64x2304",
                lambda k: jnp.argsort(k, axis=1)[:2, :4], keysrg))

    # 11. hash-insert pattern: 8k probes x 8 rounds on a 512k-slot table
    def hash_probe(tbl_keys, pk):
        M = pk.shape[0]
        C = tbl_keys.shape[0]
        # Knuth constant exceeds int32 — do the hash in uint32 (mod 2^32
        # wraparound is part of the hash)
        pu = pk.astype(jnp.uint32)
        h1 = ((pu * jnp.uint32(2654435761)) % jnp.uint32(C)).astype(jnp.int32)
        h2 = (jnp.uint32(1) + (pu * jnp.uint32(40503)) % jnp.uint32(1023)
              ).astype(jnp.int32)
        found = jnp.full((M,), -1, jnp.int32)
        for r in range(8):
            cand = (h1 + r * h2) % C
            got = tbl_keys[cand]
            hit = (got == pk) & (found < 0)
            found = jnp.where(hit, cand, found)
        return found[:8]

    tbl = jnp.asarray(rng.integers(0, 1 << 30, 524288, dtype=np.int32))
    pk = jnp.asarray(rng.integers(0, 1 << 30, 8192, dtype=np.int32))
    bank(timeit("hash_probe8_8k_on_512k", hash_probe, tbl, pk))

    # 12. small scatter (the hash-insert write path: 8k updates)
    def small_scat(x, idx):
        return jnp.zeros((524289,), jnp.float32).at[idx].add(x)[:2]

    sidx = jnp.asarray(rng.integers(0, 524288, 8192, dtype=np.int32))
    sx = jnp.asarray(rng.normal(size=8192).astype(np.float32))
    bank(timeit("scatter_add_8k_on_512k", small_scat, sx, sidx))

    # 13. full-store elementwise update (hash-store centroid refresh)
    def elemwise(x):
        return (x * 0.5 + 1.0).sum(axis=0)

    x524 = jnp.asarray(rng.normal(size=(524288, 3)).astype(np.float32))
    bank(timeit("elementwise_524k_rows", elemwise, x524))

    out = {"device": str(jax.devices()[0]), "results": results}
    path = sys.argv[1] if len(sys.argv) > 1 else None
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "n": len(results)}), flush=True)


if __name__ == "__main__":
    main()
