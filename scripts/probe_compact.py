"""Probe fixed-capacity stream-compaction variants on the real chip.

jnp.nonzero(size=K) showed up at 8.3 ms for an 8800-element mask
(scripts/profile_fuse.py) — pathological for what is logically a cumsum +
scatter. Compare: nonzero, cumsum+scatter, top_k, and sort-based variants
at the three sizes the pipeline uses (brick ids 8800, screen blocks 57600,
compacted rays 184320). Also probe the histogram (scatter-add vs one-hot
matmul) and wide-row block gathers.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rgbd_recon_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    def sync(*arrays):
        for a in arrays:
            np.asarray(jax.device_get(a.ravel()[0]))

    def bench(name, fn, *args, iters=20):
        r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:52s} {dt:9.3f} ms", file=sys.stderr, flush=True)
        return dt, r

    key = jax.random.PRNGKey(0)

    for B, K in ((8800, 640), (57600, 11520), (184320, 61440)):
        mask = jax.random.uniform(key, (B,)) < 0.1
        mask = jax.device_put(mask)

        def nz(m):
            (ids,) = jnp.nonzero(m, size=K, fill_value=B)
            return ids

        def cs(m):
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            dst = jnp.where(m, pos, K)
            ids = jnp.full((K,), B, jnp.int32)
            return ids.at[dst].set(
                jnp.arange(B, dtype=jnp.int32), mode="drop",
                unique_indices=True, indices_are_sorted=True,
            )

        def tk(m):
            neg = jnp.where(m, -jnp.arange(B, dtype=jnp.int32), -B)
            vals, _ = jax.lax.top_k(neg, K)
            return jnp.where(vals > -B, -vals, B)

        bench(f"nonzero      B={B:7d} K={K}", jax.jit(nz), mask)
        bench(f"cumsum+scat  B={B:7d} K={K}", jax.jit(cs), mask)
        if K <= 16384:
            bench(f"top_k        B={B:7d} K={K}", jax.jit(tk), mask)

    # histogram: scatter-add vs one-hot matmul (mark_bricks scale)
    P = 4 * 171 * 142
    bids = jax.random.randint(key, (P,), 0, 8800)
    val = jax.random.uniform(key, (P,)) < 0.9

    def scat_hist(b, v):
        return jnp.zeros((8800,), jnp.int32).at[b].add(v.astype(jnp.int32))

    def mm_hist(b, v):
        # split 8800 = 440 * 20: two one-hots, one matmul
        hi = b // 20
        lo = b % 20
        oh_hi = (hi[:, None] == jnp.arange(440)[None, :]) & v[:, None]
        oh_lo = lo[:, None] == jnp.arange(20)[None, :]
        h2 = jnp.einsum(
            "ph,pl->hl",
            oh_hi.astype(jnp.bfloat16),
            oh_lo.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return h2.reshape(-1).astype(jnp.int32)

    _, h1 = bench("hist scatter-add  P=97k B=8800", jax.jit(scat_hist),
                  bids, val)
    _, h2 = bench("hist one-hot mm   P=97k B=8800", jax.jit(mm_hist),
                  bids, val)
    print("hist parity:", bool(jnp.all(h1 == h2)), file=sys.stderr)

    # wide-row block gather: (N,B,V,4)[:, ids] vs (N,B,V*4)[:, ids]
    N, B2, V = 4, 8800, 1000
    proj = jax.random.normal(key, (N, B2, V, 4), jnp.float32)
    ids640 = jnp.sort(jax.random.randint(key, (640,), 0, B2))

    def g4(p, i):
        return p[:, i]

    def gwide(p, i):
        return p.reshape(N, B2, V * 4)[:, i].reshape(N, 640, V, 4)

    bench("block gather (N,B,V,4)[:,ids]", jax.jit(g4), proj, ids640)
    bench("block gather (N,B,V*4)[:,ids]", jax.jit(gwide), proj, ids640)

    # scatter of 8-wide rows at tail-compaction scale
    R, cap = 184320, 61440
    st8 = jax.random.normal(key, (R, 8))
    new8 = jax.random.normal(key, (cap, 8))
    idx = jnp.sort(jax.random.randint(key, (cap,), 0, R))

    def scat8(s, n, i):
        return s.at[i].set(n, mode="drop")

    bench("scatter 8-wide rows cap=61440", jax.jit(scat8), st8, new8, idx)

    # gather 8-wide rows (tail compaction read side)
    def gath8(s, i):
        return s[i]

    bench("gather 8-wide rows cap=61440", jax.jit(gath8), st8, idx)


if __name__ == "__main__":
    main()
